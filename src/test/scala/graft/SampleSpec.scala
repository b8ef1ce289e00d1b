package graft

/** P6/P7 property tests (SURVEY.md §5.3): sample/randomSplit are
  * RNG-dependent and never oracle-declared; verified by properties. */
class SampleSpec extends SparkSpec {

  test("sample: seed-deterministic, fraction within tolerance") {
    val docs = Tables.documents(spark, sf01)
    val a = docs.sample(withReplacement = false, 0.2, seed = 42)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = docs.sample(withReplacement = false, 0.2, seed = 42)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a === b, "same seed must reproduce")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.08, s"fraction off: ${a.size / n}")
  }

  test("randomSplit(0.8/0.2, seed=42): disjoint, complete, ratio in band") {
    val docs = Tables.documents(spark, sf01).select("doc_id")
    val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    val t = train.collect().map(_.getLong(0)).toSet
    val v = test.collect().map(_.getLong(0)).toSet
    assert((t & v).isEmpty, "splits overlap")
    assert(t.size + v.size === docs.count(), "splits don't cover input")
    val frac = t.size.toDouble / (t.size + v.size)
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
