package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TokenOps}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.exact keeps min-tiebreak survivor and is idempotent") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b"), (5L, "a"))
      .toDF("id", "k")
    val out = Dedup.exact(df, Seq("k"), $"id")
      .as[(Long, String)].collect().sortBy(_._2)
    assert(out.toSeq === Seq((1L, "a"), (2L, "b")))
    val once = Dedup.exact(df, Seq("k"), $"id")
    val twice = Dedup.exact(once, Seq("k"), $"id")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("Dedup.exactByFingerprint collapses word-order permutations") {
    val df = Seq((1L, "spark is fast"), (2L, "fast is spark"), (3L, "other doc"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByFingerprint(df,
      TokenOps.bagOfWordsFingerprint($"text"), $"doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("TABLESAMPLE: fraction in band, same-seed deterministic, subset of source") {
    val q = graft.queries.RelationalQueries.queries("q_tablesample")
    val total = Tables.lineitem(spark, sf01).count()
    val s1 = q(spark, sf01).collect()
    val s2 = q(spark, sf01).collect()
    assert(s1.toSeq == s2.toSeq, "REPEATABLE seed must make the sample stable")
    val frac = s1.length.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"10% sample out of band: $frac")
    // every sampled key exists in the source (it's a filter, not a generator)
    val keys = Tables.lineitem(spark, sf01)
      .select($"l_orderkey", $"l_linenumber".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(s1.forall(r => keys.contains((r.getLong(0), r.getInt(1).toLong))))
  }

  test("unpivot long form is exactly the wide aggregate, re-keyed") {
    val out = graft.queries.RelationalQueries.queries("q_unpivot")(spark, sf001)
      .collect()
    // 3 measures per returnflag, no nulls, and n_lines rows sum to the count
    val flags = out.map(_.getString(0)).distinct
    assert(out.length == flags.length * 3)
    val n = out.filter(_.getString(1) == "n_lines").map(_.getLong(2)).sum
    assert(n == Tables.lineitem(spark, sf001).count())
  }

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sf01)
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_partkey", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("expectations count planted violations per rule in one job") {
    import graft.operators.Expectations._
    val df = Seq(
      (1L, Some("ok"), Some(10L), Some("en")),
      (2L, None, Some(-5L), Some("english")), // null text, bad range, bad lang
      (2L, Some("dup"), None, Some("de")),    // dup id, null range (ignored)
      (3L, Some("x"), Some(200000L), None))   // bad range, null lang (ignored)
      .toDF("doc_id", "text", "n_chars", "lang")
    val out = check(df,
      Seq(notNull("text"),
        inRange("n_chars", lit(1), lit(100000)),
        matches("lang", "^[a-z]{2}$")),
      uniqueKeys = Seq("doc_id"))
      .as[(String, Long)].collect().toMap
    assert(out === Map(
      "not_null(text)" -> 1L,
      "in_range(n_chars)" -> 2L,
      "matches(lang)" -> 1L,
      "unique(doc_id)" -> 1L))
    // empty input reads as 0 violations, never NULL
    val empty = check(df.limit(0), Seq(notNull("text")),
      uniqueKeys = Seq("doc_id")).as[(String, Long)].collect().toMap
    assert(empty === Map("not_null(text)" -> 0L, "unique(doc_id)" -> 0L))
  }

  test("HLL sketch union rollup matches exact distinct within 5%") {
    val ev = Tables.events(spark, sf01)
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val rolled = SparkEntry.queries("q_hll_rollup")(spark, sf01)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    assert(rolled.keySet === exact.keySet)
    for ((k, approx) <- rolled) {
      assert(math.abs(approx - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: approx=$approx exact=${exact(k)}")
    }
    // merging daily sketches loses nothing vs sketching in one pass:
    // the two estimates must agree closely (same lgK state space)
    val direct = ev.groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, d) <- direct)
      assert(math.abs(rolled(k) - d).toDouble / math.max(d, 1L) < 0.02,
        s"$k: union-of-dailies=$rolled(k) single-pass=$d")
  }

  test("star join broadcasts small dims (plan check)") {
    val plan = SparkEntry.queries("q_join_star")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q_topk")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("TPC-H Q2/Q11/Q16/Q20 shapes: dims broadcast, no residual subquery") {
    for (q <- Seq("q_min_cost_supplier", "q_important_parts",
        "q_supplier_part_cnt", "q_potential_promotion")) {
      val plan = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$q: no broadcast join\n$plan")
      // decorrelated by construction: the DataFrame form can't even
      // express a correlated subquery — pin that none crept in via
      // exprs, and that the semi/anti chains stayed joins
      assert(!plan.contains("Subquery"), s"$q: residual subquery\n$plan")
    }
    val q20 = SparkEntry.queries("q_potential_promotion")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(q20.contains("LeftSemi"), s"q20 chain must stay semi joins\n$q20")
    val q16 = SparkEntry.queries("q_supplier_part_cnt")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(q16.contains("LeftAnti"), s"q16 exclusion must stay anti join\n$q16")
  }
}
