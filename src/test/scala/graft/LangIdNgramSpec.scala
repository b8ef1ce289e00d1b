package graft

import graft.operators.LangIdNgram

/** The trained char-n-gram language-ID tier: it must actually LEARN —
  * recover the injected arm languages on a held-out half (including
  * pt/nl, which the marker tier has no word lists for), post a kappa
  * near 1 where the marker tier posts a materially lower one, fall
  * back to "und" when a document has no n-grams, and trip its
  * broadcast-size vocabulary guard loudly. */
class LangIdNgramSpec extends SparkSpec {

  import spark.implicits._

  test("fit+predict recovers all seven injected languages on the held-out half") {
    val got = SparkEntry.queries("q_lang_id_ngram")(spark, sf001)
      .as[(Long, String, String)].collect()
    assert(got.nonEmpty)
    val acc = got.count(r => r._2 == r._3).toDouble / got.length
    assert(acc >= 0.95, s"accuracy $acc over ${got.length} docs")
    // the extensibility claim: languages OUTSIDE LangId.markers
    Seq("pt", "nl").foreach { l =>
      val arm = got.filter(_._2 == l)
      assert(arm.nonEmpty && arm.forall(_._3 == l),
        s"$l mispredicted: ${arm.filterNot(_._3 == l).toSeq}")
    }
  }

  test("kappa readout: trained tier near 1 and materially above the marker tier") {
    val k = SparkEntry.queries("q_lang_id_ngram_kappa")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(k("ngram") > 0.9, s"ngram kappa ${k("ngram")}")
    assert(k("ngram") >= k("marker") + 0.2,
      s"trained tier not materially above marker: $k")
  }

  test("CharNGramsExpr equals the substr HOF form (unicode, short, empty, null)") {
    import org.apache.spark.sql.functions._
    val texts = Seq("hello world", "Déjà vu straße", "日本語テキスト",
      "ab", "a", "", "xy z", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    Seq(1, 2, 3, 5).foreach { n =>
      // the reference form charGrams replaced: interpreted HOF substr
      val hof = when(lower(col("t")).isNotNull,
        transform(
          sequence(lit(1), greatest(length(lower(col("t"))) - (n - 1), lit(1))),
          i => lower(col("t")).substr(i, lit(n))))
      val rows = df.select(col("id"),
          LangIdNgram.charGrams(col("t"), n).as("fast"), hof.as("ref"))
        .collect()
      rows.foreach { r =>
        def seqOf(c: String): Seq[String] = Option(r.getAs[AnyRef](c))
          .map(_.asInstanceOf[scala.collection.Seq[String]].toSeq).orNull
        assert(seqOf("fast") == seqOf("ref"),
          s"n=$n id=${r.getLong(0)}: ${seqOf("fast")} != ${seqOf("ref")}")
      }
      // interpreted eval parity with the codegen path (the DotProduct
      // codegen==interpreted discipline)
      val expr = graft.functions.CharNGramsExpr(
        org.apache.spark.sql.catalyst.expressions.Literal("déjà vu"), n)
      val interp = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType).toSeq
      val viaDf = Seq("déjà vu").toDF("t")
        .select(graft.functions.CharNGramsExpr.grams(col("t"), n))
        .head().getSeq[String](0)
      assert(interp.map(_.toString) == viaDf, s"n=$n: $interp != $viaDf")
    }
  }

  test("no-gram documents predict und; the vocab guard trips") {
    val m = LangIdNgram.fit(
      Seq(("xx", "aaabbbccc"), ("yy", "dddeeefff")).toDF("l", "t"),
      "l", "t")
    val docs = Seq((1L, "aaabbb"), (2L, null.asInstanceOf[String]))
      .toDF("id", "txt")
    val p = LangIdNgram.predict(docs, "id", "txt", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p(1L) == "xx", s"got $p")
    assert(p(2L) == "und", s"null text must predict und: $p")
    val e = intercept[IllegalArgumentException] {
      LangIdNgram.fit(Seq(("xx", "abcdefghij")).toDF("l", "t"), "l", "t",
        maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab=2"), e.getMessage)
  }
}
