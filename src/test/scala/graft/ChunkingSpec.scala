package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, TokenOps}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def mk(texts: (Long, String)*) = texts.toDF("doc_id", "text")

  test("chunks cover every token exactly once after overlap removal") {
    val docs = Tables.documents(spark, sf001).limit(100)
    val w = 16; val o = 4
    val chunks = Chunking.chunk(docs, "doc_id", "text", w, o)
      .select($"doc_id", $"chunk_id", $"chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val originals = docs.filter($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(originals.nonEmpty)
    originals.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+", -1).toSeq
      val got = chunks(id)
      // first chunk whole, later chunks minus their leading overlap
      val reconstructed = got.head.split(" ", -1).toSeq ++
        got.tail.flatMap(_.split(" ", -1).toSeq.drop(o))
      assert(reconstructed === toks, s"doc $id")
    }
  }

  test("consecutive chunks share exactly the overlap tokens") {
    val docs = mk((0L, (1 to 100).map(i => s"t$i").mkString(" ")))
    val w = 10; val o = 3
    val chunks = Chunking.chunk(docs, "doc_id", "text", w, o)
      .orderBy($"chunk_id")
      .select($"chunk_text").as[String].collect().map(_.split(" ").toSeq)
    chunks.sliding(2).foreach { pair =>
      val Array(a, b) = pair
      assert(a.takeRight(o) === b.take(o))
    }
  }

  test("boundary sizes: n<=W one chunk; n=W+1 two; stride-aligned ends exact") {
    def nChunks(n: Int, w: Int, o: Int): Long = {
      val docs = mk((0L, (1 to n).map(_ => "x").mkString(" ")))
      Chunking.chunk(docs, "doc_id", "text", w, o).count()
    }
    assert(nChunks(64, 64, 16) === 1)
    assert(nChunks(65, 64, 16) === 2)
    assert(nChunks(112, 64, 16) === 2) // 64 + one full stride: ends exact
    assert(nChunks(113, 64, 16) === 3)
    // start_token of the last chunk always < n (no all-overlap tail)
    val last = Chunking.chunk(
        mk((0L, (1 to 200).map(_ => "x").mkString(" "))),
        "doc_id", "text", 64, 16)
      .agg(max($"start_token"), max($"n_tokens")).head()
    assert(last.getLong(0) < 200 && last.getLong(1) <= 64)
  }

  test("null text yields no chunks; empty text yields its single empty token") {
    val docs = mk((0L, null.asInstanceOf[String]), (1L, ""), (2L, "a b"))
    val out = Chunking.chunk(docs, "doc_id", "text", 4, 1)
      .select($"doc_id", $"n_tokens", $"chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._2 === 1L && out(0)._3 === "")
    assert(out(1)._3 === "a b")
  }

  test("plan is scan-stage: no shuffle exchange below the chunk explode") {
    val plan = Chunking.chunk(Tables.documents(spark, sf001),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("tokenization agrees with TokenOps (shared whitespace class)") {
    val docs = mk((0L, "A\tbc  d"))
    val out = Chunking.chunk(docs, "doc_id", "text", 10, 2)
      .select($"n_tokens").as[Long].head()
    val n = docs.select(size(TokenOps.tokenize($"text"))).as[Int].head()
    assert(out === n.toLong)
  }
}
