package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank invariants the oracle can't see: partitioning-independence
  * (the integer-sum discipline's whole point), near-conserved mass,
  * teleport-only isolated nodes, and canonical = argmax rank. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a two-triangle graph with a bridge and one isolated node
  private val nodes = (0L to 6L).toDF("id")
  private val pairs = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), // triangle A
    (3L, 4L), (4L, 5L), (3L, 5L), // triangle B
    (2L, 3L)                      // bridge
  ).toDF("id_a", "id_b")          // node 6 isolated

  test("bit-identical across partitionings (order-free integer sums)") {
    val a = PageRank.ranks(nodes, "id", pairs, iters = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = PageRank.ranks(nodes.repartition(7), "id",
        pairs.repartition(5), iters = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("mass nearly conserved; bridge endpoints outrank triangle interiors") {
    val pr = PageRank.ranks(nodes, "id", pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    // isolated node leaks (damping·its mass has nowhere to go); drift
    // beyond that is only per-node rounding — nanos per node
    val total = pr.values.sum
    assert(total > 700000000L && total <= 1000000007L, s"mass $total")
    // degree-3 bridge endpoints (2, 3) outrank degree-2 interiors
    assert(pr(2L) > pr(0L) && pr(3L) > pr(5L))
    assert(pr(2L) == pr(3L) && pr(0L) == pr(1L), "symmetry must be exact")
  }

  test("isolated node holds exactly the teleport term") {
    val pr = PageRank.ranks(nodes, "id", pairs, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(6L) == math.round((1.0 - 0.85) * 1e9 / 7))
  }

  test("canonical = highest-rank member per component, ties to lowest id") {
    val c = PageRank.canonical(nodes, "id", pairs, iters = 4)
      .as[(Long, Long, Long, Long)].collect()
    val byComp = c.groupBy(_._2)
    assert(byComp.size == 2) // the connected 0-5 block and isolated 6
    byComp.foreach { case (_, rows) =>
      val want = rows.map(r => (r._3, r._1)).sortBy { case (p, id) => (-p, id) }
        .head._2
      assert(rows.forall(_._4 == want))
    }
    // in the connected block that's node 2 or 3; symmetry tie → lower id
    assert(c.find(_._1 == 0L).get._4 == 2L)
  }

  test("textrank: the hub word tops the list; stopwords and self-loops never appear") {
    // "engine" co-occurs with six distinct words; the satellites only
    // ever touch "engine" (star graph) — the hub must rank first. "the"
    // is a stopword and must never become a node; "solo solo" is a
    // self-loop and contributes no edge.
    val docs = Seq(
      (0L, "the engine parses"), (1L, "the engine optimizes"),
      (2L, "engine shuffles"), (3L, "engine broadcasts"),
      (4L, "engine partitions"), (5L, "engine compiles"),
      (6L, "solo solo")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-textrank")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TokenQueries.queries("q_textrank")(
        spark, dir.toString)
      .as[(String, Long)].collect()
    assert(got.head._1 == "engine", s"hub should rank first: ${got.toSeq}")
    assert(got.head._2 > got(1)._2)
    val tokens = got.map(_._1).toSet
    assert(!tokens.contains("the") && !tokens.contains("solo"))
    assert(tokens.contains("parses") && tokens.contains("shuffles"))
  }
}
