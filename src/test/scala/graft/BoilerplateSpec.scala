package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

/** Line-level boilerplate removal: threshold arithmetic, order
  * preservation, the all-boilerplate document, and exact-match (no
  * folding) semantics. Fixture-level value checks are the DuckDB
  * oracle (`q_boilerplate`). */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // 10 docs: shared footer everywhere, header in 3, unique body each
  private val docs = (1L to 10L).map { i =>
    val header = if (i <= 3) "COOKIE BANNER\n" else ""
    (i, s"${header}body text $i\nfooter: subscribe now")
  }.toDF("doc_id", "text")

  test("lines over the doc-fraction threshold vanish; the rest keep order") {
    // N=10, maxDocFrac 0.25 → threshold max(2, ceil(2.5)) = 3:
    // footer (df=10) and header (df=3) go, unique bodies stay
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text",
        maxDocFrac = 0.25)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "body text 1")
    assert(out(5L) === "body text 5")
    assert(out.size === 10)
    // a LOOSER threshold keeps the header (df=3 < max(2, ceil(0.5·10)))
    val loose = Boilerplate.removeBoilerplate(docs, "doc_id", "text",
        maxDocFrac = 0.5)
      .as[(Long, String)].collect().toMap
    assert(loose(1L) === "COOKIE BANNER\nbody text 1")
    assert(loose(4L) === "body text 4")
  }

  test("a document of pure boilerplate survives as an empty row") {
    val withEmpty = docs.union(
      Seq((11L, "footer: subscribe now")).toDF("doc_id", "text"))
    val out = Boilerplate.removeBoilerplate(withEmpty, "doc_id", "text",
        maxDocFrac = 0.25)
      .as[(Long, String)].collect().toMap
    assert(out(11L) === "")
    assert(out.size === 11) // the row is the caller's to drop, not ours
  }

  test("lines match exactly — case/whitespace variants are NOT folded") {
    val d = (1L to 6L).map(i => (i, s"Footer\nbody $i"))
      .toDF("doc_id", "text")
      .union(Seq((7L, "footer\nbody 7"), (8L, " Footer\nbody 8"))
        .toDF("doc_id", "text"))
    // 'Footer' df=6 ≥ max(2, ceil(0.3·8)=3) → removed; 'footer' and
    // ' Footer' are distinct lines with df=1 → kept (normalization is
    // the clean stage's job, upstream)
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text",
        maxDocFrac = 0.3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "body 1")
    assert(out(7L) === "footer\nbody 7")
    assert(out(8L) === " Footer\nbody 8")
  }

  test("repeated lines WITHIN one doc count that doc once") {
    // 'echo' appears twice in each of 2 docs of 8: distinct-doc df=2,
    // threshold max(2, ceil(0.05·8)=1) = 2 → removed (both copies)
    val d = Seq(
      (1L, "echo\na1\necho"), (2L, "echo\na2\necho")).toDF("doc_id", "text")
      .union((3L to 8L).map(i => (i, s"a$i")).toDF("doc_id", "text"))
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "a1" && out(2L) === "a2")
  }

  test("guards: degenerate thresholds fail loudly") {
    intercept[IllegalArgumentException] {
      Boilerplate.removeBoilerplate(docs, "doc_id", "text", maxDocFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.removeBoilerplate(docs, "doc_id", "text", minLineDocs = 1L)
    }
  }
}
