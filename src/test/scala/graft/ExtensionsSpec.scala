package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions makes vec_dot available to plain SQL") {
    val shared = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // New session over the same SparkContext. spark.sql.extensions is
      // a STATIC conf (only honored when the context is created), so the
      // builder-side withExtensions path is used here; both routes call
      // the same GraftExtensions.apply.
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = ext.sql(
        "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head().getDouble(0)
      assert(out === 32.0)
      // wrong arity: clean message, not an IndexOutOfBoundsException
      val err = intercept[Exception] {
        ext.sql("SELECT vec_dot(array(1.0d)) AS d").head()
      }
      assert(err.getMessage.contains("2 arguments"),
        s"unexpected error: ${err.getMessage}")
      // the native aggregate rides the same front door
      val bk = ext.sql(
        "SELECT bottom_k(k, id, 2) AS ids FROM VALUES ('b', 2L), ('a', 1L), " +
          "('c', 3L) AS t(k, id)")
        .head().getSeq[Long](0)
      assert(bk === Seq(1L, 2L))
      // the mergeable heavy-hitters pair, end-to-end in SQL: build
      // per-group summaries, roll them up, read the top item
      val hh = ext.sql(
        """SELECT e.item, e.est FROM (
          |  SELECT explode(heavy_hitters_merge(hh, 4)) AS e FROM (
          |    SELECT g, heavy_hitters(t, 4) AS hh
          |    FROM VALUES (0, 'x'), (0, 'x'), (0, 'y'), (1, 'x') AS v(g, t)
          |    GROUP BY g))
          |ORDER BY e.est DESC, e.item LIMIT 1""".stripMargin)
        .head()
      assert(hh.getString(0) === "x" && hh.getLong(1) === 3L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
