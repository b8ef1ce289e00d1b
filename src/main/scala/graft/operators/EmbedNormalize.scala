package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension embedding standardization (feature-wise z-scoring) —
  * the preprocessing step before mixing embedding sources or feeding
  * distance-based models: a dimension whose scale dwarfs the others
  * owns every distance, and per-VECTOR normalization ([[Similarity]]'s
  * L2 form) cannot fix that.
  *
  * Determinism discipline (the [[graft.functions.Money]] /
  * q_embed_centroid construction, extended to second moments): floats
  * enter the micro grid once (q = round(x·10⁶) as long), per-dimension
  * sums Σq and Σq² accumulate EXACTLY (decimal-38 — order-free), and
  * z = (n·q − s1) / √(n·s2 − s1²)
  * is computed from those exact integers with one division and one
  * sqrt — both IEEE-correctly-rounded, so both engines produce the SAME
  * double bit-for-bit, no accumulation-order flake anywhere. (This is
  * n·σ-scaled z in exact form: (q − s1/n)/σ times n/√n·√n — the
  * standard z-score precisely, just never materializing the
  * non-representable intermediates.) A zero-variance dimension
  * standardizes to 0 (the convention that keeps constant dims inert
  * rather than NaN-poisoning every vector).
  *
  * Scale shape: the stats are DIMENSION-sized (one posexplode +
  * wordcount aggregate, map-side combined; d rows out) and come back as
  * literal arrays — the thresholded-collect discipline, d ≤ a few
  * thousand by construction. The transform is then row-local at scan
  * speed; the corpus never shuffles.
  */
object EmbedNormalize {

  /** Per-dimension exact micro-grid moments: (pos 1-based, n, s1, s2). */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame =
    emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
      .select((col("p") + 1).cast("long").as("pos"),
        round(col("x") * 1e6).cast("long").as("q"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s1"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("s2"))

  /** `df` with `zCol` added: the z-scored copy of `vecCol`
    * (array<double>, same length). Stats collect dimension-sized state
    * to the driver and return to the plan as literals — the transform
    * itself is row-local. */
  def standardize(emb: DataFrame, vecCol: String,
      zCol: String = "z"): DataFrame = {
    val stats = dimStats(emb, vecCol)
      .orderBy(col("pos")).collect()
    require(stats.nonEmpty, "standardize: no vectors")
    stats.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i + 1L,
        s"standardize: ragged embeddings — dimension ${i + 1} missing " +
          "from some vectors (pad or fix upstream; per-dim stats over " +
          "ragged arrays silently mix dimensions)")
    }
    val n = stats.map(_.getLong(1)).distinct match {
      case Array(one) => one
      case _ => throw new IllegalArgumentException(
        "standardize: ragged embeddings — dimensions have differing counts")
    }
    val s1 = stats.map(_.getDecimal(2).toBigInteger)
    val s2 = stats.map(_.getDecimal(3).toBigInteger)
    val bigN = java.math.BigInteger.valueOf(n)
    // n·s2 − s1² per dim, exact, then the one inexact step: to double
    val denom = s1.indices.map { i =>
      math.sqrt(bigN.multiply(s2(i)).subtract(s1(i).multiply(s1(i)))
        .doubleValue)
    }
    val s1d = array(s1.map(v => lit(v.doubleValue)): _*)
    val den = array(denom.map(v => lit(v)): _*)
    val nLit = lit(n.toDouble)
    emb.withColumn(zCol,
      zip_with(col(vecCol).cast("array<double>"),
        sequence(lit(1), lit(s1.length)),
        (x: Column, i: Column) => {
          val q = round(x * 1e6)
          val d = element_at(den, i)
          when(d === 0.0, 0.0)
            .otherwise((nLit * q - element_at(s1d, i)) / d)
        }))
  }
}
