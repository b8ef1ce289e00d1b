package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over text (the standard
  * shingle → minhash → band → bucket-join cascade).
  *
  * Everything up to the bucket join is ROW-LOCAL — shingles, the H-wide
  * minhash signature, and the band keys are computed as HOF expressions
  * inside one projection (no fitting job, no shuffle, no UDF). The only
  * shuffles are the band-bucket self-join (keys are 64-bit hashes →
  * uniformly distributed, no skew) and the final candidate verification
  * join. That is the correct shape at 100 TB: cost scales with
  * n·bands + Σ bucket² instead of n².
  *
  * Hash function: xxhash64 (Spark built-in, deterministic across runs and
  * executors). Seeded per-hash by prepending the hash index to the input.
  */
object MinHashDedup {

  /** Word n-gram shingles of a token array (distinct, order-sensitive
    * content). Documents shorter than n shingle to the empty array. */
  def shingles(tokens: Column, n: Int): Column = {
    val idx = sequence(lit(0), size(tokens) - n) // 0-based start offsets
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(j => element_at(tokens, i + j + 1)): _*))
    array_distinct(when(size(tokens) < n, array()).otherwise(grams))
  }

  /** H-wide minhash signature: sig_i = min over shingles of
    * xxhash64(i, shingle). Row-local. */
  def signature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: hash of each r-row slice of the signature. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      xxhash64(lit(j), slice(sig, j * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Candidate pairs: documents sharing at least one band bucket.
    * Returns (id_a, id_b) with id_a < id_b, distinct. */
  def candidatePairs(df: DataFrame, idCol: String, bandsCol: String)
      : DataFrame = {
    val exploded = df.select(col(idCol),
        posexplode(col(bandsCol)).as(Seq("band_id", "band_key")))
    val a = exploded.select(col(idCol).as("id_a"),
      col("band_id"), col("band_key"))
    val b = exploded.select(col(idCol).as("id_b"),
      col("band_id"), col("band_key"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full near-dup pipeline: tokenize → shingle → minhash → band →
    * candidates → EXACT Jaccard verification on candidates only.
    * Output: (id_a, id_b, jaccard) for pairs with jaccard >= threshold.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val withSig = df.select(col(idCol),
        shingles(TokenOps.tokenize(col(textCol)), shingleN).as("sh"))
      .withColumn("sig", signature(col("sh"), numHashes))
      .withColumn("bands", bandKeys(col("sig"), bands, r))
    val cands = candidatePairs(withSig, idCol, "bands")
    val sets = withSig.select(col(idCol), col("sh"))
    cands
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
