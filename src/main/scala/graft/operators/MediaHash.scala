package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (aHash) + Hamming near-duplicate pairing —
  * the IMAGE twin of [[SimHash]]'s text fingerprinting, closing the
  * multimodal side of the dedup family: byte-identical blobs are caught
  * by exact dedup, but a re-encoded / brightness-shifted / resaved copy
  * has different bytes and the same perceptual hash. The reference
  * pipeline is text-only (`/root/reference/preprocessing.py` — no media
  * stage at all); this is the standard image-dedup operator a
  * multimodal training-data pipeline runs before CLIP-style embedding.
  *
  * aHash (average hash, the classic 8×8 form): decode the image, pool
  * pixels into an 8×8 block grid, set bit (by·8+bx) iff that block's
  * mean luminance exceeds the GLOBAL mean. Comparisons are integer
  * cross-multiplies (blockSum·totalCnt > totalSum·blockCnt) over an
  * integer luminance (2126·R + 7152·G + 722·B — Rec.709 scaled by 10⁴,
  * exact), so the hash is bit-stable and, on the closed-form BMP
  * fixture, DuckDB-recomputable — the oracle re-derives every hash from
  * the pixel formula, so a regression in the REAL decode path (ImageIO,
  * same decoder `q_media_features_image` pins) breaks the hash-match.
  *
  * Scale shape: hashing is scan-stage row-local work (one decode per
  * blob, 64 counters); pairing is [[SimHash]]'s pigeonhole — the 64-bit
  * hash splits into four 16-bit bands, Hamming ≤ 3 forces at least one
  * band equal (4 bands, 3 differing bits), so candidates come from a
  * plain equi-join on (band_id, band) and only candidates pay the
  * popcount verify. No O(n²) anywhere; the only shuffle is the
  * band-bucket join on signature-sized rows.
  *
  * The hash travels as two 32-bit halves (`ahash_hi` bits 32–63,
  * `ahash_lo` bits 0–31, both non-negative BIGINTs) rather than one
  * signed 64-bit value: bit 63 would flip the sign in Spark and
  * overflow DuckDB's checked BIGINT shift in the mirror — two halves
  * keep every value positive and every shift < 32 on both engines.
  */
object MediaHash {

  final case class ImageHash(media_id: Long, width: Int, height: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** Exact sign of a·b vs c·d for NON-NEGATIVE longs via full 128-bit
    * products (Math.multiplyHigh + unsigned low-word compare). The naive
    * `a*b > c*d` long compare silently wraps once a side crosses
    * Long.MaxValue — for [[ahash]] that is a luminance sum (≤ 2.55e6 per
    * pixel) times a pixel count, i.e. real-world photos above roughly 15
    * megapixels — and a wrapped compare flips hash bits without any
    * error, corrupting near-dup detection exactly on large images. The
    * small closed-form fixtures can never trip it, so the oracle cannot
    * catch the wrap; this helper keeps the compare exact at any image
    * size instead. */
  private[graft] def mulCompare(a: Long, b: Long, c: Long, d: Long): Int = {
    require(a >= 0 && b >= 0 && c >= 0 && d >= 0,
      s"mulCompare is unsigned-exact for non-negative inputs only: $a,$b,$c,$d")
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** aHash of one decoded image as (hi, lo) 32-bit halves. Blocks are
    * the same `(x*8)/w` banding the feature extractor uses (for w < 8
    * the high blocks are empty → their bits stay 0); ties (uniform
    * images: every block mean == global mean) leave ALL bits unset, so
    * a flat image hashes to 0 — deterministic, and uniform images of
    * any brightness collide there, which is the aHash contract. */
  def ahash(img: java.awt.image.BufferedImage): (Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val bs = new Array[Long](64)
    val bc = new Array[Long](64)
    var ts = 0L
    var tc = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer Rec.709 luminance ×10000 (2126+7152+722 = 10000):
        // exact on both engines, no float division anywhere
        val lum = 2126L * ((rgb >> 16) & 0xFF) + 7152L * ((rgb >> 8) & 0xFF) +
          722L * (rgb & 0xFF)
        val i = by * 8 + x * 8 / w
        bs(i) += lum
        bc(i) += 1
        ts += lum
        tc += 1
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 64) {
      // strict >: ties (and empty blocks) leave the bit unset; the
      // block-mean vs global-mean cross-multiply rides the exact 128-bit
      // compare — bs·tc wraps a long around 15 MP (see mulCompare)
      if (bc(i) > 0 && mulCompare(bs(i), tc, ts, bc(i)) > 0) {
        if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
      }
      i += 1
    }
    (hi, lo)
  }

  /** Per-image aHash over a blob table (`media_id`, `bytes`) — scan-stage
    * mapPartitions like [[Multimodal.extractFeatures]]; blobs that do
    * not decode contribute no rows (corrupt-safe, same contract as
    * `parseMeta`). */
  def imageHashes(media: DataFrame): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          Multimodal.decodeImage(r.getAs[Array[Byte]]("bytes")).map { img =>
            val (hi, lo) = ahash(img)
            ImageHash(id, img.getWidth, img.getHeight, hi, lo)
          }
        }
      }
  }

  /** Near-duplicate image pairs (id_a < id_b, Hamming ≤ `maxHamming`)
    * via 16-bit-band pigeonhole candidates + exact popcount verify.
    * `maxHamming` must stay ≤ 3 for the 4-band blocking to be lossless
    * (k differing bits can straddle at most k bands) — guarded loudly
    * rather than silently losing recall. */
  def nearDuplicates(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: 4-band pigeonhole blocking is only " +
        "lossless for Hamming <= 3; raise the band count before the threshold")
    // four 16-bit bands out of the two 32-bit halves
    val bands = array(
      struct(lit(0).as("band_id"), col("ahash_lo").bitwiseAND(0xFFFFL).as("band")),
      struct(lit(1).as("band_id"),
        call_function("shiftright", col("ahash_lo"), lit(16)).as("band")),
      struct(lit(2).as("band_id"), col("ahash_hi").bitwiseAND(0xFFFFL).as("band")),
      struct(lit(3).as("band_id"),
        call_function("shiftright", col("ahash_hi"), lit(16)).as("band")))
    // materialize once: the self-join references the banded frame on
    // both sides (the repo's shared-frame discipline — without this the
    // whole decode+hash pipeline runs once per side)
    val ex = hashes
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        explode(bands).as("b"))
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        col("b.band_id").as("band_id"), col("b.band").as("band"))
      .localCheckpoint()
    val a = ex.select(col("media_id").as("id_a"), col("ahash_hi").as("hi_a"),
      col("ahash_lo").as("lo_a"), col("band_id"), col("band"))
    val b = ex.select(col("media_id").as("id_b"), col("ahash_hi").as("hi_b"),
      col("ahash_lo").as("lo_b"), col("band_id"), col("band"))
    a.join(b, Seq("band_id", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (SimHash.hamming(col("hi_a"), col("hi_b")) +
          SimHash.hamming(col("lo_a"), col("lo_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
