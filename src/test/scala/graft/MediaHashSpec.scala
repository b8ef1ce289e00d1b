package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaHash, Multimodal}
import java.awt.image.BufferedImage

/** aHash invariants beyond the oracle: the kernel against a driver-side
  * brute force, the flat-image/tie convention, decode-path equality with
  * the closed form, blocking losslessness, and the guard. */
class MediaHashSpec extends SparkSpec {
  import spark.implicits._

  /** The DECODED form of the BMP fixture: the generator writes rows
    * bottom-up, so image row y carries the closed form at h-1-y. */
  private def gradImg(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (seed + 7 * x + 13 * (h - 1 - y)) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  test("mulCompare is exact where the naive long compare wraps (>15 MP)") {
    // the bit test multiplies a luminance sum (<= 2.55e6/px) by a pixel
    // count: above ~15 megapixels the product crosses Long.MaxValue and
    // a plain a*b > c*d silently flips bits. Check the 128-bit compare
    // against BigInt on exactly that regime, plus a case where the
    // wrapped compare provably disagrees.
    val px20mp = 20000000L                       // 20 MP image
    val cases = Seq(
      // (blockSum, totalCnt, totalSum, blockCnt)
      (2550000L * 400000L, px20mp, 2550000L * px20mp / 2L, 400000L),
      (2550000L * 300000L, px20mp, 2549999L * px20mp / 3L, 312500L),
      (1L, 1L, 1L, 1L), (0L, 5L, 3L, 0L),
      (Long.MaxValue / 2, 3L, Long.MaxValue / 3, 2L))
    for ((a, b, c, d) <- cases) {
      val want = (BigInt(a) * BigInt(b)).compare(BigInt(c) * BigInt(d))
      assert(Integer.signum(MediaHash.mulCompare(a, b, c, d)) === want,
        s"mulCompare($a,$b,$c,$d)")
    }
    // the naive form wraps here (a*b overflows, c*d doesn't): proves the
    // guard is load-bearing, not hypothetical
    val (a, b, c, d) = (2550000L * 2000000L, px20mp, 7L, 11L)
    assert(a * b < c * d, "expected the naive compare to wrap negative")
    assert(MediaHash.mulCompare(a, b, c, d) > 0)
  }

  test("ahash matches a driver-side brute force of the documented rule") {
    for ((w, h, seed) <- Seq((16, 12, 3), (64, 48, 41), (5, 3, 7), (8, 8, 0))) {
      val img = gradImg(w, h, seed)
      val (hi, lo) = MediaHash.ahash(img)
      // brute force: same blocks, same integer cross-multiply
      val lum = Array.tabulate(w, h)((x, y) =>
        10000L * ((seed + 7 * x + 13 * (h - 1 - y)) & 0xFF))
      val cells = for { x <- 0 until w; y <- 0 until h }
        yield (y * 8 / h * 8 + x * 8 / w, lum(x)(y))
      val ts = cells.map(_._2).sum
      val tc = cells.size.toLong
      var (ehi, elo) = (0L, 0L)
      for ((idx, g) <- cells.groupBy(_._1)) {
        val bs = g.map(_._2).sum
        val bc = g.size.toLong
        if (bs * tc > ts * bc) {
          if (idx >= 32) ehi |= 1L << (idx - 32) else elo |= 1L << idx
        }
      }
      assert((hi, lo) == ((ehi, elo)), s"($w,$h,$seed)")
    }
  }

  test("a uniform image hashes to zero (all ties unset) at any brightness") {
    for (g <- Seq(0, 128, 255)) {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      assert(MediaHash.ahash(img) == ((0L, 0L)), s"gray $g")
    }
  }

  test("imageHashes over the real BMP fixture equals the closed form") {
    val media = Multimodal.containerMediaFromDocuments(
        Tables.documents(spark, sf001))
      .where(col("kind") === "image")
    val got = MediaHash.imageHashes(media)
      .collect().map(r => r.media_id -> ((r.ahash_hi, r.ahash_lo))).toMap
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars"))
      .where(col("doc_id") % 3 === 0)
      .as[(Long, Long)].collect()
    assert(got.size == docs.length)
    for ((id, nc) <- docs.take(40)) {
      val (w, h) = ((nc % 64 + 1).toInt, (nc % 48 + 1).toInt)
      val want = MediaHash.ahash(gradImg(w, h, id.toInt))
      assert(got(id) == want, s"doc $id")
    }
  }

  test("banded near-dup equals brute-force all-pairs at Hamming <= 3") {
    val media = Multimodal.containerMediaFromDocuments(
        Tables.documents(spark, sf001))
      .where(col("kind") === "image")
    val hashes = MediaHash.imageHashes(media).toDF().localCheckpoint()
    val got = MediaHash.nearDuplicates(hashes)
      .as[(Long, Long, Long)].collect().toSet
    val hs = hashes.as[(Long, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._4, r._5))
    val brute = (for {
      (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) +
        java.lang.Long.bitCount(loa ^ lob)
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture should contain perceptual near-dups")
  }

  test("nearDuplicates refuses thresholds the banding cannot guarantee") {
    val hashes = Seq((1L, 8, 8, 0L, 0L)).toDF(
      "media_id", "width", "height", "ahash_hi", "ahash_lo")
    intercept[IllegalArgumentException] {
      MediaHash.nearDuplicates(hashes, maxHamming = 4)
    }
  }
}
