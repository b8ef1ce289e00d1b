package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the storage path for
  * 100 TB embedding tables: a float32/float64 vector column shrinks 4-8×
  * to one signed byte per component plus one scale per vector, at the
  * cost of ~0.3% cosine error (spec-measured) — routinely acceptable for
  * ANN candidate generation with an exact re-rank on the (much smaller)
  * candidate set, or with dequantized scoring end to end.
  *
  * Per-vector symmetric max-abs scaling, all higher-order-function
  * column math (row-local, codegen-planned, no UDF, no shuffle):
  *
  *   scale = max_abs(v) / 127;  q[i] = round(v[i] / scale)  ∈ [-127, 127]
  *
  * Zero vectors quantize to scale 0 and all-zero codes (dequantize
  * returns the zero vector — no division by the zero scale).
  */
object Quantize {

  private def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** Per-vector scale (double): max|v| / 127; 0 for the zero vector. */
  def scaleOf(v: Column): Column = maxAbs(v) / 127.0

  /** int8 codes as array<int> in [-127, 127] (int, not tinyint, so the
    * same column round-trips through engines and parquet readers that
    * lack a signed-byte logical type; the parquet encoding is bit-packed
    * either way).
    *
    * The scale is LET-BOUND ([[graft.functions.ColumnOps.bind]]) before
    * entering the per-element lambda: an outer non-lambda subexpression
    * referenced inside `transform` is re-evaluated PER ELEMENT, turning
    * the max-abs pass into O(dim²) per row. */
  def codes(v: Column): Column =
    graft.functions.ColumnOps.bind(scaleOf(v), s =>
      transform(v, x =>
        when(s === 0.0, lit(0)).otherwise(round(x / s).cast("int"))))

  /** Reconstruct the (lossy) vector: q[i] * scale. */
  def dequantize(codesCol: Column, scale: Column): Column =
    transform(codesCol, q => q.cast("double") * scale)
}
