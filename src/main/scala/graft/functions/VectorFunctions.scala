package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (similarity search / near-dup ops).
  *
  * Vectors are `array<float>`; all arithmetic is widened to Double
  * element-wise BEFORE multiplying, so each product is exact (24-bit
  * mantissas fit in 53) and the only rounding is in the fold — which both
  * Spark's `aggregate` and the oracle's `list_sum` do sequentially; final
  * similarities are rounded before emission anyway.
  */
object VectorFunctions {

  /** Sequential left-to-right fold of element products. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, x) => acc + x))

  /** Definitional composed form (spec parity twin of [[cosine]]): three
    * interpreted HOF array walks. Bit-identical result; do not use on hot
    * paths.
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native fused single-pass codegen Expression
    * (graft.plans.CosineSimilarity), bit-identical to [[cosineComposed]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** Per-vector max-abs symmetric int8 quantization scale: scale =
    * max_i |x_i| / 127 (0 for the zero vector). Exact in both engines:
    * abs/max are rounding-free on widened doubles, the divide is one
    * IEEE op.
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Symmetric int8 quantization: q_i = round(x_i / scale) in
    * [-127, 127] (round-half-away on the exact double, matching both
    * Spark's HALF_UP and DuckDB/SQL round semantics); the zero vector
    * quantizes to all zeros. The dequantized value q_i * scale is within
    * scale/2 of x_i by construction — the certificate q100 checks.
    *
    * This is the memory-bound scale path for ANN over a 100 TB corpus:
    * 4x smaller vectors (int8 vs float32) at a bounded, certified
    * reconstruction error. A corpus-prep export op (one pass per
    * corpus), so the interpreted HOF walk is acceptable here — the hot
    * QUERY path stays on the codegen [[cosine]] / LshBucket family.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast("double") / scale).cast("int")))
}
