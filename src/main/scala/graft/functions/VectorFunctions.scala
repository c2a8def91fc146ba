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
}
