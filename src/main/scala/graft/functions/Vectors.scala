package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math on array columns without UDFs.
  *
  * The natural `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation runs
  * on Spark's interpreted expression path (no codegen for lambda
  * functions) — measured ~20× slower than an unrolled sum on 64-dim
  * vectors. An unrolled `a[1]*b[1] + … + a[dim]*b[dim]` chain is
  * codegen'd but still pays `2·dim` bounds-checked element_at calls per
  * row; [[graft.functions.DotF]] is the end state — a single native
  * codegen'd loop over the columnar ArrayData with the same left-to-right
  * double accumulation (bit-identical results, matching DuckDB's
  * list_dot_product).
  */
object Vectors {

  /** Native codegen'd dot product of two float-array columns (see
    * [[DotF]]); `dim` is kept for signature stability but unused — the
    * loop reads the actual array length. Do NOT pre-cast arrays with
    * `transform(...)`: Catalyst inlines the array-rebuilding HOF into
    * every consumer, re-materializing the array per reference. */
  def dot(a: Column, b: Column, dim: Int = 64): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(DotF(expression(a), expression(b)))
  }

  /** Fold-based dot product (any length; interpreted path — use only off
    * the hot path or for dynamic dimensions). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column, dim: Int = 64): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity for vectors that are NOT pre-normalized. */
  def cosine(a: Column, b: Column, dim: Int = 64): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
}
