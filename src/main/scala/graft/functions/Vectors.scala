package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math on array columns without UDFs.
  *
  * The natural `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation runs
  * on Spark's interpreted expression path (no codegen for lambda
  * functions) — measured ~20× slower than an unrolled sum on 64-dim
  * vectors. `dot` unrolls to `a[1]*b[1] + … + a[dim]*b[dim]`, which
  * whole-stage codegen compiles to a straight-line float kernel, with the
  * same left-to-right addition order as a sequential fold (bit-identical
  * results, matching DuckDB's list_dot_product).
  */
object Vectors {

  /** Unrolled dot product of two `dim`-length numeric array columns.
    * Elements are cast to double individually — do NOT pre-cast the whole
    * array with `transform(...)`: Catalyst inlines the array-rebuilding
    * HOF into every element_at term, re-materializing the array `dim`
    * times per row (measured 3× slower than even the interpreted fold). */
  def dot(a: Column, b: Column, dim: Int = 64): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")).reduce(_ + _)

  /** Fold-based dot product (any length; interpreted path — use only off
    * the hot path or for dynamic dimensions). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column, dim: Int = 64): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity for vectors that are NOT pre-normalized. */
  def cosine(a: Column, b: Column, dim: Int = 64): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
}
