package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact fixed-point log2 of a rational: floor-lattice of
  * 1024·log2(total/count) computed with INTEGER ops only — the
  * engine-portable −log p surrogate for likelihood lattices (ln/pow are
  * engine-divergent; this never leaves BIGINT). Algorithm: integer part
  * e = bitlength(total div count) − 1 (exact for any rational ≥ 1);
  * mantissa y₀ = floor(total·2³⁰ / (count·2ᵉ)) ∈ [2³⁰, 2³¹) via the
  * two-step long division (never forms total·2³⁰); then 10 classic
  * squaring rounds extract 10 fractional bits (y² stays < 2⁶² — no
  * overflow). DuckDB replays the identical fold as a list_reduce over
  * BIGINT pairs. Requires 1 ≤ count ≤ total and total < 2³² (the
  * (total mod d)·2³⁰ term; add a third division step past ~4.3e9).
  * Native Expression with doGenCode — stays inside whole-stage codegen
  * instead of a 10-step unrolled projection whose expression tree
  * CollapseProject would re-inline ~3× per step. */
case class Log2Fp(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"log2_fp requires two bigint arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "log2_fp"

  override protected def nullSafeEval(t: Any, c: Any): Any =
    Log2Fp.cost(t.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.Log2Fp.cost($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Log2Fp =
    copy(left = newLeft, right = newRight)
}

object Log2Fp {

  /** floor-lattice 1024·log2(total/count); see class doc for the exact
    * construction. Pure integer, identical to the DuckDB replay. */
  def cost(total: Long, count: Long): Long = {
    // Fail loudly outside the documented envelope: the (total mod d)·2³⁰
    // term wraps silently past total ≥ 2³², while the DuckDB BIGINT fold
    // raises — divergent failure modes (silently-wrong vs loud). Callers
    // feed products (a·d odds-ratio cells, corpus piece mass T) that can
    // cross 2³² on larger corpora; both engines must then fail, not drift.
    if (count < 1L || count > total || total >= (1L << 32))
      throw new ArithmeticException(
        s"log2_fp envelope: need 1 <= count <= total < 2^32, got total=$total count=$count")
    val q = total / count
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val d = count << e
    var y = (total / d) * (1L << 30) + ((total % d) << 30) / d
    var frac = 0L
    var i = 0
    while (i < 10) {
      var t2 = (y * y) >> 30
      if (t2 >= (1L << 31)) { frac = frac * 2 + 1; t2 >>= 1 }
      else frac *= 2
      y = t2
      i += 1
    }
    e * 1024L + frac
  }

  def apply(t: Column, c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(Log2Fp(expression(t), expression(c)))
  }
}
