package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the Rabin/FastCDC family): split a document
  * into variable-size chunks at positions where the rolling hash of the
  * last [[CdcChunks.W]] bytes is ≡ 0 mod 64 — so chunk boundaries follow
  * the CONTENT, not offsets, and an insertion near the start of a
  * document only changes the chunks it touches (the property that makes
  * chunk-level dedup robust to edits, unlike fixed-size blocks). Returns
  * the chunk lengths in bytes; no boundary fires before a full window.
  *
  * Native Catalyst Expression with `doGenCode` — the generated code calls
  * the same static kernel as interpreted eval, staying inside whole-stage
  * codegen. The window hash reuses RollingHash's mod-2^61-1 arithmetic
  * (h·B + bᵢ − b_{i−W}·B^W), so DuckDB can replay every window
  * independently with list_reduce over the byte slice — exact integer
  * space end to end, full hash oracle.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CdcChunks.chunkLengths(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.CdcChunks.chunkLengths($c.getBytes()))")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Window width in bytes. */
  val W = 16
  /** Boundary divisor: P(boundary) = 1/64 per position → ~64-byte chunks. */
  val Mask = 63L

  private val Mod = RollingHash.Mod
  private val Base = RollingHash.Base
  /** Base^W mod 2^61-1, for the outgoing-byte subtraction. */
  val BaseW: Long = {
    var r = 1L
    var i = 0
    while (i < W) { r = RollingHash.mulMod(r, Base); i += 1 }
    r
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def chunkLengths(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.emptyIntArray
    val ends = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = RollingHash.mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      if (i >= W) {
        h -= RollingHash.mulMod((bytes(i - W) & 0xff).toLong, BaseW)
        if (h < 0) h += Mod
      }
      if (i >= W - 1 && (h & Mask) == 0L) ends.add(i + 1)
      i += 1
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)
    val out = new Array[Int](ends.size)
    var k = 0
    var prev = 0
    while (k < out.length) { out(k) = ends.get(k) - prev; prev = ends.get(k); k += 1 }
    out
  }
}
