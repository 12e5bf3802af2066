package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LZ78 phrase count over the first [[Lz78Count.WINDOW]] word tokens — the
  * Lempel–Ziv complexity surrogate for compressibility-based quality
  * scoring (a boilerplate/template doc parses into FEW long phrases, an
  * incompressible one into ~T/log T short ones). Native codegen
  * Expression: one tokenizer pass (lowercase [a-z0-9]+ runs — the
  * Shingles.tokens classes) + the classic LZ78 greedy parse: grow the
  * current phrase while it exists in the dictionary, otherwise count it,
  * insert, reset; a non-empty trailing phrase counts once more. The
  * 64-token window bounds BOTH sides of the oracle contract: the Spark
  * parse is O(window²) worst-case string work per row, and the DuckDB
  * replay (a list_reduce fold whose list state is [current-phrase,
  * dict...]) stays tractable at sf0.1 (an unbounded dict made the fold
  * quadratic in document length).
  */
case class Lz78Count(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lz78_count requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "lz78_count"

  override protected def nullSafeEval(input: Any): Any =
    Lz78Count.phrases(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lz78Count.phrases($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Lz78Count =
    copy(child = newChild)
}

object Lz78Count {
  val WINDOW = 64

  /** Lowercase [a-z0-9]+ tokens of the first WINDOW words — identical to
    * the oracle's regexp_extract_all(lower(text), '[a-z0-9]+')[1:64]. */
  private def window(text: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](WINDOW)
    val s = text
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < s.length && out.length < WINDOW) {
      val c = s.charAt(i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0 && out.length < WINDOW) out += sb.toString
    out.toArray
  }

  /** Number of LZ78 phrases in the token window (dict insertions + the
    * trailing open phrase). Phrase keys join tokens with '_' — the same
    * key the DuckDB fold builds, so dictionary membership is identical. */
  def phrases(text: String): Long = {
    val toks = window(text)
    val dict = new java.util.HashSet[String]()
    var w = ""
    var i = 0
    while (i < toks.length) {
      val cand = if (w.isEmpty) toks(i) else w + "_" + toks(i)
      if (dict.contains(cand)) w = cand
      else { dict.add(cand); w = "" }
      i += 1
    }
    dict.size.toLong + (if (w.nonEmpty) 1L else 0L)
  }
}
