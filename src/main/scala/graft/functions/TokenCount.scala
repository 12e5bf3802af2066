package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish token count as a native codegen Expression: one pass over the
  * UTF-8 bytes counting letter runs, single digits, and single
  * non-alphanumeric-non-space characters — the same classes as the
  * regex `[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]` on ASCII text, without the
  * regex engine (no per-row matcher allocation, no backtracking).
  * Non-ASCII bytes count like the regex does on Latin-1-free input:
  * each byte of a multi-byte character is a non-alphanumeric token.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.countBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.countBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  def countBytes(bytes: Array[Byte]): Long = {
    var n = 0L
    var inLetterRun = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isLetter = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
      if (isLetter) {
        if (!inLetterRun) { n += 1; inLetterRun = true }
      } else {
        inLetterRun = false
        if (b != ' ') n += 1 // digit or punctuation/other: one token each
      }
      i += 1
    }
    n
  }
}
