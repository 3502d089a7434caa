package graft.plans

import graft.text.Tokenize
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-reachable runtime for the tokenize expressions (a plain object so
  * Scala emits static forwarders the generated Java can call, like
  * Extract.text in ExtractTextExpr). */
object TokenizeRuntime {
  def sentences(s: UTF8String): ArrayData = {
    val parts = Tokenize.splitSentences(s.toString)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** lower + token split + empty filter in one call. Lowercasing delegates to
    * UTF8String.toLowerCase — the SAME call Spark's Lower makes for the
    * default collation — so the composite stays bit-identical to
    * filter(split(lower(sent), TokenSplitRegex), t => length(t) > 0). */
  def tokensLower(s: UTF8String): ArrayData = {
    val toks = Tokenize.tokensOf(s.toLowerCase.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

private[plans] trait TokenizeLikeExpr extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
}

/** split(text, TextModel.SentenceSplitRegex) as a native scanner expression
  * (identical array, including the possible trailing empty element). */
case class SplitSentencesExpr(child: Expression) extends TokenizeLikeExpr {
  override def prettyName: String = "split_sentences"
  override def nullSafeEval(input: Any): Any =
    TokenizeRuntime.sentences(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenizeRuntime.sentences($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitSentencesExpr =
    copy(child = newChild)
}

/** filter(split(lower(sent), TextModel.TokenSplitRegex), t => length(t) > 0)
  * as one native scanner expression. */
case class TokenizeLowerExpr(child: Expression) extends TokenizeLikeExpr {
  override def prettyName: String = "tokenize_lower"
  override def nullSafeEval(input: Any): Any =
    TokenizeRuntime.tokensLower(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenizeRuntime.tokensLower($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeLowerExpr =
    copy(child = newChild)
}
