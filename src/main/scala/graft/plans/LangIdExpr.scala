package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime + profile constants for [[LangIdExpr]]. The profiles are THE
  * single source: TextStats builds both the (old) Catalyst formulation and
  * the DuckDB oracle SQL from this object, so the constants cannot drift. */
object LangIdRuntime {

  /** Tiny per-language character-trigram profiles (hand-pinned marker
    * n-grams; a deterministic heuristic, not a trained model — documented
    * limitation). Sorted by language name = the argmax tie-break order. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" de", "der", "ie ", "ein", "sch", "ich", "nd ", "die", "und", "cht"),
    "en" -> Seq(" th", "the", "he ", " an", "and", "ing", " of", "ion", " to", "ed "),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", "ión", "ent", " el", "que", "ado"),
    "fr" -> Seq(" de", "de ", " le", "es ", "le ", "ent", " la", "que", "ion", "eur"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "中", "人", "国", "一"))

  private val langU8: Array[UTF8String] =
    Profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val gramBytes: Array[Array[Array[Byte]]] =
    Profiles.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
  private val Und = UTF8String.fromString("und")

  /** Non-overlapping left-to-right occurrence count of `g` in `t` —
    * identical to ((length(t) - length(replace(t, g, ''))) / length(g)):
    * StringReplace removes non-overlapping occurrences scanning left to
    * right, and UTF-8 is self-synchronizing, so byte-level matching can
    * never fire mid-code-point. */
  private def countOcc(t: Array[Byte], g: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    val limit = t.length - g.length
    while (i <= limit) {
      var j = 0
      while (j < g.length && t(i + j) == g(j)) j += 1
      if (j == g.length) { n += 1; i += g.length } else i += 1
    }
    n
  }

  /** lang_pred of one document: pad+lowercase once, count all 50 marker
    * grams in byte scans over that ONE buffer, argmax with (hits desc,
    * lang asc) tie-break, threshold < 2 → "und". Null text → "und" (the
    * formulation's when(isNull, 'und') branch). */
  def predict(s: UTF8String): UTF8String = {
    if (s == null) return Und
    val lower = s.toLowerCase.getBytes
    val padded = new Array[Byte](lower.length + 2)
    padded(0) = ' '
    System.arraycopy(lower, 0, padded, 1, lower.length)
    padded(padded.length - 1) = ' '
    var best = -1
    var bestHits = -1L
    var l = 0
    while (l < gramBytes.length) {
      var hits = 0L
      val grams = gramBytes(l)
      var g = 0
      while (g < grams.length) { hits += countOcc(padded, grams(g)); g += 1 }
      // strict > over name-ascending langs == the array_sort((-hits, lang))
      // tie-break of the Catalyst formulation
      if (hits > bestHits) { bestHits = hits; best = l }
      l += 1
    }
    if (bestHits < 2) Und else langU8(best)
  }
}

/** Native single-pass language-ID expression — value-identical to the
  * marker-gram Catalyst formulation it replaces in TextStats.langId
  * (LangIdSpec pins it; the q_lang_id DuckDB oracle, generated from the
  * same [[LangIdRuntime.Profiles]], is unchanged). Why: the formulation
  * evaluated `replace(padded, gram, '')` for all 50 language markers —
  * fifty full-text copies and scans PER DOCUMENT (plus the padded string
  * and a struct-array sort), ~1 ms/doc at sf0.1; under the driver's
  * count() action the column is pruned so the bench never showed it, but
  * any consumer that actually reads lang_pred pays it — at 100 TB that is
  * 50x the corpus bytes in pure string churn. The native scan lowercases
  * once and counts all grams over one buffer. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false // null input predicts "und"
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LangIdRuntime.predict(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = graft.plans.LangIdRuntime.predict(
          ${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
