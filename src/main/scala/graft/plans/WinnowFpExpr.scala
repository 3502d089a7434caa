package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[WinnowFpExpr]]: the whole winnowing fingerprint of one
  * document in ONE local pass — char-k-gram hashes, sliding-window minima,
  * distinct, ascending sort. */
object WinnowRuntime {

  /** Sorted distinct window-minimum fingerprints of `s`, or an empty array
    * when length(s) < k. Hash per k-CHAR gram (code-point aware, exactly
    * substr semantics): portable=true → Md5H60 over the gram's UTF-8 bytes;
    * portable=false → xxhash64(gram) with Spark's seed 42. */
  def fingerprint(s: UTF8String, k: Int, w: Int, portable: Boolean): ArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val nGrams = nChars - (k - 1)
    if (nGrams < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // char -> byte offset table (UTF-8 boundaries), one forward pass
    val off = new Array[Int](nChars + 1)
    var c = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { off(c) = i; c += 1 }
      i += 1
    }
    off(nChars) = bytes.length
    // k-gram hashes in position order
    val h = new Array[Long](nGrams)
    if (portable) {
      val md = Md5H60Digests.get()
      var p = 0
      while (p < nGrams) {
        md.reset()
        md.update(bytes, off(p), off(p + k) - off(p))
        val d = md.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        h(p) = v >>> 4
        p += 1
      }
    } else {
      var p = 0
      while (p < nGrams) {
        h(p) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + off(p), off(p + k) - off(p), 42L)
        p += 1
      }
    }
    // sliding minima over kept positions (full w-frames; when nGrams < w the
    // single kept frame is the whole gram range — same as the ragged-tail
    // filter in the window formulation)
    val nkeep = math.max(nGrams - (w - 1), 1)
    val mins = new Array[Long](nkeep)
    var p = 0
    while (p < nkeep) {
      var m = h(p)
      var j = p + 1
      val end = math.min(p + w, nGrams)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      mins(p) = m
      p += 1
    }
    java.util.Arrays.sort(mins)
    var n = 0
    var q = 0
    while (q < nkeep) {
      if (q == 0 || mins(q) != mins(q - 1)) { mins(n) = mins(q); n += 1 }
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, n))
  }
}

/** Per-thread reused MD5 digest for [[WinnowRuntime]] (same pattern as
  * [[Md5H60]]). */
private[plans] object Md5H60Digests {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = tl.get()
}

/** Native single-pass winnowing fingerprint (Schleimer et al., SIGMOD'03) of
  * a text column: value-identical to the explode + frame-window + collect_set
  * formulation it replaces in TextStats.fingerprints —
  *
  *   array_sort(collect_set(min(h) OVER (ORDER BY pos ROWS CURRENT..w-1)))
  *   over posexploded gram hashes, ragged tail frames dropped —
  *
  * but with ZERO exchanges: the window formulation exploded ~n rows per
  * document (8x the text bytes) and shuffled them on doc_id for the frame
  * window and the collect_set aggregation, paying that at any scale even
  * though winnowing is per-document-local. WinnowFpSpec pins value equality
  * against the old formulation for both hash modes; the q_fingerprint DuckDB
  * oracle (unchanged) pins the portable mode end-to-end.
  */
case class WinnowFpExpr(child: Expression, k: Int, window: Int,
                        portable: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fp requires STRING input, got ${child.dataType.catalogString}")
    else if (k < 1 || window < 1)
      TypeCheckResult.TypeCheckFailure("winnow_fp requires k >= 1 and window >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WinnowRuntime.fingerprint(input.asInstanceOf[UTF8String], k, window, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowRuntime.fingerprint($c, $k, $window, $portable)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}
