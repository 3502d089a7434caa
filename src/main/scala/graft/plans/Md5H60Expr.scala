package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Md5H60Expr]]: md5 digest → first 60 bits as a non-negative
  * long, with a per-thread reused MessageDigest. */
object Md5H60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first 15 hex chars of md5(bytes) — i.e. the first 60 bits
    * of the digest, big-endian — as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // drop the 16th nibble: 15 hex chars = 60 bits
  }

  def hash(s: UTF8String): Long = hash(s.getBytes)
}

/** Native fused form of the portable 60-bit hash
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long`
  * ([[graft.ops.Portable.md5h60]]) — same value, bit for bit: the first 15
  * hex characters of the md5 digest ARE its first 60 bits big-endian, and
  * conv's base-16 parse of them is exactly that 60-bit non-negative integer.
  *
  * Why: the composite form pays, PER ROW, a fresh MessageDigest allocation
  * (inside Spark's Md5), a 32-char hex encode, a substring copy, and conv's
  * string parse — on the hash-per-character winnowing path (q_fingerprint)
  * and the hash-per-token simhash/minhash paths that overhead dominates the
  * digest itself. This expression reuses a thread-local digest and takes the
  * top bits numerically. String input is hashed over its UTF-8 bytes,
  * exactly like Md5's implicit cast to binary. Md5H60Spec fuzz-pins
  * equivalence (ASCII + multibyte + binary + null).
  */
case class Md5H60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5h60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5h60 requires STRING or BINARY input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => Md5H60.hash(input.asInstanceOf[UTF8String])
    case _          => Md5H60.hash(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5H60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5H60Expr =
    copy(child = newChild)
}
