package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash-friendly lexicographic string minimum.
  *
  * Built-in `min(string)` (and `min_by`, and `min(struct(...))`) are
  * DECLARATIVE aggregates whose buffer holds a string — an immutable buffer
  * type, which HashAggregateExec cannot host, so Catalyst silently falls back
  * to SortAggregate and sorts the ENTIRE relation stream on the grouping key
  * (verified on Spark 4.1: all three forms plan SortAggregate). On the KG
  * pipeline's canonicalization path that sort is the single most expensive
  * non-shuffle operator at scale.
  *
  * A TypedImperativeAggregate runs on the ObjectHashAggregateExec path
  * instead: hash-based grouping with an object buffer — no sort. This is the
  * sanctioned custom-Expression escape hatch (SURVEY.md §4.3): semantics are
  * EXACTLY min(url) (PipelineSpec asserts equality), only the physical
  * operator changes. Quantified at sf16 in BENCH/BASELINE.md.
  */
case class StringMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UTF8String] with UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_str"

  override def createAggregationBuffer(): UTF8String = null

  override def update(buffer: UTF8String, input: InternalRow): UTF8String = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = v.asInstanceOf[UTF8String]
      // clone: the input UTF8String may point into a reused row buffer
      if (buffer == null || s.compareTo(buffer) < 0) s.clone() else buffer
    }
  }

  override def merge(buffer: UTF8String, other: UTF8String): UTF8String =
    if (other == null) buffer
    else if (buffer == null || other.compareTo(buffer) < 0) other
    else buffer

  override def eval(buffer: UTF8String): Any = buffer

  // 1-byte presence marker so an empty-string minimum is distinct from null
  override def serialize(buffer: UTF8String): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val b = buffer.getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): UTF8String =
    if (bytes.isEmpty) null else UTF8String.fromBytes(bytes, 1, bytes.length - 1)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"min_str requires STRING input, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): StringMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StringMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): StringMinAgg =
    copy(child = newChild)

}
