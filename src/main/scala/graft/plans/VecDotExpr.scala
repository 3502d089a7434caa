package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native left-fold dot product of two array<float|double> columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function formulation
  * in the pairwise-scoring hot paths (Similarity / Dedup): array HOFs are
  * CodegenFallback (interpreted per row, poisoning whole-stage codegen for
  * the enclosing operator), and an unrolled 64-term expression tree generates
  * a method too large for the JIT — both evaluate at ~20µs/pair on 64-dim
  * vectors. This expression generates a SMALL loop (JIT-compiled after a few
  * thousand pairs), measured ~6x on q_dedup_embed at sf0.1.
  *
  * Bit-exactness contract (OpsSpec fuzz-pins equivalence with the HOF form,
  * and the DuckDB oracles' `Similarity.dotSql` fold replays it):
  *   - result = ((0.0 + a0*b0) + a1*b1) + ... in index order — the identical
  *     IEEE-754 addition sequence as aggregate-from-0.0 over zip_with
  *     products (and as DuckDB's init-less list_reduce);
  *   - each product widens both elements to double first (the `asDouble`
  *     cast of the HOF form);
  *   - mismatched lengths or any null element yield NULL — exactly what the
  *     HOF form produces (zip_with null-pads the shorter side, a null
  *     product nulls the whole fold);
  *   - empty equal-length arrays yield 0.0 (the fold's init).
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable regardless of input nullability: a length mismatch or a null
  // ELEMENT yields null even for non-null array inputs (and it makes
  // nullSafeCodeGen emit a real isNull variable instead of a false literal).
  // The HOF form was nullable for the same reason (zip_with null-pads).
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "vec_dot requires two array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val lt = elemType(left).get
    val rt = elemType(right).get
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, i, lt) * get(b, i, rt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String =
      if (t == FloatType) "getFloat" else "getDouble"
    val (lGet, rGet) = (getter(elemType(left).get), getter(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}
