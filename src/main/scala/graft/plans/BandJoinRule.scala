package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Internal-representation micros of a timestamp — both `TimestampType` and
  * `TimestampNTZType` store Long microseconds, so this is an identity at
  * runtime. It exists because the band-join rewrite must bucket NTZ and TZ
  * timestamps without `Cast` (an NTZ→TZ cast applies session-zone conversion,
  * which is not affine across DST transitions and could misalign buckets). */
case class TimestampMicros(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "timestamp_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"timestamp_micros requires TIMESTAMP input, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input // already Long micros

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): TimestampMicros =
    copy(child = newChild)
}

/** Optimizer rule rewriting band-interval theta joins into bucketed
  * equi-joins — the 100 TB-safe plan for `q_join_range`-shaped queries,
  * applied automatically so callers can write the natural form.
  *
  * Pattern (inner joins): a conjunct pair bounding one side's column within
  * a constant-width window of the other side's column,
  *
  *   `b > a  (or >=)`   and   `b <= a + W  (or <)`        with constant W > 0
  *
  * over timestamp (TZ or NTZ, `+ INTERVAL` = TimestampAddInterval) or
  * integral (`+` = Add with a foldable operand) columns on OPPOSITE sides of
  * the join. `b - a ∈ [0, W]` implies `floor(b/W) - floor(a/W) ∈ {0, 1}`, so
  * the rule explodes the anchor side over `[bucket(a), bucket(a)+1]`,
  * projects `bucket(b)` on the probe side, and ANDs the bucket equality into
  * the join condition. The original band conjuncts remain as exact residual
  * filters — results are identical, but ExtractEquiJoinKeys now sees an
  * equi-key, so the join hashes/sorts on (…, bucket) instead of carrying the
  * band as a residual on a potentially hot key (or, with no other equi
  * conjunct, instead of a cartesian product). Each probe row's bucket equals
  * exactly one of the two exploded values, so no duplicates are introduced.
  *
  * Scope (documented, deliberate): inner joins only (for semi/anti the
  * exploded anchor side would change multiplicity semantics); the lower
  * bound must compare the columns directly (`b > a`, width-c1 lower offsets
  * are not recognized); anchor/probe must be bare attributes. EXACT integral
  * and timestamp widths ONLY — floating-point bands are deliberately NOT
  * rewritten: `floor(b/W) - floor(a/W)` computed in double arithmetic can be
  * 2 while `b <= a + W` still holds (a=0.3, b=0.4, W=0.1 buckets to 2 and 4
  * because 0.3/0.1 rounds to 2.9999999999999996 and 0.4/0.1 to 4.0), so a
  * two-value exploded anchor would silently drop rows; double bands keep
  * their natural (correct) plan instead. Timestamps
  * bucket on internal micros with floor division computed as
  * `(x - pmod(x, W)) div W` — exact for pre-epoch values too. Idempotent:
  * rewritten joins are recognized by the reserved `__graft_band_bucket`
  * attribute prefix and skipped (the rule runs inside the operator-
  * optimization fixed point). Disable with
  * `spark.graft.bandJoin.enabled=false`. */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketPrefix = "__graft_band_bucket"

  /** Matched band: probe attr b, anchor attr a, bucket width (micros for
    * timestamps, same unit as the column for integrals). */
  private final case class Band(probe: AttributeReference,
                                anchor: AttributeReference,
                                width: Long)

  private def constLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  /** `b <= a + W` upper-bound shapes (post constant folding). */
  private def matchUpper(e: Expression): Option[Band] = {
    def mk(b: Expression, a: Expression, w: Expression): Option[Band] = (b, a) match {
      case (pb: AttributeReference, pa: AttributeReference) =>
        // FloatingPoint columns are deliberately excluded (see scaladoc):
        // double floor-division bucketing is not exact at rounding
        // boundaries, so only types with an exact Long representation
        // qualify.
        pb.dataType match {
          case TimestampType | TimestampNTZType | LongType | IntegerType | ShortType =>
            constLong(w).filter(_ > 0).map(Band(pb, pa, _))
          case _ => None
        }
      case _ => None
    }
    def fromAdd(b: Expression, add: Expression): Option[Band] = add match {
      case TimestampAddInterval(a, w, _) => mk(b, a, w)
      case Add(a: AttributeReference, w, _) if w.foldable => mk(b, a, w)
      case Add(w, a: AttributeReference, _) if w.foldable => mk(b, a, w)
      case _ => None
    }
    e match {
      case LessThanOrEqual(b, add) => fromAdd(b, add)
      case LessThan(b, add) => fromAdd(b, add)
      case GreaterThanOrEqual(add, b) => fromAdd(b, add)
      case GreaterThan(add, b) => fromAdd(b, add)
      case _ => None
    }
  }

  /** `b > a` / `b >= a` lower-bound over exactly the band's attribute pair. */
  private def matchesLower(e: Expression, band: Band): Boolean = e match {
    case GreaterThan(b: AttributeReference, a: AttributeReference) =>
      b.exprId == band.probe.exprId && a.exprId == band.anchor.exprId
    case GreaterThanOrEqual(b: AttributeReference, a: AttributeReference) =>
      b.exprId == band.probe.exprId && a.exprId == band.anchor.exprId
    case LessThan(a: AttributeReference, b: AttributeReference) =>
      b.exprId == band.probe.exprId && a.exprId == band.anchor.exprId
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      b.exprId == band.probe.exprId && a.exprId == band.anchor.exprId
    case _ => false
  }

  /** floor(x / w) over the column's natural long representation. */
  private def bucketOf(attr: AttributeReference, band: Band): Expression = {
    val x: Expression = attr.dataType match {
      case TimestampType | TimestampNTZType => TimestampMicros(attr)
      case LongType => attr
      case _ => Cast(attr, LongType)
    }
    val w = Literal(band.width)
    // exact floor division (Java `/` truncates toward zero): subtract the
    // non-negative pmod remainder first, then divide exactly
    IntegralDivide(Subtract(x, Pmod(x, w)), w)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.bandJoin.enabled", "true") != "true") return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val band = conjuncts.iterator.flatMap(matchUpper).find { b =>
          val opposite =
            (left.outputSet.contains(b.anchor) && right.outputSet.contains(b.probe)) ||
              (right.outputSet.contains(b.anchor) && left.outputSet.contains(b.probe))
          opposite && conjuncts.exists(matchesLower(_, b))
        }
        band match {
          case None => j
          case Some(b) =>
            val anchorLeft = left.outputSet.contains(b.anchor)
            val anchorPlan = if (anchorLeft) left else right
            val probePlan = if (anchorLeft) right else left
            // anchor side: explode [bucket(a), bucket(a)+1]
            val bkt = bucketOf(b.anchor, b)
            val arr = CreateArray(Seq(bkt, Add(bkt, Literal(1L))))
            val jb = AttributeReference(s"${BucketPrefix}_a", LongType,
              nullable = bkt.nullable)()
            val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(jb),
              child = anchorPlan)
            // probe side: plain projection of bucket(b)
            val bb = Alias(bucketOf(b.probe, b), s"${BucketPrefix}_b")()
            val proj = Project(probePlan.output :+ bb, probePlan)
            val newCond = And(cond, EqualTo(jb, bb.toAttribute))
            val newJoin =
              if (anchorLeft) Join(gen, proj, Inner, Some(newCond), hint)
              else Join(proj, gen, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
        }
    }
  }

  /** Idempotently install the rule into a LIVE session (extraOptimizations
    * runs after the main optimizer; for new sessions prefer
    * `SparkSession.builder.withExtensions(GraftExtensions)`). */
  def install(spark: SparkSession): Unit = spark.synchronized {
    if (!spark.experimental.extraOptimizations.contains(BandJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRule
  }

  /** Remove the rule from a live session (test hygiene). */
  def uninstall(spark: SparkSession): Unit = spark.synchronized {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BandJoinRule)
  }
}
