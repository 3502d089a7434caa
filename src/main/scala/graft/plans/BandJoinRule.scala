package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
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

/** Internal-representation epoch days of a date — `DateType` stores Int
  * days, so this is an identity at runtime. Exists because an ANSI
  * `Cast(date AS int)` is not a legal cast; the band-join rewrite needs the
  * raw day count to bucket exactly. */
case class DateEpochDays(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "date_epoch_days"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"date_epoch_days requires DATE input, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input // already Int days

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): DateEpochDays =
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
  * over timestamp (TZ or NTZ, `+ INTERVAL` = TimestampAddInterval), date
  * (`date_add(a, days)` = DateAdd — Int epoch days, exact), integral
  * (`+` = Add with a foldable operand), or double columns on OPPOSITE
  * sides of the join. `b - a ∈ [0, W]` implies
  * `floor(b/W) - floor(a/W) ∈ {0, 1}`, so the rule explodes the anchor side
  * over `[bucket(a), bucket(a)+1]` (doubles widen the window — see below),
  * projects `bucket(b)` on the probe side, and ANDs the bucket equality into
  * the join condition. The original band conjuncts remain as exact residual
  * filters — results are identical, but ExtractEquiJoinKeys now sees an
  * equi-key, so the join hashes/sorts on (…, bucket) instead of carrying the
  * band as a residual on a potentially hot key (or, with no other equi
  * conjunct, instead of a cartesian product). Each probe row's single bucket
  * equals at most one of the (distinct) exploded values, so no duplicates
  * are introduced.
  *
  * Scope (documented, deliberate): inner joins, plus left-semi / left-anti
  * when the anchor sits on the RIGHT (non-output) side — semi/anti emit
  * left rows by existence/non-existence, and exploding the right side
  * preserves existence exactly (every matching right row keeps exactly the
  * bucket copies the probe can hit; the residual keeps each copy's
  * condition equivalent), while exploding the LEFT would duplicate output
  * rows, so left-anchored semi/anti bands are left unrewritten. The lower
  * bound must compare the columns directly (`b > a`, width-c1 lower offsets
  * are not recognized); anchor/probe must be bare attributes. Timestamps
  * bucket on internal micros with floor division computed as
  * `(x - pmod(x, W)) div W` — exact for pre-epoch values too, and a 2-value
  * exploded anchor `{bucket, bucket+1}` is exactly sufficient.
  *
  * DOUBLE bands use a wider, guard-railed window because `floor(x/W)` in
  * double arithmetic is inexact at rounding boundaries (`floor(0.3/0.1)=2`
  * but `floor(0.4/0.1)=4` even though `0.4 <= 0.3 + 0.1` holds — a 2-value
  * anchor would silently drop that pair). The residual band conjuncts keep
  * the join EXACT regardless of bucketing, so the only soundness obligation
  * is COVERAGE: every pair passing the original predicate must share at
  * least one emitted bucket. With q_x = x/W in real arithmetic, f_x the
  * computed double quotient, and eps = 2^-53:
  *
  *  - while |q_x| <= 2^50+2, |f_x - q_x| <= |q_x|*eps <= 1/8 < 1, so
  *    floor(f_x) is within 1 of floor(q_x);
  *  - the matched predicate gives 0 <= b-a (exact comparison) and
  *    b <= fl(a+W) <= (a+W)(1+eps), hence
  *    q_b - q_a <= 1 + (|q_a|+1)*eps < 1.13, so
  *    floor(q_b) - floor(q_a) is in {0,1,2};
  *  - combining: floor(f_b) - floor(f_a) is in [-2, 4] — the anchor explodes
  *    that 7-value window.
  *
  * Guard rails close the |q| > 2^50 and infinity corners: the probe maps
  * |f_b| >= 2^50 to a reserved sentinel bucket; the anchor emits the
  * sentinel too when |f_a| >= 2^50-8 (any probe that can sentinel implies
  * |q_a| >= 2^50 - 2.13, so the margin covers it) or when fl(a+W) is
  * infinite (then b may itself be +Inf, which sentinels on the probe side);
  * anchors with |f_a| >= 2^50+2 clamp their window base to bucket(0) —
  * dummy values whose coverage duty is carried by the sentinel, since every
  * in-band probe of such an anchor has |q_b| >= |q_a| - 1.13 > 2^50 and
  * sentinels (this clamp also keeps `bucket+k` inside Long under ANSI
  * arithmetic). NaN/null quotients bucket arbitrarily and are discarded by
  * the exact residual, which also never matches NaN/null band values in the
  * original plan. Worst-case degradation on pathological data (|x| >=
  * 2^50 * W, i.e. quotients beyond exact-integer double range) is a hashed
  * nested loop among the sentinel rows only — never wrong results.
  *
  * Idempotent: rewritten joins are recognized by the reserved
  * `__graft_band_bucket` attribute prefix and skipped (the rule runs inside
  * the operator-optimization fixed point). Disable with
  * `spark.graft.bandJoin.enabled=false`. */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketPrefix = "__graft_band_bucket"

  /** Probe rows whose |computed quotient| reaches 2^50 map to this reserved
    * bucket; anchors near or past that range emit it alongside (or instead
    * of) their bucket window. See the coverage proof in the class scaladoc. */
  private val SentinelBucket = Long.MaxValue
  /** 2^50 — the largest quotient magnitude at which the computed double
    * floor is provably within 1 of the real floor (|q|*2^-53 <= 1/8). */
  private val QuotGuard = 1.125899906842624e15

  /** Matched band: probe attr b, anchor attr a, constant width W > 0. */
  private sealed trait Band {
    def probe: AttributeReference
    def anchor: AttributeReference
  }
  /** Exact integral/timestamp band (width in micros for timestamps, the
    * column's own unit for integrals). */
  private final case class LongBand(probe: AttributeReference,
                                    anchor: AttributeReference,
                                    width: Long) extends Band
  /** Double band (guard-railed inexact bucketing; width finite, > 0). */
  private final case class DblBand(probe: AttributeReference,
                                   anchor: AttributeReference,
                                   width: Double) extends Band

  private def constLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  private def constDouble(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) => Some(v)
    case _ => None
  }

  /** `b <= a + W` upper-bound shapes (post constant folding). */
  private def matchUpper(e: Expression): Option[Band] = {
    def mk(b: Expression, a: Expression, w: Expression): Option[Band] = (b, a) match {
      case (pb: AttributeReference, pa: AttributeReference) =>
        pb.dataType match {
          case TimestampType | TimestampNTZType | DateType |
               LongType | IntegerType | ShortType =>
            constLong(w).filter(_ > 0).map(LongBand(pb, pa, _))
          case DoubleType =>
            // FloatType never reaches here as a bare attribute (the analyzer
            // wraps float columns in Cast for a double-literal width).
            constDouble(w).filter(v => v > 0 && java.lang.Double.isFinite(v))
              .map(DblBand(pb, pa, _))
          case _ => None
        }
      case _ => None
    }
    def fromAdd(b: Expression, add: Expression): Option[Band] = add match {
      case TimestampAddInterval(a, w, _) => mk(b, a, w)
      case DateAdd(a: AttributeReference, w) if w.foldable => mk(b, a, w)
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

  /** Probe-side bucket: floor(x / W) over the column's natural long
    * representation (exact), or the guarded double floor (sentinel past
    * 2^50 — see scaladoc). */
  private def bucketOf(attr: AttributeReference, band: Band): Expression = band match {
    case lb: LongBand =>
      val x: Expression = attr.dataType match {
        case TimestampType | TimestampNTZType => TimestampMicros(attr)
        case DateType => Cast(DateEpochDays(attr), LongType)
        case LongType => attr
        case _ => Cast(attr, LongType)
      }
      val w = Literal(lb.width)
      // exact floor division (Java `/` truncates toward zero): subtract the
      // non-negative pmod remainder first, then divide exactly
      IntegralDivide(Subtract(x, Pmod(x, w)), w)
    case db: DblBand =>
      val q = Divide(attr, Literal(db.width))
      If(GreaterThanOrEqual(Abs(q), Literal(QuotGuard)),
        Literal(SentinelBucket), Floor(q))
  }

  /** Anchor-side bucket array: {bucket, bucket+1} for exact widths; the
    * proven [-2, 4] window plus guard-rail sentinel for double widths. */
  private def anchorBuckets(band: Band): Expression = band match {
    case lb: LongBand =>
      val bkt = bucketOf(lb.anchor, lb)
      CreateArray(Seq(bkt, Add(bkt, Literal(1L))))
    case db: DblBand =>
      val q = Divide(db.anchor, Literal(db.width))
      // clamp far-out quotients to 0 before Floor so `bucket + k` stays in
      // Long range under ANSI arithmetic; their coverage is the sentinel's
      val qc = If(GreaterThanOrEqual(Abs(q), Literal(QuotGuard + 2.0)),
        Literal(0.0), q)
      val bkt = Floor(qc)
      val window = (-2L to 4L).map(k => Add(bkt, Literal(k)))
      val sentinelCond = Or(
        GreaterThanOrEqual(Abs(q), Literal(QuotGuard - 8.0)),
        // fl(a+W) infinite: +Inf probes satisfy `b <= +Inf` and sentinel
        GreaterThanOrEqual(Abs(Add(db.anchor, Literal(db.width))),
          Literal(Double.MaxValue)))
      If(sentinelCond,
        CreateArray(window :+ Literal(SentinelBucket)),
        CreateArray(window))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.bandJoin.enabled", "true") != "true") return plan
    plan.transformUp {
      case j @ Join(left, right, jt @ (Inner | LeftSemi | LeftAnti), Some(cond), hint)
          if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val band = conjuncts.iterator.flatMap(matchUpper).find { b =>
          val opposite =
            (left.outputSet.contains(b.anchor) && right.outputSet.contains(b.probe)) ||
              (right.outputSet.contains(b.anchor) && left.outputSet.contains(b.probe))
          // semi/anti emit LEFT rows (at most once / on no-match): exploding
          // the left side would change multiplicity, but exploding the RIGHT
          // preserves existence exactly — for every right row satisfying the
          // original condition, exactly the exploded copies whose bucket can
          // match exist (coverage proof above), and the residual band keeps
          // the per-copy condition equivalent. So: anchor must sit on the
          // right for semi/anti; inner allows either side.
          val anchorSideOk = jt == Inner || right.outputSet.contains(b.anchor)
          opposite && anchorSideOk && conjuncts.exists(matchesLower(_, b))
        }
        band match {
          case None => j
          case Some(b) =>
            val anchorLeft = left.outputSet.contains(b.anchor)
            val anchorPlan = if (anchorLeft) left else right
            val probePlan = if (anchorLeft) right else left
            // anchor side: explode the band's bucket window
            val arr = anchorBuckets(b)
            val jb = AttributeReference(s"${BucketPrefix}_a", LongType,
              nullable = true)()
            val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(jb),
              child = anchorPlan)
            // probe side: plain projection of bucket(b)
            val bb = Alias(bucketOf(b.probe, b), s"${BucketPrefix}_b")()
            val proj = Project(probePlan.output :+ bb, probePlan)
            val newCond = And(cond, EqualTo(jb, bb.toAttribute))
            val newJoin =
              if (anchorLeft) Join(gen, proj, jt, Some(newCond), hint)
              else Join(proj, gen, jt, Some(newCond), hint)
            // inner: strip the bucket columns; semi/anti already emit only
            // left.output (the probe Project adds bb below the join only)
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
