package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension: a broadcast range join.
  *
  * A point-in-interval join — `probe.v BETWEEN dim.lo AND dim.hi` — has no
  * equi-key, so open-source Spark plans it as BroadcastNestedLoopJoin:
  * O(|probe| × |dim|) comparisons. For the reference's domain-annotation
  * join (J6: residue position → protein region,
  * `/root/reference/Plotting_Functions.py:96–169`) and any other
  * dimension-interval lookup, the right physical operator broadcasts the
  * interval table SORTED BY `lo` and binary-searches per probe row:
  * O(|probe| × (log |dim| + matches)). At 100 TB the probe side streams
  * through unchanged (no shuffle, no per-row dimension scan); only the
  * tiny interval table is collected and broadcast.
  *
  * This is SURVEY §4 ladder rung (c) end-to-end: a custom logical node
  * ([[RangeJoinPlan]]), an optimizer `Rule[LogicalPlan]`
  * ([[RewriteRangeJoin]]) that recognizes the join pattern in ANY query —
  * DataFrame-built or `spark.sql` text — and a `SparkStrategy`
  * ([[RangeJoinStrategy]]) planning the physical
  * [[BroadcastRangeJoinExec]]. All three are registered through
  * [[GraftExtensions]], so every GraftSession gets the rewrite for free;
  * queries keep their declarative form and the optimizer picks the
  * operator, exactly as with a built-in.
  *
  * Scope (checked by the rule, anything else is left to Spark's planner):
  * inner joins, plus LEFT OUTER when the probe is the left/outer input
  * (unmatched probe rows survive null-extended — the zero-fill dimension
  * lookup shape); non-streaming children; one conjunct pair forming a
  * lower and an upper bound on the same probe expression; orderable
  * identical operand types; and interval-side stats under
  * `spark.sql.autoBroadcastJoinThreshold`. Remaining conjuncts are kept
  * and evaluated per emitted row (`extraCond`), so partial matches still
  * rewrite. Multiple overlapping intervals emit one row per match —
  * standard join semantics, hence directly DuckDB-oracle-comparable.
  */
object RangeJoin {
  /** Hooks for [[GraftExtensions]]. */
  val rule: SparkSession => Rule[LogicalPlan] = s => RewriteRangeJoin(s)
  val strategy: SparkSession => SparkStrategy = _ => RangeJoinStrategy
}

/** Logical marker produced by [[RewriteRangeJoin]] and planned by
  * [[RangeJoinStrategy]]. Children are (probeSide, buildSide); the
  * original Join's column order is preserved via `probeIsLeft`.
  */
case class RangeJoinPlan(
    probeSide: LogicalPlan,
    buildSide: LogicalPlan,
    probe: Expression,
    lo: Expression,
    hi: Expression,
    loInclusive: Boolean,
    hiInclusive: Boolean,
    probeIsLeft: Boolean,
    joinType: JoinType,
    extraCond: Option[Expression]) extends BinaryNode {

  override def left: LogicalPlan = probeSide
  override def right: LogicalPlan = buildSide

  /** LeftOuter null-extends the build side, so its attributes turn
    * nullable (probe is always the preserved side — the rule only
    * rewrites LeftOuter when the probe is the left/outer input). */
  private def buildOut: Seq[Attribute] =
    if (joinType == LeftOuter) buildSide.output.map(_.withNullability(true))
    else buildSide.output

  override def output: Seq[Attribute] =
    if (probeIsLeft) probeSide.output ++ buildOut
    else buildOut ++ probeSide.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(probeSide = newLeft, buildSide = newRight)
}

/** Optimizer rule: `Join(Inner, p >= lo && p <= hi [&& rest])` with a
  * broadcast-sized interval side → [[RangeJoinPlan]].
  *
  * Runs in the user-provided batch, i.e. AFTER pushdown/pruning/infer —
  * BETWEEN is already split into conjuncts and single-side predicates have
  * already been pushed out of the condition, so what remains is the pure
  * cross-side form this rule matches. The rewrite is idempotent: the
  * produced node is not a Join.
  */
case class RewriteRangeJoin(session: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  /** One canonicalized comparison `big {>,>=} small`. */
  private case class Bound(big: Expression, small: Expression, strict: Boolean)

  private def canonical(e: Expression): Option[Bound] = e match {
    case GreaterThan(a, b)        => Some(Bound(a, b, strict = true))
    case GreaterThanOrEqual(a, b) => Some(Bound(a, b, strict = false))
    case LessThan(a, b)           => Some(Bound(b, a, strict = true))
    case LessThanOrEqual(a, b)    => Some(Bound(b, a, strict = false))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
        if !l.isStreaming && !r.isStreaming =>
      rewrite(j, l, r, jt, cond).getOrElse(j)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      jt: JoinType, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // Side of a pure single-side expression: Some(true)=left, Some(false)=right.
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None // constant bounds are a Filter, not a join
      else if (e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.subsetOf(r.outputSet)) Some(false)
      else None

    // Cross-side canonical bounds, tagged with the side of `big`.
    val bounds = conjuncts.flatMap { c =>
      canonical(c).flatMap { b =>
        (side(b.big), side(b.small)) match {
          case (Some(sb), Some(ss)) if sb != ss => Some((c, b, sb))
          case _ => None
        }
      }
    }
    // A lower bound is `probe >= lo` (big on probe side); an upper bound is
    // `hi >= probe` (big on build side). Find the first pair sharing the
    // same probe expression with lo/hi from the opposite side.
    val pairs = for {
      (cl, lower, probeSideIsLeft) <- bounds
      (cu, upper, bigSideIsLeft) <- bounds
      if cl != cu && bigSideIsLeft != probeSideIsLeft &&
        lower.big.semanticEquals(upper.small)
    } yield (cl, cu, lower, upper, probeSideIsLeft)

    pairs.headOption.flatMap { case (cl, cu, lower, upper, probeIsLeft) =>
      val (probe, lo, hi) = (lower.big, lower.small, upper.big)
      val (probePlan, buildPlan) = if (probeIsLeft) (l, r) else (r, l)
      val orderable = TypeUtils.checkForOrderingExpr(probe.dataType, "graft range join").isSuccess
      val sameType = probe.dataType == lo.dataType && probe.dataType == hi.dataType
      val small = buildPlan.stats.sizeInBytes >= 0 &&
        buildPlan.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold
      // LeftOuter preserves the LEFT input: only rewritable when the left
      // side is the probe (the build side is the one being null-extended)
      val outerOk = jt == Inner || probeIsLeft
      if (!orderable || !sameType || !small || !outerOk) None
      else {
        val rest = conjuncts.filterNot(c => c == cl || c == cu)
        Some(RangeJoinPlan(probePlan, buildPlan, probe, lo, hi,
          loInclusive = !lower.strict, hiInclusive = !upper.strict,
          probeIsLeft = probeIsLeft, joinType = jt,
          extraCond = rest.reduceOption(And)))
      }
    }
  }
}

/** Plans [[RangeJoinPlan]] as [[BroadcastRangeJoinExec]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(probe, build, p, lo, hi, li, hiIncl, pLeft, jt, extra) =>
      BroadcastRangeJoinExec(planLater(probe), planLater(build),
        p, lo, hi, li, hiIncl, pLeft, jt, extra) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast range join.
  *
  * Build phase (driver): collect the interval side (gated to broadcast
  * size by the rule), drop null-bounded rows (SQL comparison with NULL is
  * never true), sort by `lo`, and precompute the prefix running max of
  * `hi`. Probe phase (executors, zero shuffle): per row, binary-search the
  * first interval with `lo > v` and scan left from there; the prefix-max
  * array bounds the scan — once even max(hi[0..i]) fails the upper-bound
  * test no further interval can match, so cost is O(log m + matches) per
  * row rather than O(m), regardless of interval overlap patterns.
  *
  * Emission preserves the original Join's (left ++ right) column order and
  * evaluates any residual condition on the joined row before counting it.
  */
case class BroadcastRangeJoinExec(
    probeSide: SparkPlan,
    buildSide: SparkPlan,
    probe: Expression,
    lo: Expression,
    hi: Expression,
    loInclusive: Boolean,
    hiInclusive: Boolean,
    probeIsLeft: Boolean,
    joinType: JoinType,
    extraCond: Option[Expression]) extends BinaryExecNode {

  override def left: SparkPlan = probeSide
  override def right: SparkPlan = buildSide

  private def buildOut: Seq[Attribute] =
    if (joinType == LeftOuter) buildSide.output.map(_.withNullability(true))
    else buildSide.output

  override def output: Seq[Attribute] =
    if (probeIsLeft) probeSide.output ++ buildOut
    else buildOut ++ probeSide.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "broadcast interval rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(probeSide = newLeft, buildSide = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val ord = TypeUtils.getInterpretedOrdering(probe.dataType)
    val loB = BindReferences.bindReference(lo, buildSide.output)
    val hiB = BindReferences.bindReference(hi, buildSide.output)
    val entries = buildSide.executeCollect().flatMap { row =>
      val lv = loB.eval(row)
      val hv = hiB.eval(row)
      if (lv == null || hv == null) None else Some((lv, hv, row))
    }.sortBy(_._1)(ord)
    val los = entries.map(_._1)
    val his = entries.map(_._2)
    val rows = entries.map(_._3)
    val maxHi = new Array[Any](his.length)
    var i = 0
    while (i < his.length) {
      maxHi(i) = if (i == 0 || ord.gteq(his(i), maxHi(i - 1))) his(i) else maxHi(i - 1)
      i += 1
    }
    longMetric("buildRows").add(rows.length)
    val bc = sparkContext.broadcast((los, his, maxHi, rows))

    val numOutputRows = longMetric("numOutputRows")
    val probeOut = probeSide.output
    val outAttrs = output
    val probeExpr = probe
    val (loIncl, hiIncl, pLeft) = (loInclusive, hiInclusive, probeIsLeft)
    val extra = extraCond
    val outer = joinType == LeftOuter
    val nBuildCols = buildSide.output.length

    probeSide.execute().mapPartitions { iter =>
      val (los, his, maxHi, rows) = bc.value
      val probeB = BindReferences.bindReference(probeExpr, probeOut)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val pred = extra.map { c =>
        val p = Predicate.create(c, outAttrs)
        p.initialize(0)
        p
      }
      // Upper-bound test on hi given probe v; lower-bound admission on lo.
      def hiOk(h: Any, v: Any): Boolean =
        if (hiIncl) ord.gteq(h, v) else ord.gt(h, v)
      def loOk(lv: Any, v: Any): Boolean =
        if (loIncl) ord.lteq(lv, v) else ord.lt(lv, v)

      val nullBuild = new GenericInternalRow(nBuildCols)

      iter.flatMap { p =>
        val v = probeB.eval(p)
        val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        if (v != null && rows.nonEmpty) {
          // First index whose lo fails the lower bound (binary search).
          var a = 0
          var b = los.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (loOk(los(mid), v)) a = mid + 1 else b = mid
          }
          var idx = a - 1
          while (idx >= 0 && hiOk(maxHi(idx), v)) {
            if (hiOk(his(idx), v)) {
              val out = if (pLeft) joined(p, rows(idx)) else joined(rows(idx), p)
              if (pred.forall(_.eval(out))) {
                numOutputRows += 1
                buf += proj(out).copy()
              }
            }
            idx -= 1
          }
        }
        if (outer && buf.isEmpty) {
          // LeftOuter: unmatched probe rows survive, build side nulled
          numOutputRows += 1
          buf += proj(joined(p, nullBuild)).copy()
        }
        buf.iterator
      }
    }
  }

  override def nodeName: String = "BroadcastRangeJoin"
}
