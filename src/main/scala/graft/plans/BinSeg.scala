package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native binary-segmentation kernel behind
  * [[graft.operators.TimeSeries.changepoints]]:
  * `graft_binseg(ps, qs, maxChanges, minSegment, minGain)` → the sorted
  * boundary array (0-based prefix indices, first 0, last n).
  *
  * WHY an Expression (the [[VectorDot]] rationale): the segmentation is
  * O(maxChanges · n) of scalar arithmetic per group, and Catalyst
  * higher-order functions evaluate it interpreted — per-candidate lambda
  * dispatch plus a struct allocation per score. On the 200k-group × 52-week
  * probe the HOF formulation measured 44.6 s after hot-loop tuning; this
  * kernel runs the SAME arithmetic as a tight Scala loop in ~3 s
  * (SCALE.md). Bit-for-bit parity with the HOF formulation is pinned in
  * UtilitySpec: identical operation order (candidate argmin of
  * cost(a,k)+cost(k,b) with strict `<`, gain = cost(a,b) − minSum computed
  * once, outer strict `>` scan, strict `>` minGain acceptance), identical
  * tie-breaks, and the DuckDB oracle replays the same shapes.
  *
  * Eval-only ([[CodegenFallback]]): the loop is data-dependent and
  * allocation-free already; Janino codegen would buy nothing.
  *
  * Inputs: `ps`/`qs` = exact BIGINT prefix sums of v and v² (index i =
  * prefix of length i+1); the scalar args must be foldable. Null or
  * mismatched-length arrays yield null.
  */
case class BinSeg(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 5)
      return TypeCheckResult.TypeCheckFailure(
        "graft_binseg expects (ps, qs, maxChanges, minSegment, minGain)")
    (children(0).dataType, children(1).dataType, children(2).dataType,
      children(3).dataType, children(4).dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType,
          IntegerType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_binseg expects (array<bigint>, array<bigint>, int, int, " +
          s"double), got $other")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val psRaw = children(0).eval(input)
    val qsRaw = children(1).eval(input)
    val mcRaw = children(2).eval(input)
    val msRaw = children(3).eval(input)
    val mgRaw = children(4).eval(input)
    if (psRaw == null || qsRaw == null || mcRaw == null || msRaw == null ||
      mgRaw == null) return null
    val ps = psRaw.asInstanceOf[ArrayData]
    val qs = qsRaw.asInstanceOf[ArrayData]
    val n = ps.numElements()
    if (qs.numElements() != n) return null
    val p = new Array[Long](n + 1)
    val q = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      p(i + 1) = ps.getLong(i); q(i + 1) = qs.getLong(i); i += 1
    }
    new GenericArrayData(BinSeg.boundaries(p, q, n,
      mcRaw.asInstanceOf[Int], msRaw.asInstanceOf[Int],
      mgRaw.asInstanceOf[Double]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BinSeg = copy(newChildren)

  override def prettyName: String = "graft_binseg"
}

/** Native OPTIMAL-segmentation kernel —
  * `graft_segdp(ps, qs, penalty, minSegment)` → the boundary array of the
  * segmentation minimizing Σ segment-SSE + penalty · #segments (the
  * changepoint objective binary segmentation only approximates greedily;
  * this is the exact dynamic program, O(n²) per group — fine in native
  * code at the grouped short-series contract).
  *
  * Same exactness story as [[BinSeg]]: integer prefix sums, fixed float
  * shapes. The DP recurrence F(t) = min over s of (F(s) + cost(s,t)) +
  * penalty scans s ASCENDING with strict `<` (first argmin wins), and the
  * DuckDB oracle replays that exact association and tie-break, so the
  * chosen boundaries match decision-for-decision. Deliberately UNPRUNED
  * (full scan, not PELT): pruning preserves the optimum value but can
  * drop tied argmins, which would unpin the oracle's tie-break.
  */
case class SegDp(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 4)
      return TypeCheckResult.TypeCheckFailure(
        "graft_segdp expects (ps, qs, penalty, minSegment)")
    (children(0).dataType, children(1).dataType, children(2).dataType,
      children(3).dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), DoubleType,
          IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_segdp expects (array<bigint>, array<bigint>, double, " +
          s"int), got $other")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val psRaw = children(0).eval(input)
    val qsRaw = children(1).eval(input)
    val penRaw = children(2).eval(input)
    val msRaw = children(3).eval(input)
    if (psRaw == null || qsRaw == null || penRaw == null || msRaw == null)
      return null
    val ps = psRaw.asInstanceOf[ArrayData]
    val qs = qsRaw.asInstanceOf[ArrayData]
    val n = ps.numElements()
    if (qs.numElements() != n) return null
    val p = new Array[Long](n + 1)
    val q = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      p(i + 1) = ps.getLong(i); q(i + 1) = qs.getLong(i); i += 1
    }
    new GenericArrayData(SegDp.boundaries(p, q, n,
      penRaw.asInstanceOf[Double], msRaw.asInstanceOf[Int]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SegDp = copy(newChildren)

  override def prettyName: String = "graft_segdp"
}

object SegDp {
  /** Exact penalized-segmentation DP; `p`/`q` are 1-based prefix arrays
    * with p(0) = q(0) = 0. Returns sorted boundaries including 0 and n
    * (n = 0 returns Array(0, 0) degenerate; callers filter empties). */
  def boundaries(p: Array[Long], q: Array[Long], n: Int, penalty: Double,
      minSeg: Int): Array[Int] = {
    // a series shorter than one segment is a single undersized segment —
    // special-cased HERE so the +∞ unreachable-state convention below
    // never leaks an undersized segment into a longer series' optimum
    if (n < minSeg) return Array(0, n)
    def cost(a: Int, b: Int): Double = {
      val s = (p(b) - p(a)).toDouble
      (q(b) - q(a)).toDouble - s * s / (b - a).toDouble
    }
    val f = new Array[Double](n + 1)
    val cp = new Array[Int](n + 1)
    f(0) = -penalty // so every segment, including the first, pays penalty
    var t = 1
    while (t <= n) {
      if (t < minSeg) {
        // no valid segmentation ends here: +∞ makes every candidate
        // through this state lose the strict-< scan naturally
        f(t) = Double.PositiveInfinity; cp(t) = 0
      } else {
        var best = Double.MaxValue
        var bs = 0
        var s = 0
        while (s <= t - minSeg) {
          val cand = (f(s) + cost(s, t)) + penalty
          if (cand < best) { best = cand; bs = s }
          s += 1
        }
        f(t) = best; cp(t) = bs
      }
      t += 1
    }
    var bounds = List(n)
    var cur = n
    while (cur > 0) { cur = cp(cur); bounds = cur :: bounds }
    bounds.toArray
  }
}

object BinSeg {
  /** The kernel, shared with tests: `p`/`q` are 1-based prefix arrays
    * with p(0) = q(0) = 0. Returns sorted boundaries including 0 and n. */
  def boundaries(p: Array[Long], q: Array[Long], n: Int, maxChanges: Int,
      minSeg: Int, minGain: Double): Array[Int] = {
    def cost(a: Int, b: Int): Double = {
      val s = (p(b) - p(a)).toDouble
      (q(b) - q(a)).toDouble - s * s / (b - a).toDouble
    }
    var bounds = Array(0, n)
    var round = 0
    while (round < maxChanges) {
      var bestGain = -1.0
      var bestK = -1
      var si = 0
      while (si < bounds.length - 1) {
        val a = bounds(si); val b = bounds(si + 1)
        // argmin of cost(a,k)+cost(k,b), strict < (first minimum wins)
        var minSum = Double.MaxValue
        var mk = -1
        var k = a + minSeg
        while (k <= b - minSeg) {
          val s1 = (p(k) - p(a)).toDouble
          val c1 = (q(k) - q(a)).toDouble - s1 * s1 / (k - a).toDouble
          val s2 = (p(b) - p(k)).toDouble
          val c2 = (q(b) - q(k)).toDouble - s2 * s2 / (b - k).toDouble
          val sum = c1 + c2
          if (sum < minSum) { minSum = sum; mk = k }
          k += 1
        }
        val gain = if (mk >= 0) cost(a, b) - minSum else -1.0
        // strict >: the FIRST maximal segment wins, matching the
        // ascending fixed-order fold of the HOF form and the oracle
        if (gain > bestGain) { bestGain = gain; bestK = mk }
        si += 1
      }
      // bestK >= 0 guards the sentinel against a caller minGain below
      // -1.0; and once a round accepts no split, bounds are unchanged so
      // every later round would recompute the identical scan — stop
      if (bestK >= 0 && bestGain > minGain) {
        bounds = (bounds :+ bestK).sorted
        round += 1
      } else {
        round = maxChanges
      }
    }
    bounds
  }
}
