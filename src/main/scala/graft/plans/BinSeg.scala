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
      if (bestGain > minGain) {
        bounds = (bounds :+ bestK).sorted
      }
      round += 1
    }
    bounds
  }
}
