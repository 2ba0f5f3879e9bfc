package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native Pool-Adjacent-Violators kernel behind
  * [[graft.operators.Stats.isotonicFit]]:
  * `graft_pav(sums, cnts)` → array<struct<pool_sum, pool_cnt>> aligned
  * with the input positions (position i's pool totals).
  *
  * Inputs are the per-position EXACT BIGINT label sums and counts, in
  * ascending-score order. The stack-based PAV merge compares pool means
  * by CROSS-MULTIPLICATION (s₁·c₂ ≥ s₂·c₁ — no division anywhere), so
  * the computation is pure integer arithmetic and the resulting
  * partition into pools is exact. PAV's fit is UNIQUE and confluent
  * (any order of merging violators converges to the same partition *in
  * exact arithmetic* — which cross-multiplication gives us), which is
  * what lets the DuckDB oracle replay it with a different merge order
  * (first-violator iteration in a recursive CTE) and still match
  * bit-for-bit. Bound: pool sums/counts ≤ the group total N, so the
  * cross-products need N² < 2⁶³ (N < ~3e9 rows per group).
  *
  * Eval-only ([[CodegenFallback]]) like [[BinSeg]]: a tight
  * data-dependent loop that codegen would not improve.
  */
case class Pav(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private val outElem = StructType(Seq(
    StructField("pool_sum", LongType, nullable = false),
    StructField("pool_cnt", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(outElem, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 2)
      return TypeCheckResult.TypeCheckFailure("graft_pav expects (sums, cnts)")
    (children(0).dataType, children(1).dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_pav expects (array<bigint>, array<bigint>), got $other")
    }
  }

  override def eval(input: InternalRow): Any = {
    val sRaw = children(0).eval(input)
    val cRaw = children(1).eval(input)
    if (sRaw == null || cRaw == null) return null
    val sa = sRaw.asInstanceOf[ArrayData]
    val ca = cRaw.asInstanceOf[ArrayData]
    val n = sa.numElements()
    if (ca.numElements() != n) return null
    val sums = Array.tabulate(n)(sa.getLong)
    val cnts = Array.tabulate(n)(ca.getLong)
    // overflow guard (the sibling kernels' raise discipline — JVM Long
    // wraps silently even under ANSI): every cross-product is bounded by
    // totalSum · totalCount, and the totals themselves accumulate via
    // addExact so they cannot wrap unnoticed either
    var totS = 0L; var totC = 0L
    var gi = 0
    while (gi < n) {
      totS = Math.addExact(totS, sums(gi))
      totC = Math.addExact(totC, cnts(gi))
      gi += 1
    }
    if (totS.toDouble * totC.toDouble >= math.pow(2, 63))
      throw new IllegalArgumentException(
        s"graft_pav: totalSum*totalCount = ${totS.toDouble * totC.toDouble} " +
          ">= 2^63 - cross-multiplied pool comparisons may wrap; " +
          "pre-aggregate or sample the group")
    val (ps, pc) = Pav.fit(sums, cnts)
    new GenericArrayData(Array.tabulate[Any](n)(i =>
      InternalRow(ps(i), pc(i))))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Pav = copy(newChildren)

  override def prettyName: String = "graft_pav"
}

object Pav {
  /** Stack-based PAV over (label-sum, count) positions in ascending-score
    * order; returns per-position (pool_sum, pool_cnt). Merge condition:
    * previous pool mean ≥ current pool mean, decided by exact
    * cross-multiplication. */
  def fit(sums: Array[Long], cnts: Array[Long]): (Array[Long], Array[Long]) = {
    val n = sums.length
    val ps = new Array[Long](n) // pool sums (stack)
    val pc = new Array[Long](n) // pool counts
    val span = new Array[Int](n) // positions absorbed per pool
    var top = -1
    var i = 0
    while (i < n) {
      top += 1
      ps(top) = sums(i); pc(top) = cnts(i); span(top) = 1
      // merge while the previous pool's mean >= this pool's mean
      while (top > 0 && ps(top - 1) * pc(top) >= ps(top) * pc(top - 1)) {
        ps(top - 1) += ps(top); pc(top - 1) += pc(top)
        span(top - 1) += span(top)
        top -= 1
      }
      i += 1
    }
    val outS = new Array[Long](n)
    val outC = new Array[Long](n)
    var p = 0; var pos = 0
    while (p <= top) {
      var j = 0
      while (j < span(p)) { outS(pos) = ps(p); outC(pos) = pc(p); pos += 1; j += 1 }
      p += 1
    }
    (outS, outC)
  }
}
