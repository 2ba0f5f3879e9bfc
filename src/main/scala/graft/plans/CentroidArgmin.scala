package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst argmin-over-centroid-matrix: index of the centroid
  * nearest to the input vector by squared distance (`-2·v·c + ‖c‖²`,
  * first-min tie-break) — the assignment kernel of k-means
  * ([[graft.operators.Similarity.trainCentroids]]), IVF indexing, and
  * SemDeDup clustering.
  *
  * The composed form — `array_position(dists, array_min(dists))` over an
  * `array(...)` of k dot-product expressions — materializes a k-element
  * array per row and, past a few dozen centroids, outgrows the generated
  * method budget so the whole stage falls back to interpreted evaluation:
  * at k = 64 over 100k×64-dim vectors the assignment pass measured ~100 s.
  * This expression is ONE tight loop over a flat `double[]` matrix staged
  * at plan time (k·d doubles, embedded as a codegen reference object):
  * no per-row allocation, no expression-tree growth with k — the same
  * ~6.4M-element scan runs in well under a second.
  *
  * Arithmetic is bit-identical to the composed form it replaces: the dot
  * accumulates left-to-right in double skipping null elements (exactly
  * [[VectorDot]]), `‖c‖²` is the same plan-time left-to-right sum, the
  * per-centroid distance is the same `(dot × -2) + ‖c‖²` pair of IEEE
  * ops, and comparison uses `Double.compare` (NaN greatest, so a NaN
  * distance is never preferred over a finite one; `-0.0` cannot occur —
  * `‖c‖² ≥ +0.0` forces the sum non-negative-zero). A null vector or a
  * dimension mismatch yields NULL, as the composed form's null dot did.
  *
  * Second child is the centroid matrix as a FOLDABLE `array<array
  * <numeric>>` literal — evaluated once at plan time (any numeric
  * element type, converted to double during staging), never per row —
  * which keeps the expression constructible through the registered SQL
  * function (`graft_centroid_argmin(vec, matrix)`), including with
  * inline literal matrices whose elements parse as decimals.
  */
case class CentroidArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // Matrix accepts ANY numeric element (converted once in `staged`, not
      // per row): Spark SQL parses plain decimal literals as DecimalType and
      // scientific-notation ones as DoubleType, so an inline
      // `array(array(0.91, 1.2E-5))` matrix reaches us as whichever common
      // type coercion picked — rejecting non-double here made the registered
      // SQL face unusable with literal matrices.
      case (ArrayType(vt, _), ArrayType(ArrayType(mt, _), _))
          if (vt == FloatType || vt == DoubleType) &&
            mt.isInstanceOf[NumericType] && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_centroid_argmin expects (array<float|double> vector, " +
          "foldable array<array<numeric>> centroid matrix), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}" +
          (if (!right.foldable) " (matrix is not foldable)" else ""))
    }

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** (flat k×d matrix, per-centroid ‖c‖², k, d) — evaluated once from the
    * foldable matrix child; ragged or empty matrices fail loudly here. */
  @transient private lazy val staged: (Array[Double], Array[Double], Int, Int) = {
    val rows = right.eval(null).asInstanceOf[ArrayData]
    require(rows != null && rows.numElements() > 0,
      "graft_centroid_argmin: empty centroid matrix")
    val matType = right.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    val getElem: (ArrayData, Int) => Double = matType match {
      case DoubleType => (a, j) => a.getDouble(j)
      case FloatType => (a, j) => a.getFloat(j).toDouble
      case dt: DecimalType =>
        (a, j) => a.getDecimal(j, dt.precision, dt.scale).toDouble
      case ByteType => (a, j) => a.getByte(j).toDouble
      case ShortType => (a, j) => a.getShort(j).toDouble
      case IntegerType => (a, j) => a.getInt(j).toDouble
      case LongType => (a, j) => a.getLong(j).toDouble
      case other => throw new IllegalStateException(
        s"graft_centroid_argmin: unsupported matrix element type $other")
    }
    val k = rows.numElements()
    val first = rows.getArray(0)
    val d = first.numElements()
    val flat = new Array[Double](k * d)
    val norms = new Array[Double](k)
    var i = 0
    while (i < k) {
      val row = rows.getArray(i)
      require(row.numElements() == d,
        s"graft_centroid_argmin: ragged matrix — centroid $i has " +
          s"${row.numElements()} dims, centroid 0 has $d")
      var n2 = 0.0
      var j = 0
      while (j < d) {
        val x = getElem(row, j)
        flat(i * d + j) = x
        n2 += x * x
        j += 1
      }
      norms(i) = n2
      i += 1
    }
    (flat, norms, k, d)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (flat, norms, k, d) = staged
    val v = l.asInstanceOf[ArrayData]
    if (v.numElements() != d) return null
    val isF = elemIsFloat
    var best = 0
    var bestDist = 0.0
    var i = 0
    while (i < k) {
      var s = 0.0
      var j = 0
      while (j < d) {
        if (!v.isNullAt(j)) {
          val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
          s += x * flat(i * d + j)
        }
        j += 1
      }
      val dist = s * -2.0 + norms(i)
      if (i == 0 || java.lang.Double.compare(dist, bestDist) < 0) {
        best = i; bestDist = dist
      }
      i += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, norms, k, d) = staged
    val matRef = ctx.addReferenceObj("centroidMat", flat, "double[]")
    val normRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestDist = ctx.freshName("bestDist")
      s"""
         |if ($v.numElements() != $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestDist = 0.0;
         |  for (int $i = 0; $i < $k; $i++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      if (!$v.isNullAt($j)) {
         |        $s += (double) $v.$get($j) * $matRef[$i * $d + $j];
         |      }
         |    }
         |    double $dist = $s * -2.0 + $normRef[$i];
         |    if ($i == 0 || java.lang.Double.compare($dist, $bestDist) < 0) {
         |      $best = $i; $bestDist = $dist;
         |    }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmin =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_centroid_argmin"
}
