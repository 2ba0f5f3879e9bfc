package graft

import graft.operators.Cox
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Cox.coxPh]] — the one survival operator OUTSIDE the SQL
  * oracle registry (exp is not engine-portable), so the whole
  * quantized pipeline is certified here instead: a single-threaded
  * BITWISE replay, a planted-hazard-ratio recovery, a null covariate,
  * layout invariance, and the fail-fast guards. */
class CoxSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("cox-spec")
  override def afterAll(): Unit = spark.stop()

  private val XQ = 1e4
  private val WQ = 1e6

  /** Single-threaded replay of the exact quantized pipeline: same
    * floor quantizations, same BigInt cell sums, same descending-time
    * suffix fold, same float op order, same Newton solve. */
  private def naiveCox(subjects: Seq[(Double, Boolean, Seq[Double])],
      p: Int, iters: Int): (Array[Double], Array[Double], Double) = {
    val qx = subjects.map { case (_, _, xs) =>
      xs.map(x => math.floor(x * XQ).toLong) }
    def onePass(beta: Array[Double])
        : (Array[Double], Array[Double], Double) = {
      val qw = subjects.indices.map { i =>
        var eta = 0.0
        for (j <- 0 until p) eta += qx(i)(j).toDouble / XQ * beta(j)
        math.floor(math.exp(eta) * WQ).toLong
      }
      // per-time exact cells
      val upper = for (j <- 0 until p; k <- j until p) yield (j, k)
      case class Cell(var d: Long = 0L, var cw: BigInt = 0,
        sx: Array[Long] = Array.fill(p)(0L),
        cwx: Array[BigInt] = Array.fill(p)(BigInt(0)),
        cwxx: Array[BigInt] = Array.fill(upper.size)(BigInt(0)))
      val cells = scala.collection.mutable.Map[Double, Cell]()
      subjects.indices.foreach { i =>
        val (t, ev, _) = subjects(i)
        val c = cells.getOrElseUpdate(t, Cell())
        if (ev) { c.d += 1; for (j <- 0 until p) c.sx(j) += qx(i)(j) }
        c.cw += qw(i)
        for (j <- 0 until p) c.cwx(j) += BigInt(qw(i)) * qx(i)(j)
        upper.zipWithIndex.foreach { case ((j, k), u) =>
          c.cwxx(u) += BigInt(qw(i)) * qx(i)(j) * qx(i)(k) }
      }
      // suffix fold, descending time — identical float op order
      var s0 = BigInt(0)
      val s1 = Array.fill(p)(BigInt(0))
      val s2 = Array.fill(upper.size)(BigInt(0))
      val grad = Array.fill(p)(0.0)
      val hess = Array.fill(upper.size)(0.0)
      var ll = 0.0
      cells.toSeq.sortBy(-_._1).foreach { case (_, c) =>
        s0 += c.cw
        for (j <- 0 until p) s1(j) += c.cwx(j)
        for (u <- upper.indices) s2(u) += c.cwxx(u)
        if (c.d > 0) {
          val dD = c.d.toDouble
          val s0D = s0.toDouble
          def r1(j: Int) = s1(j).toDouble / s0D / XQ
          for (j <- 0 until p)
            grad(j) += c.sx(j).toDouble / XQ - dD * r1(j)
          upper.zipWithIndex.foreach { case ((j, k), u) =>
            hess(u) += dD * (s2(u).toDouble / s0D / XQ / XQ -
              r1(j) * r1(k)) }
          var bd = 0.0
          for (j <- 0 until p) bd += c.sx(j).toDouble / XQ * beta(j)
          ll += bd - dD * (math.log(s0D) - math.log(WQ))
        }
      }
      (grad, hess, ll)
    }
    def solve(infoUpper: Array[Double],
        rhs: Array[Double]): Array[Double] = {
      val a = Array.ofDim[Double](p, p)
      var idx = 0
      for (j <- 0 until p; k <- j until p) {
        a(j)(k) = infoUpper(idx); a(k)(j) = infoUpper(idx); idx += 1
      }
      val m = Array.tabulate(p, p + 1)((i, c) =>
        if (c < p) a(i)(c) else rhs(i))
      for (c <- 0 until p) {
        var piv = c
        for (r <- c + 1 until p)
          if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
        val tmp = m(c); m(c) = m(piv); m(piv) = tmp
        for (r <- 0 until p; if r != c) {
          val f = m(r)(c) / m(c)(c)
          for (cc <- c to p) m(r)(cc) -= f * m(c)(cc)
        }
      }
      Array.tabulate(p)(i => m(i)(p) / m(i)(i))
    }
    val beta = Array.fill(p)(0.0)
    for (_ <- 1 to iters) {
      val (grad, hess, _) = onePass(beta)
      val step = solve(hess, grad)
      for (j <- 0 until p) beta(j) += step(j)
    }
    val (_, hessF, llF) = onePass(beta)
    val se = Array.tabulate(p) { j =>
      val e = Array.fill(p)(0.0); e(j) = 1.0
      math.sqrt(solve(hessF, e)(j))
    }
    (beta, se, llF)
  }

  /** Deterministic exponential survival fixture: true hazard
    * λ = exp(b1·x1 + b2·x2), duration = −ln(u)/λ rounded to a
    * 0.25 grid (heavy Breslow ties), censored at the 6.0 horizon. */
  private def fixture(n: Int, b1: Double, b2: Double,
      seed: Int): Seq[(Double, Boolean, Seq[Double])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val x1 = if (i % 2 == 0) 1.0 else 0.0
      val x2 = (rng.nextInt(9) - 4) / 4.0 // in [-1, 1]
      val lambda = math.exp(b1 * x1 + b2 * x2) * 0.35
      val raw = -math.log(rng.nextDouble()) / lambda
      val t = math.max(0.25, math.ceil(raw / 0.25) * 0.25)
      if (t >= 6.0) (6.0, false, Seq(x1, x2))
      else (t, true, Seq(x1, x2))
    }
  }

  test("coxPh: bitwise equal to the single-threaded quantized replay (beta, se, loglik)") {
    import spark.implicits._
    val subj = fixture(600, b1 = 0.7, b2 = -0.4, seed = 31)
    val df = subj.map { case (t, e, xs) => ("g", t, e, xs(0), xs(1)) }
      .toDF("g", "t", "e", "x1", "x2")
    val got = Cox.coxPh(df, Seq("g"), col("t"), col("e"),
        Seq("x1" -> col("x1"), "x2" -> col("x2")), iters = 8)
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(8)))).toMap
    val (beta, se, ll) = naiveCox(subj, p = 2, iters = 8)
    assert(got("x1")._1 == beta(0), "beta x1 bitwise")
    assert(got("x2")._1 == beta(1), "beta x2 bitwise")
    assert(got("x1")._2 == se(0), "se x1 bitwise")
    assert(got("x2")._2 == se(1), "se x2 bitwise")
    assert(got("x1")._3 == ll, "loglik bitwise")
  }

  test("coxPh: recovers planted hazard ratios under censoring and ties; null covariate stays null") {
    import spark.implicits._
    val subj = fixture(3000, b1 = math.log(2.0), b2 = 0.0, seed = 47)
    val df = subj.map { case (t, e, xs) => ("g", t, e, xs(0), xs(1)) }
      .toDF("g", "t", "e", "x1", "x2")
    val out = Cox.coxPh(df, Seq("g"), col("t"), col("e"),
        Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (b1, se1, z1, hr1) = out("x1")
    // planted ln 2 ≈ 0.693: recovered within ~3 SE and meaningfully
    assert(math.abs(b1 - math.log(2.0)) < 0.15,
      s"beta x1 $b1 vs planted ${math.log(2.0)}")
    assert(hr1 > 1.6 && hr1 < 2.5, s"hazard ratio $hr1")
    assert(z1 > 5.0, s"planted effect must be decisive, z=$z1")
    assert(hr1 == math.exp(b1) && z1 == b1 / se1)
    // the no-effect covariate: small beta, |z| < 3
    val (b2, _, z2, _) = out("x2")
    assert(math.abs(b2) < 0.12, s"null beta $b2")
    assert(math.abs(z2) < 3.0, s"null z $z2")
  }

  test("coxPh: stratified fit, bitwise layout invariance, fail-fast guards") {
    import spark.implicits._
    val s1 = fixture(300, b1 = 0.9, b2 = 0.2, seed = 53)
      .map { case (t, e, xs) => ("sA", t, e, xs(0), xs(1)) }
    val s2 = fixture(300, b1 = -0.5, b2 = 0.1, seed = 59)
      .map { case (t, e, xs) => ("sB", t, e, xs(0), xs(1)) }
    val rows = s1 ++ s2
    def run(df: org.apache.spark.sql.DataFrame) =
      Cox.coxPh(df, Seq("g"), col("t"), col("e"),
          Seq("x1" -> col("x1"), "x2" -> col("x2")), iters = 6)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(8)))).toMap
    val a = run(rows.toDF("g", "t", "e", "x1", "x2"))
    // strata get their own signs
    assert(a(("sA", "x1"))._1 > 0.3 && a(("sB", "x1"))._1 < -0.1)
    // bitwise layout invariance
    val b = run(rows.reverse.toDF("g", "t", "e", "x1", "x2")
      .repartition(13))
    assert(a == b, "layout changed the fit bitwise")
    // constant covariate ⇒ singular information ⇒ honest raise
    val ex = intercept[Exception] {
      Cox.coxPh(rows.toDF("g", "t", "e", "x1", "x2"), Seq("g"),
        col("t"), col("e"), Seq("x1" -> lit(1.0))).collect()
    }
    assert(ex.getMessage.contains("singular"))
    // unscaled covariate ⇒ quantization-bound raise
    val ex2 = intercept[Exception] {
      Cox.coxPh(rows.toDF("g", "t", "e", "x1", "x2"), Seq("g"),
        col("t"), col("e"),
        Seq("x1" -> (col("x1") * 1e6))).collect()
    }
    assert(ex2.getMessage.contains("xQuant") ||
      Option(ex2.getCause).exists(_.getMessage.contains("xQuant")))
  }
}
