package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("pca-spec")
  override def afterAll(): Unit = spark.stop()

  private def naiveCov(rows: Seq[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = rows.length; val d = rows.head.length
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1))
    (mean, cov)
  }

  test("covariance: one-pass aggregator matches the naive two-pass, any layout") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(400)(Array.fill(6)(rnd.nextGaussian() * 3 + 1))
    val (em, ec) = naiveCov(rows)
    for (parts <- Seq(1, 7)) {
      val df = rows.map(r => Tuple1(r)).toDF("embedding").repartition(parts)
      val got = Pca.covariance(df, col("embedding"), 6)
      assert(got.n == 400)
      for (i <- 0 until 6) assert(math.abs(got.mean(i) - em(i)) < 1e-9)
      for (i <- 0 until 6; j <- 0 until 6)
        assert(math.abs(got.cov(i)(j) - ec(i)(j)) < 1e-9, s"cov($i)($j)")
    }
    // float input vectors go through the same path
    val fdf = rows.map(r => Tuple1(r.map(_.toFloat))).toDF("embedding")
    val gf = Pca.covariance(fdf, col("embedding"), 6)
    for (i <- 0 until 6) assert(math.abs(gf.mean(i) - em(i)) < 1e-4)
  }

  test("principalComponents: eigenpairs satisfy A*v = lambda*v, orthonormal, descending") {
    val rnd = new scala.util.Random(23)
    val d = 8
    // synthesize a symmetric PSD matrix via B^T B
    val b = Array.fill(d, d)(rnd.nextGaussian())
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val model = Pca.principalComponents(
      Pca.CovarianceModel(2L, new Array[Double](d), a), d)
    val ev = model.eigenvalues; val comps = model.components
    // descending order
    for (i <- 1 until d) assert(ev(i - 1) >= ev(i) - 1e-9)
    // trace preserved
    val trace = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(ev.sum - trace) < 1e-8 * math.max(1.0, math.abs(trace)))
    for (k <- 0 until d) {
      val v = comps(k)
      // unit norm
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
      // A v = lambda v
      for (i <- 0 until d) {
        val av = (0 until d).map(j => a(i)(j) * v(j)).sum
        assert(math.abs(av - ev(k) * v(i)) < 1e-7, s"eigenpair $k row $i")
      }
      // orthogonality
      for (l <- k + 1 until d) {
        val dot = v.zip(comps(l)).map { case (x, y) => x * y }.sum
        assert(math.abs(dot) < 1e-8, s"components $k,$l not orthogonal")
      }
    }
  }

  test("known 2x2: eigenvalues of [[2,1],[1,2]] are 3 and 1") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val m = Pca.principalComponents(
      Pca.CovarianceModel(2L, Array(0.0, 0.0), a), 2)
    assert(math.abs(m.eigenvalues(0) - 3.0) < 1e-12)
    assert(math.abs(m.eigenvalues(1) - 1.0) < 1e-12)
    // leading component is (1,1)/sqrt(2) up to sign
    val v = m.components(0)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12)
  }

  test("project: variance concentrates on leading components; reconstruction improves with k") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val d = 10
    // anisotropic cloud: variance 25, 9, 1, 1, ... along rotated axes
    val rows = Seq.fill(600) {
      val z = Array.tabulate(d)(i =>
        rnd.nextGaussian() * (if (i == 0) 5.0 else if (i == 1) 3.0 else 1.0))
      // fixed rotation mixing dims 0/1 into 0..3 so PCA has work to do
      val x = z.clone()
      x(2) = z(2) + 0.5 * z(0); x(3) = z(3) - 0.5 * z(1)
      x
    }
    val df = rows.map(r => Tuple1(r)).toDF("embedding")
    val model = Pca.principalComponents(
      Pca.covariance(df, col("embedding"), d), d)
    val proj = df.select(Pca.project(col("embedding"), model).as("p"))
      .collect().map(_.getSeq[Double](0).toArray)
    // per-component sample variance is descending (components are the
    // covariance eigenvectors, so this is the defining property)
    val n = proj.length
    val vars = (0 until d).map { j =>
      val m = proj.map(_(j)).sum / n
      proj.map(p => (p(j) - m) * (p(j) - m)).sum / (n - 1)
    }
    for (j <- 1 until d) assert(vars(j - 1) >= vars(j) - 1e-6,
      s"projected variance not descending at $j: ${vars.toList}")
    // projected variances equal the eigenvalues (within float tolerance)
    for (j <- 0 until d)
      assert(math.abs(vars(j) - model.eigenvalues(j)) < 1e-6 *
        math.max(1.0, model.eigenvalues(j)))
    // reconstruction error decreases as k grows, ~0 at k = d
    def reconErr(k: Int): Double = {
      val mk = Pca.PcaModel(model.mean, model.eigenvalues.take(k),
        model.components.take(k))
      rows.zip(proj).map { case (x, p) =>
        val rec = Array.tabulate(d)(i => model.mean(i) +
          (0 until k).map(c => p(c) * mk.components(c)(i)).sum)
        math.sqrt(x.zip(rec).map { case (a2, b2) =>
          (a2 - b2) * (a2 - b2) }.sum)
      }.sum / rows.length
    }
    val errs = Seq(1, 2, 4, d).map(reconErr)
    for (i <- 1 until errs.length) assert(errs(i) <= errs(i - 1) + 1e-9)
    assert(errs.last < 1e-9, s"full-rank reconstruction not exact: ${errs.last}")
  }

  test("whiten: identity covariance out; near-null eigenvalue rejected") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val d = 5
    val rows = Seq.fill(800)(Array.tabulate(d)(i =>
      rnd.nextGaussian() * (i + 1) + (if (i > 0) 0.3 * i else 0.0)))
    val df = rows.map(r => Tuple1(r)).toDF("embedding")
    val model = Pca.principalComponents(
      Pca.covariance(df, col("embedding"), d), d)
    val w = df.select(Pca.whiten(col("embedding"), model).as("w"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = w.length
    for (i <- 0 until d; j <- i until d) {
      val mi = w.map(_(i)).sum / n; val mj = w.map(_(j)).sum / n
      val c = w.map(p => (p(i) - mi) * (p(j) - mj)).sum / (n - 1)
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(c - expect) < 1e-6, s"whitened cov($i)($j) = $c")
    }
    // a degenerate direction (constant coordinate) must be rejected
    val flat = Seq.fill(50)(Tuple1(Array(1.0, rnd.nextGaussian())))
      .toDF("embedding")
    val fm = Pca.principalComponents(
      Pca.covariance(flat, col("embedding"), 2), 2)
    val e = intercept[IllegalArgumentException] {
      flat.select(Pca.whiten(col("embedding"), fm)).collect()
    }
    assert(e.getMessage.contains("truncate k"))
    // truncating k above the null direction works
    val fm1 = Pca.PcaModel(fm.mean, fm.eigenvalues.take(1),
      fm.components.take(1))
    assert(flat.select(Pca.whiten(col("embedding"), fm1)).count() == 50)
  }

  test("mahalanobisSq: equals the explicit inverse-covariance form; outliers rank last") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // 2-D correlated cloud + two planted far outliers
    val cloud = Seq.fill(500) {
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      Array(a * 2.0, a * 1.0 + b * 0.5)
    }
    val outliers = Seq(Array(30.0, -30.0), Array(-25.0, 28.0))
    val all = cloud ++ outliers
    val df = all.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
    val model = Pca.principalComponents(
      Pca.covariance(df, col("embedding"), 2), 2)
    val got = df.select(col("id"),
        Pca.mahalanobisSq(col("embedding"), model).as("m2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // explicit check: invert the 2x2 covariance by hand
    val cm = Pca.covariance(df, col("embedding"), 2)
    val det = cm.cov(0)(0) * cm.cov(1)(1) - cm.cov(0)(1) * cm.cov(1)(0)
    for ((v, i) <- all.zipWithIndex) {
      val dx = v(0) - cm.mean(0); val dy = v(1) - cm.mean(1)
      val expect = (cm.cov(1)(1) * dx * dx - 2 * cm.cov(0)(1) * dx * dy +
        cm.cov(0)(0) * dy * dy) / det
      assert(math.abs(got(i.toLong) - expect) <
        1e-7 * math.max(1.0, expect), s"row $i")
    }
    // the two planted outliers carry the two largest scores
    val top2 = got.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(top2 == Set(500L, 501L), s"outliers not ranked last: $top2")
  }

  test("project plan: no shuffle, no UDF - broadcast-literal dots at scan speed") {
    import spark.implicits._
    val df = Seq.fill(50)(Tuple1(Array.fill(4)(1.0))).toDF("embedding")
    val model = Pca.PcaModel(Array.fill(4)(0.0), Array(1.0, 1.0),
      Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0)))
    val plan = df.select(Pca.project(col("embedding"), model).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"), plan)
  }

  test("exactCovarianceLongForm: matches naive on quantized values; nulls pairwise-deleted") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(120)(Array.fill(4)(rnd.nextGaussian()))
    val df = rows.map(r => Tuple1(r.map(_.toFloat))).toDF("embedding")
    val got = graft.operators.Pca
      .exactCovarianceLongForm(df, col("embedding"), quant = 100.0)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 10) // 4*5/2 upper-triangle pairs
    val qrows = rows.map(_.map(x =>
      math.floor(x.toFloat.toDouble * 100.0).toLong))
    for (i <- 0 until 4; j <- i until 4) {
      val n = qrows.length.toLong
      val sx = qrows.map(_(i)).sum; val sy = qrows.map(_(j)).sum
      val sxy = qrows.map(r => r(i) * r(j)).sum
      val num = n * sxy - sx * sy
      assert(got((i, j))._1 == n && got((i, j))._2 == num, s"($i,$j)")
      assert(got((i, j))._3 == num.toDouble / (n * (n - 1)).toDouble)
    }
    // layout invariance is exact (integer sums)
    val re = graft.operators.Pca
      .exactCovarianceLongForm(df.repartition(7), col("embedding"), 100.0)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(re == got)
    // a null element drops its pairs from n AND the sums together
    val withNull = (rows.map(r => r.map(x => x: java.lang.Double)) :+
      Array[java.lang.Double](null, 1.0, 2.0, 3.0)).map(Tuple1(_))
      .toDF("embedding")
    val gn = graft.operators.Pca
      .exactCovarianceLongForm(withNull, col("embedding"), 100.0)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(gn((0, 0)) == 120L && gn((0, 1)) == 120L,
      "null-element pairs leaked into n")
    assert(gn((1, 1)) == 121L && gn((1, 2)) == 121L)
  }

  test("exactCovarianceLongForm: raises past the n*B < 2^31 overflow bound") {
    import spark.implicits._
    // |x*quant| = 3e8, n = 10 => n*B = 3e9 > 2^31: the BIGINT co-moments
    // could wrap, so the row must ERROR, not emit a silently-wrong cov
    val big = Seq.fill(10)(Tuple1(Array(3e6, 1.0))).toDF("embedding")
    val e = intercept[Exception] {
      graft.operators.Pca
        .exactCovarianceLongForm(big, col("embedding"), quant = 100.0)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exactCovarianceLongForm")), e.getMessage)
    // just inside the bound: no error, exact values
    val ok = Seq.fill(10)(Tuple1(Array(3e6, 1.0))).toDF("embedding")
    val got = graft.operators.Pca
      .exactCovarianceLongForm(ok, col("embedding"), quant = 0.001)
      .collect()
    assert(got.nonEmpty)
  }

  test("PCA -> ANN: top-5 recall in the 8-dim reduced space >= 0.8 vs full 32-dim") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(71)
    val d = 32
    // structured corpus: 8 latent directions carry the signal, the rest
    // is small isotropic noise — the regime PCA reduction targets
    val basis = Array.fill(8, d)(rnd.nextGaussian())
    def vec() = {
      val coef = Array.fill(8)(rnd.nextGaussian() * 3)
      Array.tabulate(d)(i =>
        (0 until 8).map(k => coef(k) * basis(k)(i)).sum +
          rnd.nextGaussian() * 0.1)
    }
    val all = (0L until 300L).map(i => (i, vec()))
    val base = all.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = all.take(20).map { case (i, v) =>
      (i + 1000L, v.map(_.toFloat)) }.toDF("qid", "qvec")
    val fullTop = Similarity.bruteForceTopK(base, queries, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val model = Pca.principalComponents(
      Pca.covariance(base, col("embedding"), d), 8)
    val baseR = base.select(col("vec_id"),
      Pca.project(col("embedding"), model).as("embedding"))
    val queriesR = queries.select(col("qid"),
      Pca.project(col("qvec"), model).as("qvec"))
    val redTop = Similarity.bruteForceTopK(baseR, queriesR, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = fullTop.keys.toSeq.map { q =>
      (fullTop(q) & redTop(q)).size.toDouble / fullTop(q).size
    }.sum / fullTop.size
    assert(recall >= 0.8, f"PCA-reduced recall@5 = $recall%.2f")
  }

  test("whitened PQ: ADC fidelity beats plain PQ on a skewed-covariance corpus") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(83)
    val d = 16; val m = 4; val cb = 16; val topk = 5
    // skewed-covariance corpus: points live in an 8-dim latent subspace
    // with strongly unequal scales, mixed across all 16 raw coordinates,
    // plus isotropic noise — plain PQ's contiguous raw subspaces then
    // straddle wildly different variance scales AND spend budget on
    // pure-noise directions, the imbalance OPQ corrects
    val latents = Array.fill(8, d)(rnd.nextGaussian())
    val scales = Array(8.0, 6.0, 5.0, 4.0, 3.0, 2.5, 2.0, 1.5)
    def point() = {
      val c = Array.tabulate(8)(j => rnd.nextGaussian() * scales(j))
      Array.tabulate(d)(i =>
        (0 until 8).map(j => c(j) * latents(j)(i)).sum +
          rnd.nextGaussian() * 0.2)
    }
    val pts = Array.fill(400)(point())
    val base = (0L until 400L).map(i => (i, pts(i.toInt)))
      .toDF("vec_id", "embedding")
    // queries are PLANTED NEAR-DUPLICATES of base points — the SemDeDup/
    // curation task: does the twin surface in the approximate top-5?
    val twinOf = (0 until 25).map(q => q -> q * 7).toMap
    val queries = (0 until 25).map { q =>
      (2000L + q, pts(twinOf(q)).map(_ + rnd.nextGaussian() * 0.1))
    }.toDF("qid", "qvec")
    def twinRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0 until 25).count(q =>
        got(2000L + q).contains(twinOf(q).toLong)).toDouble / 25
    }
    // plain PQ on the raw vectors
    val rawBooks = Similarity.trainPqCodebooks(base, d, m, cb)
    val rawRecall = twinRecall(Similarity.pqTopK(
      Similarity.pqEncode(base, rawBooks), queries, topk, rawBooks))
    // whitened PQ truncated to the 8-dim signal subspace: the m x cb
    // budget spends entirely on equalized signal directions
    val (model, wBooks) = Pca.whitenedPqTrain(base, d, m, cb, kDims = 8)
    val wRecall = twinRecall(Pca.whitenedPqTopK(
      Pca.whitenedPqEncode(base, model, wBooks), queries, topk, model, wBooks))
    assert(wRecall >= rawRecall,
      f"whitened-PQ twin recall $wRecall%.3f < plain-PQ $rawRecall%.3f")
    assert(wRecall >= 0.8, f"whitened-PQ twin recall only $wRecall%.3f")
  }

  test("guards: wrong-length vector and undersized input fail fast") {
    import spark.implicits._
    val bad = Seq(Tuple1(Array(1.0, 2.0)), Tuple1(Array(1.0, 2.0, 3.0)))
      .toDF("embedding")
    val e = intercept[Exception] {
      Pca.covariance(bad, col("embedding"), 2)
    }
    assert(e.getMessage != null)
    val one = Seq(Tuple1(Array(1.0, 2.0))).toDF("embedding")
    val e2 = intercept[Exception] { Pca.covariance(one, col("embedding"), 2) }
    assert(e2.getMessage.contains("at least 2"))
  }
}
