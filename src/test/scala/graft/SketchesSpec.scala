package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("sketches-spec")
  override def afterAll(): Unit = spark.stop()

  test("small cardinality is EXACT; merged partials equal the whole; layout-proof") {
    import spark.implicits._
    // 3 days × overlapping user sets; true distinct over all days = 60
    val rows = for {
      day <- Seq("d1", "d2", "d3")
      u <- 0 until 50
    } yield (day, (u + (if (day == "d3") 10 else 0)).toLong)
    val df = rows.toDF("day", "user_id")

    val daily = Sketches.distinctSketch(df, Seq(col("day")), col("user_id"))
    val dailyEst = daily.select(col("day"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // coupon mode: exact at this size
    assert(dailyEst == Map("d1" -> 50L, "d2" -> 50L, "d3" -> 50L))

    // merge of per-day sketches == sketch of the union, exactly
    val merged = Sketches.mergeSketches(daily, Seq(lit(1).as("one")), col("sketch"))
      .select(Sketches.estimate(col("sketch"))).collect()(0).getLong(0)
    val whole = Sketches.distinctSketch(df, Seq(lit(1).as("one")), col("user_id"))
      .select(Sketches.estimate(col("sketch"))).collect()(0).getLong(0)
    assert(merged == whole)
    assert(merged == 60L)

    // physical layout cannot change the estimate (register-wise max is
    // order-independent)
    val reparted = Sketches.distinctSketch(df.repartition(17), Seq(col("day")), col("user_id"))
      .select(col("day"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == dailyEst)
  }

  test("large cardinality stays within the lgK=12 error bound") {
    import spark.implicits._
    val n = 200000L
    val df = spark.range(n).select((col("id") % 2).cast("string").as("g"), col("id"))
    val est = Sketches.distinctSketch(df, Seq(col("g")), col("id"))
      .select(col("g"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((_, e) <- est) {
      val exact = n / 2
      assert(math.abs(e - exact).toDouble / exact < 0.05,
        s"estimate $e vs exact $exact out of bound")
    }
  }

  test("count-min: one-sided error, exact at generous width, partial merge == whole") {
    import spark.implicits._
    // zipf-ish: key i appears 200/i times
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"key$i"))
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val probes = exact.keys.toSeq.toDF("k")

    // generous width → no collisions among 40 keys → estimates EXACT
    val wide = Sketches.countMinSketch(df, col("k"), depth = 4, width = 4096)
    val wideEst = wide.estimate(probes, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wideEst == exact, s"wide sketch should be collision-free")

    // tiny width → collisions inflate SOME estimate, but NEVER deflate
    val tiny = Sketches.countMinSketch(df, col("k"), depth = 2, width = 8)
    val tinyEst = tiny.estimate(probes, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(tinyEst(k) >= n, s"CMS must never undercount: $k ${tinyEst(k)} < $n")
    }
    assert(exact.exists { case (k, n) => tinyEst(k) > n },
      "40 keys in 8 buckets must collide somewhere")

    // split the corpus arbitrarily; merged partial sketches == whole
    val (a, b) = rows.splitAt(137)
    val merged = Sketches.countMinSketch(a.toDF("k"), col("k"), 4, 4096)
      .merge(Sketches.countMinSketch(b.toDF("k"), col("k"), 4, 4096))
    val mergedRows = merged.counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wholeRows = wide.counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mergedRows == wholeRows, "counter-wise merge must equal the whole")

    // mismatched build parameters cannot meet: merge refuses
    intercept[IllegalArgumentException] { wide.merge(tiny) }

    // an unseen key reads 0 (all its buckets empty at this width)
    val unseen = wide.estimate(Seq("neverseen").toDF("k"), col("k")).collect()
    assert(unseen.length == 1 && unseen(0).getLong(1) == 0L)
  }

  test("quantile sketch: merge == whole, ≤1% relative error, exact under 1000 units") {
    import spark.implicits._
    // two groups with different shapes: a linear ramp and a heavy tail
    val rows = (1 to 5000).map(i => ("ramp", i * 1.37)) ++
      (1 to 5000).map(i => ("tail", math.pow(1.002, i) * 3.0))
    val df = rows.toDF("g", "v")

    val whole = Sketches.quantileSketch(df, Seq(col("g")), col("v"))
    // arbitrary disjoint split: merged partials must equal the whole,
    // bucket row for bucket row (addition is the merge — order-free)
    val (a, b) = rows.splitAt(3791)
    val merged = Sketches.quantileSketch(a.toDF("g", "v"), Seq(col("g")), col("v"))
      .merge(Sketches.quantileSketch(b.toDF("g", "v"), Seq(col("g")), col("v")))
    def bucketMap(s: Sketches.QuantileSketch) = s.buckets.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(bucketMap(merged) == bucketMap(whole),
      "merged partial sketches must equal the whole sketch exactly")

    // estimates vs the true rank-⌈qN⌉ element: the estimate is the
    // bucket's lower bound, so est ≤ exact < est·1.01 (m ≥ 100), and
    // for values under 1000 scaled units buckets are singletons → exact
    val qs = Seq(0.5, 0.9, 0.99)
    val est = whole.quantiles(qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (g <- Seq("ramp", "tail"); q <- qs) {
      val vs = byGroup(g)
      val exact = vs(math.ceil(q * vs.size).toInt - 1)
      val e = est((g, q))
      assert(e <= exact + 1e-9, s"$g q=$q: estimate $e above true $exact")
      assert(exact < e * 1.01 + 1e-9,
        s"$g q=$q: estimate $e more than 1% below true $exact")
    }

    // sub-1000 scaled units (< 10.00 at scale=2): singleton buckets, so
    // the estimate IS the exact order statistic
    val small = (1 to 999).map(i => ("s", i / 100.0)).toDF("g", "v")
    val smallEst = Sketches.quantileSketch(small, Seq(col("g")), col("v"))
      .quantiles(Seq(0.5)).collect()(0).getDouble(2)
    assert(smallEst == 5.00, s"singleton-bucket median should be exact: $smallEst")

    // mismatched fixed-point scales cannot merge
    intercept[IllegalArgumentException] {
      whole.merge(Sketches.quantileSketch(df, Seq(col("g")), col("v"), scale = 3))
    }

    // negative values are outside the domain and excluded at build
    val signed = Seq(("n", -5.0), ("n", 1.0), ("n", 2.0), ("n", 3.0))
      .toDF("g", "v")
    val negTotal = Sketches.quantileSketch(signed, Seq(col("g")), col("v"))
      .buckets.agg(sum("cnt")).collect()(0).getLong(0)
    assert(negTotal == 3L, "negative values must not enter the histogram")
  }

  test("frequentItems: EXACT heavy hitters under any partitioning (fuzzed Zipf)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 4) {
      // Zipf-ish: key k drawn with weight ~ 1/(k+1); plus nulls to
      // exercise the skip contract
      val vocab = 200
      val rows = (0 until 30000).map { _ =>
        val r = rnd.nextDouble()
        val k = math.min(vocab - 1, (math.pow(vocab.toDouble, r) - 1).toInt)
        if (rnd.nextInt(100) == 0) null else s"k$k"
      }
      val parts = Seq(1, 7, 32)(trial % 3)
      val df = rows.toDF("k").repartition(parts)
      val minShare = Seq(0.01, 0.02, 0.005, 0.001)(trial)
      val got = Sketches.frequentItems(df, col("k"), minShare)
        .orderBy("key").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      // exact reference computed driver-side
      val nonNull = rows.filter(_ != null)
      val n = nonNull.size.toLong
      val thresh = math.ceil(minShare * n).toLong
      val want = nonNull.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thresh).toSeq.sortBy(_._1)
      assert(got == want,
        s"trial $trial (parts=$parts, minShare=$minShare): $got vs $want")
    }
  }

  test("frequentItems: MG candidate union is bounded and has no false negatives") {
    import spark.implicits._
    // adversarial for MG: one true heavy hitter drowned in a sea of
    // near-unique keys that constantly trigger decrement rounds
    val rows = (0 until 20000).map { i =>
      if (i % 10 == 0) "HH" else s"u$i"
    }
    val minShare = 0.05 // HH share = 10%
    val slots = math.ceil(2.0 / minShare).toInt
    val df = rows.toDF("k").repartition(8)
    val cands = Sketches.frequentItems(df, col("k"), minShare)
      .collect().map(_.getString(0))
    assert(cands.toSeq == Seq("HH"))
    // the zero-shuffle candidate pass itself stays within slots × parts
    val candDf = Sketches.mgCandidates(df, col("k"), slots)
    val nCands = candDf.count()
    assert(nCands <= slots.toLong * 8,
      s"candidate union must stay within slots × partitions: $nCands")
    assert(candDf.filter(col("k") === "HH").count() == 1,
      "true heavy hitter must survive the per-partition MG summaries")
  }

  test("KMV: exact below k; merged partials equal the whole; layout-proof") {
    import spark.implicits._
    // group "small" has 40 distinct values (< k=64) → exact path;
    // group "big" has 5000 (> k) → estimation path; heavy duplication
    // everywhere so the distinct-hash dedup is actually exercised
    val rows =
      (for (i <- 0 until 40; _ <- 0 until 5) yield ("small", i.toLong)) ++
      (for (i <- 0 until 5000; _ <- 0 until 2) yield ("big", i.toLong))
    val df = rows.toDF("g", "v")

    val whole = Sketches.kmvSketch(df, Seq("g"), col("v"), k = 64)
    val est = whole.estimate.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 40.0, "below k the KMV estimate is exact")
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.40,
      s"KMV k=64 estimate off by more than 3σ: ${est("big")}")

    // merge of disjoint halves == whole, down to identical min-hash state
    val Seq(b0, b1) = Seq(0, 1).map(p =>
      Sketches.kmvSketch(df.filter(col("v") % 2 === p), Seq("g"), col("v"),
        k = 64))
    def state(s: Sketches.KmvSketch) = s.mins.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(state(b0.merge(b1)) == state(whole))
    // overlapping halves too: dedup must keep one slot per value
    val Seq(o0, o1) = Seq(0, 3500).map(lo =>
      Sketches.kmvSketch(df.filter(col("v") >= lo), Seq("g"), col("v"),
        k = 64))
    assert(state(o1.merge(o0)) == state(whole))
    // layout independence
    assert(state(Sketches.kmvSketch(df.repartition(17), Seq("g"), col("v"),
      k = 64)) == state(whole))
    // nulls are ignored, matching COUNT(DISTINCT): a sketch over the
    // data with nulls interleaved equals the null-free sketch (and does
    // not crash the non-nullable buffer encoder)
    val withNulls = df.select(col("g"),
      when(col("v") >= 0, col("v")).as("v"))
      .unionByName(Seq(("small", null.asInstanceOf[java.lang.Long]),
        ("big", null.asInstanceOf[java.lang.Long])).toDF("g", "v"))
    assert(state(Sketches.kmvSketch(withNulls, Seq("g"), col("v"), k = 64))
      == state(whole))
  }

  test("kmvJaccard: exact below k, within 3σ above, extremes exact") {
    import spark.implicits._
    def sk(lo: Long, hi: Long, k: Int) = Sketches.kmvSketch(
      (lo until hi).map(v => ("g", v)).toDF("g", "v"), Seq("g"), col("v"), k)
    def est(a: Sketches.KmvSketch, b: Sketches.KmvSketch): Double =
      Sketches.kmvJaccard(a, b).collect()(0).getDouble(2)
    // small sets (|A∪B| < k): the union sample IS the union — exact
    // J([0,30) vs [10,40)) = |{10..29}| / 40 = 20/40
    assert(est(sk(0, 30, 64), sk(10, 40, 64)) == 0.5)
    // identical sets → exactly 1; disjoint sets → exactly 0 (any size)
    assert(est(sk(0, 5000, 64), sk(0, 5000, 64)) == 1.0)
    assert(est(sk(0, 5000, 64), sk(5000, 10000, 64)) == 0.0)
    // large overlapping sets: J = 5k/15k = 1/3, k=256 → σ ≈ √(J(1−J)/k)
    // ≈ 0.029; assert within 3σ
    val j = est(sk(0, 10000, 256), sk(5000, 15000, 256))
    assert(math.abs(j - 1.0 / 3.0) < 0.09, s"estimate $j too far from 1/3")
  }
}
