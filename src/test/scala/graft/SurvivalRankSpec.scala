package graft

import graft.operators.{Concordance, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 rank/sequential wave: Harrell's C (bucket-grid
  * decomposition vs naive O(n²) replay), the Pocock win ratio (tiered
  * Mann–Whitney counts vs naive pair enumeration), Jonckheere–Terpstra
  * (vs naive pairwise level U sums), and the group-sequential
  * boundary tables (OBF rejects late what Pocock rejects early). */
class SurvivalRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("survival-rank-spec")
  override def afterAll(): Unit = spark.stop()

  // deterministic LCG so fixtures replay identically
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  // ---------------------------------------------------------------- C

  private def naiveC(subs: Seq[(Double, Boolean, Double)]): (Long, Long) = {
    // (comparable, concordant2) by direct enumeration
    var pairs = 0L; var num2 = 0L
    for ((ti, ei, ri) <- subs; if ei; (tj, ej, rj) <- subs) {
      val comparable = tj > ti || (tj == ti && !ej)
      if (comparable) {
        pairs += 1
        if (rj < ri) num2 += 2 else if (rj == ri) num2 += 1
      }
    }
    (pairs, num2)
  }

  test("harrellC equals the naive O(n²) enumeration, with heavy time and risk ties") {
    import spark.implicits._
    val rs = lcg(7).map(x => math.abs(x)).take(3 * 400).toSeq
    val subs = rs.grouped(3).zipWithIndex.map { case (Seq(a, b, c), i) =>
      ("g" + (i % 2),
        (a % 20).toDouble,          // few distinct times ⇒ many ties
        b % 3 != 0,                 // ~2/3 events
        (c % 15).toDouble)          // few distinct risks ⇒ risk ties
    }.toSeq
    val df = subs.toDF("g", "t", "e", "r")
    val out = Concordance.harrellC(df, Seq("g"), col("t"), col("e"),
      col("r"), buckets = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("comparable_pairs"), r.getAs[Long]("concordant2"),
          r.getAs[Double]("c_index")))).toMap
    for (g <- Seq("g0", "g1")) {
      val mine = subs.filter(_._1 == g).map(s => (s._2, s._3, s._4))
      val (pairs, num2) = naiveC(mine)
      assert(out(g)._1 == pairs, s"$g comparable")
      assert(out(g)._2 == num2, s"$g concordant2")
      assert(out(g)._3 == num2.toDouble / (2.0 * pairs))
    }
  }

  test("harrellC is invariant to the bucket count (it tunes cost, not the result)") {
    import spark.implicits._
    val rs = lcg(11).map(math.abs).take(3 * 300).toSeq
    val df = rs.grouped(3).map { case Seq(a, b, c) =>
      ("g", (a % 50).toDouble + (a % 7) * 0.5, b % 4 != 0,
        (c % 1000).toDouble / 9.0)
    }.toSeq.toDF("g", "t", "e", "r")
    def run(bk: Int) = Concordance.harrellC(df, Seq("g"), col("t"),
      col("e"), col("r"), buckets = bk).collect().map(r =>
      (r.getAs[Long]("comparable_pairs"), r.getAs[Long]("concordant2"),
        r.getAs[Double]("c_index"))).head
    val base = run(1)
    assert(run(7) == base)
    assert(run(64) == base)
    assert(run(300) == base) // more buckets than useful boundaries
  }

  test("harrellC hand example: perfect, anti-perfect and known mixed ordering") {
    import spark.implicits._
    // events at t=1,2,3 (all events). risk descending with earlier
    // failure = perfect concordance
    val perfect = Seq(("g", 1.0, true, 3.0), ("g", 2.0, true, 2.0),
      ("g", 3.0, true, 1.0)).toDF("g", "t", "e", "r")
    val p = Concordance.harrellC(perfect, Seq("g"), col("t"), col("e"),
      col("r")).head()
    assert(p.getAs[Long]("comparable_pairs") == 3L)
    assert(p.getAs[Double]("c_index") == 1.0)
    val anti = Seq(("g", 1.0, true, 1.0), ("g", 2.0, true, 2.0),
      ("g", 3.0, true, 3.0)).toDF("g", "t", "e", "r")
    assert(Concordance.harrellC(anti, Seq("g"), col("t"), col("e"),
      col("r")).head().getAs[Double]("c_index") == 0.0)
    // censored-at-same-time IS comparable; event-at-same-time is NOT
    val mixed = Seq(
      ("g", 1.0, true, 5.0),  // index event
      ("g", 1.0, false, 4.0), // censored same t: comparable, concordant
      ("g", 1.0, true, 9.0),  // event same t: NOT comparable
      ("g", 2.0, false, 5.0)  // later: comparable, risk tie (½)
    ).toDF("g", "t", "e", "r")
    val m = Concordance.harrellC(mixed, Seq("g"), col("t"), col("e"),
      col("r")).head()
    // index1 (t=1,r=5): partners j2 (2, concordant) and j4 (tie) = 2 pairs
    // index3 (t=1,r=9): partners j2 and j4, both r < 9 = 2 concordant
    assert(m.getAs[Long]("comparable_pairs") == 4L)
    assert(m.getAs[Long]("concordant2") == 2L + 1L + 2L + 2L)
    assert(m.getAs[Double]("c_index") == 7.0 / 8.0)
  }

  test("unoC equals a naive IPCW replay and is bucket-invariant") {
    import spark.implicits._
    val rs = lcg(31).map(math.abs).take(3 * 300).toSeq
    val subs = rs.grouped(3).map { case Seq(a, b, c) =>
      ("g", (a % 15 + 1).toDouble, b % 3 != 0, (c % 12).toDouble)
    }.toSeq
    val df = subs.toDF("g", "t", "e", "r")
    val tau = 10.0
    def run(bk: Int) = Concordance.unoC(df, Seq("g"), col("t"),
      col("e"), col("r"), tau, buckets = bk).head().getAs[Double]("c_uno")
    val got = run(5)
    assert(got == run(1) && got == run(50), "bucket count changed c_uno")
    // naive replay: censoring KM, per-index-cell credits, floor chain
    val n = subs.size
    val grid = subs.groupBy(_._2).map { case (t, xs) =>
      (t, xs.count(!_._3).toLong, xs.count(_._3).toLong)
    }.toSeq.sortBy(_._1)
    var used = 0L; var p = 1.0
    val gSteps = grid.map { case (t, d, c) =>
      p = p * (1.0 - d.toDouble / (n - used)); used += d + c; (t, p)
    }
    def gtm(x: Double): Double = gSteps.foldLeft(1.0) {
      case (acc, (t, s)) => if (t < x) s else acc }
    // per-index-CELL (t, r): credits over all comparable partners
    val cellsM = subs.filter(s => s._3 && s._2 <= tau)
      .groupBy(s => (s._2, s._4))
    var sn = 0L; var sd = 0L
    for (((t, r), members) <- cellsM) {
      var num2 = 0L; var den = 0L
      for ((_, tj, ej, rj) <- subs) {
        val comparable = tj > t || (tj == t && !ej)
        if (comparable) {
          den += members.size
          num2 += members.size * (if (rj < r) 2L else if (rj == r) 1L else 0L)
        }
      }
      val w = 1.0 / (gtm(t) * gtm(t))
      sn += math.floor(num2.toDouble * w * 1e6).toLong
      sd += math.floor(den.toDouble * w * 1e6).toLong
    }
    assert(got == sn.toDouble / (2.0 * sd.toDouble))
  }

  test("aucT equals naive per-horizon case/control AUC; perfect risk gives 1.0") {
    import spark.implicits._
    val rs = lcg(23).map(math.abs).take(3 * 400).toSeq
    val subs = rs.grouped(3).map { case Seq(a, b, c) =>
      ("g", (a % 25 + 1).toDouble, b % 3 != 0, (c % 40).toDouble)
    }.toSeq
    val df = subs.toDF("g", "t", "e", "r")
    val hs = Seq(5.0, 12.0, 20.0)
    val out = Concordance.aucT(df, Seq("g"), col("t"), col("e"),
      col("r"), hs).collect()
      .map(r => r.getAs[Double]("h") ->
        ((r.getAs[Long]("n_cases"), r.getAs[Long]("n_controls"),
          r.getAs[Double]("auc")))).toMap
    for (h <- hs) {
      val cases = subs.filter(s => s._2 <= h && s._3).map(_._4)
      val ctrls = subs.filter(s => s._2 > h).map(_._4)
      var num = 0.0
      for (x <- cases; y <- ctrls)
        num += (if (x > y) 1.0 else if (x == y) 0.5 else 0.0)
      assert(out(h)._1 == cases.size && out(h)._2 == ctrls.size, s"h=$h")
      assert(out(h)._3 == num / (cases.size.toDouble * ctrls.size), s"h=$h")
    }
    // risk = -t on all-event data ranks every case above every control
    val perfect = (1 to 50).map(i => ("g", i.toDouble, true, -i.toDouble))
      .toDF("g", "t", "e", "r")
    assert(Concordance.aucT(perfect, Seq("g"), col("t"), col("e"),
      col("r"), Seq(25.0)).head().getAs[Double]("auc") == 1.0)
  }

  test("aucTIpcw equals a naive weighted replay; equals unweighted aucT when nothing censors") {
    import spark.implicits._
    val rs = lcg(43).map(math.abs).take(3 * 300).toSeq
    val subs = rs.grouped(3).map { case Seq(a, b, c) =>
      ("g", (a % 18 + 1).toDouble, b % 3 != 0, (c % 25).toDouble)
    }.toSeq
    val df = subs.toDF("g", "t", "e", "r")
    val hs = Seq(6.0, 12.0)
    val out = Concordance.aucTIpcw(df, Seq("g"), col("t"), col("e"),
      col("r"), hs).collect()
      .map(r => r.getAs[Double]("h") -> r.getAs[Double]("auc_ipcw")).toMap
    // replay: censoring KM then the quantized weighted pair sum
    val n = subs.size
    val grid = subs.groupBy(_._2).map { case (t, xs) =>
      (t, xs.count(!_._3).toLong, xs.count(_._3).toLong)
    }.toSeq.sortBy(_._1)
    var used = 0L; var p = 1.0
    val gSteps = grid.map { case (t, d, c) =>
      p = p * (1.0 - d.toDouble / (n - used)); used += d + c; (t, p)
    }
    def gtm(x: Double): Double = gSteps.foldLeft(1.0) {
      case (acc, (t, s)) => if (t < x) s else acc }
    for (h <- hs) {
      val cases = subs.filter(s => s._2 <= h && s._3)
      val ctrls = subs.filter(s => s._2 > h).map(_._4)
      var num = 0L; var w = 0L
      for ((_, t, _, r) <- cases) {
        val qa = math.floor((1.0 / (gtm(t) * gtm(t))) * 1e6).toLong
        w += qa
        val strict = ctrls.count(_ < r).toLong
        val tie = ctrls.count(_ == r).toLong
        num += qa * (2 * strict + tie)
      }
      assert(out(h) ==
        num.toDouble / (2.0 * w.toDouble * ctrls.size.toDouble), s"h=$h")
    }
    // all-event data: every weight is 1/Ĝ(t⁻)² with Ĝ ≡ 1 ⇒ the
    // weighted statistic IS the unweighted aucT
    val unc = subs.map(s => (s._1, s._2, true, s._4)).toDF("g", "t", "e", "r")
    val a1 = Concordance.aucTIpcw(unc, Seq("g"), col("t"), col("e"),
      col("r"), hs).collect()
      .map(r => r.getAs[Double]("h") -> r.getAs[Double]("auc_ipcw")).toMap
    val a0 = Concordance.aucT(unc, Seq("g"), col("t"), col("e"),
      col("r"), hs).collect()
      .map(r => r.getAs[Double]("h") -> r.getAs[Double]("auc")).toMap
    for (h <- hs) assert(a1(h) == a0(h), s"uncensored mismatch at h=$h")
  }

  test("brierIpcw matches a single-threaded IPCW replay; uncensored data needs no weights") {
    import spark.implicits._
    val rs = lcg(29).map(math.abs).take(3 * 300).toSeq
    val subs = rs.grouped(3).map { case Seq(a, b, c) =>
      ("g", (a % 20 + 1).toDouble, b % 4 != 0, (c % 100) / 100.0)
    }.toSeq
    val hs = Seq(6.0, 14.0)
    val df = subs.toDF("g", "t", "e", "p0")
      .withColumn("pred", array(lit(1.0) / (lit(1.0) + col("p0")),
        lit(1.0) / (lit(2.0) + col("p0"))))
    val out = Concordance.brierIpcw(df, Seq("g"), col("t"), col("e"),
      col("pred"), hs).collect()
      .map(r => r.getAs[Double]("h") -> r.getAs[Double]("brier")).toMap
    // replay: censoring KM by hand (ascending distinct times), then the
    // same quantized-term sum
    val n = subs.size
    val grid = subs.groupBy(_._2).map { case (t, xs) =>
      (t, xs.count(!_._3).toLong, xs.count(_._3).toLong)
    }.toSeq.sortBy(_._1) // (t, censorEvents, kept)
    var used = 0L; var p = 1.0
    val gSteps = grid.map { case (t, d, c) =>
      val nr = n - used
      p = p * (1.0 - d.toDouble / nr)
      used += d + c
      (t, p)
    }
    def gAt(x: Double, strict: Boolean): Double =
      gSteps.foldLeft(1.0) { case (acc, (t, s)) =>
        if (if (strict) t < x else t <= x) s else acc }
    for (h <- hs) {
      val preds = subs.map(s =>
        if (h == 6.0) 1.0 / (1.0 + s._4) else 1.0 / (2.0 + s._4))
      var sq = 0L
      for (((g0, t, e, _), pr) <- subs.zip(preds)) {
        val term =
          if (t <= h && e) (1.0 / gAt(t, strict = true)) * ((pr - 0.0) * (pr - 0.0))
          else if (t > h) (1.0 / gAt(h, strict = false)) * ((pr - 1.0) * (pr - 1.0))
          else 0.0
        sq += math.floor(term * 1e12).toLong
      }
      assert(out(h) == (sq.toDouble / 1e12) / n, s"h=$h")
    }
    // no censoring ⇒ Ĝ ≡ 1 ⇒ BS(t) is the plain quantized Brier mean
    val unc = (1 to 100).map(i => ("g", (i % 10 + 1).toDouble, true,
      0.3)).toDF("g", "t", "e", "p0")
      .withColumn("pred", array(lit(0.3)))
    val b = Concordance.brierIpcw(unc, Seq("g"), col("t"), col("e"),
      col("pred"), Seq(5.0)).head()
    // cases (t<=5) score (0.3-0)²; controls (0.3-1)² — Ĝ ≡ 1 throughout
    val cases = (1 to 100).count(i => (i % 10 + 1) <= 5)
    val ctrls = 100 - cases
    val sq = cases * math.floor((0.3 - 0.0) * (0.3 - 0.0) * 1e12).toLong +
      ctrls * math.floor((0.3 - 1.0) * (0.3 - 1.0) * 1e12).toLong
    assert(b.getAs[Double]("brier") == (sq.toDouble / 1e12) / 100.0)
  }

  // ---------------------------------------------------------- win ratio

  test("winRatio equals naive pair enumeration on a tiered composite with ties") {
    import spark.implicits._
    val rs = lcg(13).map(math.abs).take(3 * 500).toSeq
    val subs = rs.grouped(3).zipWithIndex.map { case (Seq(a, b, c), i) =>
      ("g" + (i % 2), a % 2 == 0, (b % 8).toDouble, (c % 5).toDouble)
    }.toSeq
    val df = subs.toDF("g", "arm", "o1", "o2")
    val out = Stats.winRatio(df, Seq("g"), col("arm"),
      Seq(col("o1"), col("o2")))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("wins"), r.getAs[Long]("losses"),
          r.getAs[Long]("ties")))).toMap
    for (g <- Seq("g0", "g1")) {
      val ts = subs.filter(s => s._1 == g && s._2).map(s => (s._3, s._4))
      val cs = subs.filter(s => s._1 == g && !s._2).map(s => (s._3, s._4))
      var w = 0L; var l = 0L; var tie = 0L
      for ((t1, t2) <- ts; (c1, c2) <- cs) {
        if (t1 > c1 || (t1 == c1 && t2 > c2)) w += 1
        else if (c1 > t1 || (t1 == c1 && c2 > t2)) l += 1
        else tie += 1
      }
      assert(out(g) == ((w, l, tie)), s"cohort $g")
    }
  }

  test("winRatio tier hierarchy: tier 2 only decides pairs tied on tier 1") {
    import spark.implicits._
    // tier1 separates arms completely ⇒ tier2 (all equal reversed) moot
    val df = Seq(("g", true, 2.0, 0.0), ("g", true, 2.0, 0.0),
      ("g", false, 1.0, 9.0), ("g", false, 1.0, 9.0))
      .toDF("g", "arm", "o1", "o2")
    val r = Stats.winRatio(df, Seq("g"), col("arm"),
      Seq(col("o1"), col("o2"))).head()
    assert(r.getAs[Long]("wins") == 4L && r.getAs[Long]("losses") == 0L)
    assert(r.getAs[Long]("ties") == 0L)
    assert(r.get(r.fieldIndex("win_ratio")) == null) // L = 0
    // all tied on tier1 ⇒ tier2 decides; full ties stay ties
    val df2 = Seq(("g", true, 1.0, 5.0), ("g", true, 1.0, 3.0),
      ("g", false, 1.0, 4.0), ("g", false, 1.0, 3.0))
      .toDF("g", "arm", "o1", "o2")
    val r2 = Stats.winRatio(df2, Seq("g"), col("arm"),
      Seq(col("o1"), col("o2"))).head()
    // (5 vs 4) W, (5 vs 3) W, (3 vs 4) L, (3 vs 3) tie
    assert(r2.getAs[Long]("wins") == 2L && r2.getAs[Long]("losses") == 1L)
    assert(r2.getAs[Long]("ties") == 1L)
    assert(r2.getAs[Double]("win_ratio") == 2.0)
    assert(r2.getAs[Double]("z") ==
      (2.0 - 1.0) / math.sqrt(3.0))
  }

  // --------------------------------------------------------- Jonckheere

  test("jonckheereTerpstra equals naive pairwise-level U sums; ordered data drives z up") {
    import spark.implicits._
    val rs = lcg(17).map(math.abs).take(2 * 600).toSeq
    val subs = rs.grouped(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ("g", (i % 4).toLong, (a % 12).toDouble + (b % 3) * 0.5)
    }.toSeq
    val df = subs.toDF("g", "dose", "x")
    val out = Stats.jonckheereTerpstra(df, Seq(col("g")), col("dose"),
      col("x")).head()
    // naive: JT = Σ_{a<b} [#(x_a < x_b) + ½#(x_a = x_b)]
    var jt2 = 0L
    for (la <- 0L to 3L; lb <- (la + 1) to 3L) {
      val xa = subs.filter(_._2 == la).map(_._3)
      val xb = subs.filter(_._2 == lb).map(_._3)
      for (x1 <- xa; x2 <- xb) {
        if (x1 < x2) jt2 += 2 else if (x1 == x2) jt2 += 1
      }
    }
    assert(out.getAs[Double]("jt") == jt2.toDouble / 2.0)
    assert(math.abs(out.getAs[Double]("z")) < 4.0) // dose uninformative
    // strictly increasing with dose ⇒ JT at its maximum, z large
    val mono = (0 until 200).map(i =>
      ("g", (i % 4).toLong, (i % 4) * 1000.0 + i)).toDF("g", "dose", "x")
    val m = Stats.jonckheereTerpstra(mono, Seq(col("g")), col("dose"),
      col("x")).head()
    val n = 200L; val nl = 50L
    val maxJt = (6L * nl * nl).toDouble // C(4,2) level pairs × 50×50
    assert(m.getAs[Double]("jt") == maxJt)
    assert(m.getAs[Double]("z") > 10.0)
  }

  test("jonckheereTerpstra is layout-invariant and matches kruskalWallis's n") {
    import spark.implicits._
    val df = (1 to 300).map(i =>
      ("g" + (i % 2), (i % 3).toLong, (i * 7 % 23).toDouble))
      .toDF("g", "dose", "x")
    val a = Stats.jonckheereTerpstra(df, Seq(col("g")), col("dose"), col("x"))
      .orderBy("g").collect().toSeq.map(_.toSeq)
    val b = Stats.jonckheereTerpstra(df.repartition(13), Seq(col("g")),
      col("dose"), col("x")).orderBy("g").collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("trendLogRank equals a per-time naive replay; dose-monotone hazard drives z negative") {
    import spark.implicits._
    val rs = lcg(37).map(math.abs).take(2 * 400).toSeq
    val subs = rs.grouped(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ("g", (i % 4).toDouble, (a % 12 + 1).toDouble, b % 3 != 0)
    }.toSeq
    val df = subs.toDF("g", "l", "t", "e")
    val out = Stats.trendLogRank(df, Seq("g"), col("t"), col("e"),
      col("l")).head()
    // naive replay: per distinct time, at-risk per level, U/V terms,
    // the same floor-quantized accumulation
    val times = subs.map(_._3).distinct.sorted
    var qu = 0L; var qv = 0L
    for (t <- times) {
      val atRisk = subs.filter(_._3 >= t)
      val nl = (0 to 3).map(l => atRisk.count(_._2 == l.toDouble).toLong)
      val dl = (0 to 3).map(l =>
        subs.count(s => s._3 == t && s._4 && s._2 == l.toDouble).toLong)
      val n = nl.sum.toDouble; val d = dl.sum.toDouble
      val sd = (0 to 3).map(l => l * dl(l).toDouble).sum
      val sn = (0 to 3).map(l => l * nl(l).toDouble).sum
      val sn2 = (0 to 3).map(l => l.toDouble * l * nl(l)).sum
      val uT = sd - d / n * sn
      val cT = if (n > 1 && d > 0) d * (n - d) / (n * n * (n - 1.0)) else 0.0
      val vT = cT * (n * sn2 - sn * sn)
      qu += math.floor(uT * 1e9).toLong
      qv += math.floor(vT * 1e9).toLong
    }
    assert(out.getAs[Double]("u") == qu.toDouble / 1e9)
    assert(out.getAs[Double]("v") == qv.toDouble / 1e9)
    assert(math.abs(out.getAs[Double]("z")) < 4.0) // dose uninformative
    // higher dose ⇒ shorter durations: events at high doses come early,
    // so U (scored O−E) goes positive — a strong monotone trend
    val mono = (0 until 400).map { i =>
      val l = i % 4
      ("g", l.toDouble, (20 - 4 * l + i % 3).toDouble, true)
    }.toDF("g", "l", "t", "e")
    val m = Stats.trendLogRank(mono, Seq("g"), col("t"), col("e"),
      col("l")).head()
    assert(m.getAs[Double]("z") > 5.0,
      s"monotone hazard not detected: z=${m.getAs[Double]("z")}")
  }

  test("smr: pooled-cohort identity (SMR == 1 up to quantization); naive replay per group") {
    import spark.implicits._
    val rs = lcg(41).map(math.abs).take(2 * 400).toSeq
    val subs = rs.grouped(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ("g" + (i % 3), (a % 15 + 1).toDouble, b % 3 != 0)
    }.toSeq
    val df = subs.toDF("g", "t", "e")
    // identity: Σᵢ Ĥ(tᵢ) = Σ_t d_t when the "group" IS the pool
    val one = Stats.smr(df.withColumn("g", lit("all")), Seq("g"),
      col("t"), col("e")).head()
    val o = one.getAs[Long]("o")
    assert(math.abs(one.getAs[Double]("e") - o.toDouble) < 1e-6)
    assert(math.abs(one.getAs[Double]("smr") - 1.0) < 1e-6)
    // naive replay per group against the pooled hazard
    val n = subs.size
    val grid = subs.groupBy(_._2).map { case (t, xs) =>
      (t, xs.count(_._3).toLong, xs.count(!_._3).toLong)
    }.toSeq.sortBy(_._1)
    var used = 0L; var h = 0.0
    val hSteps = grid.map { case (t, d, c) =>
      h = h + d.toDouble / (n - used); used += d + c; (t, h)
    }
    def hAt(x: Double): Double = hSteps.foldLeft(0.0) {
      case (acc, (t, s)) => if (t <= x) s else acc }
    val out = Stats.smr(df, Seq("g"), col("t"), col("e")).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("o"),
        r.getAs[Double]("e"), r.getAs[Double]("smr")))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val mine = subs.filter(_._1 == g)
      val oG = mine.count(_._3).toLong
      val eQ = mine.map(s => math.floor(hAt(s._2) * 1e9).toLong).sum
      assert(out(g)._1 == oG)
      assert(out(g)._2 == eQ.toDouble / 1e9)
      assert(out(g)._3 == oG.toDouble / (eQ.toDouble / 1e9))
    }
  }

  test("survivalCalibration: uncensored deciles read the empirical event fraction; predictions average exactly") {
    import spark.implicits._
    // all events ⇒ KM at h is exactly 1 − fraction(t ≤ h) per decile
    val subs = (0 until 200).map { i =>
      ("g", (i % 20 + 1).toDouble, true, (i % 50) / 50.0, f"id$i%03d")
    }
    val df = subs.toDF("g", "t", "e", "pred", "sid")
    val out = Concordance.survivalCalibration(df, Seq("g"), col("t"),
      col("e"), col("pred"), col("sid"), horizon = 10.0, bins = 4)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(50L, 50L, 50L, 50L))
    // replay the deterministic (pred, sid) ntile to locate each bin's
    // members, then check observed == its empirical fraction ≤ h
    val ranked = subs.sortBy(s => (s._4, s._5))
    val binOf = ranked.zipWithIndex.map { case (s, ix) => s -> (ix / 50 + 1) }
    for (b <- 1 to 4) {
      val members = binOf.filter(_._2 == b).map(_._1)
      val frac = members.count(_._2 <= 10.0).toDouble / members.size
      val row = out(b - 1)
      // the KM product telescopes to the empirical fraction exactly in
      // ℝ; in floats each factor rounds, so compare to 1e-12
      assert(math.abs(row.getAs[Double]("observed") - frac) < 1e-12,
        s"bin $b observed")
      val qp = members.map(s => math.floor(s._4 * 1e12).toLong).sum
      assert(row.getAs[Double]("mean_pred") ==
        (qp.toDouble / 1e12) / members.size, s"bin $b mean_pred")
    }
  }

  test("partialAuc: fpr=1 equals full AUC; naive replay on the hard-negative pool") {
    import spark.implicits._
    val rs = lcg(47).map(math.abs).take(2 * 400).toSeq
    val subs = rs.grouped(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ("g", (a % 30).toDouble, b % 3 == 0, i.toLong)
    }.toSeq
    val df = subs.toDF("g", "s", "l", "id")
    val full = Stats.auc(df, Seq(col("g")), col("s"), col("l"))
      .head().getAs[Double]("auc")
    val p1 = Stats.partialAuc(df, Seq("g"), col("s"), col("l"),
      col("id"), fpr = 1.0).head()
    assert(p1.getAs[Double]("pauc") == full)
    assert(p1.getAs[Long]("k_neg") == p1.getAs[Long]("n_neg"))
    // naive replay at fpr = 0.3: hard negatives by (score desc, id)
    val out = Stats.partialAuc(df, Seq("g"), col("s"), col("l"),
      col("id"), fpr = 0.3).head()
    val negs = subs.filter(!_._3).sortBy(s => (-s._2, s._4))
    val k = (negs.size * 0.3).toInt
    val kept = negs.take(k).map(_._2)
    val poss = subs.filter(_._3).map(_._2)
    var num = 0.0
    for (x <- poss; y <- kept)
      num += (if (x > y) 1.0 else if (x == y) 0.5 else 0.0)
    assert(out.getAs[Long]("k_neg") == k)
    assert(out.getAs[Double]("pauc") ==
      num / (poss.size.toDouble * k))
    // hard negatives only ⇒ pAUC can only be ≤ the full ranking's AUC
    assert(out.getAs[Double]("pauc") <= full)
  }

  test("requiredSampleSize replays the design formula; smaller mde needs more subjects") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i % 10 < 3)).toDF("g", "o")
    def run(mde: Double) = Stats.requiredSampleSize(df, Seq(col("g")),
      col("o"), mde).head().getAs[Long]("n_required")
    val got = run(0.02)
    // replay: p̂ = 0.3
    val p1 = 0.3; val p2 = 0.32; val pBar = (p1 + p2) / 2.0
    val num = 1.959963984540054 * math.sqrt(2.0 * pBar * (1.0 - pBar)) +
      0.8416212335705798 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    assert(got == math.ceil(num * num / (0.02 * 0.02)).toLong)
    assert(got > 8000L && got < 9500L, s"implausible n: $got")
    assert(run(0.01) > got && run(0.05) < got)
    // unsupported alpha raises
    val ex = intercept[IllegalArgumentException] {
      Stats.requiredSampleSize(df, Seq(col("g")), col("o"), 0.02,
        alpha = 0.10)
    }
    assert(ex.getMessage.contains("literal z table"))
  }

  // ----------------------------------------------------- group-sequential

  test("groupSequentialTest: OBF rejects late what Pocock rejects early") {
    import spark.implicits._
    // effect appears from look 1: moderate uplift. Pocock's flat 2.413
    // boundary rejects as soon as z crosses it; OBF's early looks are
    // much stricter (4.56 at k=1) and only relax near the end.
    val rows = (1 to 5).flatMap { look =>
      (1 to 400).map { i =>
        val treated = i % 2 == 0
        // treated converts at 60%, control at 40% (deterministic grid)
        val conv = if (treated) (i % 10) < 6 else (i % 10) < 4
        ("g", look, treated, conv)
      }
    }
    val df = rows.toDF("g", "look", "arm", "conv")
    def looks(kind: String) = Stats.groupSequentialTest(df, Seq("g"),
      col("look"), col("arm"), col("conv"), looks = 5, kind = kind)
      .orderBy("look").collect()
      .map(r => (r.getAs[Int]("look"), r.getAs[Double]("boundary"),
        r.getAs[Boolean]("reject")))
    val obf = looks("obf"); val pk = looks("pocock")
    // boundaries: OBF strictly decreasing, Pocock flat
    assert(obf.map(_._2).sliding(2).forall(p => p(0) > p(1)))
    assert(pk.map(_._2).distinct.length == 1)
    val firstObf = obf.find(_._3).map(_._1)
    val firstPk = pk.find(_._3).map(_._1)
    assert(firstPk.isDefined, "Pocock must reject under a real effect")
    assert(firstObf.isDefined, "OBF must reject by the final look")
    assert(firstPk.get <= firstObf.get,
      s"Pocock ($firstPk) rejects no later than OBF ($firstObf)")
    assert(firstObf.get > 1, "OBF must NOT reject at the earliest look")
  }

  test("groupSequentialTest boundary values are the published K=5 constants") {
    import spark.implicits._
    val df = (1 to 5).flatMap(k => Seq(("g", k, true, true),
      ("g", k, false, false))).toDF("g", "look", "arm", "conv")
    val obf = Stats.groupSequentialTest(df, Seq("g"), col("look"),
      col("arm"), col("conv"), looks = 5, kind = "obf")
      .orderBy("look").collect().map(_.getAs[Double]("boundary"))
    assert(obf.zipWithIndex.forall { case (b, i) =>
      b == 2.040 * math.sqrt(5.0 / (i + 1)) })
    val pk = Stats.groupSequentialTest(df, Seq("g"), col("look"),
      col("arm"), col("conv"), looks = 5, kind = "pocock")
      .head().getAs[Double]("boundary")
    assert(pk == 2.413)
    // α = 0.01 tables: uniformly stricter than α = 0.05
    val pk01 = Stats.groupSequentialTest(df, Seq("g"), col("look"),
      col("arm"), col("conv"), looks = 5, kind = "pocock", alpha = 0.01)
      .head().getAs[Double]("boundary")
    assert(pk01 == 2.986 && pk01 > pk)
    val obf01 = Stats.groupSequentialTest(df, Seq("g"), col("look"),
      col("arm"), col("conv"), looks = 5, kind = "obf", alpha = 0.01)
      .orderBy("look").collect().map(_.getAs[Double]("boundary"))
    assert(obf01.zip(obf).forall { case (a, b) => a > b })
    assert(obf01.zipWithIndex.forall { case (b, i) =>
      b == 2.621 * math.sqrt(5.0 / (i + 1)) })
    // out-of-range look fails fast
    val bad = Seq(("g", 9, true, true)).toDF("g", "look", "arm", "conv")
    val ex = intercept[Exception] {
      Stats.groupSequentialTest(bad, Seq("g"), col("look"), col("arm"),
        col("conv"), looks = 5).collect()
    }
    assert(ex.getMessage.contains("look outside 1..5"))
  }
}
