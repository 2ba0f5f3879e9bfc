package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast range-join extension (plans.RangeJoin): the optimizer
  * rule must rewrite point-in-interval inner joins — however the query was
  * written — to BroadcastRangeJoinExec, and the exec must return exactly
  * the rows the naive (nested-loop) join returns, for every boundary
  * flavor, overlap pattern, null placement, and column order.
  */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("range-join-spec")

  override def afterAll(): Unit = spark.stop()

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Probe values 0..120 plus nulls; intervals with overlaps, point
    * intervals, empty intervals (lo > hi), and null bounds.
    */
  private def fixtures: (DataFrame, DataFrame) = {
    val probe = spark.createDataFrame(
      ((0 to 120).map(i => (i.toLong, Some(i % 97))) ++
        Seq((900L, None), (901L, None))))
      .toDF("pid", "v")
    val ivals = spark.createDataFrame(Seq(
      ("a", Some(0), Some(10)),
      ("b", Some(5), Some(25)),        // overlaps a
      ("c", Some(25), Some(25)),       // point interval
      ("d", Some(60), Some(40)),       // empty (lo > hi)
      ("e", Some(40), Some(96)),       // wide
      ("f", None, Some(50)),           // null lo — never matches
      ("g", Some(50), None)            // null hi — never matches
    )).toDF("name", "lo", "hi")
    (probe, ivals)
  }

  /** Reference result computed row-at-a-time on the driver. */
  private def naive(probe: Seq[(Long, Option[Int])],
      ivals: Seq[(String, Option[Int], Option[Int])],
      loIncl: Boolean, hiIncl: Boolean): Set[(Long, String)] =
    (for {
      (pid, Some(v)) <- probe
      (name, Some(lo), Some(hi)) <- ivals
      if (if (loIncl) v >= lo else v > lo) && (if (hiIncl) v <= hi else v < hi)
    } yield (pid, name)).toSet

  private val probeRows =
    (0 to 120).map(i => (i.toLong, Some(i % 97))) ++ Seq((900L, None), (901L, None))
  private val ivalRows = Seq(
    ("a", Some(0), Some(10)), ("b", Some(5), Some(25)), ("c", Some(25), Some(25)),
    ("d", Some(60), Some(40)), ("e", Some(40), Some(96)),
    ("f", Option.empty[Int], Some(50)), ("g", Some(50), Option.empty[Int]))

  test("BETWEEN join rewrites to BroadcastRangeJoin and matches the naive join") {
    val (probe, ivals) = fixtures
    val joined = probe.join(ivals,
      col("v") >= col("lo") && col("v") <= col("hi"))
    val p = physical(joined)
    assert(p.contains("BroadcastRangeJoin"), s"no range join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    val got = joined.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive(probeRows, ivalRows, loIncl = true, hiIncl = true))
    // original left-then-right column order preserved
    assert(joined.columns.toSeq === Seq("pid", "v", "name", "lo", "hi"))
  }

  test("strict bounds (v > lo AND v < hi) keep exclusivity") {
    val (probe, ivals) = fixtures
    val joined = probe.join(ivals, col("v") > col("lo") && col("v") < col("hi"))
    assert(physical(joined).contains("BroadcastRangeJoin"))
    val got = joined.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive(probeRows, ivalRows, loIncl = false, hiIncl = false))
  }

  test("interval side on the LEFT still rewrites, column order intact") {
    val (probe, ivals) = fixtures
    val joined = ivals.join(probe, col("v") >= col("lo") && col("v") <= col("hi"))
    assert(physical(joined).contains("BroadcastRangeJoin"))
    assert(joined.columns.toSeq === Seq("name", "lo", "hi", "pid", "v"))
    val got = joined.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive(probeRows, ivalRows, loIncl = true, hiIncl = true))
  }

  test("residual predicates survive the rewrite (evaluated per match)") {
    val (probe, ivals) = fixtures
    val joined = probe.join(ivals,
      col("v") >= col("lo") && col("v") <= col("hi") && col("name") =!= "b" &&
        (col("pid") + col("lo")) % 2 === 0)
    assert(physical(joined).contains("BroadcastRangeJoin"))
    val got = joined.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = naive(probeRows, ivalRows, loIncl = true, hiIncl = true)
      .filter { case (pid, name) =>
        val lo = ivalRows.find(_._1 == name).get._2.get
        name != "b" && (pid + lo) % 2 == 0
      }
    assert(got === want)
  }

  test("pure SQL text triggers the same rewrite") {
    val (probe, ivals) = fixtures
    probe.createOrReplaceTempView("rj_probe")
    ivals.createOrReplaceTempView("rj_ivals")
    val q = spark.sql(
      "SELECT name, COUNT(*) AS n FROM rj_probe JOIN rj_ivals " +
        "ON v BETWEEN lo AND hi GROUP BY name ORDER BY name")
    assert(physical(q).contains("BroadcastRangeJoin"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = naive(probeRows, ivalRows, loIncl = true, hiIncl = true)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("build side over the broadcast threshold is left to Spark's planner") {
    val (probe, ivals) = fixtures
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = probe.join(ivals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      val p = physical(joined)
      assert(!p.contains("BroadcastRangeJoin"), s"rewrite fired despite -1 threshold:\n$p")
      // correctness unchanged on the fallback plan
      val got = joined.select("pid", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === naive(probeRows, ivalRows, loIncl = true, hiIncl = true))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("LEFT OUTER rewrites when the probe is the outer side; matches naive") {
    val (probe, ivals) = fixtures
    val outer = probe.join(ivals,
      col("v") >= col("lo") && col("v") <= col("hi"), "left")
    assert(physical(outer).contains("BroadcastRangeJoin"))
    val got = outer.select("pid", "name").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val matched = naive(probeRows, ivalRows, loIncl = true, hiIncl = true)
    val matchedIds = matched.map(_._1)
    val want = matched.map { case (pid, n) => (pid, Some(n)) } ++
      probeRows.map(_._1).filterNot(matchedIds).map(pid => (pid, None))
    assert(got === want)
    // every probe row survives, including null-valued probes
    assert(outer.count() >= probeRows.size)
    assert(outer.filter(col("pid") === 900L && col("name").isNull).count() === 1)
  }

  test("LEFT OUTER with the interval side as the outer input is untouched") {
    val (probe, ivals) = fixtures
    // here the preserved side is the interval table — not our shape
    val outer = ivals.join(probe,
      col("v") >= col("lo") && col("v") <= col("hi"), "left")
    assert(!physical(outer).contains("BroadcastRangeJoin"))
  }

  test("other join types and equi-joins are untouched") {
    val (probe, ivals) = fixtures
    val semi = probe.join(ivals,
      col("v") >= col("lo") && col("v") <= col("hi"), "left_semi")
    assert(!physical(semi).contains("BroadcastRangeJoin"))
    val equi = probe.join(ivals, col("v") === col("lo"))
    assert(!physical(equi).contains("BroadcastRangeJoin"))
  }

  test("randomized differential: exec == naive on 500 probes × 40 intervals") {
    val rnd = new scala.util.Random(20260813)
    val pr = (1 to 500).map(i =>
      (i.toLong, if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000))))
    val iv = (1 to 40).map { i =>
      val a = rnd.nextInt(1000)
      val b = a + rnd.nextInt(120) - 10 // some empty
      (s"r$i",
        if (rnd.nextInt(20) == 0) None else Some(a),
        if (rnd.nextInt(20) == 0) None else Some(b))
    }
    val probe = spark.createDataFrame(pr).toDF("pid", "v")
    val ivals = spark.createDataFrame(iv).toDF("name", "lo", "hi")
    val joined = probe.join(ivals, col("v") >= col("lo") && col("v") <= col("hi"))
    assert(physical(joined).contains("BroadcastRangeJoin"))
    val got = joined.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive(pr, iv, loIncl = true, hiIncl = true))
  }

  test("doubles and timestamps order correctly through the exec") {
    val probe = spark.createDataFrame(Seq((1L, 0.5), (2L, 1.5), (3L, 2.5)))
      .toDF("pid", "v")
    val ivals = spark.createDataFrame(Seq(("lowhalf", 0.0, 1.0), ("rest", 1.0, 9.9)))
      .toDF("name", "lo", "hi")
    val j = probe.join(ivals, col("v") >= col("lo") && col("v") <= col("hi"))
    assert(physical(j).contains("BroadcastRangeJoin"))
    assert(j.select("pid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "lowhalf"), (2L, "rest"), (3L, "rest")))

    val ev = spark.createDataFrame(Seq(
      (1L, java.sql.Timestamp.valueOf("2021-01-03 12:00:00")),
      (2L, java.sql.Timestamp.valueOf("2021-02-03 12:00:00"))))
      .toDF("eid", "ts")
    val eras = spark.createDataFrame(Seq(
      ("jan", java.sql.Timestamp.valueOf("2021-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2021-01-31 23:59:59")),
      ("feb", java.sql.Timestamp.valueOf("2021-02-01 00:00:00"),
        java.sql.Timestamp.valueOf("2021-02-28 23:59:59"))))
      .toDF("era", "t0", "t1")
    val je = ev.join(eras, col("ts") >= col("t0") && col("ts") <= col("t1"))
    assert(physical(je).contains("BroadcastRangeJoin"))
    assert(je.select("eid", "era").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "jan"), (2L, "feb")))
  }

  test("intervalOverlapJoin: differential vs naive theta, exactly-once, any grid") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val la = Seq.tabulate(150) { i =>
      val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(60)) }
    val lb = Seq.tabulate(170) { i =>
      val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(60)) }
    val want = (for {
      (ia, sa, ea) <- la; (ib, sb, eb) <- lb
      if sa <= eb && sb <= ea
    } yield (ia, ib)).toSeq.sorted
    for (grid <- Seq(1L, 7L, 64L, 4096L)) {
      val got = graft.operators.Regions.intervalOverlapJoin(
          la.toDF("id_a", "s_a", "e_a"), col("s_a"), col("e_a"),
          lb.toDF("id_b", "s_b", "e_b"), col("s_b"), col("e_b"), grid)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // sorted SEQ compare (not Set): duplicates from multi-cell pairs
      // would be a canonical-cell bug even when the pair set is right
      assert(got == want, s"grid=$grid: ${got.size} vs ${want.size} pairs")
    }
    // touching endpoints overlap (closed intervals)
    val touch = graft.operators.Regions.intervalOverlapJoin(
        Seq((1L, 0L, 10L)).toDF("id_a", "s_a", "e_a"), col("s_a"), col("e_a"),
        Seq((2L, 10L, 20L)).toDF("id_b", "s_b", "e_b"), col("s_b"), col("e_b"),
        grid = 8)
      .count()
    assert(touch == 1L)
    // span > maxCells × grid fails fast instead of silently clipping
    val e = intercept[Exception] {
      graft.operators.Regions.intervalOverlapJoin(
        Seq((1L, 0L, 100000L)).toDF("id_a", "s_a", "e_a"),
        col("s_a"), col("e_a"),
        Seq((2L, 5L, 6L)).toDF("id_b", "s_b", "e_b"), col("s_b"), col("e_b"),
        grid = 4, maxCells = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxCells")))
  }
}
