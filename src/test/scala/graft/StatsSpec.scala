package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("stats-spec")
  override def afterAll(): Unit = spark.stop()

  test("exact moments agree with built-ins to 1e-12 and are bit-stable across partitionings") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (if (i % 3 == 0) "a" else "b", i % 47, (i * 7) % 13))
    val df = rows.toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.exactMoments(d, Seq(col("g")), col("x"), col("y"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6)))).toMap
    val out = run(df)
    // differential vs Spark's own floating aggregates (tolerance — their
    // merge order is plan-dependent, which is the point of this operator)
    val ref = df.groupBy("g").agg(
        avg("x"), var_samp("x"), stddev_samp("x"), corr("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for ((g, (_, _, mean, varx, std, corr)) <- out) {
      assert(math.abs(mean - ref(g)._1) < 1e-12)
      assert(math.abs(varx - ref(g)._2) < 1e-10)
      assert(math.abs(std - ref(g)._3) < 1e-12)
      assert(math.abs(corr - ref(g)._4) < 1e-12)
    }
    // bit-identical under any physical layout: exact integer moments are
    // order-independent and the float tail is a fixed tree
    assert(run(df.repartition(13)) == out)
    assert(run(df.coalesce(1)) == out)
  }

  test("typed Aggregator face is bit-identical to the Column face") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (if (i % 2 == 0) "e" else "o", i % 31, (i * 3) % 17))
    val df = rows.toDF("g", "x", "y")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val column = canon(Stats.exactMoments(df, Seq(col("g")), col("x"), col("y")))
    val typed = canon(Stats.exactMomentsTyped(df, col("g"), col("x"), col("y")))
    assert(typed == column, "the two faces must agree bit for bit")
    assert(canon(Stats.exactMomentsTyped(df.repartition(11), col("g"), col("x"), col("y")))
      == column, "aggregator merge must be layout-independent")
  }

  test("profile: exact per-column stats in one pass; typed (not lexicographic) min/max") {
    import spark.implicits._
    val df = Seq((9, Some("b"), "x"), (10, None, "y"), (2, Some("a"), "y"))
      .toDF("num", "maybe", "cat")
    val out = Stats.profile(df, Seq("num", "maybe", "cat"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    // numeric min/max: 2 < 9 < 10 — a lexicographic compare would say "10" < "2"
    assert(out("num") == ((3L, 0L, 3L, "2", "10")))
    assert(out("maybe") == ((3L, 1L, 2L, "a", "b")), "distinct must exclude nulls")
    assert(out("cat") == ((3L, 0L, 2L, "x", "y")))
  }

  test("null inputs: pairwise deletion keeps n consistent with the sums") {
    import spark.implicits._
    val df = Seq[(String, Option[Int], Option[Int])](
      ("g", Some(1), Some(2)), ("g", None, Some(9)), ("g", Some(3), None),
      ("g", Some(5), Some(4)), ("empty", None, None))
      .toDF("g", "x", "y")
    val out = Stats.exactMoments(df, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // only the two complete (x, y) rows count — n must match the sums
    assert(out("g").getLong(1) == 2L)
    assert(out("g").getLong(2) == 6L) // 1 + 5
    assert(out("g").getDouble(4) == 8.0) // var_samp of {1, 5}
    assert(!out.contains("empty"), "an all-null group has no complete pairs")
  }

  test("quantileProfile: exact order statistics, partition-invariant, long form") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 100).map(i => ("a", i)) ++
      (1 to 777).map(_ => ("b", rng.nextInt(10000)))
    val df = rows.toDF("g", "v")
    val probs = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.quantileProfile(d, Seq(col("g")), col("v"), probs)
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("prob")) ->
          r.getAs[Int]("value")).toMap
    val out = run(df)
    // group "a" is 1..100: quantiles are known order statistics
    assert(out(("a", 0.0)) == 1 && out(("a", 1.0)) == 100)
    assert(out(("a", 0.5)) == 50 && out(("a", 0.25)) == 25)
    // accuracy (10k) ≥ n: the sketch is EXACT, so any partitioning of the
    // same rows returns identical elements — the mergeability contract
    assert(run(df.repartition(13)) == out)
    assert(out.keySet.map(_._1) == Set("a", "b") &&
      out.size == 2 * probs.size)
    // every reported value is a dataset element of its group (discrete
    // quantile, never an interpolation)
    val bVals = rows.collect { case ("b", v) => v }.toSet
    probs.foreach(p => assert(bVals.contains(out(("b", p)))))
  }

  test("single-row group: null variance and corr, not a divide-by-zero") {
    import spark.implicits._
    val df = Seq(("solo", 5, 2), ("pair", 1, 1), ("pair", 3, 9)).toDF("g", "x", "y")
    val out = Stats.exactMoments(df, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("solo").isNullAt(4) && out("solo").isNullAt(5) && out("solo").isNullAt(6))
    assert(out("pair").getDouble(4) == 2.0) // var_samp of {1,3}
    // constant-x group: zero variance → corr undefined (null)
    val const = Seq(("c", 4, 1), ("c", 4, 2)).toDF("g", "x", "y")
    val c = Stats.exactMoments(const, Seq(col("g")), col("x"), col("y")).collect()(0)
    assert(c.getDouble(4) == 0.0 && c.isNullAt(6))
  }

  test("incremental rollup: merged batch partials == one-shot, bit for bit, any slicing") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (0 until 3000).map(i =>
      (s"g${i % 5}", rng.nextInt(1000), rng.nextInt(100), i))
    val df = rows.toDF("g", "x", "y", "i")
    val whole = Stats.exactMoments(df, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

    // three arbitrary, uneven batch slicings — including one where some
    // groups are entirely absent from a batch
    val slicings = Seq(
      Seq(col("i") % 2 === 0, col("i") % 2 === 1),
      Seq(col("i") < 100, col("i") >= 100),
      Seq(col("g") === "g0", col("g") =!= "g0"))
    slicings.foreach { preds =>
      val partials = preds.map(p =>
        Stats.momentPartials(df.filter(p), Seq(col("g")), col("x"), col("y")))
      val merged = Stats.momentsFromPartials(
          Stats.mergeMomentPartials(partials, Seq("g")))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(merged == whole,
        s"incremental != one-shot under slicing $preds")
    }
  }
}
