package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality
import graft.operators.Quality._

/** Data-quality gate ([[Quality]]): per-kind violation semantics on a
  * deliberately dirty fixture, the one-aggregation-pass plan property,
  * and the enforce (promote-or-abort) face. */
class QualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("quality-spec")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def dirty = Seq(
    (Some(1L), "ok", 5.0, "AB-1"),
    (Some(2L), "ok", 500.0, "AB-2"),    // range violation
    (Some(2L), "bad", 6.0, "XY-3"),     // dup id, set violation, regex violation
    (None, "ok", 7.0, "AB-4"),          // null id
    (Some(4L), null, 8.0, null))        // nulls exempt from set/regex
    .toDF("id", "status", "v", "code")

  private def reportMap(cs: Seq[Constraint]): Map[String, (Long, Boolean)] =
    Quality.report(dirty, cs).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(4))).toMap

  test("each constraint kind counts exactly its violations; nulls exempt where documented") {
    val m = reportMap(Seq(
      NotNull("id"), InRange("v", 0.0, 100.0), InSet("status", Seq("ok")),
      Matches("code", "^AB-"), Unique(Seq("id"))))
    assert(m("not_null(id)") == (1L, false))
    assert(m("in_range(v,0.0,100.0)") == (1L, false))
    assert(m("in_set(status)") == (1L, false))      // null status exempt
    assert(m("matches(code)") == (1L, false))       // null code exempt
    assert(m("unique(id)") == (1L, false))          // one row beyond first dup
  }

  test("a fully clean table passes everything; total is carried on every row") {
    val rows = Quality.report(dirty.filter("id = 1"),
      Seq(NotNull("id"), Unique(Seq("id")))).collect()
    assert(rows.forall(_.getBoolean(4)))
    assert(rows.forall(_.getLong(3) == 1L))
  }

  test("N constraints run as ONE aggregation job (single scan, no per-rule pass)") {
    val df = Quality.report(dirty, Seq(
      NotNull("id"), InRange("v", 0.0, 100.0), InSet("status", Seq("ok")),
      Matches("code", "^AB-"), Unique(Seq("id")), Unique(Seq("id", "status"))))
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans <= 1, s"expected one scan of the input, saw $scans")
  }

  test("enforce throws naming every failed rule, passes a clean gate through") {
    val e = intercept[RuntimeException] {
      Quality.enforce(dirty, Seq(NotNull("id"), InSet("status", Seq("ok"))))
    }
    assert(e.getMessage.contains("not_null(id)") &&
      e.getMessage.contains("in_set(status)"))
    val through = Quality.enforce(dirty, Seq(InRange("v", 0.0, 1000.0)))
    assert(through.count() == 5)
  }

  test("benford: exact digit counts; geometric data conforms, uniform does not") {
    import org.apache.spark.sql.functions._
    // hand case: digits 1,1,1,2,3,9; 0.5 and null drop
    val hand = Seq[java.lang.Double](10.0, 11.5, 19.0, 2.0, 3.9, 999.0,
      0.5, null).map(Tuple2("g", _)).toDF("g", "x")
    val h = Quality.benford(hand, Seq(col("g")), col("x")).collect().head
    assert(h.getLong(1) == 6L, "n excludes <1 and null")
    assert((1 to 9).map(d => h.getLong(1 + d)) ==
      Seq(3L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 1L), s"counts ${h.toSeq}")
    // multi-magnitude geometric growth is the Benford-generating shape;
    // a uniform 5-digit column concentrates first digits near flat
    val rnd = new scala.util.Random(7)
    val geo = (0 until 3000).map(_ =>
      ("geo", math.pow(10.0, rnd.nextDouble() * 5 + 0.1)))
    val uni = (0 until 3000).map(_ =>
      ("uni", 10000.0 + rnd.nextInt(90000).toDouble))
    val out = Quality.benford((geo ++ uni).toDF("g", "x"),
        Seq(col("g")), col("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(11)).toMap
    assert(out("geo") < 30.0, s"geometric chi2 ${out("geo")}")
    assert(out("uni") > 500.0, s"uniform chi2 ${out("uni")}")
    assert(out("uni") > out("geo") * 10)
  }
}
