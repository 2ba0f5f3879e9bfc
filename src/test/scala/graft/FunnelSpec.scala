package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel semantics ([[Sessions.funnelStepTimes]] /
  * [[Sessions.funnelSummary]]): step i counts only at-or-after step
  * i−1's earliest completion, never-reached steps null-propagate, ties
  * at the same timestamp count, and the optional per-step gap cap
  * drops late conversions. */
class FunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("funnel-spec")
  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val steps = Seq("view", "click", "purchase")

  test("step ordering: only conversions at-or-after the previous step count") {
    import spark.implicits._
    val ev = Seq(
      // u1: clean full funnel
      (1L, ts("2021-01-01 10:00:00"), "view"),
      (1L, ts("2021-01-01 10:05:00"), "click"),
      (1L, ts("2021-01-01 10:10:00"), "purchase"),
      // u2: click BEFORE the first view and never after → funnel stops
      // at view even though a purchase exists later
      (2L, ts("2021-01-01 09:00:00"), "click"),
      (2L, ts("2021-01-01 10:00:00"), "view"),
      (2L, ts("2021-01-01 11:00:00"), "purchase"),
      // u3: view and click at the SAME instant (batch-loaded) → counts
      (3L, ts("2021-01-01 10:00:00"), "view"),
      (3L, ts("2021-01-01 10:00:00"), "click"),
      // u4: never views → nothing counts despite click+purchase
      (4L, ts("2021-01-01 10:00:00"), "click"),
      (4L, ts("2021-01-01 10:01:00"), "purchase"),
      // u5: earliest view is what step 2 gates on — a click between two
      // views converts (>= FIRST view)
      (5L, ts("2021-01-01 10:00:00"), "view"),
      (5L, ts("2021-01-01 10:30:00"), "click"),
      (5L, ts("2021-01-01 11:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val times = Sessions.funnelStepTimes(ev, col("user_id"), col("ts"),
        col("event_type"), steps)
      .collect().map(r => r.getLong(0) ->
        (0 to 2).map(i => Option(r.getTimestamp(i + 1)))).toMap
    assert(times(1L).forall(_.nonEmpty))
    assert(times(2L) == Seq(Some(ts("2021-01-01 10:00:00")), None, None))
    assert(times(3L) == Seq(Some(ts("2021-01-01 10:00:00")),
      Some(ts("2021-01-01 10:00:00")), None))
    assert(times(4L) == Seq(None, None, None))
    assert(times(5L).take(2).forall(_.nonEmpty) && times(5L)(2).isEmpty)

    val summary = Sessions.funnelSummary(ev, col("user_id"), col("ts"),
        col("event_type"), steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(summary.toSeq == Seq(
      (0, "view", 4L, 1.0), (1, "click", 3L, 0.75),
      (2, "purchase", 1L, 0.25)))
  }

  test("per-step gap cap drops late conversions; layout-independent") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2021-01-01 10:00:00"), "view"),
      (1L, ts("2021-01-01 10:04:00"), "click"),   // within 5 min
      (2L, ts("2021-01-01 10:00:00"), "view"),
      (2L, ts("2021-01-01 10:06:00"), "click"))   // past 5 min
      .toDF("user_id", "ts", "event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sessions.funnelSummary(d, col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click"),
          maxStepGapSeconds = Some(300L))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val out = run(ev)
    assert(out == Seq(("view", 2L), ("click", 1L)))
    assert(run(ev.repartition(7)) == out)
  }
}
