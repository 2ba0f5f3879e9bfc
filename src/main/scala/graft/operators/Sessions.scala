package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of a key belong to one
  * session while the gap between neighbors stays within `maxGap` — the
  * standard event-stream operator (and the batch face of Structured
  * Streaming's native `session_window`, which StreamingSpec proves gives
  * the same sessions on the same data).
  *
  * Plan shape: ONE hash shuffle on the key, then lag + running-sum over
  * the same sort order — Spark stacks both window functions over a single
  * sort with no second exchange. Gap arithmetic is in microseconds
  * (`unix_micros`), mirrored exactly by DuckDB's `epoch_us` in the
  * registered query's oracle. */
object Sessions {

  /** Tag every row with its 0-based `session_idx` within the key group: a
    * session starts at the first event and whenever the gap since the
    * previous event EXCEEDS `maxGapSeconds` — a gap of exactly maxGap
    * stays in one session, matching `session_window`, whose touching
    * windows merge (StreamingSpec's parity fixture includes an
    * exactly-boundary pair to pin this empirically). Events tied on
    * (key, ts) always share a session (their mutual gap is zero), so the
    * output is deterministic even though tie order is not. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
      maxGapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = unix_micros(col(tsCol)) -
      unix_micros(lag(col(tsCol), 1).over(byKey))
    df.withColumn("__gap_us", gapUs)
      .withColumn("session_idx",
        sum(when(col("__gap_us").isNull ||
            col("__gap_us") > maxGapSeconds * 1000000L, 1L).otherwise(0L))
          .over(run) - 1)
      .drop("__gap_us")
  }

  /** Per-session rollup: event count, first/last timestamps, and an
    * EXACT value total (decimal-summed, one final double conversion — a
    * float SUM would be accumulation-order-dependent and engine-
    * divergent). */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
      maxGapSeconds: Long, valueCol: Column): DataFrame =
    sessionize(df, keys, tsCol, maxGapSeconds)
      .groupBy((keys :+ "session_idx").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("sum_value"))

  // ------------------------------------------------------------- funnels

  /** Ordered-funnel step times per user: `step<i>_ts` is the earliest
    * time the user performed `steps(i)` AT OR AFTER completing step
    * i−1 (an event at the exact same timestamp counts — simultaneous
    * batch-loaded events shouldn't break a funnel; a user who never
    * reaches step i−1 has every later step NULL via three-valued
    * propagation). With `maxStepGapSeconds` set, a step only counts
    * within that many seconds of the previous step's time.
    *
    * Plan shape: the [[sessionize]] contract — ONE hash exchange on the
    * user key, then k stacked window-min passes over the same
    * partitioning (no second exchange, no self-joins: the naive
    * formulation joins events back per step, shuffling the event table
    * k times), then one groupBy collapse to a row per user. Every
    * window is partitioned — the [[Ranks]] ban holds. */
  def funnelStepTimes(events: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, steps: Seq[String],
      maxStepGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(userCol)
    val tagged = steps.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val afterPrev = if (i == 0) lit(true) else {
        val base = tsCol >= col(s"step${i - 1}_ts")
        maxStepGapSeconds match {
          case Some(g) => base &&
            unix_micros(tsCol) <=
              unix_micros(col(s"step${i - 1}_ts")) + g * 1000000L
          case None => base
        }
      }
      df.withColumn(s"step${i}_ts",
        min(when(typeCol === st && afterPrev, tsCol)).over(w))
    }
    tagged.groupBy(userCol.as("user"))
      .agg(first(col("step0_ts")).as("step0_ts"),
        steps.indices.drop(1)
          .map(i => first(col(s"step${i}_ts")).as(s"step${i}_ts")): _*)
  }

  /** Funnel summary: one row per step with the number of users who
    * reached it and the conversion rate from step 0 — exact counts, one
    * IEEE division each, so the registered query (c_funnel_steps) is
    * oracle-exact. */
  def funnelSummary(events: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, steps: Seq[String],
      maxStepGapSeconds: Option[Long] = None): DataFrame = {
    val times = funnelStepTimes(events, userCol, tsCol, typeCol, steps,
      maxStepGapSeconds)
    val counts = times.agg(
      count(when(col("step0_ts").isNotNull, lit(1))).as("c0"),
      steps.indices.drop(1).map(i =>
        count(when(col(s"step${i}_ts").isNotNull, lit(1))).as(s"c$i")): _*)
    // the counts live on ONE row — conversion is computed right there
    // (no window, certainly no partition-less one)
    counts.select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i).as("step_idx"), lit(st).as("step"),
          col(s"c$i").as("users"),
          (col(s"c$i").cast("double") / col("c0").cast("double"))
            .as("conversion"))
      }: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.users"),
        col("s.conversion"))
      .orderBy("step_idx")
  }
}
