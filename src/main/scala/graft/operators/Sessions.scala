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
}
