package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordering primitives.
  *
  * `Window.orderBy(...)` with no partition key is Spark's single-partition
  * trap: `WindowExec` moves EVERY row to one task ("No Partition Defined
  * for Window operation"), serializing the job exactly when the data gets
  * big enough to matter. [[globalRowNumber]] computes the same rank with
  * the classic two-phase shape instead: range-repartition on the sort key
  * (sampled bounds → balanced partitions), rank WITHIN each partition
  * (the window partitions by `spark_partition_id()`, so it is parallel),
  * then add per-partition prefix offsets. Range partitions are ordered by
  * the partitioner, so offset + local rank IS the global rank.
  *
  * Everything is one lazy plan in Tungsten/whole-stage codegen — no RDD
  * round-trip, no row serde, no driver collect. The offsets branch and
  * the ranking branch share the SAME range exchange (ReuseExchange
  * dedupes the identical subtrees), so the sampled partition bounds are
  * computed once and both branches see identical pids — and because the
  * partition count is explicit, AQE never coalesces the stage differently
  * per branch. The prefix sum itself is a theta self-join over the
  * ≤`parts`-row count table (≤ parts² ≈ 1k pairs — constant), broadcast
  * back onto the data.
  *
  * Correctness requires `order` to be a TOTAL order (include a unique
  * tiebreak column, e.g. the representative id) — equal keys split across
  * a range boundary would otherwise be numbered nondeterministically.
  */
object Ranks {

  /** Equivalent of `row_number().over(Window.orderBy(order: _*))` — 1-based,
    * emitted as LongType `outCol` — without a single-partition WindowExec. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val withPid = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    // per-partition sizes (≤ `parts` rows) → prefix offsets via a tiny
    // theta self-join (no window, no collect)
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    // rank within each range partition (parallel — the window IS
    // partitioned) and shift by the broadcast offset
    val local = row_number().over(
      Window.partitionBy("__pid").orderBy(order: _*)).cast("long")
    withPid.withColumn("__lrk", local)
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }
}
