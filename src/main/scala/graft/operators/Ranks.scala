package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe global ordering primitives.
  *
  * `Window.orderBy(...)` with no partition key is Spark's single-partition
  * trap: `WindowExec` moves EVERY row to one task ("No Partition Defined
  * for Window operation"), serializing the job exactly when the data gets
  * big enough to matter. [[globalRowNumber]] computes the same rank with
  * the classic two-phase shape instead: range-repartition on the sort key
  * (sampled bounds → balanced partitions), sort within partitions, then
  * assign contiguous indices from per-partition counts + prefix offsets
  * (`RDD.zipWithIndex`). Cost is one extra lightweight count job; no stage
  * ever runs on a single task, so a `Uniq<n>` assignment over billions of
  * distinct clusters scales with the cluster count.
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
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    // zipWithIndex = per-partition counts (small extra job) + broadcast
    // prefix offsets; partition order matches the range partitioner, so
    // the index IS the global rank.
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }
}
