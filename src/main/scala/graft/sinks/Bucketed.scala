package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed datasource tables — the co-located-join pattern for joins
  * that repeat across jobs at 100 TB (fact ⋈ fact on a stable key).
  *
  * A one-off join shuffles both sides on the key every run. Writing each
  * side ONCE as a table hash-bucketed (and sort-bucketed) by that key
  * moves the shuffle to write time: every later join between tables
  * bucketed the same way plans with NO Exchange on either side (Spark
  * requires equal bucket counts; with `sortCols` the per-bucket sort
  * drops too). BucketedJoinSpec pins the shuffle-free plan.
  *
  * Plain parquet `bucketBy` needs the session catalog (any catalog works
  * — no Hive required); buckets are ordinary part files readable as plain
  * parquet by engines that ignore bucket metadata. */
object Bucketed {

  /** Write `df` as a bucketed (optionally sort-bucketed) parquet table in
    * the session catalog, replacing any previous version. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    val sorted = if (sortCols.nonEmpty)
      w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on their join keys with
    * the same bucket count: no Exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))
  }
}
