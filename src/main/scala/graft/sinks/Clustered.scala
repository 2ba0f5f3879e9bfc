package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order clustered parquet writes: multi-column data skipping.
  *
  * Parquet scans prune row groups and files with footer min/max stats,
  * but stats only help when the layout makes them tight. A sort by one
  * column gives perfect skipping on that column and none on any other; at
  * 100 TB, a corpus queried by BOTH `domain` and `quality_score` (or
  * partkey and suppkey) wants a layout where every file covers a small
  * RANGE OF EVERY clustering column at once. Interleaving the bits of the
  * normalized column values (a Z-/Morton curve) gives exactly that: a
  * range partition by z-value assigns each file a contiguous curve
  * segment, which projects to a ~|files|^(-1/k) span per dimension for k
  * clustering columns.
  *
  * The z-value is pure column arithmetic (shift/mask/or — whole-stage
  * codegen, no UDF), so the only cost over a plain sorted write is one
  * bounded min/max aggregate to scale the columns. Nothing is added to
  * the output schema: the curve key lives only in the range partitioner
  * and the within-partition sort.
  *
  * Normalization is linear min-max. Heavily skewed columns concentrate
  * z-values (several files sharing one hot prefix); the range
  * partitioner still balances ROW counts per file — skew costs skipping
  * selectivity, not write balance. For such columns, pre-transform
  * (e.g. `log1p`) before clustering.
  */
object Clustered {

  /** Morton/Z value of `cols`, each scaled to `bits` bits via the given
    * [min, max] bounds. Total bits (cols.size × bits) must fit a signed
    * long. Nulls sort first (scaled position 0).
    */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int): Column = {
    require(cols.nonEmpty && cols.size == mins.size && cols.size == maxs.size)
    require(cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a signed long")
    val maxCell = (1L << bits) - 1
    // per-column scaled integer position in [0, 2^bits)
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val span = math.max(maxs(i) - mins(i), Double.MinPositiveValue)
      val pos = (c.cast("double") - lit(mins(i))) / lit(span) * lit(maxCell.toDouble)
      coalesce(least(greatest(round(pos), lit(0.0)), lit(maxCell.toDouble)),
        lit(0.0)).cast("long")
    }
    // interleave: output bit (j*k + i) = bit j of column i
    val k = scaled.size
    (0 until bits).flatMap { j =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftleft(shiftright(s, j).bitwiseAND(lit(1L)), j * k + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** One bounded pass for the clustering columns' min/max. */
  private def bounds(df: DataFrame, cols: Seq[String]): (Seq[Double], Seq[Double]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val mins = cols.indices.map(i => Option(row.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val maxs = cols.indices.map(i => Option(row.get(2 * i + 1))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    (mins, maxs)
  }

  /** Returns `df` re-arranged on the Z-curve over `cols` into `nFiles`
    * range partitions, each internally curve-sorted — ready for
    * `.write.parquet`. The curve key is never added to the schema.
    */
  def zorder(df: DataFrame, cols: Seq[String], nFiles: Int,
      bits: Int = 16): DataFrame = {
    val (mins, maxs) = bounds(df, cols)
    val z = zValue(cols.map(col), mins, maxs, bits)
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
  }

  /** Z-order clustered parquet write. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      nFiles: Int, bits: Int = 16): Unit =
    zorder(df, cols, nFiles, bits).write.mode("overwrite").parquet(path)
}
