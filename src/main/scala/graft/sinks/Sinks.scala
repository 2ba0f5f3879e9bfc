package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output formatting + sinks (SURVEY.md S7–S9, S11, C8/C10/C14).
  *
  * All "-" sentinels, percent strings and `>`-block layouts live here so
  * the relational lineage stays typed (`null`, `double`, `array`) until
  * the very last operator — the reference interleaves formatting with
  * compute (`/root/reference/MSA_Reader.py:806–1162`).
  */
object Sinks {

  /** Render nullable columns with the reference's `"-"` sentinel
    * (`/root/reference/MSA_Reader.py:716–724`). */
  def withDashSentinels(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, coalesce(col(c).cast("string"), lit("-"))))

  /** S8 — single-file CSV with header, matching the reference's
    * one-file-per-report contract (`/root/reference/Time_Series.py:671`).
    * `coalesce(1)` only touches the (small, already-aggregated) result. */
  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").option("sep", sep).csv(path)

  /** S9 — grouped `>`-block text report:
    * {{{
    * >cluster_id, N sequences
    * code1
    * code2
    * <blank>
    * }}}
    * (`/root/reference/MSA_Reader.py:806–816`). `lines` must already be in
    * the desired within-group order (see Reports.infoByCluster). One
    * `concat_ws` per group, one text write — no per-line file I/O. */
  def writeBlockReport(grouped: DataFrame, headerCol: String,
      linesCol: String, path: String): Unit =
    grouped
      .select(concat(
        lit(">"), col(headerCol), lit("\n"),
        concat_ws("\n", col(linesCol))).as("value"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("lineSep", "\n\n").text(path)

  /** S7 — `where_reference.tsv`: protein → reference-cluster id, no header
    * (`/root/reference/Find_Reference_Clusters.R:86`). */
  def writeWhereReference(df: DataFrame, path: String): Unit =
    df.select(col("protein"), col("cluster_id"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "false").csv(path)

  /** S7 read side (`/root/reference/Time_Series.py:587–611`): tiny table →
    * driver map, the only sanctioned `collect` in the engine. */
  def readWhereReference(spark: SparkSession, path: String): Map[String, String] =
    spark.read.option("sep", "\t").option("header", "false")
      .csv(path).select("_c0", "_c1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
}
