package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark cannot
  * read natively; with `spark.sql.legacy.parquet.nanosAsLong` set at session
  * build (GraftSession) it arrives as a long (ns since epoch) and we truncate
  * to microseconds — the same truncation DuckDB applies, so oracle results
  * line up exactly.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
