package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical encodings across testdata
  * generations, so the loader branches on the type Spark actually read:
  *
  *  - parquet TIMESTAMP(NANOS): unreadable natively; with
  *    `spark.sql.legacy.parquet.nanosAsLong` set at session build
  *    (GraftSession) it arrives as a long (ns since epoch) and we truncate
  *    to microseconds — the same truncation DuckDB applies.
  *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
  *    TIMESTAMP_NTZ; session timezone is pinned to UTC, so the cast to
  *    TimestampType below preserves every instant bit-for-bit and keeps
  *    one downstream type across both encodings.
  *
  * Either way downstream code sees a TimestampType `ts` whose values match
  * what DuckDB reads from the same file, so oracle results line up exactly.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // ns since epoch via nanosAsLong
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw // already TimestampType
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
