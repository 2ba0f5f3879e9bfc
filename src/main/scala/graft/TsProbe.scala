package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    e.printSchema()
    e.orderBy("event_id").show(3, false)
    spark.stop()
  }
}
