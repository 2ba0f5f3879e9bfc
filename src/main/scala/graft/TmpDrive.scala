package graft

import org.apache.spark.sql.functions._

object TmpDrive {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("tmp-drive")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
        .select(length(col("text")).as("len"))
      val out = docs.agg(
        expr("approx_percentile(len, array(0.0,0.25,0.5,0.75,0.95,1.0), 1000000)")
          .as("qs"),
        count(lit(1)).as("n")).head()
      println(s"SF $sf n=${out.getLong(1)} qs=${out.getSeq[Int](0).mkString(",")}")
    }
    spark.stop()
  }
}
