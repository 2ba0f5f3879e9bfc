package graft

/** Dev-loop helper (test scope, never shipped): dump a SUBSET of
  * registered queries to parquet for a quick DuckDB spot-check while
  * iterating, instead of a full 150-query Verify pass.
  *
  * Usage: `sbt "Test/runMain graft.DevRunner <sfDir> <outDir> name1 name2 ..."`
  */
object DevRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = GraftSession.local("graft-dev")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val target = s"$outDir/$name.parquet"
      df.coalesce(1).write.mode("overwrite").parquet(target)
      println(s"[dev] $name rows=${spark.read.parquet(target).count()}")
    }
    spark.stop()
  }
}
