package graft

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Failures are reported explicitly in an "errors" object instead of
  * being folded into the timing sum.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // warm the JVM + parquet footers so the first timed query isn't
    // charged for session/codegen startup
    SparkEntry.entry(spark).count()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val missing = SparkEntry.headline.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"headline names not in queries: ${missing.mkString(",")}")
    val headline = SparkEntry.queries.view.filterKeys(SparkEntry.headline.contains).toMap
    val results = headline.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // collect() forces full materialization of every output row;
      // results are aggregated/small by construction
      try { fn(spark, sfDir).collect() }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
