package graft

/** Benchmark main — times the `SparkEntry.headline` query subset against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query runs `reps` times (default 3) and reports the MEDIAN — a
  * single cold run at this SF is dominated by codegen/JIT noise (BENCH_r03
  * drifted +22% on identical code), so a median of warm repeats is the only
  * number stable enough to detect a real regression. The total is the sum
  * of medians, and the line carries `"scope":"headline"` + `"reps"` +
  * `"n_queries"` so consumers can't misread it as a full-registry or
  * single-shot total. Failures are reported explicitly in an "errors"
  * object instead of being folded into the timing sum.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.local("graft-bench")
    // warm the JVM + parquet footers so the first timed query isn't
    // charged for session/codegen startup
    SparkEntry.entry(spark).count()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val missing = SparkEntry.headline.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"headline names not in queries: ${missing.mkString(",")}")
    val headline = SparkEntry.queries.view.filterKeys(SparkEntry.headline.contains).toMap
    val results = headline.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // collect() forces full materialization of every output row;
        // results are aggregated/small by construction
        try { fn(spark, sfDir).collect(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
          None
        }
      }
      val median = if (times.isEmpty) 0.0 else times.sorted.apply(times.size / 2)
      name -> median
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""scope":"headline","n_queries":${results.size},"reps":$reps,""" +
      s""""queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
