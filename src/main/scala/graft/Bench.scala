package graft

/** Benchmark main — times the `SparkEntry.headline` query subset against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query runs `reps` times (default 3). The headline per-query number
  * and total use the MIN of the warm reps: min-of-warm-reps measures the
  * code, while median/mean also measure the machine — BENCH_r05's driver
  * run showed 8–13× phantom "regressions" on untouched queries that
  * reproduced at normal speed locally, i.e. ambient load on the driver
  * host, which a min is immune to as long as one rep runs uncontended.
  * The median is still reported per query (`queries_median`) and every raw
  * rep is emitted (`reps_sec`) so an outlier run is diagnosable post-hoc.
  * The line carries `"scope":"headline"` + `"reps"` + `"n_queries"` so
  * consumers can't misread it as a full-registry or single-shot total.
  * Failures are reported explicitly in an "errors" object instead of being
  * folded into the timing sum.
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
      name -> times
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    def fmt(d: Double) = f"$d%.4f"
    def obj(m: Seq[(String, String)]) =
      m.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val mins = results.map { case (k, ts) =>
      k -> (if (ts.isEmpty) 0.0 else ts.min) }
    val medians = results.map { case (k, ts) =>
      k -> (if (ts.isEmpty) 0.0 else ts.sorted.apply(ts.size / 2)) }
    val qs = obj(mins.map { case (k, v) => k -> fmt(v) })
    val qmed = obj(medians.map { case (k, v) => k -> fmt(v) })
    val raw = obj(results.map { case (k, ts) =>
      k -> ts.map(fmt).mkString("[", ",", "]") })
    val es = obj(errors.toSeq.map { case (k, v) => k -> jstr(v) })
    val total = mins.map(_._2).sum
    val totalMedian = medians.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""stat":"min_of_warm_reps","total_median":${fmt(totalMedian)},""" +
      s""""scope":"headline","n_queries":${results.size},"reps":$reps,""" +
      s""""queries":$qs,"queries_median":$qmed,"reps_sec":$raw,""" +
      s""""errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
