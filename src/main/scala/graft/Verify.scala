package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Besides the file outputs, prints ONE machine-readable JSON line on
  * stdout (same shape as [[Bench]]) so a stdout-parsing driver sees a
  * per-query summary even if it never opens the parquet:
  * `{"metric":"verify","value":N,"unit":"queries","queries":{name:rows},
  *   "errors":{name:msg},"sf":...,"outDir":...}`.
  * The same JSON is also written to `outDir/verify_summary.json`.
  *
  * Arg handling is deliberately forgiving: `args(0)` = sfDir (default
  * `$SPARK_GRAFT_SF_DIR` or /root/testdata/sf0.01), `args(1)` = outDir
  * (default /tmp/verify_out). Extra args are ignored — a driver-side
  * invocation mismatch must degrade to defaults, not a MatchError.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.nonEmpty)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = args.lift(1).filter(_.nonEmpty).getOrElse("/tmp/verify_out")
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // write a single-part directory, then promote the part file to a
        // plain <name>.parquet FILE — readable by both directory-aware
        // (pyarrow) and single-file (duckdb read_parquet) consumers
        val tmp = s"$outDir/.tmp_$name"
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for $name"))
        Files.move(part.toPath, Paths.get(s"$outDir/$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        new java.io.File(tmp).listFiles().foreach(_.delete())
        Files.deleteIfExists(Paths.get(tmp))
        rows(name) = spark.read.parquet(s"$outDir/$name.parquet").count()
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(160)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val qs = rows.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val summary = s"""{"metric":"verify","value":${rows.size},"unit":"queries",""" +
      s""""queries":$qs,"errors":$es,"sf":${q(sfDir)},"outDir":${q(outDir)}}"""
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    println(summary)
    spark.stop()
  }
}
