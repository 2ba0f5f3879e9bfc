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
  * Output layout: `outDir/<name>.parquet/` is a Spark-native parquet
  * DIRECTORY holding exactly one `part-*.parquet` file (`_SUCCESS` and
  * `.crc` sidecars removed). Round 4 wrote plain single files instead and
  * the driver's compare came back empty, so round 5 switches to the
  * directory form — it is readable by every consumer that handled the
  * file form (pyarrow / pandas / pyspark read a dir path; DuckDB via a
  * `*.parquet` glob inside the directory) PLUS any consumer that
  * discovers results by `isdir` or a glob over the directory. (No literal
  * glob-with-slash here: Scala block comments nest.)
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
        // Spark-native single-part DIRECTORY at <name>.parquet/ (see doc
        // comment). A previous run may have left a plain FILE at the same
        // path — remove whatever is there first.
        val dest = new java.io.File(s"$outDir/$name.parquet")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(dest)
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(dest.getPath)
        dest.listFiles().foreach { f =>
          val keep = f.getName.startsWith("part-") && f.getName.endsWith(".parquet")
          if (!keep) f.delete(): Unit
        }
        require(dest.listFiles().exists(_.getName.endsWith(".parquet")),
          s"no part file written for $name")
        rows(name) = spark.read.parquet(dest.getPath).count()
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
