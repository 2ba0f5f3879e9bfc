package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** S12 — external-tool execution. The reference shells its alignment
  * step out to a native binary (`/root/reference/Clustal_All.sh:22`,
  * clustalo over the deduped FASTA); the distributed equivalent is the
  * Hadoop-streaming shape: ONE process per partition on the executor,
  * rows streamed through stdin/stdout as lines. `RDD.pipe` is Spark's
  * canonical surface for exactly this — the deliberate, documented use
  * of the RDD layer (SURVEY §4 preference (d)): an external process is
  * genuinely imperative per-partition work no Column expression can
  * express.
  *
  * Scale shape: no shuffle, no driver traffic — parallelism = partitions,
  * each executor hosts its own copies of the tool. A non-zero exit fails
  * the task (and, after retries, the job) rather than silently dropping a
  * partition's output.
  */
object ExternalTool {

  /** Stream one text column through `command` (argv vector, spawned
    * without a shell) and return the tool's output lines. Line-oriented
    * protocol: one input row per stdin line; each stdout line becomes an
    * output row — tools may emit more or fewer lines than they read
    * (clustalo does). A value containing an embedded newline would
    * silently become several stdin records and corrupt the row↔record
    * correspondence, so it FAILS the job loudly instead (flatten or
    * escape upstream — e.g. FASTA values are single-line by
    * construction); null values fail for the same reason. */
  def pipeLines(df: DataFrame, textCol: Column,
      command: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spark.createDataset(
      df.select(textCol.cast("string")).rdd.map { r =>
        val s = r.getString(0)
        require(s != null, "pipeLines: null value has no line representation")
        require(s.indexOf('\n') < 0 && s.indexOf('\r') < 0,
          "pipeLines: embedded newline would split one row into several " +
            s"stdin records: ${s.take(80)}...")
        s
      }.pipe(command)
    ).toDF("line")
  }
}
