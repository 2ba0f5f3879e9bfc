package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Streaming CDC maintenance — the ingestion-time face of
  * [[graft.operators.Merge]]: a change stream (I/U/D rows with a
  * monotone sequence column) is folded into a persistent keyed snapshot,
  * one version per micro-batch.
  *
  * Snapshot versions are plain parquet directories `v<batchId>` under
  * `targetDir` (zero-padded, NOT hive `k=v` naming — the version is a
  * lineage coordinate, not a partition column). Each batch:
  *
  *   1. compacts its raw changes last-wins per key on the sequence
  *      column (a raw CDC feed may carry several ops for one key in one
  *      batch; [[Merge.applyChanges]] requires at most one),
  *   2. reads the latest snapshot version STRICTLY BELOW this batch id,
  *   3. applies the compacted set (one broadcast anti join + union), and
  *   4. overwrites `v<batchId>`.
  *
  * Reading the version below the CURRENT batch id (not the latest
  * version present) is what makes replays idempotent: if the job dies
  * after writing `v7` but before the checkpoint commits, the replayed
  * batch 7 re-reads `v6` and rewrites an identical `v7` — at-least-once
  * delivery converges to exactly-once state (the same argument as the
  * weekly parquet sink's batch-id stamping, StreamingSpec).
  *
  * At scale the per-batch cost is the merge plan's: the base crosses one
  * anti join against the (small) batch change-key set; old versions are
  * retention — compact/delete them with the same maintenance pass as
  * [[graft.sinks.Compaction]].
  */
object StreamingMerge {

  /** Last-wins compaction of a raw change batch: one row per key — the
    * one with the highest `seqCol`. Equal-sequence ties resolve by a
    * TOTAL deterministic order (delete first, then op, then a hash of
    * the whole row): a proper CDC feed has unique sequence numbers per
    * key, but if a producer violates that, the winner must still be the
    * same row on every run — replay idempotence (the class contract)
    * dies the moment a tie is left to shuffle order. */
  def compactChanges(raw: DataFrame, keys: Seq[String], opCol: String,
                     seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc,
        when(col(opCol) === "D", 0).otherwise(1),
        col(opCol),
        xxhash64(raw.columns.sorted.map(col): _*))
    raw.withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1)
      .drop("graft_rn", seqCol)
  }

  private def versionDir(targetDir: String, id: Long) =
    f"$targetDir/v$id%012d"

  /** Latest snapshot version strictly below `beforeId` (None ⇒ no
    * predecessor — the batch starts from an empty base). */
  def versionBefore(spark: SparkSession, targetDir: String,
                    beforeId: Long): Option[Long] =
    versions(spark, targetDir).filter(_ < beforeId).maxOption

  /** Current snapshot: the highest version present (empty-schema error if
    * none — callers gate on the query having processed a batch). */
  def latestSnapshot(spark: SparkSession, targetDir: String): DataFrame = {
    val latest = versionBefore(spark, targetDir, Long.MaxValue)
      .getOrElse(sys.error(s"no snapshot versions under $targetDir"))
    spark.read.parquet(versionDir(targetDir, latest))
  }

  /** All snapshot versions present, ascending (the single listing/parse
    * path — everything else derives from it). */
  def versions(spark: SparkSession, targetDir: String): Seq[Long] = {
    val path = new Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.length > 1 && n.startsWith("v") &&
          n.drop(1).forall(_.isDigit) =>
        n.drop(1).toLong }
      .sorted
  }

  /** Time travel: the snapshot as of an exact stored version. Hard error
    * on a missing version — silently reading a neighbor would hand the
    * caller the wrong history. */
  def snapshotAt(spark: SparkSession, targetDir: String,
                 version: Long): DataFrame = {
    // list once — each versions() call is a full remote listing on an
    // object store, and the error message would otherwise list again
    val have = versions(spark, targetDir)
    require(have.contains(version),
      s"snapshot version $version not present under $targetDir " +
        s"(have: ${have.mkString(", ")})")
    spark.read.parquet(versionDir(targetDir, version))
  }

  /** Retention: delete all but the newest `keep` versions. Returns the
    * versions deleted. Each version is a FULL snapshot — older versions
    * are pure storage, not lineage — BUT the crash-replay protocol reads
    * the version STRICTLY BELOW the replayed batch id, so the latest
    * version's PREDECESSOR must survive retention: if the newest write's
    * checkpoint has not committed yet and its predecessor is pruned, the
    * replay would fall back to an empty base and silently truncate the
    * snapshot. Hence `keep >= 2` is enforced — the latest version plus
    * its replay base. With that invariant held, pruning is safe to run
    * concurrently with both readers and the writer's recovery. */
  def pruneVersions(spark: SparkSession, targetDir: String,
                    keep: Int): Seq[Long] = {
    require(keep >= 2,
      "must keep the latest version AND its predecessor (the crash-replay base)")
    val all = versions(spark, targetDir)
    val doomed = all.dropRight(keep)
    val path = new Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach { v =>
      if (!fs.delete(new Path(versionDir(targetDir, v)), true))
        sys.error(s"failed to delete snapshot version $v under $targetDir")
    }
    doomed
  }

  /** Start the maintenance query over a streaming change feed. `changes`
    * must carry `keys ++ (opCol, seqCol) ++ payload`; the snapshot holds
    * `keys ++ payload`. */
  def startCdcMergeQuery(changes: DataFrame, keys: Seq[String],
      opCol: String, seqCol: String,
      targetDir: String, checkpointDir: String) = {
    val payloadCols = changes.columns.filterNot(c => c == opCol || c == seqCol)
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val compacted = compactChanges(batch.toDF(), keys, opCol, seqCol)
        val base = versionBefore(spark, targetDir, batchId) match {
          case Some(v) => spark.read.parquet(versionDir(targetDir, v))
          case None =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              org.apache.spark.sql.types.StructType(
                compacted.select(payloadCols.map(col): _*).schema))
        }
        Merge.applyChanges(base, compacted, keys, opCol)
          .write.mode("overwrite").parquet(versionDir(targetDir, batchId))
      }
      .start()
  }
}
