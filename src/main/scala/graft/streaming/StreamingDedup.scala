package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming corpus dedup — the ingestion-time face of
  * [[graft.operators.Dedup.incrementalDedup]]: each micro-batch of crawled
  * documents is deduplicated (exact + MinHash near-dup) against everything
  * already retained, using the SAME relational engine as the batch
  * operator inside `foreachBatch` — not a reimplementation under
  * `mapGroupsWithState`. The dedup step is corpus-relational (window-min,
  * band-bucket joins, connected components), which keyed per-group state
  * cannot express; what streaming adds is delivery: checkpointed input
  * tracking plus versioned, replay-idempotent outputs.
  *
  * Layout mirrors [[StreamingMerge]]: two version trees,
  * `keptDir/v<batchId>` (the surviving document rows of that batch) and
  * `stateDir/v<batchId>` (the cumulative [[Dedup.corpusState]] AFTER the
  * batch — hashes + signatures only, never text). Each batch reads the
  * state version STRICTLY BELOW its own batch id, so a replay after a
  * crash-between-write-and-commit re-reads the same base and rewrites
  * byte-identical outputs: at-least-once delivery converges to
  * exactly-once results (the StreamingMerge argument, proven for that
  * sink by the kill-and-restart test).
  *
  * At 100 TB the per-batch cost is the incremental operator's contract —
  * ∝ batch + state-join, never ∝ corpus — and the state tree has the two
  * established maintenance levers: [[Dedup.compactState]] between
  * batches (rewrite a compacted version) and [[StreamingMerge
  * .pruneVersions]]-style retention on old versions (each version is a
  * full state snapshot; only the latest and its replay base are live).
  * Pass `stateBloomBits` to put the Bloom front-filter in front of the
  * cold state join (IncrementalDedupSpec proves decisions unchanged). */
object StreamingDedup {

  private def versionDir(dir: String, id: Long) = f"$dir/v$id%012d"

  /** Latest state version strictly below `batchId`, or an empty state
    * when the stream is at its first batch. */
  private def stateBase(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, batchId: Long, shingleK: Int, numHashes: Int,
      family: Dedup.MinhashFamily): DataFrame = {
    import spark.implicits._
    StreamingMerge.versionBefore(spark, stateDir, batchId) match {
      case Some(v) => spark.read.parquet(versionDir(stateDir, v))
      case None => Dedup.corpusState(
        Seq.empty[(Long, String)].toDF("id", "text"),
        col("id"), col("text"), shingleK, numHashes, family)
    }
  }

  /** Start the streaming dedup query. `docs` must carry `idCol` (unique,
    * monotone across batches — crawl ids are) and `textCol`; surviving
    * FULL rows land under `keptDir`, the post-batch state under
    * `stateDir`. Returns the StreamingQuery handle. */
  def startDedupQuery(docs: DataFrame, idCol: String, textCol: String,
      keptDir: String, stateDir: String, checkpointDir: String,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      minJaccard: Double = 0.7, maxBucket: Int = 200,
      family: Dedup.MinhashFamily = Dedup.XxMinhash,
      stateBloomBits: Option[Int] = None) = {
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val base = stateBase(spark, stateDir, batchId, shingleK, numHashes,
          family)
        val res = Dedup.incrementalDedup(batch.toDF(), col(idCol),
          col(textCol), base, shingleK, numHashes, bands, minJaccard,
          maxBucket, family, stateBloomBits)
        // kept FULL rows: semi join the batch by surviving id (the
        // operator returns ids only — the dedupCorpus contract)
        batch.toDF().join(res.kept.withColumnRenamed("id", "__kept_id"),
            col(idCol) === col("__kept_id"), "left_semi")
          .write.mode("overwrite").parquet(versionDir(keptDir, batchId))
        res.state.write.mode("overwrite")
          .parquet(versionDir(stateDir, batchId))
        res.release()
      }
      .start()
  }

  /** All surviving documents so far: union of every kept version (each
    * batch's survivors are disjoint by construction — later batches were
    * deduplicated against earlier state). */
  def keptSoFar(spark: org.apache.spark.sql.SparkSession,
      keptDir: String): DataFrame = {
    val vs = StreamingMerge.versions(spark, keptDir)
    require(vs.nonEmpty, s"no kept versions under $keptDir")
    vs.map(v => spark.read.parquet(versionDir(keptDir, v)))
      .reduce(_.unionByName(_))
  }
}
