package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance — the ingestion face of the persisted
  * IVF-PQ layout ([[Similarity.writeIvfPqIndex]]): arriving embeddings are
  * assigned to the FROZEN coarse lists and encoded with the FROZEN
  * codebooks ([[Similarity.appendToIvfPqIndex]]'s discipline), landing as
  * new parquet files inside their list directories. Probe-time partition
  * pruning is untouched (pruning keys on the directory, never the file
  * set), full-precision vectors are never stored, and the index a search
  * sees is EXACTLY what a batch re-encode of the union under the same
  * quantizers would build — StreamingSpec pins that equality across
  * micro-batches and replays.
  *
  * At-least-once posture: PQ encoding under frozen quantizers is
  * DETERMINISTIC, so a replayed micro-batch appends byte-identical
  * (vec_id, code, norm, list) rows — [[searchGrownIndex]]'s
  * `dropDuplicates(vec_id)` collapse IS the replay guard (the
  * [[StreamingTimeSeries.startTopKQuery]] distinct-merge move; no batch-id
  * bookkeeping needed), and it also collapses a re-submitted vector id.
  * Quantizer drift remains the operator's responsibility: appends stay
  * exact w.r.t. the frozen quantizers while recall degrades gradually as
  * the arrival distribution drifts — monitor (e.g. mean
  * distance-to-centroid on arrivals) and schedule a retrain + rebuild;
  * never retrain in place (codes from two codebook generations are not
  * comparable).
  */
object StreamingAnn {

  /** Append each arriving micro-batch of `(baseId, vecCol)` rows to the
    * persisted index at `indexPath`. The quantizers are reloaded from the
    * index per batch (k·dim + m·k·subDim doubles of driver traffic). */
  def startIvfPqAppendQuery(vectors: DataFrame, indexPath: String,
      checkpointDir: String, baseId: String = "vec_id",
      vecCol: String = "embedding") =
    vectors
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        Similarity.appendToIvfPqIndex(batch.sparkSession, indexPath,
          batch.toDF(), baseId, vecCol): Unit
      }
      .start()

  /** Search the incrementally-grown index: reload, collapse replay
    * duplicates, and run the standard [[Similarity.ivfPqTopK]]. The
    * dedup happens AFTER probe pruning would restrict the lists in a
    * serving deployment; here it rides the scan (codes are 16-byte rows,
    * and identical duplicates collapse to identical values under any
    * pick). Output: (qid, rank, nid, cos). */
  def searchGrownIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, k: Int, nProbe: Int = 2,
      baseId: String = "vec_id"): DataFrame = {
    val idx = Similarity.readIvfPqIndex(spark, indexPath)
    Similarity.ivfPqTopK(idx.data.dropDuplicates(baseId), queries, k,
      idx.centroids, idx.codebooks, nProbe, baseId = baseId)
  }
}
