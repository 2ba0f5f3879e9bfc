package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata. The payload
  * column stays `binary` end-to-end; only metadata is ever a shuffle key. */
case class MediaItem(
    media_id: Long,
    mime: String,
    payload: Array[Byte],
    width: Int,
    height: Int,
    n_frames: Int)

/** Decoded-frame features (one row per sampled frame). */
case class FrameFeatures(
    media_id: Long,
    frame_idx: Int,
    feature: Array[Float])

/** Multimodal column handling (images/audio/video as opaque binary).
  *
  * The Spark-side plumbing — schema, batch iteration, partition shape,
  * explode-per-frame — is real and tested; the codec itself is a STUB
  * (this container has no image/audio libraries): `decodeFrame` derives a
  * deterministic fake feature vector from the payload bytes. Swapping in a
  * real decoder changes ONE function, not the pipeline.
  *
  * Design points for 100 TB of media:
  *  - payloads never appear in a join/groupBy key — operations key on
  *    `media_id` and carry the binary column alongside;
  *  - per-frame work is `flatMap`-shaped (narrow, zero shuffle);
  *  - decode runs batched inside `mapPartitions`, the JVM analog of an
  *    Arrow-batched scalar UDF: per-partition setup (codec init) happens
  *    once, then rows stream through in groups of `batchSize`.
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB codec: deterministic pseudo-features from payload bytes. A real
    * build replaces the body with an actual decode (e.g. JPEG → pixels →
    * pooled features); the signature and everything downstream stay.
    *
    * The fake is md5-derived (feature i = the first 12 bits of
    * `md5(md5hex(payload):frameIdx:i)` over 4096) so it is expressible in
    * SQL — the driver's DuckDB oracle checks the whole extract-features
    * flow, not just its row counts. The payload is digested ONCE and the
    * per-feature hashes derive from its 32-char hex — a multi-MB media
    * payload is not re-hashed FeatureDim times per frame. 12-bit/4096
    * values are exact in Float, and their sums stay exact in Double, so
    * cross-engine aggregation compares bit-for-bit. */
  def decodeFrame(payload: Array[Byte], frameIdx: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val payloadHex = md.digest(payload).map(b => f"${b & 0xff}%02x").mkString
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      md.reset()
      val d = md.digest(
        s"$payloadHex:$frameIdx:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = (((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)) / 4096.0f
      i += 1
    }
    out
  }

  /** Evenly-spaced frame indices: `n` samples from [0, nFrames). */
  def sampleFrameIndices(nFrames: Int, n: Int): Seq[Int] =
    if (nFrames <= n) 0 until nFrames
    else (0 until n).map(i => (i.toLong * nFrames / n).toInt)

  /** Per-frame feature extraction: one output row per sampled frame.
    * Narrow flatMap over batched partitions — no shuffle, codec state
    * initialized once per partition. */
  def extractFeatures(items: Dataset[MediaItem], framesPerItem: Int,
      batchSize: Int = 64): Dataset[FrameFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition codec setup would go here (once, not per row)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          sampleFrameIndices(m.n_frames, framesPerItem).iterator.map { f =>
            FrameFeatures(m.media_id, f, decodeFrame(m.payload, f))
          }
        }
      }
    }
  }

  /** Metadata/typing pass over a raw binary table: payload size, content
    * hash, aspect ratio — all computed without the payload ever leaving
    * the scan stage. */
  def describe(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("content_sha", sha2(col(payloadCol), 256))
      .withColumn("aspect",
        when(col("height") > 0, col("width").cast("double") / col("height")))

  /** "Resize": metadata transform keeping payload opaque (a real build
    * would re-encode in decodeFrame's codec layer). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Synthesize a deterministic MediaItem table from the documents table
    * (texts become payload bytes) — the test/demo input shape. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        concat(lit("media/"), element_at(split(col("lang"), ""), 1)).as("mime"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(480)) + 32).cast("int").as("height"),
        (pmod(col("doc_id"), lit(24)) + 1).cast("int").as("n_frames"))
      .as[MediaItem]
  }
}
