package graft.streaming

import graft.operators.{Dedup, Linkage}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental entity resolution — the ingestion face of
  * [[Linkage.resolveEntitiesWithWeights]]: a master-data store where
  * records keep arriving and "which entity is this?" must stay current
  * without re-linking the whole corpus per batch.
  *
  * The frozen-model discipline (the StreamingAnn move): the
  * Fellegi–Sunter weights, the minhash family, and every blocking
  * parameter are FROZEN at query start, so a matched edge (a, b) is a
  * DETERMINISTIC fact of the two records' content — append-only edge
  * state is sound, and a replayed micro-batch re-derives byte-identical
  * edges that `dropDuplicates(id_a, id_b)` collapses at readout. Model
  * drift means retrain + re-link (a batch job), never in-place edits —
  * the ANN drift contract verbatim.
  *
  * Per micro-batch (new records N against stored records S):
  *   1. signatures for N under the frozen family (the only pass over
  *      text — each record is shingled exactly once, ever);
  *   2. N's LSH band keys union the PERSISTED `er_keys` table (the
  *      store is never re-hashed — a batch scans narrow
  *      (id, band, bucket) rows; keys are deterministic, so replayed
  *      appends dedup away); buckets above `maxBucket` are skipped
  *      THIS batch (cost guard — see the cap note below);
  *   3. candidate pairs with ≥1 side in N (old–old pairs were emitted
  *      when their later record arrived — never re-derived);
  *   4. field features from both sides' stored attrs, scored under the
  *      frozen weights in fixed field order; pairs above `threshold`
  *      append to `er_edges`, the batch's records (id, signature,
  *      attrs) append to `er_records`.
  *
  * Readout ([[mergedEntities]]): connected components over the distinct
  * stored edges, min-id labels — bit-identical to
  * [[Linkage.resolveEntitiesWithWeights]] over all records under the
  * same frozen model, PROVIDED no bucket ever crossed `maxBucket`
  * (StreamingSpec pins that regime). The cap contract when it does
  * bind: edges already emitted from a bucket that later outgrows the
  * cap are kept (append-only, never retracted); NEW pairs from it stop
  * being generated — the same recall-for-cost trade
  * [[Dedup.minhashCandidates]] makes, applied at arrival time.
  *
  * Scale shape: each batch shuffles |S ∪ N| 16-byte band keys (read,
  * not recomputed) but the join output is bounded by bucket caps and
  * the N-side semi filter; the CC at readout runs on the matched-edge
  * graph only. State is (signature + attrs) per record, `bands` key
  * rows per record, and one row per matched pair — never raw text,
  * never unmatched candidates. */
object StreamingEntityResolution {

  /** Start the ingestion query. `attrs` are column names present on the
    * stream; `fields` agreement expressions reference `a_<attr>` /
    * `b_<attr>` (the [[Linkage.resolveEntities]] contract); `weights`
    * is the frozen model (collected once — it is |fields| rows). */
  def startErIngestQuery(records: DataFrame, idCol: String,
      textCol: String, attrs: Seq[String],
      fields: Seq[(String, Column)], weights: DataFrame,
      threshold: Double, targetDir: String, checkpointDir: String,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      maxBucket: Int = 200,
      family: Dedup.MinhashFamily = Dedup.XxMinhash) = {
    require(attrs.nonEmpty && attrs.distinct.size == attrs.size,
      "attrs must be non-empty and distinct")
    require(bands >= 1 && numHashes % bands == 0,
      "bands must divide numHashes")
    // freeze the model: the closure re-creates the tiny weights frame
    // per batch from collected rows, immune to upstream mutation
    val frozenW = weights.select(col("field"), col("w_agree"),
      col("w_disagree")).collect().toSeq
    records
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, idCol, textCol, attrs,
          fields, frozenW, threshold, targetDir, shingleK, numHashes,
          bands, maxBucket, family)
      }
      .start()
  }

  private def bandKeysOf(recs: DataFrame, numHashes: Int, bands: Int,
      family: Dedup.MinhashFamily): DataFrame =
    recs.select(col("id"),
        explode(Dedup.lshBandKeys(col("signature"), bands,
          numHashes / bands, family.bucketHash)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))

  private[graft] def ingestBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, attrs: Seq[String],
      fields: Seq[(String, Column)],
      frozenW: Seq[org.apache.spark.sql.Row], threshold: Double,
      targetDir: String, shingleK: Int, numHashes: Int, bands: Int,
      maxBucket: Int, family: Dedup.MinhashFamily): Unit = {
    val spark = batch.sparkSession
    val base = batch.select(col(idCol).as("__id") +:
      col(textCol).as("__text") +: attrs.map(col): _*)
    val sigs = Dedup.minhashSignatures(base, col("__id"), col("__text"),
      shingleK, numHashes, family)
    val newRecs = sigs.join(base, col("id") === col("__id"))
      .select(col("id") +: col("signature") +: attrs.map(col): _*)
    val recsPath = s"$targetDir/er_records"
    val keysPath = s"$targetDir/er_keys"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(recsPath), spark.sparkContext.hadoopConfiguration)
    val stored =
      if (fs.exists(new org.apache.hadoop.fs.Path(recsPath)))
        spark.read.parquet(recsPath).drop("batch_id")
          .dropDuplicates("id")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newRecs.schema)
    val all = stored.unionByName(newRecs).dropDuplicates("id")
    val newKeyed = bandKeysOf(newRecs, numHashes, bands, family)
    // the store's band keys persist as their own narrow table — a
    // batch scans (id, band, bucket) rows instead of re-hashing every
    // stored signature (band keys are deterministic, so replayed
    // appends are byte-identical and the dedup collapses them)
    val storedKeyed =
      if (fs.exists(new org.apache.hadoop.fs.Path(keysPath)))
        spark.read.parquet(keysPath).drop("batch_id")
          .dropDuplicates("id", "band", "bucket")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newKeyed.schema)
    // cap applies to TODAY's bucket population — the arrival-time cost
    // guard documented above
    val keyed = storedKeyed.unionByName(newKeyed)
      .dropDuplicates("id", "band", "bucket")
      .withColumn("__bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket")))
      .filter(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")
    val newIds = newRecs.select(col("id"))
    val keyedNew = keyed.join(newIds, Seq("id"), "left_semi")
    // ≥1 new side; canonical (id_a < id_b); a pair colliding in many
    // bands lands once
    val cand = keyed.as("a")
      .join(keyedNew.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(
        when(col("a.id") < col("b.id"), col("a.id"))
          .otherwise(col("b.id")).as("id_a"),
        when(col("a.id") < col("b.id"), col("b.id"))
          .otherwise(col("a.id")).as("id_b"))
      .distinct()
    val aSide = all.select(col("id").as("__ia") +:
      attrs.map(n => col(n).as(s"a_$n")): _*)
    val bSide = all.select(col("id").as("__ib") +:
      attrs.map(n => col(n).as(s"b_$n")): _*)
    val pairs = cand
      .join(aSide, col("id_a") === col("__ia"))
      .join(bSide, col("id_b") === col("__ib"))
      .select(col("id_a") +: col("id_b") +:
        fields.map { case (n, expr) => expr.as(s"__f_$n") }: _*)
    val weights = spark.createDataFrame(
      spark.sparkContext.parallelize(frozenW, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("field",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("w_agree",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("w_disagree",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val fieldRefs = fields.map { case (n, _) => n -> col(s"__f_$n") }
    Linkage.score(pairs, Seq(col("id_a"), col("id_b")), weights,
        fieldRefs)
      .filter(col("link_score") > threshold)
      .select(col("id_a"), col("id_b"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$targetDir/er_edges")
    newRecs.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(recsPath)
    newKeyed.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(keysPath)
  }

  /** Current entity assignment from the grown state: connected
    * components over the distinct stored edges (min-id labels), every
    * stored record labeled (own id when never linked) — bit-identical
    * to the frozen-weights batch pipeline over the union (cap regime
    * noted above). */
  def mergedEntities(spark: SparkSession, targetDir: String): DataFrame = {
    val edges = spark.read.parquet(s"$targetDir/er_edges")
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"))
    val ids = spark.read.parquet(s"$targetDir/er_records")
      .dropDuplicates("id").select(col("id"))
    val comps = Dedup.connectedComponents(edges)
    ids.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("entity_id"))
  }
}
