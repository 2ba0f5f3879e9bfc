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
  * Re-ingest contract (which version of an id wins): duplicate ids
  * WITHIN a batch must carry identical content — exact-duplicate rows
  * collapse (a replayed source re-delivering a row is fine), but two
  * versions of an id in one batch raise in-plan (`assert_true`): there
  * is no order inside a batch, so "which version" would be
  * nondeterministic. ACROSS batches the winner is deterministic: max
  * `batch_id` wins (last writer), so scoring always reads the current
  * attrs. Superseded versions are never retracted — their band keys
  * keep generating candidates (scored against CURRENT content: a
  * recall-widening artifact, never a wrong edge) and their emitted
  * edges persist, per the append-only discipline above.
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
    // exact-duplicate rows collapse (replay-safe); a remaining duplicate
    // __id means two VERSIONS of the record in one unordered batch —
    // nondeterministic by construction, so it raises in-plan rather than
    // letting an arbitrary winner break the deterministic-edge contract
    val base = batch.select(col(idCol).as("__id") +:
        col(textCol).as("__text") +: attrs.map(col): _*)
      .dropDuplicates()
      .withColumn("__idn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))))
      .filter(assert_true(col("__idn") === 1L,
        concat(lit("ingestBatch: id appears with differing content " +
          "within one batch: "), col("__id").cast("string"))).isNull)
      .drop("__idn")
    val sigs = Dedup.minhashSignatures(base, col("__id"), col("__text"),
      shingleK, numHashes, family)
    val newRecs = sigs.join(base, col("id") === col("__id"))
      .select(col("id") +: col("signature") +: attrs.map(col): _*)
    val recsPath = s"$targetDir/er_records"
    val keysPath = s"$targetDir/er_keys"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(recsPath), spark.sparkContext.hadoopConfiguration)
    // deterministic winner on re-ingest: max batch_id (last writer). The
    // row_number tie-break only binds when a batch is REPLAYED (same
    // batch_id ⇒ byte-identical content), so any pick is the same row.
    def latestPerId(df: DataFrame, keys: Seq[String]): DataFrame =
      df.withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(
            keys.map(col): _*).orderBy(col("batch_id").desc)))
        .filter(col("__rn") === 1).drop("__rn", "batch_id")
    val stored =
      if (fs.exists(new org.apache.hadoop.fs.Path(recsPath)))
        latestPerId(spark.read.parquet(recsPath), Seq("id"))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newRecs.schema)
    // this batch supersedes the store for ids it re-ingests (its
    // batch_id is ≥ every stored one under streaming's monotone ids)
    val all = stored.join(newRecs.select(col("id")), Seq("id"),
        "left_anti").unionByName(newRecs)
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

  /** Post-maintenance accounting, one row per er_* store. */
  final case class StoreResult(store: String, rowsBefore: Long,
      rowsAfter: Long, filesBefore: Int, filesAfter: Int)

  /** Maintenance pass for the er_* stores — the compaction face of the
    * append-only design. [[ingestBatch]] appends one small parquet file
    * set per store per batch, and the HOT PATH scans er_keys every
    * batch, so a week of 15-minute batches (~700 file sets) taxes every
    * subsequent ingest with listing + tiny-scan overhead. This pass
    * rewrites each store to (a) ONE logical row per key — last writer
    * (max `batch_id`) wins, the [[ingestBatch]] read-side rule applied
    * at rest, so reads after maintenance see byte-identical logical
    * content through a physically smaller scan — and (b) few large
    * files (`ceil(bytes / targetBytes)`).
    *
    * Keys per store: er_records → id; er_keys → (id, band, bucket);
    * er_edges → (id_a, id_b). Each rewrite validates (distinct-key
    * count must survive) into a dot-prefixed temp dir before the swap —
    * the [[graft.sinks.Compaction]] validated-swap discipline, with the
    * same non-transactional contract: run in a maintenance window with
    * the ingest query STOPPED (checkpointed streaming restarts cleanly
    * around it; a replayed batch re-appends rows the next maintenance
    * collapses again).
    *
    * Readout invariance (StreamingSpec-pinned): [[mergedEntities]] and
    * the next [[ingestBatch]] read per-key winners, and the winner per
    * key is unchanged by dropping superseded rows, so results before
    * and after maintenance are bit-identical. */
  def erMaintenance(spark: SparkSession, targetDir: String,
      targetBytes: Long = 128L << 20): Seq[StoreResult] = {
    val stores = Seq(
      "er_records" -> Seq("id"),
      "er_keys" -> Seq("id", "band", "bucket"),
      "er_edges" -> Seq("id_a", "id_b"))
    val conf = spark.sparkContext.hadoopConfiguration
    stores.flatMap { case (store, keys) =>
      val dir = new org.apache.hadoop.fs.Path(s"$targetDir/$store")
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) None
      else {
        def dataFiles() = fs.listStatus(dir).filter { f =>
          val n = f.getPath.getName
          f.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
            !n.startsWith(".")
        }
        val before = dataFiles()
        val bytes = before.map(_.getLen).sum
        val nFiles = math.max(1,
          math.ceil(bytes.toDouble / targetBytes).toInt)
        val df = spark.read.parquet(dir.toString)
        val latest = df.withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(
              keys.map(col): _*).orderBy(col("batch_id").desc)))
          .filter(col("__rn") === 1).drop("__rn")
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s".ermaint-${java.util.UUID.randomUUID}")
        latest.coalesce(nFiles).write.parquet(tmp.toString)
        val rowsBefore = df.count()
        val keyCount = df.select(keys.map(col): _*).distinct().count()
        val rowsAfter = spark.read.parquet(tmp.toString).count()
        if (rowsAfter != keyCount) {
          fs.delete(tmp, true)
          throw new IllegalStateException(s"erMaintenance of $store: " +
            s"rewrote $rowsAfter rows, expected $keyCount distinct keys " +
            "— aborted, originals untouched")
        }
        before.foreach(f => fs.delete(f.getPath, false))
        val newFiles = fs.listStatus(tmp).filter(_.getPath.getName
          .endsWith(".parquet"))
        newFiles.foreach { f =>
          val dest = new org.apache.hadoop.fs.Path(dir, f.getPath.getName)
          if (!fs.rename(f.getPath, dest))
            throw new IllegalStateException(
              s"erMaintenance of $store: rename ${f.getPath} -> $dest " +
                s"failed; compacted data intact under $tmp — recover " +
                "manually")
        }
        fs.delete(tmp, true)
        Some(StoreResult(store, rowsBefore, rowsAfter, before.length,
          newFiles.length))
      }
    }
  }
}
