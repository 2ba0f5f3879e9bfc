package graft

import graft.operators._
import graft.sinks.Sinks
import graft.sources.Fasta
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The complete reference pipeline, end-to-end, as one Spark application
  * (SURVEY.md §3): a user of `wish1832/GISAID_Pipeline_Functions` points
  * this at the same inputs and gets the same products.
  *
  * Stages (reference stage → here):
  *  1. split by protein (`Protein_File_Splitter.py`) → partitioned write
  *  2. filter host/length/ambiguity (`Sequence_Filter.py`) → [[filtered]]
  *  3. USEARCH dedup → in-engine [[operators.Dedup.exactClusters]]
  *  4. clustalo alignment → EXTERNAL (its MSA output is our S1 input)
  *  5. find reference cluster (`Find_Reference_Clusters.R`) → [[RefCluster.find]]
  *  6. variant calling (`MSA_Reader.py`) → [[VariantCalling.callAgainstCluster]]
  *  7. reports (`MSA_Reader.py:806–1162`) → [[Reports]]
  *  8. weekly time series (`Time_Series.py`) → [[VariantTimeSeries]]
  */
object Pipeline {

  /** Stages 1–3 over a raw `allprot`-style FASTA. */
  def prepare(spark: SparkSession, fastaPath: String, outDir: String,
      refLenByProtein: Map[String, Int], lengthDelta: Int = 30,
      ambiguityCutoff: Double = 0.01): DataFrame = {
    val raw = Fasta.withHeaderFields(Fasta.read(spark, fastaPath).toDF())
    val refLens = spark.createDataFrame(refLenByProtein.toSeq)
      .toDF("protein", "ref_len")
    val filtered = raw
      .join(broadcast(refLens), Seq("protein")) // F2's per-protein band
      .filter(col("host") === "Human")
      .filter(length(col("seq")) >= col("ref_len") - lengthDelta &&
        length(col("seq")) < col("ref_len") + lengthDelta)
      .filter(Filters.charRatio(col("seq"), "X") <= ambiguityCutoff)
    Fasta.writePartitioned(filtered, "protein", s"$outDir/filtered")
    val clusters = Dedup.exactClusters(
      filtered.withColumn("id", col("accession")), col("id"), col("seq"))
    Sinks.writeCsv(clusters.select("cluster_id", "cluster_size", "first_id"),
      s"$outDir/clusters")
    filtered
  }

  /** A15 — sequence counts at each of the FIVE reference pipeline stages
    * (`/root/reference/Sequence_Counter.py:19–241`):
    *
    *  1. `1_raw` — raw FASTA records ("Sequences Downloaded")
    *  2. `2_filtered` — filtered records per protein
    *  3. `3_cluster_sizes` — Σ cluster sizes from the dedup table
    *     ("Sequences Clustered and Aligned", `Sequence_Counter.py:134–171`)
    *  4. `4_meta_linked` — rows of the metadata-with-variants join per
    *     protein ("Clustered Sequences Linked to Metadata",
    *     `Sequence_Counter.py:173–203`)
    *  5. `5_ts_total` — Σ total_genomes of the Worldwide weekly series
    *     after head/tail week trimming ("Metadata-Sequence Pairs Included
    *     in Time Series Analysis", `Sequence_Counter.py:205–241`)
    *
    * Stages 4–5 consume the in-flight per-protein frames (the reference
    * re-reads its own TSV/CSV products; here the caller passes the same
    * frames it is about to sink, so the counts stay one job, no re-scan).
    * One row per (stage, protein); a `null` protein carries a cross-protein
    * total (the raw file predates the protein split).
    *
    * Partition discovery goes through the Hadoop `FileSystem` API — a
    * `java.io.File` listing would return nothing on HDFS/S3, where a
    * 100 TB run actually stores its stages. */
  def stageCounts(spark: SparkSession, fastaPath: String, outDir: String,
      metaWithVariants: Map[String, DataFrame] = Map.empty,
      weeklyMatrix: Map[String, DataFrame] = Map.empty,
      trimHead: Int = 0, trimTail: Int = 0): DataFrame = {
    val raw = Fasta.read(spark, fastaPath).toDF()
      .agg(count(lit(1)).as("n"))
      .select(lit("1_raw").as("stage"), lit(null).cast("string").as("protein"), col("n"))
    // one count per protein partition dir (input_file_name() is empty for
    // DSv2 readers, so enumerate the hive-style dirs like partition
    // discovery does — via Hadoop FS, which resolves file://, hdfs://, s3a://)
    val filteredRoot = new org.apache.hadoop.fs.Path(s"$outDir/filtered")
    val fs = filteredRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val partDirs = (if (fs.exists(filteredRoot)) fs.listStatus(filteredRoot)
      else Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("protein="))
    require(partDirs.nonEmpty, s"no filtered partitions under $outDir/filtered")
    val filtered = partDirs.map { d =>
      spark.read.format("fasta").load(s"${d.getPath.toString}/*.txt")
        .agg(count(lit(1)).as("n"))
        .select(lit("2_filtered").as("stage"),
          lit(d.getPath.getName.stripPrefix("protein=")).as("protein"), col("n"))
    }.reduce(_ unionByName _)
    val clustered = spark.read.option("header", "true").csv(s"$outDir/clusters")
      .agg(sum(col("cluster_size").cast("long")).as("n"))
      .select(lit("3_cluster_sizes").as("stage"),
        lit(null).cast("string").as("protein"), col("n"))
    val metaLinked = metaWithVariants.toSeq.sortBy(_._1).map { case (prot, df) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit("4_meta_linked").as("stage"), lit(prot).as("protein"), col("n"))
    }
    val tsTotals = weeklyMatrix.toSeq.sortBy(_._1).map { case (prot, matrix) =>
      VariantTimeSeries.trimmedWeeklyTotal(matrix, "Worldwide", trimHead, trimTail)
        .select(lit("5_ts_total").as("stage"), lit(prot).as("protein"),
          coalesce(col("total_genomes"), lit(0L)).as("n"))
    }
    (Seq(raw, filtered, clustered) ++ metaLinked ++ tsTotals)
      .reduce(_ unionByName _)
      .orderBy("stage", "protein")
  }

  /** Stages 5–8 over one protein's MSA (the aligned FASTA an external
    * aligner produced from stage 3's clusters). */
  def analyzeMsa(spark: SparkSession, msaPath: String, refIsolateId: String,
      meta: DataFrame, clusterMap: DataFrame, outDir: String): Unit = {
    val aligned = VariantCalling.readMsa(spark, msaPath)
    val clusterHeaders = aligned.toDF().select(
      col("clusterId"), col("clusterSize"))

    // stage 5: which cluster holds the reference isolate
    val refClusterId = RefCluster.find(
      clusterMap.withColumnRenamed("accession", "input_id"), refIsolateId)
    val refRow = aligned.filter(col("clusterId") === refClusterId)
      .select("seq", "clusterSize").head()

    // stage 6: embarrassingly-parallel variant calling, cached for fan-out
    val events = VariantCalling.callAll(aligned, refRow.getString(0))
      .filter(col("clusterId") =!= refClusterId).cache()

    // stage 7: report fan-out off the cached events
    val total = Reports.totalSequences(clusterHeaders).head().getLong(0)
    Sinks.writeCsv(VariantCalling.toRawTsvShape(events),
      s"$outDir/variants_raw", sep = "\t")
    Sinks.writeBlockReport(
      Reports.infoByCluster(events).select(
        concat(col("cluster_id"), lit(", "), col("cluster_size"),
          lit(" sequences")).as("hdr"), col("codes")),
      "hdr", "codes", s"$outDir/info_by_cluster")
    Sinks.writeCsv(Reports.mutationCsv(events, total), s"$outDir/all_by_code")
    val refGapless = refRow.getString(0).replace("-", "")
    Sinks.writeCsv(Reports.perPositionTable(events, refGapless, total),
      s"$outDir/per_position")
    Sinks.writeCsv(Reports.pymolStrings(
      Reports.perPositionTable(events, refGapless, total)), s"$outDir/pymol")

    // stage 8: weekly matrices (every region + Worldwide, one pass)
    val per = VariantTimeSeries.variantsPerCluster(events, refClusterId,
      refRow.getInt(1))
    val joined = VariantTimeSeries.joinMetadata(meta, clusterMap, per)
    val wm = VariantTimeSeries.weeklyMatrix(joined)
    Sinks.writeCsv(wm.orderBy("region", "code", "week_start"),
      s"$outDir/weekly_matrix")
    // stage 8b: the reference's styled heatmap table (S10,
    // Time_Series.py:813–837) over the Worldwide share matrix — week
    // columns are report-bounded, so the explicit pivot value list and
    // the xlsx sink's driver-side collect are safe by construction
    val global = wm.filter(col("region") === "Worldwide")
    val weeks = global.select("week_start").distinct()
      .orderBy("week_start").collect().map(_.get(0).toString)
    if (weeks.nonEmpty)
      graft.sinks.Xlsx.writeHeatmap(
        global.groupBy("code").pivot("week_start", weeks.toSeq)
          .sum("share").na.fill(0.0).orderBy("code"),
        s"$outDir/heatmap_table.xlsx", "Global")
    Sinks.writeCsv(VariantTimeSeries.weeklyCombos(joined)
      .orderBy("region", "week_start", "combo"), s"$outDir/weekly_combos")
    events.unpersist()
  }
}
