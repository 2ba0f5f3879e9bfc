package graft.operators

import graft.core.{VariantCaller, VariantEvent}
import graft.sources.Fasta
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One aligned MSA row (equal-length gapped string) with its cluster
  * identity — the distributed unit of variant calling.
  */
case class AlignedSeq(clusterId: String, clusterSize: Int, seq: String)

/** Distributed variant calling (SURVEY.md E1/E2/J7).
  *
  * The reference materializes the whole MSA in one process and scans it
  * row-major on a single thread (`/root/reference/MSA_Reader.py:136–171,
  * 1179`). Here the single reference row + its position index are broadcast
  * (a degenerate 1-row build side of a broadcast nested-loop join,
  * SURVEY.md J7) and every aligned row is diffed independently in a typed
  * `flatMap` — embarrassingly parallel, zero shuffle, scales linearly with
  * executors.
  */
object VariantCalling {

  /** Read an `<protein>_msa.fasta` into aligned rows with cluster fields. */
  def readMsa(spark: SparkSession, path: String): Dataset[AlignedSeq] = {
    import spark.implicits._
    Fasta.withClusterFields(Fasta.read(spark, path).toDF())
      .select(col("cluster_id").as("clusterId"),
        col("cluster_size").as("clusterSize"), col("seq"))
      .as[AlignedSeq]
  }

  /** Call variants for every row against the aligned reference sequence. */
  def callAll(aligned: Dataset[AlignedSeq], alignedReference: String): Dataset[VariantEvent] = {
    val spark = aligned.sparkSession
    import spark.implicits._
    val refIndex = VariantCaller.referencePosition(alignedReference)
    val bc = spark.sparkContext.broadcast((alignedReference, refIndex))
    aligned.flatMap { row =>
      val (ref, idx) = bc.value
      VariantCaller.callVariants(ref, idx, row.clusterId, row.clusterSize, row.seq)
    }
  }

  /** Locate the reference cluster's row (SURVEY.md F10/J10: the tiny
    * driver-side lookup the reference does via `where_reference.tsv`,
    * `/root/reference/MSA_Reader.py:1249–1290`) and call variants for the
    * rest of the alignment against it.
    */
  def callAgainstCluster(aligned: Dataset[AlignedSeq], refClusterId: String): Dataset[VariantEvent] = {
    val refRows = aligned.filter(_.clusterId == refClusterId).take(2)
    require(refRows.nonEmpty, s"reference cluster $refClusterId not in alignment")
    callAll(aligned, refRows.head.seq)
  }

  /** Events dataset → the raw-TSV DataFrame shape with `"-"` sentinels
    * (`/root/reference/MSA_Reader.py:50`).
    */
  def toRawTsvShape(events: Dataset[VariantEvent]): DataFrame =
    events.toDF()
      .select(
        col("clusterId").as("Cluster_ID"),
        col("clusterSize").as("Cluster_Size"),
        col("varType").as("Type"),
        col("code").as("Code"),
        col("refAA").as("Ref Residue(s)"),
        col("varAA").as("Var Residue(s)"),
        col("msaStart").cast("string").as("AA_Start(MSA)"),
        coalesce(col("msaEnd").cast("string"), lit("-")).as("AA_End(MSA)"),
        coalesce(col("refStart").cast("string"), lit("-")).as("AA_Start(Ref)"),
        coalesce(col("refEnd").cast("string"), lit("-")).as("AA_End(Ref)"))
}
