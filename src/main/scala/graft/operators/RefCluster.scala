package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F10/J10 — locate the cluster containing the reference isolate, plus the
  * F12 motif patch (SURVEY.md §2.2).
  */
object RefCluster {

  /** F10 — find the reference cluster: rows of the cluster map whose
    * member id contains the reference isolate id
    * (`/root/reference/Find_Reference_Clusters.R:51–81`). Returns the
    * cluster id; the reference's multi/zero-match warnings become hard
    * requirements here. */
  def find(clusterMap: DataFrame, refId: String,
      inputIdCol: String = "input_id", clusterCol: String = "cluster_id"): String = {
    val hits = clusterMap.filter(col(inputIdCol).contains(refId))
      .select(clusterCol).distinct().take(2)
    require(hits.nonEmpty, s"reference id $refId not found in cluster map")
    require(hits.length == 1,
      s"reference id $refId matched multiple clusters: ${hits.mkString(",")}")
    hits.head.getString(0)
  }

  /** F12 — erroneous-motif patch: where `seq[start-1..end)` equals the bad
    * motif, overwrite that slice with the fix
    * (`/root/reference/alignment_tools.py:28–93`). 1-based inclusive
    * `start`, like the reference. `overlay` keeps everything else intact. */
  def patchMotif(df: DataFrame, seqCol: String, start: Int,
      badMotif: String, fix: String): DataFrame = {
    require(fix.length == badMotif.length, "patch must preserve alignment length")
    df.withColumn(seqCol,
      when(substring(col(seqCol), start, badMotif.length) === badMotif,
        overlay(col(seqCol), lit(fix), lit(start)))
        .otherwise(col(seqCol)))
  }

  /** C12 — short→long mutation-type names with the reference's
    * fail-on-unknown contract (`/root/reference/Plotting_Functions.py:1334–1354`). */
  def longTypes(df: DataFrame, typeCol: String): DataFrame = {
    val mapping = Map("sub" -> "Substitution", "del" -> "Deletion",
      "ins" -> "Insertion", "ext" -> "Extension", "delins" -> "Deletion-Insertion")
    val expr = mapping.foldLeft(
      raise_error(concat(lit("unknown variant type: "), col(typeCol)))
        .cast("string")) { case (acc, (k, v)) =>
      when(col(typeCol) === k, v).otherwise(acc)
    }
    df.withColumn(s"${typeCol}_long", expr)
  }
}
