package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A named inclusive interval `[start, end]`
  * (`/root/reference/Plotting_Functions.py:76–103`).
  */
case class Region(name: String, start: Int, end: Int)

/** J6/E4 — point-in-interval annotation with first-match-wins and an
  * `"Other"` fallback (`/root/reference/Plotting_Functions.py:96–169`).
  *
  * Region tables are tiny (dozens of rows), so at scale the right physical
  * plan is either a when-chain folded into whole-stage codegen (zero join,
  * zero shuffle — `annotate`) or a broadcast range join (`annotateJoin`)
  * when the intervals only exist as a DataFrame.
  */
object Regions {

  /** Driver-known intervals → pure codegen when-chain. First match in list
    * order wins (the reference's `region_checker` returns on the first hit,
    * `Plotting_Functions.py:135–145`).
    */
  def regionExpr(pos: Column, regions: Seq[Region]): Column =
    regions.foldRight(lit("Other")) { (r, acc) =>
      when(pos.between(r.start, r.end), r.name).otherwise(acc)
    }

  def annotate(df: DataFrame, posCol: String, regions: Seq[Region],
      outCol: String = "domain"): DataFrame =
    df.withColumn(outCol, regionExpr(col(posCol), regions))

  /** Interval table only available as a DataFrame(name, start, end, ord):
    * broadcast theta-join + min-ordinal tie-break + "Other" for no match.
    * The build side is broadcast so the probe side never shuffles.
    */
  def annotateJoin(df: DataFrame, posCol: String, regions: DataFrame,
      outCol: String = "domain"): DataFrame = {
    val keyed = df.withColumn("__rid", monotonically_increasing_id())
    val joined = keyed.join(broadcast(regions),
      keyed(posCol).between(regions("start"), regions("end")), "left")
    val first = row_number().over(
      Window.partitionBy(col("__rid")).orderBy(col("ord").asc_nulls_last))
    joined.withColumn("__rn", first).filter(col("__rn") === 1)
      .withColumn(outCol, coalesce(col("name"), lit("Other")))
      .drop("__rid", "__rn", "name", "start", "end", "ord")
  }

  /** A16 — distinct variants per domain
    * (`/root/reference/Plotting_Functions.py:1320–1332`).
    */
  def uniquePerDomain(annotated: DataFrame, domainCol: String, keyCol: String): DataFrame =
    annotated.groupBy(domainCol).agg(countDistinct(col(keyCol)).as("unique_variants"))
}
