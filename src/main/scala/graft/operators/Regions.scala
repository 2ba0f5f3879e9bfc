package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * collect the (by-definition tiny) table to the driver and compile the
    * same first-match-wins when-chain as [[annotate]].
    *
    * This replaces an earlier broadcast-theta-join + per-row-id window
    * implementation: the window repartitioned EVERY probe row by a
    * synthetic id — a full shuffle of the fact table that a dozen-row
    * dimension never justifies. Collect-and-compile keeps the probe side
    * narrow and codegen'd; `maxRegions` guards against misuse with a
    * non-tiny interval table (use a real range join there instead).
    */
  def annotateJoin(df: DataFrame, posCol: String, regions: DataFrame,
      outCol: String = "domain", maxRegions: Int = 10000): DataFrame = {
    val rows = regions.select(col("name"), col("start"), col("end"), col("ord"))
      .collect()
    require(rows.length <= maxRegions,
      s"interval table has ${rows.length} rows (> $maxRegions); " +
        "use an explicit range join for non-tiny interval tables")
    val ordered = rows.sortBy(_.getAs[Int]("ord")).toSeq.map(r =>
      Region(r.getAs[String]("name"), r.getAs[Int]("start"), r.getAs[Int]("end")))
    annotate(df, posCol, ordered, outCol)
  }

  /** A16 — distinct variants per domain
    * (`/root/reference/Plotting_Functions.py:1320–1332`).
    */
  def uniquePerDomain(annotated: DataFrame, domainCol: String, keyCol: String): DataFrame =
    annotated.groupBy(domainCol).agg(countDistinct(col(keyCol)).as("unique_variants"))

  /** Band join between two LARGE sides: all (left, right) pairs with
    * `|leftVal − rightVal| ≤ delta`. The naive form is a theta join —
    * a cartesian at scale, and not broadcastable when both sides are
    * big. This rewrites it as an EQUI-join: every value lands in bucket
    * `floor(v/delta)`; a qualifying pair's buckets differ by at most 1,
    * so the left side explodes to its three neighbor buckets, joins on
    * the bucket key (shuffle hash/sort-merge — a real distributed join),
    * and the exact `abs ≤ delta` filter drops the bucket-neighbor false
    * positives. Each true pair matches EXACTLY once (the right row keeps
    * its single home bucket). Cost: 3× the left row count in the
    * shuffle, versus |L|×|R| for the cartesian.
    *
    * Output: every `left` column (aliased `l_*` by the caller if needed)
    * plus every `right` column — the caller projects. Column names must
    * be disjoint. Skew note: a value spike maps to one bucket triplet —
    * AQE skew-join splits it like any hot equi-key. */
  def bandJoin(left: DataFrame, leftVal: Column,
      right: DataFrame, rightVal: Column, delta: Double): DataFrame = {
    require(delta > 0, "delta must be positive")
    val lb = floor(leftVal / delta).cast("long")
    val l = left.withColumn("__band", explode(array(lb - 1, lb, lb + 1)))
    val r = right.withColumn("__band", floor(rightVal / delta).cast("long"))
    l.join(r, Seq("__band"))
      .filter(abs(leftVal - rightVal) <= delta)
      .drop("__band")
  }
}
