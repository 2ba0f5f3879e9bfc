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

  /** Interval OVERLAP join, large × large — pairs whose closed intervals
    * `[s, e]` intersect (touching endpoints count). The genomic /
    * temporal-validity classic; the naive form is a theta join
    * (|L|×|R| nested loop). Here both sides explode onto a grid of
    * cells of width `grid` and EQUI-join on the cell id — the
    * [[bandJoin]] move generalized to intervals — so the shuffle is
    * `rows × cells-per-interval` and the join fans out only inside
    * cells where intervals actually coexist.
    *
    * Each overlapping pair would meet in EVERY shared cell; instead of
    * a distinct, the pair is emitted only from its canonical cell — the
    * one containing `max(s_l, s_r)`, the overlap's start, which both
    * intervals cover by definition. Exactly-once emission, no dedup
    * shuffle.
    *
    * Contract (assert_true'd in-plan, the fail-fast convention):
    * coordinates non-negative with `e ≥ s`, and every interval spans at
    * most `maxCells` grid cells — an interval longer than
    * `maxCells × grid` needs a coarser grid, and silently clipping it
    * would silently lose pairs. Coordinates stay below 2^53 so the
    * double floor-division that both engines replay is exact at cell
    * boundaries. Output: all left columns then all right columns
    * (caller guarantees distinct names, as in [[bandJoin]]). */
  def intervalOverlapJoin(left: DataFrame, ls: Column, le: Column,
      right: DataFrame, rs: Column, re: Column, grid: Long,
      maxCells: Int = 1024): DataFrame = {
    require(grid > 0, "grid must be positive")
    def cellOf(c: Column): Column =
      floor(c.cast("double") / lit(grid.toDouble)).cast("long")
    def cells(s: Column, e: Column, side: String): Column = {
      val lo = cellOf(s); val hi = cellOf(e)
      when(assert_true(s >= 0 && e >= s &&
          hi - lo + 1 <= maxCells, concat(
        lit(s"intervalOverlapJoin($side): need 0 <= s <= e and span <= " +
          s"maxCells=$maxCells grid cells of $grid; got [s="), s.cast("string"),
        lit(", e="), e.cast("string"), lit("]"))).isNull,
        sequence(lo, hi))
    }
    val l = left.withColumn("__cell", explode(cells(ls, le, "left")))
    val r = right.withColumn("__cell", explode(cells(rs, re, "right")))
    l.join(r, Seq("__cell"))
      .filter(ls <= re && rs <= le &&
        col("__cell") === cellOf(greatest(ls, rs)))
      .drop("__cell")
  }
}
