package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small scalar helpers completing the SURVEY.md §2.8 checklist (C9, C16,
  * C18, C19; the rest live where they're used: C1–C8/C10–C15/C17/C20 in
  * sources/operators/sinks). All pure column expressions. */
object Scalars {

  /** C9 — graph date labels: `mm/dd`, with the year appended on the first
    * label of a year (`/root/reference/Plotting_Functions.py:1356–1449`). */
  def graphDateLabel(date: Column, isFirstOfYear: Column): Column =
    when(isFirstOfYear, date_format(date, "MM/dd/yyyy"))
      .otherwise(date_format(date, "MM/dd"))

  /** C9, all `dates_for_graph` variants
    * (`/root/reference/Plotting_Functions.py:1356–1449`):
    *
    *  - `dateRange` — `start-end` vs start only
    *  - `numericMonth` — `12/27` vs `Dec 27`
    *  - `year = None` — no year; `Some("all")` — two-digit year on every
    *    date (`12/27/20`); `Some("first")` — full year prefixed
    *    `2020: 12/27-01/02` on the first label and on each label whose
    *    END date starts a new year (the reference keys both the boundary
    *    test and the printed year off the END dates, `:1386–1405`)
    *  - `formatOverride` — a datetime pattern applied to both dates
    *    (Spark `date_format` codes here, vs strftime in the reference —
    *    same dial, host-native pattern language)
    */
  def graphDateLabel(start: Column, end: Column, dateRange: Boolean,
      numericMonth: Boolean, year: Option[String],
      newYear: Column = lit(false),
      formatOverride: Option[String] = None): Column = {
    def range(s: Column, e: Column): Column =
      if (dateRange) concat(s, lit("-"), e) else s
    formatOverride match {
      case Some(fmt) => range(date_format(start, fmt), date_format(end, fmt))
      case None =>
        val md = if (numericMonth) "MM/dd" else "MMM dd"
        year match {
          case None => range(date_format(start, md), date_format(end, md))
          case Some("all") =>
            val mdy = if (numericMonth) "MM/dd/yy" else "MMM dd yy"
            range(date_format(start, mdy), date_format(end, mdy))
          case Some("first") =>
            val base = range(date_format(start, md), date_format(end, md))
            when(newYear, concat(date_format(end, "yyyy"), lit(": "), base))
              .otherwise(base)
          case Some(other) =>
            throw new IllegalArgumentException(s"year must be all|first, got $other")
        }
    }
  }

  /** DataFrame face of [[graphDateLabel]]: adds a `label` column over
    * `(startCol, endCol)` rows ordered by start date. The `year="first"`
    * new-year flag needs each row's PREDECESSOR year — computed with the
    * scale-safe global rank ([[graft.operators.Ranks.globalRowNumber]])
    * and a self-join on rank−1 instead of a partition-less lag window, so
    * even this axis-shaped helper never plans a single-task stage. */
  def graphDateLabels(df: DataFrame, startCol: String, endCol: String,
      dateRange: Boolean = true, numericMonth: Boolean = true,
      year: Option[String] = None,
      formatOverride: Option[String] = None): DataFrame = {
    val yearFn = org.apache.spark.sql.functions.year _
    val ranked = graft.operators.Ranks.globalRowNumber(
      df, Seq(col(startCol).asc), "__rk")
    val prev = ranked.select((col("__rk") + 1).as("__rk"),
      yearFn(col(endCol)).as("__prev_end_year"))
    val newYear = col("__prev_end_year").isNull ||
      yearFn(col(endCol)) =!= col("__prev_end_year")
    ranked.join(prev, Seq("__rk"), "left")
      .withColumn("label",
        graphDateLabel(col(startCol), col(endCol), dateRange, numericMonth,
          year, newYear, formatOverride))
      .drop("__rk", "__prev_end_year")
  }

  /** C16 — `Drange` decimal range (`/root/reference/Seq_Tools.py:57–74`):
    * fractional-step sequence via integer scaling (exact, no float drift). */
  def drange(start: Double, stop: Double, step: Double, scale: Int = 1000000): Column =
    transform(
      sequence(lit((start * scale).round), lit((stop * scale).round),
        lit((step * scale).round)),
      i => i.cast("double") / scale)

  /** C18 — order-of-magnitude bounds for axis scaling
    * (`/root/reference/Plotting_Functions.py:1549–1555`). */
  def orderOfMagnitude(v: Column): Column = floor(log10(v))

  /** C19 — `complex_region_query`: protein match AND position membership
    * (`/root/reference/Plotting_Functions.py:400–412`). */
  def regionQuery(protein: Column, pos: Column, targetProtein: String,
      targets: Seq[Int]): Column =
    protein === targetProtein && pos.isin(targets.map(x => x: Any): _*)

  /** C3 — character count of `target` in `s` (`/root/reference/Seq_Tools.py:18–34`). */
  def charCount(s: Column, target: String): Column =
    length(s) - length(regexp_replace(s, java.util.regex.Pattern.quote(target), ""))
}
