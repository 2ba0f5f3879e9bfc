package graft.functions

import org.apache.spark.sql.Column
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
