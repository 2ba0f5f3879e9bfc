package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the payload of the
  * most recent right row at or before its timestamp within the same key
  * group. The temporal-join operator Spark has no native form for
  * (DuckDB: `ASOF JOIN`, which is exactly what the registered query's
  * oracle uses — an independent algorithm checking this one).
  *
  * NOT a join in the plan: the naive formulation
  * `left.join(right, keys && right.ts <= left.ts)` + per-left max plans a
  * per-key cartesian (|L|·|R| per key) and dies at scale. Here both
  * sides are union-tagged and ONE running window per key carries the
  * latest right payload forward (`last(_, ignoreNulls)` over rows
  * unbounded-preceding..current) — a single hash shuffle on the key, then
  * a per-partition sort; cost O((|L|+|R|) log) regardless of how many
  * right rows precede each left row. AsOfSpec asserts the plan contains
  * no join node at all.
  *
  * Semantics: the right payload travels as ONE struct, so the attached
  * columns always come from the SAME right row (never a per-column mix).
  * Right rows tied on (key, ts) are ordered by that payload struct, so
  * the greatest payload tuple wins a tie deterministically (pre-aggregate
  * the right side per (key, ts) — as the registered query does — when a
  * different tie policy matters). `strict = true` excludes right rows at
  * exactly the left timestamp (`<` instead of `<=`).
  */
object AsOf {

  /** @param payloads right-side columns to attach (names must not collide
    *                 with left columns)
    * @param leftOuter keep unmatched left rows with null payloads (true,
    *                  the default) or drop them (false) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloads: Seq[String],
      strict: Boolean = false, leftOuter: Boolean = true): DataFrame = {
    require(payloads.nonEmpty, "asofJoin needs at least one payload column")
    val collisions = payloads.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload names collide with left: $collisions")
    val ts = "__asof_ts"
    val side = "__asof_side"
    val pay = "__asof_p"
    val payType = right.select(struct(payloads.map(col): _*).as(pay))
      .schema.head.dataType
    val leftOther = left.columns.filterNot(keys.contains).toSeq
    // left rows sort at side 1; right rows sort BEFORE them at an equal
    // timestamp (side 0) so `<=` matches, or AFTER (side 2) for strict `<`
    val rSide = if (strict) 2 else 0
    val lT = left.select(
      keys.map(col) ++ Seq(col(leftTs).as(ts), lit(1).as(side),
        lit(null).cast(payType).as(pay)) ++ leftOther.map(col): _*)
    val rT = right.select(
      keys.map(col) ++ Seq(col(rightTs).as(ts), lit(rSide).as(side),
        struct(payloads.map(col): _*).as(pay)) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(pay).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lT.unionByName(rT)
      .withColumn("__m", last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    val kept = if (leftOuter) matched else matched.filter(col("__m").isNotNull)
    kept.select(
      keys.map(col) ++ leftOther.map(col) ++
        payloads.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** SCD2 validity intervals from a change stream: every change row gets
    * half-open `[valid_from, valid_to)` bounds, `valid_to` = the NEXT
    * change's timestamp within the key (null = currently valid). One
    * shuffle on the key, one `lead()` window. `tieBreak` columns order
    * same-timestamp changes deterministically — without them, tied rows
    * would chain in partition-dependent order. Combine with [[asofJoin]]
    * when a point-in-time lookup is all that's needed (no materialized
    * intervals). */
  def intervalize(df: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(tsCol).asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }
}
