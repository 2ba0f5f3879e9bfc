package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7.4 risk 4: the Spike-protein partition
  * dominates real GISAID data; one reducer would own most of the corpus).
  *
  * AQE's skew-join split handles JOIN skew at runtime; aggregation skew on
  * a hot GROUP BY key still funnels every row of that key through one
  * partial-agg reducer. [[saltedAggregate]] is the classic two-phase fix:
  * aggregate on (key, salt) first — spreading the hot key over `salts`
  * reducers — then re-aggregate by key. Correct for any algebraic
  * aggregate (sum/count/min/max); means are derived from sum+count.
  */
object Skew {

  def withSalt(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))

  /** Two-phase salted sum/count per key. `aggs` maps output column name →
    * column to sum. Phase 1 shuffles (key, salt) — at most `salts` rows
    * per key per reducer; phase 2 shuffles the tiny partial table. */
  def saltedAggregate(df: DataFrame, keyCol: Column, salts: Int,
      aggs: Map[String, Column]): DataFrame = {
    val salted = withSalt(df, salts)
    val partial = salted.groupBy(keyCol.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        aggs.map { case (n, c) => sum(c).as(n) }.toSeq: _*)
    val finalAggs = sum(col("__cnt")).as("n") +:
      aggs.keys.toSeq.map(n => sum(col(n)).as(n))
    partial.groupBy("key").agg(finalAggs.head, finalAggs.tail: _*)
  }
}
