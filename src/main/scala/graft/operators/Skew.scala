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

  /** Salted equi-join for a SKEWED probe side — the manual fix when
    * AQE's runtime skew split can't apply (known-hot keys, a build side
    * that must shuffle anyway, or a sort-merge join whose one hot key
    * funnels a corpus partition through one task). Probe rows take a
    * salt in [0, salts); build rows REPLICATE once per salt; the join
    * key widens to (key, salt), spreading every hot key over `salts`
    * reducers at the cost of salts× build-side shuffle volume — the
    * standard trade when the build side is the small-but-unbroadcastable
    * one. Output equals the unsalted join EXACTLY (each probe row meets
    * precisely its salt's full build replica; differential-tested in
    * LlmOperatorsSpec and oracle-checked by j_skew_salted_join against
    * the plain join).
    *
    * Join types where build replication is sound: inner, left/left_outer
    * (null-extension per probe row unchanged), left_semi, left_anti.
    * Right/full would duplicate unmatched build rows — rejected. */
  def saltedJoin(probe: DataFrame, probeKey: Column, build: DataFrame,
      buildKey: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(Set("inner", "left", "left_semi", "left_anti", "leftsemi",
      "leftanti").contains(jt),
      s"saltedJoin: build-side replication is unsound for '$joinType' " +
        "(unmatched build rows would appear once per salt)")
    require(salts > 0, "salts must be positive")
    val p = probe.withColumn("__psalt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val b = build.withColumn("__bsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, probeKey === buildKey && col("__psalt") === col("__bsalt"),
        joinType)
      .drop("__psalt", "__bsalt")
  }
}
