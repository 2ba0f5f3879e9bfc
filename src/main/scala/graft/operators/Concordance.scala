package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival discrimination metrics — grading the risk scores the
  * estimation side (Cox, conformal, any model) produces against what
  * actually happened: Harrell's C-index (the censoring-aware AUC) and
  * the time-dependent cumulative/dynamic AUC(t) / Brier(t) ladder.
  *
  * The shared scale problem: every metric here is defined over PAIRS of
  * subjects (or subject×horizon), and the naive estimator is an O(n²)
  * cross join — the reason this family was shelved twice. The move that
  * makes them distributed is the same one everywhere in this file:
  *
  *  1. RISK-BUCKET DECOMPOSITION — subjects land in `buckets`
  *     approximate-quantile risk buckets (assignment is monotone BY
  *     VALUE, so equal risks share a bucket and cross-bucket order is
  *     STRICT). A pair spanning two buckets has a known risk order, so
  *     its contribution reduces to per-(bucket, time) counts on a
  *     B×T grid — window cumulative sums, no pair enumeration.
  *  2. BOUNDED IN-ROW RESOLUTION — only same-bucket pairs (unknown
  *     order) need cell-level comparison; each bucket's distinct
  *     (t, risk) cells collect in-row (`maxBucketCells` fail-fast) and
  *     a bounded O(cells²) fold counts them exactly, the
  *     kaplanMeier-fold discipline. Work is O(Σ m_b²) ≈ O(n²/B): pick
  *     B ≈ n/1000 and the in-row total is ~1000·n — linear-ish, never
  *     a shuffle.
  *
  * Every count is an exact BIGINT (concordance doubles: 2·concordant +
  * ties, so ½-credit ties never leave integer land); the only float is
  * the final division — results hash unrounded and are INDEPENDENT of
  * `buckets`, which tunes cost only.
  */
object Concordance {

  /** Harrell's concordance index per group (Harrell et al., JAMA
    * 1982) — the discrimination statistic for censored time-to-event
    * data: over comparable pairs, the probability the model ranked the
    * earlier-failing subject as higher-risk.
    *
    * Comparable pairs (the standard convention): index subject i must
    * be an EVENT, and j survives past it — t_j > t_i, or t_j = t_i
    * with j censored. Two events at the same time are not comparable;
    * ties in risk score credit ½.
    *
    *   C = [Σ 2·(r_j < r_i) + 1·(r_j = r_i)] / (2·Σ comparable)
    *
    * Decomposition (see the object doc): cross-bucket pairs resolve on
    * the densified bucket×time grid — F(b,t) = later-mass of bucket b
    * past time t (suffix window) + its censored mass AT t; an event
    * cell at (b,t) contributes d·Σ_{b'<b}F(b',t) doubled-concordant
    * (strictly lower bucket ⇒ strictly lower risk, no tie term) and
    * d·Σ_{b'}F(b',t) comparable. Same-bucket pairs (including risk
    * ties) resolve in the bounded in-row fold. Both integer-exact.
    *
    * Output: groups... + (n, n_events, comparable_pairs, concordant2
    * [= 2·concordant + risk-ties], c_index). c_index null when no
    * comparable pairs. */
  def harrellC(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, riskCol: Column,
      buckets: Int = 64, maxTimes: Int = 1000,
      maxBucketCells: Int = 4096): DataFrame = {
    val (base, cells, g) = riskCells(df, groupCols, durationCol,
      eventCol, riskCol, buckets, maxTimes)
    val names = groupCols

    // ---- cross-bucket via the densified bucket × time grid ----
    val times = cells.select(g :+ col("__t"): _*).distinct()
    val bkts = cells.select(g :+ col("__b"): _*).distinct()
    val byBT = cells.groupBy(g ++ Seq(col("__b"), col("__t")): _*)
      .agg(sum(col("__nall")).as("__a"), sum(col("__ncen")).as("__c"))
    val grid = bkts.join(times, names)
      .join(byBT, names ++ Seq("__b", "__t"), "left")
      .na.fill(0L, Seq("__a", "__c"))
    val wSuf = Window.partitionBy((names :+ "__b").map(col): _*)
      .orderBy(col("__t")).rowsBetween(1, Window.unboundedFollowing)
    val wLow = Window.partitionBy((names :+ "__t").map(col): _*)
      .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val wAllB = Window.partitionBy((names :+ "__t").map(col): _*)
    val gridF = grid
      .withColumn("__f", coalesce(sum(col("__a")).over(wSuf), lit(0L)) +
        col("__c"))
      .withColumn("__lowF", coalesce(sum(col("__f")).over(wLow), lit(0L)))
      .withColumn("__denF", sum(col("__f")).over(wAllB))
    val evAgg = cells.filter(col("__nev") > 0L)
      .groupBy(g ++ Seq(col("__b"), col("__t")): _*)
      .agg(sum(col("__nev")).as("__d"))
    val cross = evAgg
      .join(gridF.select(g ++ Seq(col("__b"), col("__t"), col("__lowF"),
        col("__denF")): _*), names ++ Seq("__b", "__t"))
      .groupBy(g: _*)
      .agg(sum(col("__d") * col("__lowF") * 2L).as("__num2x"),
        sum(col("__d") * col("__denF")).as("__den"))

    // ---- same-bucket pairs: bounded in-row exact fold ----
    val within = withinBucketFold(cells, names, maxBucketCells,
      // index cell a (events) vs cell b: later mass and doubled credit
      (a, b) => {
        val m = when(b.getField("__t") > a.getField("__t"),
            b.getField("__nall"))
          .when(b.getField("__t") === a.getField("__t"),
            b.getField("__ncen"))
          .otherwise(lit(0L))
        val credit = when(b.getField("__r") < a.getField("__r"), lit(2L))
          .when(b.getField("__r") === a.getField("__r"), lit(1L))
          .otherwise(lit(0L))
        a.getField("__nev") * m * credit
      })
      .groupBy(g: _*).agg(sum(col("__w2")).as("__num2w"))

    val totals = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"))
    totals
      .join(cross, names, "left").join(within, names, "left")
      .na.fill(0L, Seq("__num2x", "__den", "__num2w"))
      // num2 ≤ 2n², den ≤ n² — in BIGINT iff n < √(2⁶²); the witness
      // multiplies as DOUBLE so it cannot itself wrap
      .filter(assert_true(col("n").cast("double") * col("n")
          .cast("double") < lit(math.pow(2, 62)),
        lit("harrellC: n² wraps BIGINT pair counts — shard groups"))
        .isNull)
      .withColumn("comparable_pairs", col("__den"))
      .withColumn("concordant2", col("__num2x") + col("__num2w"))
      .withColumn("c_index", when(col("__den") > 0L,
        col("concordant2").cast("double") /
          (lit(2.0) * col("__den").cast("double"))))
      .select(g ++ Seq(col("n"), col("n_events"),
        col("comparable_pairs"), col("concordant2"), col("c_index")): _*)
  }

  /** Shared front half: subjects → (t, e, r, bucket) plus the exact
    * per-(group, bucket, t, r) cell counts, with the maxTimes grid
    * fail-fast. Bucket assignment is monotone by risk VALUE (count of
    * approximate-quantile boundaries strictly below r), so equal risks
    * share a bucket and cross-bucket order is strict — exactness never
    * depends on where the approximate boundaries land. */
  private def riskCells(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, riskCol: Column,
      buckets: Int, maxTimes: Int): (DataFrame, DataFrame, Seq[Column]) = {
    require(buckets >= 1 && buckets <= 4096,
      s"buckets in 1..4096, got $buckets")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val base = df
      .filter(durationCol.isNotNull && ev.isNotNull && riskCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("double").as("__t"),
        ev.as("__e"), riskCol.cast("double").as("__r")): _*)
    val bounds = base.groupBy(g: _*)
      .agg(percentile_approx(col("__r"),
        array((1 until buckets).map(i =>
          lit(i.toDouble / buckets)): _*), lit(10000)).as("__bs"))
    val withB =
      if (buckets == 1) base.withColumn("__b", lit(0))
      else base.join(broadcast(bounds), groupCols)
        .withColumn("__b", aggregate(col("__bs"), lit(0),
          (acc, b) => acc + when(b < col("__r"), 1).otherwise(0)))
        .drop("__bs")
    val cells = withB
      .groupBy(g ++ Seq(col("__b"), col("__t"), col("__r")): _*)
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__nev"),
        sum(when(!col("__e"), 1L).otherwise(0L)).as("__ncen"))
      .withColumn("__nall", col("__nev") + col("__ncen"))
      .withColumn("__tn", size(collect_set(col("__t")).over(
        Window.partitionBy(g: _*))))
      .filter(assert_true(col("__tn") <= maxTimes,
        lit(s"a group exceeds maxTimes=$maxTimes distinct times — " +
          "bin durations coarser first")).isNull)
      .drop("__tn")
    (base, cells, g)
  }

  /** Bounded same-bucket pair fold: collects each (group, bucket)'s
    * distinct (t, r) cells sorted (≤ maxBucketCells fail-fast: raise
    * `buckets` instead) and sums `term(a, b)` over ALL ordered cell
    * pairs in-row — exact BIGINT, O(cells²) bounded, never a shuffle. */
  private def withinBucketFold(cells: DataFrame, names: Seq[String],
      maxBucketCells: Int, term: (Column, Column) => Column): DataFrame = {
    val g = names.map(col)
    val packed = cells.groupBy(g :+ col("__b"): _*)
      .agg(sort_array(collect_list(struct(col("__t"), col("__r"),
        col("__nev"), col("__ncen"), col("__nall")))).as("__cs"))
      .filter(assert_true(size(col("__cs")) <= maxBucketCells,
        lit(s"a risk bucket exceeds maxBucketCells=$maxBucketCells " +
          "distinct (t, risk) cells — raise `buckets` to split it"))
        .isNull)
    val s = col("__cs")
    packed.withColumn("__w2",
      aggregate(sequence(lit(1), size(s)), lit(0L), (acc, i) => {
        val a = element_at(s, i)
        acc + when(a.getField("__nev") > 0L,
          aggregate(sequence(lit(1), size(s)), lit(0L),
            (acc2, j) => acc2 + term(a, element_at(s, j))))
          .otherwise(lit(0L))
      }))
  }
}
