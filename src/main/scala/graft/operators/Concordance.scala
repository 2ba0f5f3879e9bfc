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
    val gridF = crossGrid(cells, names, maxTimes, "harrellC")
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

  /** Uno's IPCW concordance per group (Uno et al., Stat. Med. 2011) —
    * [[harrellC]] corrected for censoring dependence: Harrell's C
    * estimates a quantity that depends on the study's own censoring
    * distribution; Uno reweights every comparable pair by the inverse
    * squared censoring survival at the index event, w(tᵢ) = Ĝ(tᵢ⁻)⁻²,
    * and restricts index events to tᵢ ≤ τ, recovering a
    * population-level concordance. Same comparability/tie convention
    * as [[harrellC]] (τ applied to the index side).
    *
    * Machinery: the weight depends ONLY on the index cell, so the
    * whole bucket-grid decomposition carries over — per index cell
    * (t, r) the exact doubled partner credit is n_ev·(2·lowF +
    * same-bucket inner), an exact BIGINT; it is multiplied by w(t)
    * (from the collected censoring-KM grid, the [[brierIpcw]] lookup)
    * and floor-quantized ONCE per cell (so an engine mirror replays
    * the identical floor chain); the quantized numerators and
    * denominators sum associatively. In-plan witnesses guard both the
    * per-cell floor and the BIGINT sum.
    *
    * Output: groups... + (n, n_events, c_uno); c_uno null when no
    * weighted comparable mass. */
  def unoC(df: DataFrame, groupCols: Seq[String], durationCol: Column,
      eventCol: Column, riskCol: Column, tau: Double,
      buckets: Int = 64, maxTimes: Int = 1000,
      maxBucketCells: Int = 4096, quantScale: Double = 1e6): DataFrame = {
    require(quantScale >= 1e3 && quantScale <= 1e9 &&
      quantScale == math.floor(quantScale),
      s"quantScale integral in [1e3, 1e9], got $quantScale")
    val (base, cells, g) = riskCells(df, groupCols, durationCol,
      eventCol, riskCol, buckets, maxTimes)
    val names = groupCols
    val gridF = crossGrid(cells, names, maxTimes, "unoC")
    // per-index-cell same-bucket partner credit, EXCLUDING the n_ev
    // multiplicity (every subject in a cell shares (t, r), so shares
    // the credit sum)
    val packed = cells.groupBy(g :+ col("__b"): _*)
      .agg(sort_array(collect_list(struct(col("__t"), col("__r"),
        col("__nev"), col("__ncen"), col("__nall")))).as("__cs"))
      .filter(assert_true(size(col("__cs")) <= maxBucketCells,
        lit(s"unoC: a risk bucket exceeds maxBucketCells=" +
          s"$maxBucketCells distinct (t, risk) cells — raise `buckets`"))
        .isNull)
    val s = col("__cs")
    val perCell = packed
      .select(g ++ Seq(col("__b"), explode(transform(s, a =>
        struct(a.getField("__t").as("t"), a.getField("__r").as("r"),
          a.getField("__nev").as("nev"),
          aggregate(s, lit(0L), (acc, b) => {
            val m = when(b.getField("__t") > a.getField("__t"),
                b.getField("__nall"))
              .when(b.getField("__t") === a.getField("__t"),
                b.getField("__ncen"))
              .otherwise(lit(0L))
            val credit = when(b.getField("__r") < a.getField("__r"),
                lit(2L))
              .when(b.getField("__r") === a.getField("__r"), lit(1L))
              .otherwise(lit(0L))
            acc + m * credit
          }).as("inner2")))).as("__pc")): _*)
      .select(g ++ Seq(col("__b"), col("__pc.t").as("__t"),
        col("__pc.r").as("__r"), col("__pc.nev").as("__nev"),
        col("__pc.inner2").as("__inner2")): _*)
      .filter(col("__nev") > 0L && col("__t") <= tau)
    // censoring KM grid for the weights (the brierIpcw lookup)
    val cens = Stats.kaplanMeier(base, names, col("__t"), !col("__e"),
      maxTimes)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("t"), col("survival"))))
        .as("__gr"))
    val joined = perCell
      .join(gridF.select(g ++ Seq(col("__b"), col("__t"),
        col("__lowF"), col("__denF")): _*), names ++ Seq("__b", "__t"))
      .join(broadcast(cens), names)
    // binary-search step lookup (r16) — see [[Stats.stepLookupLt1]];
    // was an interpreted O(|grid|) fold per cell row
    val gtm = Stats.stepLookupLt1(col("__gr"), col("__t"))
    val w = lit(1.0) / (gtm * gtm)
    val num2 = col("__nev") * (lit(2L) * col("__lowF") + col("__inner2"))
    val den = col("__nev") * col("__denF")
    val qn = num2.cast("double") * w * lit(quantScale)
    val qd = den.cast("double") * w * lit(quantScale)
    val sums = joined
      .filter(assert_true(gtm > 0.0,
        lit("unoC: censoring survival hit 0 at an index event <= tau " +
          "— lower tau")).isNull)
      .filter(assert_true(qn < 9.2e18 && qd < 9.2e18,
        lit("unoC: quantized cell term exceeds BIGINT — lower " +
          "quantScale")).isNull)
      .select(g ++ Seq(floor(qn).cast("long").as("__qn"),
        floor(qd).cast("long").as("__qd")): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__nc"), sum(col("__qn")).as("__sn"),
        sum(col("__qd")).as("__sd"), greatest(max(col("__qn")),
          max(col("__qd"))).as("__mx"))
      .filter(assert_true(col("__nc").cast("double") *
          greatest(col("__mx"), lit(0L)).cast("double") < 4.6e18,
        lit("unoC: quantized sum may wrap BIGINT — lower quantScale " +
          "or shard groups")).isNull)
    val totals = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"))
    totals.join(sums, names, "left")
      .withColumn("c_uno", when(col("__sd") > 0L,
        col("__sn").cast("double") /
          (lit(2.0) * col("__sd").cast("double"))))
      .select(g ++ Seq(col("n"), col("n_events"), col("c_uno")): _*)
  }

  /** Time-dependent cumulative/dynamic AUC(t) per group (Heagerty &
    * Zheng 2005, the unweighted C/D estimator): at each horizon h,
    * cases = subjects who FAILED by h (t ≤ h, event), controls =
    * subjects still at risk past h (t > h); AUC(h) is the probability
    * a random case outranks a random control on the risk score — i.e.
    * EXACTLY the Mann–Whitney/[[Stats.auc]] statistic of the
    * horizon-sliced labels, midrank ties and all. Censored-by-h
    * subjects drop from that horizon (the unweighted estimator; the
    * IPCW-weighted variant is [[brierIpcw]]'s weighting applied to
    * ranks — out of scope, documented).
    *
    * Shape: ONE explode of the ≤ `maxHorizons` horizon literals (the
    * data-sized pass), then the exact doubled-midrank machinery per
    * (group, horizon) — counts are BIGINTs, `auc` one division, every
    * column hashes unrounded.
    *
    * Output: groups... + (h, n_cases, n_controls, auc). */
  def aucT(df: DataFrame, groupCols: Seq[String], durationCol: Column,
      eventCol: Column, riskCol: Column,
      horizons: Seq[Double]): DataFrame = {
    require(horizons.nonEmpty && horizons.size <= 50,
      s"aucT needs 1..50 horizons, got ${horizons.size}")
    require(horizons.distinct.size == horizons.size,
      "aucT horizons must be distinct")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val lab = df
      .filter(durationCol.isNotNull && ev.isNotNull && riskCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("double").as("__t"),
        ev.as("__e"), riskCol.cast("double").as("__r")): _*)
      .withColumn("h", explode(array(horizons.map(lit): _*)))
      .withColumn("__case",
        when(col("__t") <= col("h") && col("__e"), lit(true))
          .when(col("__t") > col("h"), lit(false)))
      .filter(col("__case").isNotNull)
    Stats.auc(lab, g :+ col("h"), col("__r"), col("__case"))
      .withColumnRenamed("n_pos", "n_cases")
      .withColumnRenamed("n_neg", "n_controls")
  }

  /** IPCW-weighted cumulative/dynamic AUC(t) per group (Uno et al.,
    * JASA 2007) — [[aucT]] corrected for censoring dependence: every
    * CASE weights by a_i = Ĝ(t_i⁻)⁻²; the common control weight
    * Ĝ(h)⁻² cancels between numerator and denominator, so controls
    * stay unweighted and the pair sum FACTORIZES into one weighted
    * rank pass:
    *
    *   AUC_w(h) = Σ_cases a_i·[#ctrl(r<r_i) + ½#ctrl(r=r_i)]
    *              / (Σ_cases a_i · n_ctrl)
    *
    * Per-subject weights floor-quantize (·quantScale) so the weighted
    * doubled-credit sums are exact BIGINTs over the distinct-risk cell
    * frame (one window cumsum of control counts per (group, horizon))
    * — the quantized-weights estimand, replayed exactly by a mirror.
    * In-plan witnesses guard the per-cell product and the sums;
    * horizons where Ĝ hits 0 at a case's event time fail fast.
    *
    * Output: groups... + (h, n_cases, n_controls, auc_ipcw). */
  def aucTIpcw(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, riskCol: Column,
      horizons: Seq[Double], quantScale: Double = 1e6,
      maxTimes: Int = 1000): DataFrame = {
    require(horizons.nonEmpty && horizons.size <= 50,
      s"aucTIpcw needs 1..50 horizons, got ${horizons.size}")
    require(quantScale >= 1e3 && quantScale <= 1e9 &&
      quantScale == math.floor(quantScale),
      s"quantScale integral in [1e3, 1e9], got $quantScale")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val base = df
      .filter(durationCol.isNotNull && ev.isNotNull && riskCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("double").as("__t"),
        ev.as("__e"), riskCol.cast("double").as("__r")): _*)
    val cens = Stats.kaplanMeier(base, groupCols, col("__t"), !col("__e"),
      maxTimes)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("t"), col("survival"))))
        .as("__gr"))
    val lab = base.join(broadcast(cens), groupCols)
      .withColumn("h", explode(array(horizons.map(lit): _*)))
      .withColumn("__case",
        when(col("__t") <= col("h") && col("__e"), lit(true))
          .when(col("__t") > col("h"), lit(false)))
      .filter(col("__case").isNotNull)
    // binary-search step lookup (r16) — see [[Stats.stepLookupLt1]];
    // was an interpreted O(|grid|) fold per (subject, horizon) row
    val gtm = Stats.stepLookupLt1(col("__gr"), col("__t"))
    val qa = when(col("__case"),
      floor((lit(1.0) / (gtm * gtm)) * lit(quantScale)).cast("long"))
      .otherwise(lit(0L))
    val cells = lab
      .filter(assert_true(!col("__case") || gtm > 0.0,
        lit("aucTIpcw: censoring survival hit 0 at a case's event " +
          "time — trim horizons")).isNull)
      .withColumn("__qa", qa)
      .groupBy(g ++ Seq(col("h"), col("__r").as("__x")): _*)
      .agg(sum(col("__qa")).as("__qa"),
        sum(when(!col("__case"), 1L).otherwise(0L)).as("__c2"),
        sum(when(col("__case"), 1L).otherwise(0L)).as("__c1"))
    val wCum = Window.partitionBy((groupCols :+ "h").map(col): _*)
      .orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__cum2", sum(col("__c2")).over(wCum))
      .filter(assert_true(col("__qa").cast("double") *
          (lit(2.0) * col("__cum2").cast("double")) < 4.6e18,
        lit("aucTIpcw: weighted cell credit exceeds BIGINT — lower " +
          "quantScale")).isNull)
      .groupBy(g :+ col("h"): _*)
      .agg(sum(col("__qa") * (lit(2L) * (col("__cum2") - col("__c2")) +
          col("__c2"))).as("__num"),
        sum(col("__qa")).as("__w"), sum(col("__c2")).as("n_controls"),
        sum(col("__c1")).as("n_cases"))
      .filter(assert_true(col("__w").cast("double") * lit(2.0) *
          col("n_controls").cast("double") < 4.6e18,
        lit("aucTIpcw: weighted denominator exceeds BIGINT — lower " +
          "quantScale")).isNull)
      .withColumn("auc_ipcw",
        when(col("__w") > 0L && col("n_controls") > 0L,
          col("__num").cast("double") /
            (lit(2.0) * col("__w").cast("double") *
              col("n_controls").cast("double"))))
      .select(g ++ Seq(col("h"), col("n_cases"), col("n_controls"),
        col("auc_ipcw")): _*)
  }

  /** IPCW Brier score BS(t) per group (Graf et al., Stat. Med. 1999)
    * — calibration-plus-discrimination grading of predicted survival
    * probabilities under censoring: at horizon h,
    *
    *   BS(h) = (1/n) Σᵢ wᵢ(h) · (ŝᵢ(h) − 1{tᵢ > h})²
    *   wᵢ(h) = 1{tᵢ ≤ h, event}/Ĝ(tᵢ⁻) + 1{tᵢ > h}/Ĝ(h)
    *
    * with Ĝ the Kaplan–Meier of the CENSORING distribution (events
    * flipped — the `kaplanMeier` machinery reused verbatim, so Ĝ's
    * step values replay engine-portably via the same recursion the
    * c_kaplan_meier oracle already mirrors). Censored-by-h subjects
    * get weight 0; a horizon where Ĝ hits 0 while weighted mass
    * remains fails fast (trim horizons — the standard contract).
    *
    * Portability: Ĝ lookups are in-row folds over the collected
    * ≤ maxTimes censoring grid (broadcast — one small join); each
    * subject's term is a FIXED float expression; terms quantize to
    * BIGINT (floor(term·quantScale), the logisticFit discipline)
    * before the only cross-row sum, so the aggregate is associative
    * and plan-order-free; the readout is one division. A max-term
    * witness guards the BIGINT sum against wrap.
    *
    * `predCol` must be an array<double> aligned with `horizons`
    * (ŝᵢ(h_k) at position k). Output: groups... + (h, n, n_cases,
    * n_controls, brier). */
  def brierIpcw(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, predCol: Column,
      horizons: Seq[Double], quantScale: Double = 1e12,
      maxTimes: Int = 1000): DataFrame = {
    require(horizons.nonEmpty && horizons.size <= 50,
      s"brierIpcw needs 1..50 horizons, got ${horizons.size}")
    require(quantScale >= 1e3 && quantScale <= 1e12 &&
      quantScale == math.floor(quantScale),
      s"quantScale integral in [1e3, 1e12], got $quantScale")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val base = df
      .filter(durationCol.isNotNull && ev.isNotNull && predCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("double").as("__t"),
        ev.as("__e"), predCol.cast("array<double>").as("__p")): _*)
      .filter(assert_true(size(col("__p")) === horizons.size,
        lit(s"brierIpcw: predCol must hold ${horizons.size} entries " +
          "aligned with `horizons`")).isNull)
    // censoring KM: flip the event flag; grid ≤ maxTimes per group
    val cens = Stats.kaplanMeier(base, groupCols, col("__t"), !col("__e"),
      maxTimes)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("t"), col("survival"))))
        .as("__gr"))
    val joined = base.join(broadcast(cens), groupCols)
      .select(g ++ Seq(col("__t"), col("__e"), col("__p"),
        col("__gr")): _*)
      .select(g ++ Seq(col("__t"), col("__e"), col("__gr"),
        posexplode(col("__p")).as(Seq("__hi", "__pred"))): _*)
      .withColumn("h", element_at(array(horizons.map(lit): _*),
        col("__hi") + 1))
    // Ĝ is a right-continuous step function: value at x = survival of
    // the LAST grid time ≤ x (seed 1.0); the left limit Ĝ(t⁻) uses
    // strict <. Binary-search lookup (r16) — see [[Stats.stepLookupLt1]];
    // was an interpreted O(|grid|) fold per (subject, horizon) row.
    def gAt(x: Column, strict: Boolean): Column =
      if (strict) Stats.stepLookupLt1(col("__gr"), x)
      else Stats.stepLookupLeq1(col("__gr"), x)
    val isCase = col("__t") <= col("h") && col("__e")
    val isCtrl = col("__t") > col("h")
    val gDen = when(isCase, gAt(col("__t"), strict = true))
      .when(isCtrl, gAt(col("h"), strict = false))
    val term = when(isCase || isCtrl, {
      val o = when(isCtrl, lit(1.0)).otherwise(lit(0.0))
      val d = col("__pred") - o
      (lit(1.0) / gDen) * (d * d)
    }).otherwise(lit(0.0))
    val withQ = joined
      .filter(assert_true(gDen.isNull || gDen > 0.0,
        lit("brierIpcw: censoring survival hit 0 with weighted mass " +
          "remaining — trim horizons below the last censoring time"))
        .isNull)
      .withColumn("__q", floor(term * lit(quantScale)).cast("long"))
    withQ.groupBy(g :+ col("h"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(isCase, 1L).otherwise(0L)).as("n_cases"),
        sum(when(isCtrl, 1L).otherwise(0L)).as("n_controls"),
        sum(col("__q")).as("__sq"), max(col("__q")).as("__mq"))
      // BIGINT wrap witness for the quantized sum (DOUBLE multiply)
      .filter(assert_true(col("n").cast("double") *
          greatest(col("__mq"), lit(0L)).cast("double") < lit(4.6e18),
        lit("brierIpcw: quantized term sum may wrap BIGINT — lower " +
          "quantScale or shard groups")).isNull)
      .withColumn("brier",
        (col("__sq").cast("double") / lit(quantScale)) /
          col("n").cast("double"))
      .select(g ++ Seq(col("h"), col("n"), col("n_cases"),
        col("n_controls"), col("brier")): _*)
  }

  /** Survival-model calibration at one horizon per group (the
    * "one-calibration" decile table, Demler et al. 2015 style): does a
    * predicted event probability at h MEAN what it says? Subjects rank
    * into `bins` equal-depth deciles of the prediction (deterministic
    * (pred, id) order — the qiniCurve convention), and each decile
    * reports the mean prediction against the OBSERVED Kaplan–Meier
    * event probability 1 − Ŝ_decile(h) — censoring-correct where a
    * naive event rate is biased low.
    *
    * Portability: decile assignment is NTILE over a partitioned,
    * tie-broken window; mean predictions floor-quantize per subject
    * before the BIGINT sum (order-free); the per-decile KM rides
    * [[Stats.kaplanMeierFromCounts]] (the recursion every survival
    * oracle already mirrors) and Ŝ(h) is max_by over the ≤ maxTimes
    * grid rows at t ≤ h. Output: groups... + (bin 1..bins, n,
    * n_events, mean_pred, observed) — `observed` null only when the
    * decile is empty (it cannot be: ntile fills every bin when
    * n ≥ bins). */
  def survivalCalibration(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, predCol: Column,
      idCol: Column, horizon: Double, bins: Int = 10,
      quantScale: Double = 1e12, maxTimes: Int = 1000): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins in 2..100, got $bins")
    require(quantScale >= 1e3 && quantScale <= 1e12 &&
      quantScale == math.floor(quantScale),
      s"quantScale integral in [1e3, 1e12], got $quantScale")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val w = Window.partitionBy(g: _*)
      .orderBy(col("__p").asc, col("__id").asc)
    val base = df
      .filter(durationCol.isNotNull && ev.isNotNull &&
        predCol.isNotNull && idCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("double").as("__t"),
        ev.as("__e"), predCol.cast("double").as("__p"),
        idCol.as("__id")): _*)
      .withColumn("bin", ntile(bins).over(w))
    val perBin = base
      .groupBy(g :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"),
        sum(floor(col("__p") * lit(quantScale)).cast("long")).as("__qp"))
    val km = Stats.kaplanMeier(base, groupCols :+ "bin", col("__t"),
      col("__e"), maxTimes)
    val sAtH = km.filter(col("t") <= horizon)
      .groupBy(g :+ col("bin"): _*)
      .agg(max_by(col("survival"), col("t")).as("__sh"))
    perBin
      .join(sAtH, groupCols :+ "bin", "left")
      .withColumn("mean_pred",
        (col("__qp").cast("double") / lit(quantScale)) /
          col("n").cast("double"))
      .withColumn("observed",
        lit(1.0) - coalesce(col("__sh"), lit(1.0)))
      .select(g ++ Seq(col("bin"), col("n"), col("n_events"),
        col("mean_pred"), col("observed")): _*)
  }

  /** The PARTIAL behind the STREAMING face of survival calibration:
    * exact per-(group, bin, t) BIGINT (events, censored, quantized-
    * prediction-sum) cells under CALLER-FROZEN bin edges — three
    * associative sums, so batch-sliced partials re-summed per cell are
    * exactly the one-shot table. Freezing the edges is what makes the
    * partial sound (the frozen-model discipline): [[survivalCalibration]]'s
    * NTILE deciles depend on ALL data, so they cannot accumulate
    * incrementally; a monitoring pipeline pre-registers the bin edges
    * instead. bin = 1 + #{edges < pred} — monotone by value. Closed
    * subjects only (the [[Stats.survivalCounts]] streaming contract). */
  def calibrationCounts(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column, predCol: Column,
      edges: Seq[Double], quantScale: Double = 1e12): DataFrame = {
    require(edges.nonEmpty && edges.size <= 31 &&
      edges == edges.sorted && edges.distinct.size == edges.size,
      s"edges must be 1..31 sorted distinct cut points, got $edges")
    require(quantScale >= 1e3 && quantScale <= 1e12 &&
      quantScale == math.floor(quantScale),
      s"quantScale integral in [1e3, 1e12], got $quantScale")
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val p = predCol.cast("double")
    val bin = edges.foldLeft(lit(1)) { (acc, e) =>
      acc + when(lit(e) < p, 1).otherwise(0) }
    df.filter(durationCol.isNotNull && ev.isNotNull && p.isNotNull)
      .groupBy(g ++ Seq(bin.as("bin"),
        durationCol.cast("double").as("t")): _*)
      .agg(sum(when(ev, 1L).otherwise(0L)).as("d"),
        sum(when(!ev, 1L).otherwise(0L)).as("c"),
        sum(floor(p * lit(quantScale)).cast("long")).as("qp"))
  }

  /** Merge [[calibrationCounts]] tables: BIGINT re-sum per cell. */
  def mergeCalibrationCounts(partials: Seq[DataFrame],
      groupNames: Seq[String]): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy((groupNames ++ Seq("bin", "t")).map(col): _*)
      .agg(sum(col("d")).as("d"), sum(col("c")).as("c"),
        sum(col("qp")).as("qp"))

  /** Finalize a (possibly merged) [[calibrationCounts]] table into the
    * [[survivalCalibration]] output schema — the streaming-readout
    * face (frozen-edges estimand; the batch NTILE face is the
    * data-driven-deciles estimand, documented apart). */
  def survivalCalibrationFromCounts(counts: DataFrame,
      groupCols: Seq[String], horizon: Double,
      quantScale: Double = 1e12, maxTimes: Int = 1000): DataFrame = {
    val g = groupCols.map(col)
    val perBin = counts.groupBy(g :+ col("bin"): _*)
      .agg(sum(col("d") + col("c")).as("n"), sum(col("d")).as("n_events"),
        sum(col("qp")).as("__qp"))
    val km = Stats.kaplanMeierFromCounts(
      counts.select((groupCols :+ "bin").map(col) :+ col("t") :+
        col("d") :+ col("c"): _*),
      groupCols :+ "bin", maxTimes)
    val sAtH = km.filter(col("t") <= horizon)
      .groupBy(g :+ col("bin"): _*)
      .agg(max_by(col("survival"), col("t")).as("__sh"))
    perBin
      .join(sAtH, groupCols :+ "bin", "left")
      .withColumn("mean_pred",
        (col("__qp").cast("double") / lit(quantScale)) /
          col("n").cast("double"))
      .withColumn("observed",
        lit(1.0) - coalesce(col("__sh"), lit(1.0)))
      .select(g ++ Seq(col("bin"), col("n"), col("n_events"),
        col("mean_pred"), col("observed")): _*)
  }

  /** Conditional survival per group — the "you made it this far"
    * readout every retention review asks for: P(T > t₀+s | T > t₀) =
    * Ŝ(t₀+s)/Ŝ(t₀) from the Kaplan–Meier grid, for each requested
    * (t₀, s) pair. Two step-function lookups over the collected
    * ≤ maxTimes grid and ONE division — rides the same stored
    * [[Stats.survivalCounts]] partial as every other survival readout.
    * Null when Ŝ(t₀) = 0. Output: groups... + (t0, s, s_t0, s_t1,
    * cond_survival). */
  def conditionalSurvival(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column,
      pairs: Seq[(Double, Double)], maxTimes: Int = 1000): DataFrame =
    conditionalSurvivalFromCounts(
      Stats.survivalCounts(df, groupCols, durationCol, eventCol),
      groupCols, pairs, maxTimes)

  /** Finalize a (possibly merged) [[Stats.survivalCounts]] table into
    * the [[conditionalSurvival]] schema — the streaming-readout face. */
  def conditionalSurvivalFromCounts(counts: DataFrame,
      groupCols: Seq[String], pairs: Seq[(Double, Double)],
      maxTimes: Int = 1000): DataFrame = {
    require(pairs.nonEmpty && pairs.size <= 50 &&
      pairs.forall { case (t0, s) => t0 >= 0 && s > 0 },
      s"pairs must be 1..50 (t0 >= 0, s > 0) entries, got $pairs")
    val g = groupCols.map(col)
    val grid = Stats.kaplanMeierFromCounts(counts, groupCols, maxTimes)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("t"), col("survival"))))
        .as("__gr"))
    // binary-search step lookup (r16) — see [[Stats.stepLookupLeq1]]
    def sAt(x: Column): Column = Stats.stepLookupLeq1(col("__gr"), x)
    grid
      .withColumn("__p", explode(array(pairs.map { case (t0, s) =>
        struct(lit(t0).as("t0"), lit(s).as("s")) }: _*)))
      .select(g ++ Seq(col("__p.t0").as("t0"), col("__p.s").as("s"),
        col("__gr")): _*)
      .withColumn("s_t0", sAt(col("t0")))
      .withColumn("s_t1", sAt(col("t0") + col("s")))
      .withColumn("cond_survival",
        when(col("s_t0") > 0.0, col("s_t1") / col("s_t0")))
      .drop("__gr")
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
    // bucket(r) = #{boundaries < r}, by BINARY SEARCH over the sorted
    // boundary array — a generated O(B)-node / O(log B)-depth when-tree
    // that whole-stage codegen compiles, where an `aggregate` HOF would
    // cost B interpreted comparisons per ROW (measured: the dominant
    // stage at 1M×1024)
    def search(lo: Int, hi: Int): Column =
      if (lo > hi) lit(lo - 1)
      else {
        val mid = (lo + hi) / 2
        when(element_at(col("__bs"), mid) < col("__r"),
          search(mid + 1, hi)).otherwise(search(lo, mid - 1))
      }
    val withB =
      if (buckets == 1) base.withColumn("__b", lit(0))
      else base.join(broadcast(bounds), groupCols)
        .withColumn("__b", search(1, buckets - 1))
        .drop("__bs")
    // cells fan out to several consumers (grids, event join, the
    // same-bucket fold, n-totals) — cache so the scan + bucket assign
    // + cell aggregation run ONCE (measured 5× recompute without)
    val cells = withB
      .groupBy(g ++ Seq(col("__b"), col("__t"), col("__r")): _*)
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__nev"),
        sum(when(!col("__e"), 1L).otherwise(0L)).as("__ncen"))
      .withColumn("__nall", col("__nev") + col("__ncen"))
      .cache()
    (base, cells, g)
  }

  /** The densified bucket×time grid with, per (group, bucket, t):
    * `__f` = the bucket's later-mass past t plus its censored mass AT
    * t, `__lowF` = Σ_{b'<b} F(b', t), `__denF` = Σ_{b'} F(b', t) —
    * window cumulative sums over ≤ B×T rows per group. The maxTimes
    * gate rides the DISTINCT-times frame (grid-sized, never the data). */
  private def crossGrid(cells: DataFrame, names: Seq[String],
      maxTimes: Int, op: String): DataFrame = {
    val g = names.map(col)
    val times = cells.select(g :+ col("__t"): _*).distinct()
      .withColumn("__tn", count(lit(1)).over(
        Window.partitionBy(g: _*)))
      .filter(assert_true(col("__tn") <= maxTimes,
        lit(s"$op: a group exceeds maxTimes=$maxTimes distinct " +
          "times — bin durations coarser first")).isNull)
      .drop("__tn")
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
    grid
      .withColumn("__f", coalesce(sum(col("__a")).over(wSuf), lit(0L)) +
        col("__c"))
      .withColumn("__lowF", coalesce(sum(col("__f")).over(wLow), lit(0L)))
      .withColumn("__denF", sum(col("__f")).over(wAllB))
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
    // fold directly over the struct array (no sequence/element_at
    // indirection — the interpreted-HOF inner loop is the measured
    // cost center, and per-element index-array allocations double it)
    val s = col("__cs")
    packed.withColumn("__w2",
      aggregate(s, lit(0L), (acc, a) =>
        acc + when(a.getField("__nev") > 0L,
          aggregate(s, lit(0L), (acc2, b) => acc2 + term(a, b)))
          .otherwise(lit(0L))))
  }
}
