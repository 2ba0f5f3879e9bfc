package graft.queries

import graft.Tables
import graft.operators.{Filters, Ranks, Region, Regions, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator registry (SURVEY.md §2) over the driver testdata.
  *
  * Every entry has a DuckDB `oracleSql` twin with IDENTICAL column names and
  * deterministic `ORDER BY`. Numeric-parity rules used throughout so the
  * Spark and DuckDB results hash-match exactly:
  *
  *  - money sums go through `decimal(18,2)` (exact, order-independent) and
  *    cast back to double at the end — a raw double sum is order-dependent
  *    and differs between engines;
  *  - sums of int-valued doubles (`l_quantity`, event counts) are exact in
  *    IEEE double, so plain `sum` is fine;
  *  - ratios are a single double division of exactly-equal operands, which
  *    IEEE defines bit-exactly;
  *  - Spark `sum(int)` is BIGINT while DuckDB's is HUGEINT — oracle SQL
  *    casts those back to BIGINT.
  *
  * Each query is written the way it should run on a 1000-executor cluster:
  * small dimensions broadcast, aggregates partial-before-shuffle, filters
  * pushed to the scan, top-k via TakeOrdered, and no driver-side loops.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** A1/A13 — grouped sums with exact int-valued-double quantities
    * (reference by-code totals, `/root/reference/MSA_Reader.py:862–867`). */
  def a1SumByFlagStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** J1 — large⋈large join (sort-merge at scale; AQE may broadcast at
    * small SF) + grouped revenue (`/root/reference/Time_Series.py:490–498`). */
  def j1OrdersCustomerSegment(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** J2/C13 — left join with null-probe detection and zero-fill
    * (`/root/reference/Time_Series.py:613–623, 657–661`). */
  def j2LeftJoinZeroFill(s: SparkSession, dir: String): DataFrame = {
    val oc = t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    val c = t(s, dir, "customer")
    c.join(oc, c("c_custkey") === oc("o_custkey"), "left")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("cnt").isNull, 1).otherwise(0)).as("n_no_orders"))
      .orderBy("c_nationkey")
  }

  /** J3/J5 — star join: fact ⋈ three explicitly-broadcast dimensions
    * (`/root/reference/Time_Series.py:567–585`). The probe side never
    * shuffles — one scan, one partial agg, one tiny exchange. */
  def j3BroadcastStarJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier"); val na = t(s, dir, "nation"); val re = t(s, dir, "region")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(na), sup("s_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("r_name")
  }

  private val sizeBands = Seq(
    Region("small", 1, 10), Region("medium", 11, 25), Region("large", 26, 49))

  /** J6/E4 — point-in-interval annotation, driver-known intervals → pure
    * codegen when-chain, zero join zero shuffle
    * (`/root/reference/Plotting_Functions.py:135–169`). */
  def j6SizeBandWhenChain(s: SparkSession, dir: String): DataFrame =
    Regions.annotate(t(s, dir, "part"), "p_size", sizeBands, "band")
      .groupBy("band").agg(count(lit(1)).as("n")).orderBy("band")

  /** J6 variant — intervals only known as a DataFrame → broadcast range
    * join with first-match-wins ordinal and "Other" fallback. */
  def j6SizeBandRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val regions = s.createDataFrame(
      sizeBands.zipWithIndex.map { case (r, i) => (r.name, r.start, r.end, i) })
      .toDF("name", "start", "end", "ord")
    Regions.annotateJoin(t(s, dir, "part"), "p_size", regions, "band")
      .groupBy("band").agg(count(lit(1)).as("n")).orderBy("band")
  }

  /** J6 variant — the same point-in-interval join expressed as a plain
    * declarative inner join and REWRITTEN BY THE OPTIMIZER into the custom
    * broadcast range join (plans.RangeJoin: Rule → RangeJoinPlan →
    * BroadcastRangeJoinExec, binary search per probe row instead of the
    * stock BroadcastNestedLoopJoin's per-row interval scan). Inner-join
    * semantics: sizes outside every band drop; each match emits one row. */
  def j6RangeJoinExec(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(
      sizeBands.map(r => (r.name, r.start, r.end))).toDF("band", "lo", "hi")
    t(s, dir, "part")
      .join(bands, col("p_size") >= col("lo") && col("p_size") <= col("hi"))
      .groupBy("band").agg(count(lit(1)).as("n")).orderBy("band")
  }

  /** J6 through the custom exec with the reference's EXACT semantics:
    * LEFT OUTER range join (unmatched sizes survive null-extended) +
    * "Other" fallback (`/root/reference/Plotting_Functions.py:141–145`'s
    * return-on-no-match). */
  def j6RangeJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(
      sizeBands.map(r => (r.name, r.start, r.end))).toDF("b_name", "lo", "hi")
    t(s, dir, "part")
      .join(bands, col("p_size") >= col("lo") && col("p_size") <= col("hi"), "left")
      .select(coalesce(col("b_name"), lit("Other")).as("band"))
      .groupBy("band").agg(count(lit(1)).as("n")).orderBy("band")
  }

  /** Z-order layout round-trip: lineitem rewritten on the (l_partkey,
    * l_suppkey) Z-curve (sinks.Clustered), read back through the
    * footer-stats-skipping scan with a two-column band filter, and
    * aggregated. The oracle filters the ORIGINAL table — a match proves
    * the clustered rewrite is a pure permutation and the pruned scan
    * loses no qualifying row. */
  def lZorderRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_zorder_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.sinks.Clustered.writeZOrdered(
      t(s, dir, "lineitem"), out, Seq("l_partkey", "l_suppkey"), nFiles = 8)
    s.read.parquet(out)
      .filter(col("l_partkey") <= 200 && col("l_suppkey") <= 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** O4 — global top-k with deterministic tie-break: Spark plans this as
    * TakeOrdered (no full sort, no single-node collect of the input)
    * (`/root/reference/Plotting_Functions.py:715–730`). */
  def o4TopkParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_partkey").agg(sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("l_partkey").asc)
      .limit(10)

  /** W1/W2 — per-group top-n via row_number window
    * (`/root/reference/Plotting_Functions.py:626–639`). */
  def w1Top3PerNation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
      .orderBy("c_nationkey", "rn")
  }

  /** A7/W3 — share-of-week normalization with a window sum: one shuffle,
    * no second scan (`/root/reference/Time_Series.py:790–811`). */
  def w3ShareNormalization(s: SparkSession, dir: String): DataFrame = {
    val f = t(s, dir, "events")
      .groupBy(TimeSeries.weekStart(to_date(col("ts"))).as("week_start"),
        col("event_type"))
      .agg(count(lit(1)).as("freq"))
    TimeSeries.normalizeByWeek(f)
      .select("week_start", "event_type", "freq", "share")
      .orderBy("week_start", "event_type")
  }

  /** A6 — per-region AND worldwide totals in ONE shuffle via rollup instead
    * of the reference's repeat-per-continent loop
    * (`/root/reference/Time_Series.py:323, 868–897`). */
  def a6RollupWorldwide(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val na = t(s, dir, "nation"); val re = t(s, dir, "region")
    c.join(broadcast(na), c("c_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .rollup(col("r_name"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("r_name"), lit("Worldwide")).as("region"), col("n"))
      .orderBy("region")
  }

  /** A8/O2 — first-row-per-group with a total order (never `first()` on an
    * unordered group) (`/root/reference/Time_Series.py:573`). */
  def a8FirstOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        to_date(col("o_orderdate")).as("first_date"))
      .orderBy("o_custkey")
  }

  /** A12/F13 — 2×2 contingency in one pass: four conditional sums, no
    * four-subset rescan (`/root/reference/Plotting_Functions.py:1243–1315`). */
  def a12Contingency(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      sum(when(col("l_returnflag") === "R" && col("l_linestatus") === "F", 1).otherwise(0)).as("rf"),
      sum(when(col("l_returnflag") === "R" && col("l_linestatus") =!= "F", 1).otherwise(0)).as("r_notf"),
      sum(when(col("l_returnflag") =!= "R" && col("l_linestatus") === "F", 1).otherwise(0)).as("notr_f"),
      sum(when(col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F", 1).otherwise(0)).as("notr_notf"),
      count(lit(1)).as("total"))

  /** A14/E5 — histogram with the reference's exact edge semantics: all bins
    * half-open except the last (closed), overflow labeled
    * (`/root/reference/Seq_Tools.py:126–148`). */
  def a14HistogramQuantity(s: SparkSession, dir: String): DataFrame =
    Filters.histogram(t(s, dir, "lineitem"), col("l_quantity"),
        Seq(1, 10, 20, 30, 40, 50).map(_.toDouble))
      .orderBy("bin")

  /** U1/U3 — vertical concat of two sides with aligned schemas
    * (`/root/reference/Plotting_Functions.py:300–386`). */
  def u1UnionAccounts(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_nationkey").as("nationkey"),
      col("c_acctbal").cast("decimal(18,2)").as("bal"),
      lit("customer").as("side"))
    val su = t(s, dir, "supplier").select(
      col("s_nationkey").as("nationkey"),
      col("s_acctbal").cast("decimal(18,2)").as("bal"),
      lit("supplier").as("side"))
    c.unionByName(su)
      .groupBy("nationkey", "side")
      .agg(count(lit(1)).as("n"), sum(col("bal")).cast("double").as("total_bal"))
      .orderBy("nationkey", "side")
  }

  /** F5/F6/F8 — predicate stack: set membership + date range + regex, all
    * pushed into one scan (`/root/reference/Time_Series.py:625–655`,
    * `Plotting_Functions.py:45–49`). */
  def f5PredicateStack(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "signup"))
      .filter(to_date(col("ts")).between(lit("2024-01-08"), lit("2024-03-31")))
      .filter(col("props").rlike("\"k\": [0-9]+"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  /** C6/C7/A5 — Sunday-aligned weekly bins by date arithmetic, one groupBy
    * instead of the reference's filter-per-week loop
    * (`/root/reference/Time_Series.py:677–715, 744`). */
  def c7WeeklyCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(TimeSeries.weekStart(to_date(col("ts"))).as("week_start"))
      .agg(count(lit(1)).as("freq"))
      .orderBy("week_start")

  /** C8 — `Week<i> (mm/dd/yyyy-mm/dd/yyyy)` labels
    * (`/root/reference/Time_Series.py:772`). */
  def c8WeekLabels(s: SparkSession, dir: String): DataFrame = {
    // week_start is unique post-groupBy, so a global row number IS the
    // dense rank — assigned scale-safely, no partition-less window
    val weekly = Ranks.globalRowNumber(
      c7WeeklyCounts(s, dir), Seq(col("week_start").asc), "__idx")
    weekly
      .withColumn("label", TimeSeries.weekLabel(col("__idx"), col("week_start")))
      .select("week_start", "label", "freq")
      .orderBy("week_start")
  }

  /** A5 dense — every key × every week zero-filled; the week dimension comes
    * from `sequence()`, the key set is broadcast — no driver loop
    * (`/root/reference/Time_Series.py:731–788`). */
  def a5DenseWeekly(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.denseWeekly(f)
      .select("key", "week_start", "freq")
      .orderBy("key", "week_start")
  }

  /** A11/C10/A13 — variant-combination frequencies: sorted distinct set per
    * (user, day) joined to one string, then value_counts
    * (`/root/reference/Time_Series.py:927–986`). */
  def a11ComboFrequencies(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("combo"))
      .groupBy("combo").agg(count(lit(1)).as("n"))
      .orderBy("combo")

  /** O1/O3/E6/C1 — natural sort: numeric suffix extracted and sorted as int
    * (`/root/reference/MSA_Reader.py:781–803`). */
  def o1NaturalSortSources(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("src_num", regexp_extract(col("source"), "(\\d+)", 1).cast("int"))
      .select("source", "src_num", "n_docs")
      .orderBy("src_num")

  /** C14 — `{:.4%}` percent strings at the sink, numeric upstream
    * (`/root/reference/MSA_Reader.py:1030`). */
  def c14PercentFormatting(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    // grand total via broadcast 1-row agg, not a partition-less window
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__total"))
      .withColumn("pct", format_string("%.4f%%", col("share") * 100))
      .select("lang", "n", "pct")
      .orderBy("lang")
  }

  /** C15 — title-casing (single-token exact semantics,
    * `/root/reference/Sequence_Filter.py:52–54`). */
  def c15TitleCase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(col("n_name"),
        concat(upper(substring(lower(col("n_name")), 1, 1)),
          lower(col("n_name")).substr(lit(2), length(col("n_name")))).as("title"))
      .orderBy("n_name")

  /** A15 — pipeline stage counts as rows
    * (`/root/reference/Sequence_Counter.py:19–241`). */
  def a15StageCounts(s: SparkSession, dir: String): DataFrame = {
    def stage(name: String) =
      t(s, dir, name).agg(count(lit(1)).as("n")).withColumn("stage", lit(name))
    stage("lineitem").unionByName(stage("orders")).unionByName(stage("customer"))
      .select("stage", "n").orderBy("stage")
  }

  /** A17/O7 — means for ordering, derived exactly (decimal sum ÷ count; a
    * single IEEE division) (`/root/reference/Plotting_Functions.py:1512–1514`). */
  def a17AvgValueByType(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_value"), count(lit(1)).as("n"))
      .orderBy(col("avg_value").desc, col("event_type"))

  /** A2/W2 — exact dedup with counts + `Uniq<n>` naming, the in-engine
    * USEARCH `fastx_uniques` replacement
    * (`/root/reference/Time_Series.py:471–478`, `MSA_Reader.py:1296–1297`).
    * The groupBy key here is the content column; at 100 TB the same operator
    * runs over `xxhash64(content)` buckets first (operators.Dedup) so the
    * shuffle carries 8-byte keys, and the `Uniq` rank is over the already-
    * aggregated (small) cluster table. */
  def a2ExactDedupDocs(s: SparkSession, dir: String): DataFrame =
    // r16: via the scale-form operator — the old inline groupBy("text")
    // shuffled full document text as the grouping key; exactClusters
    // groups on (xxhash64, sha2-256), 40 bytes a row, per the Dedup
    // design rule (guide §2.3). Identical clusters (a simultaneous
    // 64+256-bit collision between distinct texts is negligible — and
    // the oracle, which still replays GROUP BY text, would catch one),
    // identical rank order (cluster_size desc, first id asc).
    graft.operators.Dedup.exactClusters(t(s, dir, "documents"),
        col("doc_id"), col("text"))
      .select(col("cluster_id"), col("cluster_size"),
        col("first_id").as("first_doc"))
      .orderBy(col("cluster_size").desc, col("first_doc").asc)

  /** A9 — per-position pivot as conditional aggregation: one shuffle, never
    * a per-position rescan (`/root/reference/MSA_Reader.py:1107–1162`). */
  def a9PivotByFlag(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linenumber")
      .agg(
        sum(when(col("l_returnflag") === "A", col("l_quantity")).otherwise(0.0)).as("qty_A"),
        sum(when(col("l_returnflag") === "N", col("l_quantity")).otherwise(0.0)).as("qty_N"),
        sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)).as("qty_R"),
        sum(col("l_quantity")).as("qty_total"))
      .orderBy("l_linenumber")

  /** A10/C11 — explode a generated position range (multi-residue deletion
    * expansion, `/root/reference/MSA_Reader.py:1038–1077`). */
  def a10ExplodePositions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(explode(expr("sequence(1, l_linenumber)")).as("pos"))
      .groupBy("pos").agg(count(lit(1)).as("n"))
      .select(col("pos").cast("bigint").as("pos"), col("n"))
      .orderBy("pos")

  /** J9 — top-k key set then left-semi membership subsetting
    * (`/root/reference/Plotting_Functions.py:630–644`). */
  def j9SemiTopkFilter(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val top = li.groupBy("l_partkey").agg(sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("l_partkey").asc).limit(10)
    li.join(top.select("l_partkey"), Seq("l_partkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_sum_by_flag_status" -> (a1SumByFlagStatus _),
    "j1_orders_customer_segment" -> (j1OrdersCustomerSegment _),
    "j2_left_join_zero_fill" -> (j2LeftJoinZeroFill _),
    "j3_broadcast_star_join" -> (j3BroadcastStarJoin _),
    "j6_size_band_when_chain" -> (j6SizeBandWhenChain _),
    "j6_size_band_range_join" -> (j6SizeBandRangeJoin _),
    "j6_range_join_exec" -> (j6RangeJoinExec _),
    "j6_range_join_outer" -> (j6RangeJoinOuter _),
    "l_zorder_roundtrip" -> (lZorderRoundtrip _),
    "j9_semi_topk_filter" -> (j9SemiTopkFilter _),
    "o4_topk_parts" -> (o4TopkParts _),
    "w1_top3_per_nation" -> (w1Top3PerNation _),
    "w3_share_normalization" -> (w3ShareNormalization _),
    "a6_rollup_worldwide" -> (a6RollupWorldwide _),
    "a8_first_order_per_customer" -> (a8FirstOrderPerCustomer _),
    "a12_contingency" -> (a12Contingency _),
    "a14_histogram_quantity" -> (a14HistogramQuantity _),
    "u1_union_accounts" -> (u1UnionAccounts _),
    "f5_predicate_stack" -> (f5PredicateStack _),
    "c7_weekly_counts" -> (c7WeeklyCounts _),
    "c8_week_labels" -> (c8WeekLabels _),
    "a5_dense_weekly" -> (a5DenseWeekly _),
    "c_seasonal_decompose" -> (cSeasonalDecompose _),
    "c_ts_anomalies" -> (cTsAnomalies _),
    "c_growth_advantage" -> (cGrowthAdvantage _),
    "c_ewma_level" -> (cEwmaLevel _),
    "c_acf" -> (cAcf _),
    "c_pacf" -> (cPacf _),
    "c_holt_winters" -> (cHoltWinters _),
    "c_backtest" -> (cBacktest _),
    "c_backtest_rolling" -> (cBacktestRolling _),
    "c_ts_strength" -> (cTsStrength _),
    "c_holt_forecast" -> (cHoltForecast _),
    "c_mann_kendall" -> (cMannKendall _),
    "c_assoc_rules" -> (cAssocRules _),
    "a_benford_prices" -> (aBenfordPrices _),
    "c_theil_sen_trend" -> (cTheilSenTrend _),
    "c_changepoints" -> (cChangepoints _),
    "c_retention_cohorts" -> (cRetentionCohorts _),
    "c_cusum_alarms" -> (cCusumAlarms _),
    "c_cross_corr" -> (cCrossCorr _),
    "c_optimal_changepoints" -> (cOptimalChangepoints _),
    "a11_combo_frequencies" -> (a11ComboFrequencies _),
    "o1_natural_sort_sources" -> (o1NaturalSortSources _),
    "c14_percent_formatting" -> (c14PercentFormatting _),
    "c15_title_case" -> (c15TitleCase _),
    "a15_stage_counts" -> (a15StageCounts _),
    "a17_avg_value_by_type" -> (a17AvgValueByType _),
    "a2_exact_dedup_docs" -> (a2ExactDedupDocs _),
    "a9_pivot_by_flag" -> (a9PivotByFlag _),
    "a10_explode_positions" -> (a10ExplodePositions _),
  )

  /** Classical seasonal decomposition ([[TimeSeries.decompose]]) of the
    * dense weekly event series, period 5: exact BIGINT window sums and
    * detrended numerators, fixed-order seasonal centering fold — every
    * trend/seasonal/remainder value hashes exactly against the DuckDB
    * mirror. */
  def cSeasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.decompose(
        TimeSeries.denseWeekly(f).select("key", "week_start", "freq"),
        Seq("key"), col("week_start"), col("freq"), 5)
      .select(col("key"), col("week_start"), col("value"), col("trend"),
        col("seasonal"), col("remainder"))
      .orderBy("key", "week_start")
  }

  /** Seasonal/trend strength of the dense weekly series
    * ([[TimeSeries.strength]], period 3 — the 5-week testdata span
    * leaves 3 complete centered-trend rows per key): exact decompose
    * columns, two fixed-order variance folds each — f_trend and
    * f_seasonal hash unrounded. */
  def cTsStrength(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.strength(
        TimeSeries.denseWeekly(f).select("key", "week_start", "freq"),
        Seq("key"), col("week_start"), col("freq"), period = 3)
      .orderBy("key")
  }

  /** Seasonal-aware weekly anomalies ([[TimeSeries.anomalies]]): the
    * decomposition remainder tested against 2 x per-key MAD. Exact
    * decomposition + the winsorize-proven percentile pair keep every
    * column (including the boolean flags) hash-identical to the
    * oracle's full replay. */
  def cTsAnomalies(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.anomalies(
        TimeSeries.denseWeekly(f).select("key", "week_start", "freq"),
        Seq("key"), col("week_start"), col("freq"), 5, k = 2.0)
      .select(col("key"), col("week_start"), col("value"),
        col("remainder"), col("med"), col("mad"), col("is_anomaly"))
      .orderBy("key", "week_start")
  }

  /** Per-key growth advantage — the logistic-growth analysis run on
    * variant share data: weekly share p -> logit ln(p/(1-p)), quantized
    * to exact micro-logits (floor x 1e6, the Pca.exactCovariance
    * quantization move), then [[graft.operators.Stats.groupOls]] per
    * key over integer week indices. slope = growth advantage in
    * micro-logits/week, exact-moment algebra, fixed float tail — every
    * column hashes against the oracle replay. Weeks where a key is
    * absent or is the entire total drop out (logit undefined). */
  def cGrowthAdvantage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    val withTotal = f.withColumn("__tot",
      sum(col("freq")).over(Window.partitionBy(col("week_start"))))
    val p = col("freq").cast("double") / col("__tot").cast("double")
    val shares = withTotal
      .filter(col("freq") > 0 && col("freq") < col("__tot"))
      .withColumn("__y",
        floor(log(p / (lit(1.0) - p)) * lit(1000000.0)).cast("bigint"))
      .withColumn("__x", (datediff(col("week_start"),
        min(col("week_start")).over(Window.partitionBy(col("key")))) / 7)
        .cast("bigint"))
    graft.operators.Stats.groupOls(shares, Seq(col("key")),
        col("__x"), col("__y"))
      .orderBy("key")
  }

  /** Level-shift changepoints ([[TimeSeries.changepoints]]) of the weekly
    * event series: binary segmentation on exact BIGINT prefix sums, up to
    * 3 splits — every segment boundary, mean and SSE hashes against the
    * oracle's recursive-CTE replay of the same fixed-order folds. */
  def cChangepoints(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.changepoints(f, Seq("key"), col("week_start"), col("freq"),
        maxChanges = 3)
      .orderBy("key", "seg")
  }

  /** Optimal penalized segmentation ([[TimeSeries.optimalChangepoints]])
    * of the weekly event series, penalty 2000: the exact DP objective
    * (Σ SSE + penalty·segments) via the graft_segdp kernel, replayed by
    * the oracle's recursive-CTE dynamic program + backtrack — every
    * boundary, mean and SSE hashes bit-for-bit. */
  def cOptimalChangepoints(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.optimalChangepoints(f, Seq("key"), col("week_start"),
        col("freq"), penalty = 2000.0)
      .orderBy("key", "seg")
  }

  /** Sequential CUSUM drift alarms ([[TimeSeries.cusum]]) on the weekly
    * event series, slack 2 / threshold 20 against the floored per-key
    * median: pure integer recurrence folded in-row, so every column
    * (including alarm dates) hashes with no float anywhere. */
  /** Weekly cohort retention ([[TimeSeries.retentionCohorts]]): users
    * cohorted by first active week, counted at each later offset —
    * exact distinct-activity BIGINTs and ONE closing division, so
    * every column including `retention` hashes with no rounding. */
  def cRetentionCohorts(s: SparkSession, dir: String): DataFrame =
    TimeSeries.retentionCohorts(t(s, dir, "events"), col("user_id"),
        to_date(col("ts")))
      .orderBy("cohort_week", "offset_weeks")

  def cCusumAlarms(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.cusum(f, Seq("key"), col("week_start"), col("freq"),
        slack = 2L, threshold = 20L)
      .orderBy("key")
  }

  /** Lead–lag cross-correlation ([[graft.operators.Stats.crossCorr]]):
    * does the weekly click series predict the weekly purchase series
    * 0–2 weeks ahead? Exact BIGINT co-moments per lag, one algebraic
    * float tail — every column hashes with no rounding. */
  def cCrossCorr(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    val xw = f.filter(col("key") === "click")
      .select(col("week_start"), col("freq").as("x"))
    val yw = f.filter(col("key") === "purchase")
      .select(col("week_start"), col("freq").as("y"))
    val j = xw.join(yw, "week_start")
    val w0 = j.groupBy().agg(min(col("week_start")).as("__w0"))
    val idx = j.crossJoin(broadcast(w0))
      .withColumn("__i",
        (datediff(col("week_start"), col("__w0")) / 7).cast("bigint"))
    graft.operators.Stats.crossCorr(idx, Seq(), col("__i"), col("x"),
        col("y"), maxLag = 2)
      .orderBy("lag")
  }

  /** EWMA smoothing level ([[TimeSeries.ewma]]) of the weekly event
    * series, dyadic alpha = 0.25 so 1 - alpha is exact and the in-row
    * fold matches DuckDB's list_reduce bitwise. */
  def cEwmaLevel(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.ewma(f, Seq("key"), col("week_start"), col("freq"),
        alpha = 0.25)
      .orderBy("key")
  }

  /** Autocorrelation (lags 1–4) of the weekly event series
    * ([[TimeSeries.acf]]): exact n²-scaled BIGINT moments, ONE
    * division — every column including `r` hashes with no rounding. */
  def cAcf(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.acf(f, Seq("key"), col("week_start"), col("freq"),
        maxLag = 4)
      .orderBy("key", "lag")
  }

  /** Holt–Winters additive seasonal smoothing over the weekly event
    * series ([[TimeSeries.holtWinters]], period 2 — the testdata
    * events span only 5 weeks, so period 2 is what leaves recursion
    * steps after the one-period seed — 4-week-ahead forecast). Dyadic
    * α/γ/δ keep every (1−·) literal engine-exact; the mirror replays
    * seed + recursion as a recursive CTE, so level/trend/forecast hash
    * bit-for-bit. */
  def cHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.holtWinters(f, Seq("key"), col("week_start"), col("freq"),
        period = 2, horizon = 4)
      .orderBy("key")
  }

  /** Forecast backtest over the weekly event series
    * ([[TimeSeries.backtest]], period 2, 2-week holdout): five methods
    * scored by sMAPE on the held-out weeks, every fold fixed-order —
    * all smape values hash unrounded. */
  def cBacktest(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.backtest(f, Seq("key"), col("week_start"), col("freq"),
        period = 2, horizon = 2)
      .orderBy("key", "method")
  }

  /** Rolling-origin backtest over the weekly event series
    * ([[TimeSeries.backtestRolling]], period 2, 1-week holdout, 3
    * origins): the five methods scored at three consecutive cutoffs,
    * mean sMAPE per method — the evaluation [[cBacktest]]'s single
    * origin overfits to one window. All folds fixed-order; smape
    * hashes unrounded. */
  def cBacktestRolling(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.backtestRolling(f, Seq("key"), col("week_start"),
        col("freq"), period = 2, horizon = 1, origins = 3)
      .orderBy("key", "method")
  }

  /** Partial autocorrelation (lags 1–4) of the weekly event series
    * ([[TimeSeries.pacf]]): exact acf ratios, then the Durbin–Levinson
    * fold in fixed op order — pure +,·,/ so `pacf` hashes with no
    * rounding; the mirror replays the recursion as a recursive CTE. */
  def cPacf(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.pacf(f, Seq("key"), col("week_start"), col("freq"),
        maxLag = 4)
      .orderBy("key", "lag")
  }

  /** Holt linear-trend smoothing over the weekly event series
    * ([[TimeSeries.holt]]): level + trend state, 4-week-ahead forecast.
    * α = 0.25 and γ = 0.125 are dyadic so the (1−α)/(1−γ) literals are
    * engine-exact; the DuckDB mirror replays the recursion as a
    * recursive CTE in the same operation order, so level/trend/forecast
    * hash bit-for-bit, float columns included. */
  def cHoltForecast(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    TimeSeries.holt(f, Seq("key"), col("week_start"), col("freq"),
        alpha = 0.25, gamma = 0.125, horizon = 4)
      .orderBy("key")
  }

  /** Association rules over per-user event-type baskets
    * ([[graft.operators.Assoc.associationRules]]): which event types
    * co-occur in the same user's history beyond chance —
    * support/confidence/lift as ratios of exact BIGINT counts, so
    * every float column hashes exactly. */
  def cAssocRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assoc.associationRules(t(s, dir, "events"),
        col("user_id"), col("event_type"))
      .orderBy("antecedent", "consequent")

  /** Benford first-digit conformance of order totals per priority
    * ([[graft.operators.Quality.benford]]): exact digit counts via the
    * BIGINT string prefix, χ² against the [[graft.operators.Quality
    * .BenfordP]] literals in fixed digit order — fully hash-checkable
    * (no log evaluated in either engine). */
  def aBenfordPrices(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.benford(t(s, dir, "orders"),
        Seq(col("o_orderpriority")), col("o_totalprice"))
      .orderBy("o_orderpriority")

  /** Mann–Kendall trend test over the weekly event series
    * ([[graft.operators.Stats.mannKendall]]) — the significance half of
    * the nonparametric trend pair whose slope half is
    * c_theil_sen_trend. S sums exact ±1 comparisons, the tie term is an
    * exact count aggregate, and tau/z are fixed float expressions over
    * BIGINT casts, so every column hashes cross-engine. */
  def cMannKendall(s: SparkSession, dir: String): DataFrame = {
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    graft.operators.Stats.mannKendall(f, Seq(col("key")),
        col("week_start"), col("freq"))
      .orderBy("key")
  }

  /** Theil-Sen robust weekly trend ([[graft.operators.Stats.theilSen]]):
    * median pairwise slope of freq vs integer week index per event type
    * - the outlier-robust twin of the OLS trend, bitwise-portable via
    * in-row pair generation and the explicit odd/even median. */
  def cTheilSenTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = TimeSeries.weeklyFrequency(
      t(s, dir, "events"), to_date(col("ts")), col("event_type"))
    val indexed = f.withColumn("__x", (datediff(col("week_start"),
      min(col("week_start")).over(Window.partitionBy(col("key")))) / 7)
      .cast("bigint"))
    graft.operators.Stats.theilSen(indexed, Seq(col("key")),
        col("__x"), col("freq"))
      .orderBy("key")
  }

  /** c_changepoints mirror — a recursive CTE runs the SAME binary
    * segmentation as [[TimeSeries.changepoints]]: exact BIGINT prefix
    * sums from one window, then maxChanges=3 rounds each adding the
    * globally-best split boundary via the identical fixed-order
    * list folds (strict `>`, sentinel-seeded `list_reduce`, candidates
    * ascending), so every gain comparison replays bit-for-bit. The SQL
    * is assembled from the cost/gain building blocks to keep the two
    * engines' expressions visibly identical. */
  private val changepointsOracle: String = {
    def pat(i: String) =
      s"(CASE WHEN ($i) = 0 THEN 0 ELSE pl[CAST($i AS INTEGER)] END)"
    def qat(i: String) =
      s"(CASE WHEN ($i) = 0 THEN 0 ELSE ql[CAST($i AS INTEGER)] END)"
    def cost(a: String, b: String) =
      s"(CAST(${qat(b)} - ${qat(a)} AS DOUBLE) - " +
        s"CAST(${pat(b)} - ${pat(a)} AS DOUBLE) * " +
        s"CAST(${pat(b)} - ${pat(a)} AS DOUBLE) / CAST(($b) - ($a) AS DOUBLE))"
    val A = "bounds[CAST(i AS INTEGER)]"
    val B = "bounds[CAST(i AS INTEGER)+1]"
    // argmin of cost(a,k)+cost(k,b) with strict <, then ONE gain
    // computation — the exact association the Spark hot loop uses (it
    // differs from cost−cost−cost in the last ulp, so shapes must match)
    val sum = s"(${cost(A, "k")} + ${cost("k", B)})"
    val minsum =
      "list_reduce(list_prepend(struct_pack(sum := 1e308, kk := CAST(-1 AS BIGINT)), " +
        s"list_transform(range(($A) + 2, ($B) - 1), " +
        s"k -> struct_pack(sum := $sum, kk := k))), " +
        "(a2, x2) -> CASE WHEN struct_extract(x2,'sum') < " +
        "struct_extract(a2,'sum') THEN x2 ELSE a2 END)"
    val segbest =
      s"struct_pack(gain := CASE WHEN struct_extract($minsum,'kk') >= 0 " +
        s"THEN ${cost(A, B)} - struct_extract($minsum,'sum') ELSE -1.0 END, " +
        s"kk := struct_extract($minsum,'kk'))"
    s"""WITH RECURSIVE
      |f AS (SELECT event_type AS key,
      |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
      |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
      |p AS (SELECT key, week_start,
      |    CAST(SUM(freq) OVER (PARTITION BY key ORDER BY week_start
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps,
      |    CAST(SUM(freq * freq) OVER (PARTITION BY key ORDER BY week_start
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS qs
      |  FROM f),
      |s AS (SELECT key,
      |    list(week_start ORDER BY week_start) AS tl,
      |    list(ps ORDER BY week_start) AS pl,
      |    list(qs ORDER BY week_start) AS ql,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1),
      |it AS (
      |  SELECT key, 0 AS depth, [CAST(0 AS BIGINT), n] AS bounds FROM s
      |  UNION ALL
      |  SELECT key, depth + 1,
      |    CASE WHEN struct_extract(best, 'gain') > 0.0
      |      THEN list_sort(list_append(bounds, struct_extract(best, 'kk')))
      |      ELSE bounds END AS bounds
      |  FROM (
      |    SELECT it.key AS key, it.depth AS depth, it.bounds AS bounds,
      |      s.pl AS pl, s.ql AS ql,
      |      list_reduce(list_prepend(struct_pack(gain := -1.0, kk := CAST(-1 AS BIGINT)),
      |        list_transform(range(1, CAST(len(it.bounds) AS BIGINT)),
      |          i -> $segbest)),
      |        (acc, x) -> CASE WHEN struct_extract(x,'gain') >
      |          struct_extract(acc,'gain') THEN x ELSE acc END) AS best
      |    FROM it JOIN s ON s.key = it.key WHERE it.depth < 3) q
      |),
      |fin AS (SELECT key, bounds FROM it WHERE depth = 3),
      |segs AS (SELECT fin.key AS key, s.tl AS tl, s.pl AS pl, s.ql AS ql,
      |    UNNEST(list_transform(range(1, CAST(len(bounds) AS BIGINT)),
      |      i -> struct_pack(seg := i - 1, a := bounds[CAST(i AS INTEGER)],
      |        b := bounds[CAST(i AS INTEGER)+1]))) AS sg
      |  FROM fin JOIN s ON s.key = fin.key)
      |SELECT key, CAST(struct_extract(sg,'seg') AS INTEGER) AS seg,
      |  tl[CAST(struct_extract(sg,'a') AS INTEGER) + 1] AS start_t,
      |  tl[CAST(struct_extract(sg,'b') AS INTEGER)] AS end_t,
      |  struct_extract(sg,'b') - struct_extract(sg,'a') AS n_rows,
      |  CAST(${pat("struct_extract(sg,'b')")} - ${pat("struct_extract(sg,'a')")} AS DOUBLE)
      |    / CAST(struct_extract(sg,'b') - struct_extract(sg,'a') AS DOUBLE) AS mean,
      |  ${cost("struct_extract(sg,'a')", "struct_extract(sg,'b')")} AS sse
      |FROM segs ORDER BY key, seg""".stripMargin
  }

  /** c_cusum_alarms mirror. NOT a same-shape fold replay: DuckDB 1.0's
    * `list_reduce` evaluates a struct accumulator whose fields
    * cross-reference inconsistently (observed: the na field read a
    * partially-updated acc — an engine bug the fixture exposed), so the
    * mirror instead materializes the CUSUM trace as per-prefix scalar
    * folds (O(weeks²), fine at series length) and counts alarms off the
    * trace. Safe BECAUSE the operator is pure integer arithmetic:
    * exactness makes any evaluation shape produce identical values —
    * the float-tail queries don't have that freedom, this one does. */
  private val cusumOracle: String =
    """WITH f AS (SELECT event_type AS key,
      |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
      |    CAST(COUNT(*) AS BIGINT) AS freq FROM events GROUP BY 1, 2),
      |s AS (SELECT key,
      |    list(week_start ORDER BY week_start) AS tl,
      |    list(freq ORDER BY week_start) AS vs,
      |    CAST(FLOOR(quantile_cont(freq, 0.5)) AS BIGINT) AS ref,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM f GROUP BY 1),
      |tr AS (SELECT key, n, ref, tl,
      |    list_transform(range(1, n + 1), k ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_slice(vs, 1, CAST(k AS INTEGER))),
      |        (acc, x) -> greatest(acc + x - (ref + 2),
      |          CAST(0 AS BIGINT)))) AS trace
      |  FROM s),
      |al AS (SELECT key, n, ref, tl, trace,
      |    list_filter(range(1, n + 1),
      |      k -> trace[CAST(k AS INTEGER)] > 20) AS hits
      |  FROM tr)
      |SELECT key, n, ref, trace[CAST(n AS INTEGER)] AS s_final,
      |  CAST(len(hits) AS BIGINT) AS n_alarms,
      |  CASE WHEN len(hits) > 0 THEN tl[CAST(hits[1] AS INTEGER)] END
      |    AS first_alarm_t
      |FROM al ORDER BY key""".stripMargin

  /** c_optimal_changepoints mirror — the graft_segdp dynamic program as
    * a recursive CTE (one iteration per prefix position, candidates via
    * a sentinel-seeded strict-< fold in the kernel's exact association
    * `(F(s) + cost) + penalty`), a second recursion walking the
    * backpointers, then the same segment expansion as c_changepoints. */
  private val optimalChangepointsOracle: String = {
    def pat(i: String) =
      s"(CASE WHEN ($i) = 0 THEN 0 ELSE pl[CAST($i AS INTEGER)] END)"
    def qat(i: String) =
      s"(CASE WHEN ($i) = 0 THEN 0 ELSE ql[CAST($i AS INTEGER)] END)"
    def cost(a: String, b: String) =
      s"(CAST(${qat(b)} - ${qat(a)} AS DOUBLE) - " +
        s"CAST(${pat(b)} - ${pat(a)} AS DOUBLE) * " +
        s"CAST(${pat(b)} - ${pat(a)} AS DOUBLE) / CAST(($b) - ($a) AS DOUBLE))"
    val pen = "2000.0"; val ms = 2
    val cand = s"((f[CAST(s2 AS INTEGER) + 1] + ${cost("s2", "t + 1")}) + $pen)"
    val best =
      "list_reduce(list_prepend(struct_pack(val := 1e308, ss := CAST(-1 AS BIGINT)), " +
        s"list_transform(range(0, t + 1 - $ms + 1), " +
        s"s2 -> struct_pack(val := $cand, ss := s2))), " +
        "(a2, x2) -> CASE WHEN struct_extract(x2,'val') < " +
        "struct_extract(a2,'val') THEN x2 ELSE a2 END)"
    s"""WITH RECURSIVE
      |fq AS (SELECT event_type AS key,
      |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
      |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
      |p AS (SELECT key, week_start,
      |    CAST(SUM(freq) OVER (PARTITION BY key ORDER BY week_start
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps,
      |    CAST(SUM(freq * freq) OVER (PARTITION BY key ORDER BY week_start
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS qs
      |  FROM fq),
      |s AS (SELECT key, list(week_start ORDER BY week_start) AS tl,
      |    list(ps ORDER BY week_start) AS pl, list(qs ORDER BY week_start) AS ql,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1),
      |it AS (
      |  SELECT key, CAST(0 AS BIGINT) AS t, [CAST(-$pen AS DOUBLE)] AS f,
      |    CAST([] AS BIGINT[]) AS cp FROM s
      |  UNION ALL
      |  SELECT q.key, t + 1,
      |    CASE WHEN t + 1 < $ms THEN f || [CAST('infinity' AS DOUBLE)]
      |      ELSE f || [struct_extract(b, 'val')] END,
      |    CASE WHEN t + 1 < $ms THEN cp || [CAST(0 AS BIGINT)]
      |      ELSE cp || [struct_extract(b, 'ss')] END
      |  FROM (
      |    SELECT it.key AS key, it.t AS t, it.f AS f, it.cp AS cp,
      |      s.pl AS pl, s.ql AS ql, s.n AS n, $best AS b
      |    FROM it JOIN s ON s.key = it.key WHERE it.t < s.n) q
      |),
      |fin AS (SELECT it.key AS key, cp FROM it
      |  JOIN s ON s.key = it.key WHERE it.t = s.n),
      |bt AS (
      |  SELECT key, CAST(len(cp) AS BIGINT) AS cur,
      |    [CAST(len(cp) AS BIGINT)] AS bounds, cp FROM fin
      |  UNION ALL
      |  SELECT key, cp[CAST(cur AS INTEGER)],
      |    list_prepend(cp[CAST(cur AS INTEGER)], bounds), cp
      |  FROM bt WHERE cur > 0
      |),
      |fb AS (SELECT key, bounds FROM bt WHERE cur = 0),
      |segs AS (SELECT fb.key AS key, s.tl AS tl, s.pl AS pl, s.ql AS ql,
      |    UNNEST(list_transform(range(1, CAST(len(bounds) AS BIGINT)),
      |      i -> struct_pack(seg := i - 1, a := bounds[CAST(i AS INTEGER)],
      |        b := bounds[CAST(i AS INTEGER)+1]))) AS sg
      |  FROM fb JOIN s ON s.key = fb.key)
      |SELECT key, CAST(struct_extract(sg,'seg') AS INTEGER) AS seg,
      |  tl[CAST(struct_extract(sg,'a') AS INTEGER) + 1] AS start_t,
      |  tl[CAST(struct_extract(sg,'b') AS INTEGER)] AS end_t,
      |  struct_extract(sg,'b') - struct_extract(sg,'a') AS n_rows,
      |  CAST(${pat("struct_extract(sg,'b')")} - ${pat("struct_extract(sg,'a')")} AS DOUBLE)
      |    / CAST(struct_extract(sg,'b') - struct_extract(sg,'a') AS DOUBLE) AS mean,
      |  ${cost("struct_extract(sg,'a')", "struct_extract(sg,'b')")} AS sse
      |FROM segs ORDER BY key, seg""".stripMargin
  }

  /** a_benford_prices mirror: exact digit counts, χ² over the SAME
    * BenfordP double literals (interpolated below, so neither engine
    * evaluates a log), fixed digit-order fold. */
  private val benfordOracle: String = {
    val digit =
      "substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)"
    val counts = (1 to 9).map(d =>
      s"    CAST(SUM(CASE WHEN $digit = '$d' THEN 1 ELSE 0 END) " +
        s"AS BIGINT) AS d$d").mkString(",\n|")
    // list_reduce's first-element seed == the operator's 0.0-seeded
    // fold (0.0 + t1 = t1 exactly); a bare + chain would be exposed to
    // either engine's reassociation
    // CAST each constant to DOUBLE FROM A STRING: a bare 17-digit
    // literal is typed DECIMAL (decimal arithmetic, term 3 measured 5
    // ulps off), and CAST(DECIMAL AS DOUBLE) double-rounds because the
    // 17-digit mantissa exceeds 2^53 — only the string parse is the
    // correctly-rounded nearest double, i.e. the exact lit() Spark uses
    val chi2 = (1 to 9).map { d =>
      val p = s"CAST('${graft.operators.Quality.BenfordP(d - 1)}' AS DOUBLE)"
      s"((CAST(d$d AS DOUBLE) - CAST(n AS DOUBLE) * $p) * " +
        s"(CAST(d$d AS DOUBLE) - CAST(n AS DOUBLE) * $p)) / " +
        s"(CAST(n AS DOUBLE) * $p)"
    }.mkString("list_reduce([\n|    ", ",\n|    ", "\n|    ], (a, b) -> a + b)")
    s"""WITH c AS (SELECT o_orderpriority,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |$counts
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
       |  GROUP BY 1)
       |SELECT o_orderpriority, n, d1, d2, d3, d4, d5, d6, d7, d8, d9,
       |  CASE WHEN n > 0 THEN $chi2
       |  END AS chi2
       |FROM c ORDER BY o_orderpriority""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "a_benford_prices" -> benfordOracle,
    // Association-rules mirror: the same dedup -> self-join -> count
    // pipeline; every metric a fixed ratio of exact BIGINTs.
    "c_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT user_id AS bk, event_type AS it
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_baskets
        |  FROM bi),
        |itn AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n_it
        |  FROM bi GROUP BY 1),
        |pn AS (SELECT l.it AS it_a, r.it AS it_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM bi l JOIN bi r ON l.bk = r.bk AND l.it < r.it
        |  GROUP BY 1, 2),
        |d AS (SELECT it_a AS antecedent, it_b AS consequent, n_both
        |  FROM pn
        |  UNION ALL
        |  SELECT it_b, it_a, n_both FROM pn)
        |SELECT d.antecedent, d.consequent, a.n_it AS n_ante,
        |  c.n_it AS n_cons, d.n_both, nb.n_baskets,
        |  CAST(d.n_both AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE)
        |    AS support,
        |  CAST(d.n_both AS DOUBLE) / CAST(a.n_it AS DOUBLE)
        |    AS confidence,
        |  (CAST(d.n_both AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE))
        |    / (CAST(a.n_it AS DOUBLE) * CAST(c.n_it AS DOUBLE)) AS lift
        |FROM d JOIN itn a ON a.it = d.antecedent
        |JOIN itn c ON c.it = d.consequent
        |CROSS JOIN nb ORDER BY antecedent, consequent""".stripMargin,
    "c_changepoints" -> changepointsOracle,
    "c_cusum_alarms" -> cusumOracle,
    // Retention mirror: same Sunday week alignment as a5, distinct
    // (user, week) activity, min-week cohort window, and the
    // offset-0 size window; retention is the one float division.
    "c_retention_cohorts" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE))
        |      AS INTEGER) AS w
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT u, w, MIN(w) OVER (PARTITION BY u) AS cw FROM uw),
        |cell AS (SELECT cw AS cohort_week,
        |    CAST((w - cw) // 7 AS BIGINT) AS offset_weeks,
        |    CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM c GROUP BY 1, 2)
        |SELECT cohort_week, offset_weeks, n_active,
        |  CAST(MAX(CASE WHEN offset_weeks = 0 THEN n_active END)
        |    OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size,
        |  CAST(n_active AS DOUBLE)
        |    / CAST(MAX(CASE WHEN offset_weeks = 0 THEN n_active END)
        |        OVER (PARTITION BY cohort_week) AS DOUBLE) AS retention
        |FROM cell ORDER BY 1, 2""".stripMargin,
    "c_optimal_changepoints" -> optimalChangepointsOracle,
    "c_cross_corr" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |x AS (SELECT week_start, freq AS x FROM f WHERE key = 'click'),
        |y AS (SELECT week_start, freq AS y FROM f WHERE key = 'purchase'),
        |j AS (SELECT x.week_start, x.x, y.y
        |  FROM x JOIN y ON y.week_start = x.week_start),
        |i AS (SELECT CAST((week_start - (SELECT MIN(week_start) FROM j)) / 7
        |      AS BIGINT) AS t,
        |    CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y FROM j),
        |l AS (SELECT CAST(UNNEST(range(0, 3)) AS BIGINT) AS lag),
        |p AS (SELECT l.lag, i.t + l.lag AS tj, i.x FROM i CROSS JOIN l),
        |q AS (SELECT p.lag, p.x, i2.y FROM p JOIN i i2 ON i2.t = p.tj),
        |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM q GROUP BY 1)
        |SELECT lag, n,
        |  CASE WHEN n > 1 AND n * sxx - sx * sx > 0
        |      AND n * syy - sy * sy > 0 THEN
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |             * CAST(n * syy - sy * sy AS DOUBLE)) END AS r
        |FROM m ORDER BY lag""".stripMargin,
    "a1_sum_by_flag_status" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "j1_orders_customer_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j2_left_join_zero_fill" ->
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1)
        |SELECT c_nationkey, COUNT(*) AS n_customers,
        |  CAST(SUM(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
        |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j3_broadcast_star_join" ->
      """SELECT r_name, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j6_size_band_when_chain" ->
      """SELECT CASE WHEN p_size BETWEEN 1 AND 10 THEN 'small'
        |            WHEN p_size BETWEEN 11 AND 25 THEN 'medium'
        |            WHEN p_size BETWEEN 26 AND 49 THEN 'large'
        |            ELSE 'Other' END AS band, COUNT(*) AS n
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "j6_size_band_range_join" ->
      """SELECT CASE WHEN p_size BETWEEN 1 AND 10 THEN 'small'
        |            WHEN p_size BETWEEN 11 AND 25 THEN 'medium'
        |            WHEN p_size BETWEEN 26 AND 49 THEN 'large'
        |            ELSE 'Other' END AS band, COUNT(*) AS n
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "j6_range_join_exec" ->
      """SELECT band, COUNT(*) AS n
        |FROM part
        |JOIN (VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 49))
        |  AS b(band, lo, hi)
        |ON p_size BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j6_range_join_outer" ->
      """SELECT COALESCE(b_name, 'Other') AS band, COUNT(*) AS n
        |FROM part
        |LEFT JOIN (VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 49))
        |  AS b(b_name, lo, hi)
        |ON p_size BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "l_zorder_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey <= 200 AND l_suppkey <= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j9_semi_topk_filter" ->
      """WITH top AS (SELECT l_partkey FROM lineitem GROUP BY 1
        |             ORDER BY SUM(l_quantity) DESC, l_partkey LIMIT 10)
        |SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |WHERE l_partkey IN (SELECT l_partkey FROM top)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "o4_topk_parts" ->
      """SELECT l_partkey, SUM(l_quantity) AS sum_qty FROM lineitem
        |GROUP BY 1 ORDER BY sum_qty DESC, l_partkey LIMIT 10""".stripMargin,
    "w1_top3_per_nation" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        |  FROM customer) WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "w3_share_normalization" ->
      """WITH f AS (SELECT CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    event_type, COUNT(*) AS freq FROM events GROUP BY 1, 2)
        |SELECT week_start, event_type, freq,
        |  CAST(freq AS DOUBLE) / CAST(SUM(freq) OVER (PARTITION BY week_start) AS DOUBLE) AS share
        |FROM f ORDER BY week_start, event_type""".stripMargin,
    "a6_rollup_worldwide" ->
      """SELECT COALESCE(r_name, 'Worldwide') AS region, COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name) ORDER BY region""".stripMargin,
    "a8_first_order_per_customer" ->
      """SELECT o_custkey, first_orderkey, first_date FROM (
        |  SELECT o_custkey, o_orderkey AS first_orderkey,
        |    CAST(o_orderdate AS DATE) AS first_date,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "a12_contingency" ->
      """SELECT
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS rf,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS r_notf,
        |  CAST(SUM(CASE WHEN l_returnflag <> 'R' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS notr_f,
        |  CAST(SUM(CASE WHEN l_returnflag <> 'R' AND l_linestatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS notr_notf,
        |  COUNT(*) AS total
        |FROM lineitem""".stripMargin,
    "a14_histogram_quantity" ->
      """SELECT CASE WHEN l_quantity > 50 THEN 'Greater than 50'
        |            WHEN l_quantity >= 40 AND l_quantity <= 50 THEN '40 to 50'
        |            WHEN l_quantity >= 30 AND l_quantity < 40 THEN '30 to 40'
        |            WHEN l_quantity >= 20 AND l_quantity < 30 THEN '20 to 30'
        |            WHEN l_quantity >= 10 AND l_quantity < 20 THEN '10 to 20'
        |            WHEN l_quantity >= 1 AND l_quantity < 10 THEN '1 to 10'
        |            END AS bin, COUNT(*) AS count
        |FROM lineitem WHERE bin IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "u1_union_accounts" ->
      """WITH u AS (
        |  SELECT c_nationkey AS nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
        |    'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, CAST(s_acctbal AS DECIMAL(18,2)) AS bal,
        |    'supplier' AS side FROM supplier)
        |SELECT nationkey, side, COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS total_bal
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "f5_predicate_stack" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE event_type IN ('purchase', 'signup')
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-03-31'
        |  AND regexp_matches(props, '"k": [0-9]+')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c7_weekly_counts" ->
      """SELECT CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |  COUNT(*) AS freq
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "c8_week_labels" ->
      """WITH f AS (SELECT CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1)
        |SELECT week_start,
        |  printf('Week%d (%s-%s)', DENSE_RANK() OVER (ORDER BY week_start),
        |    strftime(week_start, '%m/%d/%Y'),
        |    strftime(week_start + 6, '%m/%d/%Y')) AS label,
        |  freq
        |FROM f ORDER BY week_start""".stripMargin,
    "c_theil_sen_trend" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |pt0 AS (SELECT key,
        |    CAST((week_start - MIN(week_start) OVER (PARTITION BY key)) / 7
        |      AS DOUBLE) AS x,
        |    CAST(freq AS DOUBLE) AS y FROM f),
        |pr AS (SELECT a.key, (b.y - a.y) / (b.x - a.x) AS sl
        |  FROM pt0 a JOIN pt0 b ON a.key = b.key
        |    AND (b.x > a.x OR (b.x = a.x AND b.y > a.y))
        |  WHERE b.x <> a.x),
        |r AS (SELECT key, sl,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY sl) AS rn,
        |    COUNT(*) OVER (PARTITION BY key) AS c FROM pr),
        |sel AS (SELECT key, c AS n_pairs,
        |    SUM(CASE WHEN c % 2 = 1 AND rn = (c + 1) / 2 THEN sl END) AS m_odd,
        |    SUM(CASE WHEN c % 2 = 0 AND rn IN (c / 2, c / 2 + 1) THEN sl END)
        |      / 2 AS m_even
        |  FROM r GROUP BY key, c),
        |np AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pt0 GROUP BY 1)
        |SELECT np.key, np.n, COALESCE(CAST(sel.n_pairs AS BIGINT), 0)
        |    AS n_pairs,
        |  CASE WHEN sel.n_pairs % 2 = 1 THEN m_odd ELSE m_even END AS slope
        |FROM np LEFT JOIN sel ON sel.key = np.key
        |ORDER BY 1""".stripMargin,
    "c_ewma_level" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |  list_reduce(list(CAST(freq AS DOUBLE) ORDER BY week_start),
        |    (acc, x) -> 0.25 * x + 0.75 * acc) AS level
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // ACF mirror: the same n²-scaled exact-BIGINT deviations and lag
    // numerators over the sorted weekly list; r is the identical single
    // division of exact integers, so it hashes unrounded.
    "c_acf" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS BIGINT) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(freq) AS BIGINT) AS sm FROM f GROUP BY 1),
        |d AS (SELECT key, n,
        |    list_transform(vs, x -> n * x - sm) AS dv FROM s
        |  WHERE n >= 2),
        |l AS (SELECT key, n, dv,
        |    CAST(UNNEST(range(1, CAST(least(4, n - 1) AS INTEGER) + 1))
        |      AS BIGINT) AS lag FROM d)
        |SELECT key, lag, n,
        |  CAST(list_sum(list_transform(
        |    range(1, CAST(n - lag AS INTEGER) + 1),
        |    i -> dv[CAST(i AS INTEGER)] *
        |         dv[CAST(i + lag AS INTEGER)])) AS BIGINT) AS num,
        |  CAST(list_sum(list_transform(dv, x -> x * x)) AS BIGINT) AS den,
        |  CASE WHEN CAST(list_sum(list_transform(dv, x -> x * x))
        |      AS BIGINT) > 0
        |    THEN CAST(CAST(list_sum(list_transform(
        |        range(1, CAST(n - lag AS INTEGER) + 1),
        |        i -> dv[CAST(i AS INTEGER)] *
        |             dv[CAST(i + lag AS INTEGER)])) AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(list_sum(list_transform(dv, x -> x * x))
        |          AS BIGINT) AS DOUBLE)
        |  END AS r
        |FROM l ORDER BY key, lag""".stripMargin,
    // Backtest mirror: the five forecasters replayed over the TRAINING
    // prefix (holt and holt-winters as recursive CTEs, the others as
    // list folds), then the same fixed-order sMAPE fold per method.
    "c_backtest" ->
      """WITH RECURSIVE f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS DOUBLE) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |base AS (SELECT key, vs, n, CAST(n - 2 AS INTEGER) AS m,
        |    vs[1 : CAST(n - 2 AS INTEGER)] AS tr,
        |    list_transform(range(1, 3),
        |      i -> vs[CAST(n - 2 + i AS INTEGER)]) AS act
        |  FROM s WHERE n - 2 >= 2),
        |hit AS (
        |  SELECT key, m, tr, CAST(1 AS BIGINT) AS i, tr[1] AS l,
        |    CASE WHEN m >= 2 THEN tr[2] - tr[1]
        |      ELSE CAST(0 AS DOUBLE) END AS b
        |  FROM base
        |  UNION ALL
        |  SELECT key, m, tr, i + 1, lp, 0.125 * (lp - l) + 0.875 * b
        |  FROM (SELECT key, m, tr, i, l, b,
        |      0.25 * tr[CAST(i + 1 AS INTEGER)] + 0.75 * (l + b) AS lp
        |    FROM hit WHERE i < m) AS hq),
        |hfin AS (SELECT key, l, b FROM hit WHERE i = m),
        |hwseed AS (SELECT key, m, tr,
        |    list_reduce(list_transform(range(1, 3),
        |      j -> tr[CAST(j AS INTEGER)]), (a, b) -> a + b) / 2.0 AS l0
        |  FROM base),
        |hwi AS (
        |  SELECT key, m, tr, CAST(2 AS BIGINT) AS t, l0 AS l,
        |    CAST(0 AS DOUBLE) AS b,
        |    list_transform(range(1, 3),
        |      j -> tr[CAST(j AS INTEGER)] - l0) AS sl
        |  FROM hwseed
        |  UNION ALL
        |  SELECT key, m, tr, t + 1, lp,
        |    0.125 * (lp - l) + 0.875 * b,
        |    list_transform(sl, (sv, j) -> CASE WHEN j = pos
        |      THEN 0.25 * (tr[CAST(t + 1 AS INTEGER)] - lp) + 0.75 * sv
        |      ELSE sv END)
        |  FROM (SELECT key, m, tr, t, l, b, sl,
        |      CAST(t % 2 + 1 AS INTEGER) AS pos,
        |      0.25 * (tr[CAST(t + 1 AS INTEGER)]
        |          - sl[CAST(t % 2 + 1 AS INTEGER)])
        |        + 0.75 * (l + b) AS lp
        |    FROM hwi WHERE t < m) AS wq),
        |hwfin AS (SELECT key, l, b, sl FROM hwi WHERE t = m),
        |fc AS (
        |  SELECT key, n, 'naive' AS method,
        |    list_transform(range(1, 3), i -> tr[m]) AS fl, act FROM base
        |  UNION ALL
        |  SELECT key, n, 'snaive',
        |    list_transform(range(1, 3),
        |      i -> tr[CAST(m - 2 + (i - 1) % 2 + 1 AS INTEGER)]), act
        |  FROM base
        |  UNION ALL
        |  SELECT key, n, 'ewma',
        |    list_transform(range(1, 3),
        |      i -> list_reduce(tr, (a, x) -> 0.25 * x + 0.75 * a)), act
        |  FROM base
        |  UNION ALL
        |  SELECT base.key, n, 'holt',
        |    list_transform(range(1, 3),
        |      i -> hfin.l + CAST(i AS DOUBLE) * hfin.b), act
        |  FROM base JOIN hfin ON hfin.key = base.key
        |  UNION ALL
        |  SELECT base.key, n, 'holt_winters',
        |    list_transform(range(1, 3),
        |      i -> hwfin.l + CAST(i AS DOUBLE) * hwfin.b
        |        + hwfin.sl[CAST((m + i - 1) % 2 + 1 AS INTEGER)]), act
        |  FROM base JOIN hwfin ON hwfin.key = base.key)
        |SELECT key, method, n,
        |  list_reduce(list_transform(range(1, 3), i ->
        |    CASE WHEN abs(fl[CAST(i AS INTEGER)])
        |        + abs(act[CAST(i AS INTEGER)]) = 0 THEN 0.0
        |      ELSE 2.0 * abs(fl[CAST(i AS INTEGER)]
        |          - act[CAST(i AS INTEGER)])
        |        / (abs(fl[CAST(i AS INTEGER)])
        |          + abs(act[CAST(i AS INTEGER)])) END),
        |    (a, b) -> a + b) / 2.0 AS smape
        |FROM fc ORDER BY key, method""".stripMargin,
    // Rolling-origin mirror: the c_backtest replay with the recursions
    // keyed by (key, origin j); origin j trains on vs[1 : n-1-j]; the
    // cross-origin mean folds list(smape ORDER BY j) — ascending j,
    // matching the operator's in-row ascending-origin fold.
    "c_backtest_rolling" ->
      """WITH RECURSIVE f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS DOUBLE) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |base AS (SELECT key, o.j, vs, n, CAST(n - 1 - o.j AS INTEGER) AS m,
        |    vs[1 : CAST(n - 1 - o.j AS INTEGER)] AS tr,
        |    list_transform(range(1, 2),
        |      i -> vs[CAST(n - 1 - o.j + i AS INTEGER)]) AS act
        |  FROM s CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) o
        |  WHERE n - 1 - 2 >= 2),
        |hit AS (
        |  SELECT key, j, m, tr, CAST(1 AS BIGINT) AS i, tr[1] AS l,
        |    CASE WHEN m >= 2 THEN tr[2] - tr[1]
        |      ELSE CAST(0 AS DOUBLE) END AS b
        |  FROM base
        |  UNION ALL
        |  SELECT key, j, m, tr, i + 1, lp, 0.125 * (lp - l) + 0.875 * b
        |  FROM (SELECT key, j, m, tr, i, l, b,
        |      0.25 * tr[CAST(i + 1 AS INTEGER)] + 0.75 * (l + b) AS lp
        |    FROM hit WHERE i < m) AS hq),
        |hfin AS (SELECT key, j, l, b FROM hit WHERE i = m),
        |hwseed AS (SELECT key, j, m, tr,
        |    list_reduce(list_transform(range(1, 3),
        |      q -> tr[CAST(q AS INTEGER)]), (a, b) -> a + b) / 2.0 AS l0
        |  FROM base),
        |hwi AS (
        |  SELECT key, j, m, tr, CAST(2 AS BIGINT) AS t, l0 AS l,
        |    CAST(0 AS DOUBLE) AS b,
        |    list_transform(range(1, 3),
        |      q -> tr[CAST(q AS INTEGER)] - l0) AS sl
        |  FROM hwseed
        |  UNION ALL
        |  SELECT key, j, m, tr, t + 1, lp,
        |    0.125 * (lp - l) + 0.875 * b,
        |    list_transform(sl, (sv, q) -> CASE WHEN q = pos
        |      THEN 0.25 * (tr[CAST(t + 1 AS INTEGER)] - lp) + 0.75 * sv
        |      ELSE sv END)
        |  FROM (SELECT key, j, m, tr, t, l, b, sl,
        |      CAST(t % 2 + 1 AS INTEGER) AS pos,
        |      0.25 * (tr[CAST(t + 1 AS INTEGER)]
        |          - sl[CAST(t % 2 + 1 AS INTEGER)])
        |        + 0.75 * (l + b) AS lp
        |    FROM hwi WHERE t < m) AS wq),
        |hwfin AS (SELECT key, j, l, b, sl FROM hwi WHERE t = m),
        |fc AS (
        |  SELECT key, j, n, 'naive' AS method,
        |    list_transform(range(1, 2), i -> tr[m]) AS fl, act FROM base
        |  UNION ALL
        |  SELECT key, j, n, 'snaive',
        |    list_transform(range(1, 2),
        |      i -> tr[CAST(m - 2 + (i - 1) % 2 + 1 AS INTEGER)]), act
        |  FROM base
        |  UNION ALL
        |  SELECT key, j, n, 'ewma',
        |    list_transform(range(1, 2),
        |      i -> list_reduce(tr, (a, x) -> 0.25 * x + 0.75 * a)), act
        |  FROM base
        |  UNION ALL
        |  SELECT base.key, base.j, n, 'holt',
        |    list_transform(range(1, 2),
        |      i -> hfin.l + CAST(i AS DOUBLE) * hfin.b), act
        |  FROM base JOIN hfin ON hfin.key = base.key AND hfin.j = base.j
        |  UNION ALL
        |  SELECT base.key, base.j, n, 'holt_winters',
        |    list_transform(range(1, 2),
        |      i -> hwfin.l + CAST(i AS DOUBLE) * hwfin.b
        |        + hwfin.sl[CAST((m + i - 1) % 2 + 1 AS INTEGER)]), act
        |  FROM base JOIN hwfin ON hwfin.key = base.key
        |    AND hwfin.j = base.j),
        |sm AS (SELECT key, j, n, method,
        |    list_reduce(list_transform(range(1, 2), i ->
        |      CASE WHEN abs(fl[CAST(i AS INTEGER)])
        |          + abs(act[CAST(i AS INTEGER)]) = 0 THEN 0.0
        |        ELSE 2.0 * abs(fl[CAST(i AS INTEGER)]
        |            - act[CAST(i AS INTEGER)])
        |          / (abs(fl[CAST(i AS INTEGER)])
        |            + abs(act[CAST(i AS INTEGER)])) END),
        |      (a, b) -> a + b) / 1.0 AS smape
        |  FROM fc)
        |SELECT key, method, n, CAST(3 AS BIGINT) AS n_origins,
        |  list_reduce(list(smape ORDER BY j), (a, b) -> a + b)
        |    / 3.0 AS smape
        |FROM sm GROUP BY key, method, n
        |ORDER BY key, method""".stripMargin,
    // Holt-Winters mirror: seed (period mean, b=0, v-mean seasonals) +
    // the three-equation recursion replayed as a recursive CTE with a
    // list seasonal state; lp computed once and reused like the Holt
    // mirror; all smoothing literals dyadic, hence engine-exact.
    "c_holt_winters" ->
      """WITH RECURSIVE f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS DOUBLE) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |i AS (SELECT key, vs, n,
        |    list_reduce(list_transform(range(1, 3),
        |      j -> vs[CAST(j AS INTEGER)]), (a, b) -> a + b) / 2.0 AS l0
        |  FROM s WHERE n >= 2),
        |it AS (
        |  SELECT key, vs, n, CAST(2 AS BIGINT) AS t, l0 AS l,
        |    CAST(0 AS DOUBLE) AS b,
        |    list_transform(range(1, 3),
        |      j -> vs[CAST(j AS INTEGER)] - l0) AS sl
        |  FROM i
        |  UNION ALL
        |  SELECT key, vs, n, t + 1, lp,
        |    0.125 * (lp - l) + 0.875 * b,
        |    list_transform(sl, (sv, j) -> CASE WHEN j = pos
        |      THEN 0.25 * (vs[CAST(t + 1 AS INTEGER)] - lp) + 0.75 * sv
        |      ELSE sv END)
        |  FROM (SELECT key, vs, n, t, l, b, sl,
        |      CAST(t % 2 + 1 AS INTEGER) AS pos,
        |      0.25 * (vs[CAST(t + 1 AS INTEGER)]
        |          - sl[CAST(t % 2 + 1 AS INTEGER)])
        |        + 0.75 * (l + b) AS lp
        |    FROM it WHERE t < n) AS q
        |)
        |SELECT key, n, l AS level, b AS trend,
        |  l + 4.0 * b + sl[CAST((n + 4 - 1) % 2 + 1 AS INTEGER)] AS forecast
        |FROM it WHERE t = n ORDER BY key""".stripMargin,
    // PACF mirror: the exact acf ratios, then Durbin-Levinson replayed
    // as a recursive CTE in the operator's op order (list_reduce seeds
    // from the first term; 0.0 + t == t, so the folds match bitwise).
    "c_pacf" ->
      """WITH RECURSIVE f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS BIGINT) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(freq) AS BIGINT) AS sm FROM f GROUP BY 1),
        |d AS (SELECT key, n,
        |    list_transform(vs, x -> n * x - sm) AS dv FROM s
        |  WHERE n >= 2),
        |dn AS (SELECT key, n, dv,
        |    CAST(list_sum(list_transform(dv, x -> x * x)) AS BIGINT)
        |      AS den
        |  FROM d),
        |r AS (SELECT key, n,
        |    list_transform(range(1, CAST(least(4, n - 1) AS INTEGER) + 1),
        |      k -> CAST(CAST(list_sum(list_transform(
        |            range(1, CAST(n - k AS INTEGER) + 1),
        |            i -> dv[CAST(i AS INTEGER)] *
        |                 dv[CAST(i + k AS INTEGER)])) AS BIGINT) AS DOUBLE)
        |        / CAST(den AS DOUBLE)) AS rs
        |  FROM dn WHERE den > 0),
        |it AS (
        |  SELECT key, n, rs, CAST(1 AS BIGINT) AS k,
        |    [rs[1]] AS phi, [rs[1]] AS pacf
        |  FROM r
        |  UNION ALL
        |  SELECT key, n, rs, k + 1,
        |    list_append(list_transform(phi, (p, j) ->
        |      p - pk * phi[CAST(k + 1 - j AS INTEGER)]), pk),
        |    list_append(pacf, pk)
        |  FROM (
        |    SELECT key, n, rs, k, phi, pacf,
        |      CASE WHEN (1.0 - list_reduce(list_transform(
        |            range(1, CAST(k AS INTEGER) + 1),
        |            j -> phi[CAST(j AS INTEGER)] * rs[CAST(j AS INTEGER)]),
        |          (a, b) -> a + b)) = 0.0 THEN NULL
        |        ELSE (rs[CAST(k + 1 AS INTEGER)]
        |            - list_reduce(list_transform(
        |                range(1, CAST(k AS INTEGER) + 1),
        |                j -> phi[CAST(j AS INTEGER)]
        |                   * rs[CAST(k + 1 - j AS INTEGER)]),
        |              (a, b) -> a + b))
        |          / (1.0 - list_reduce(list_transform(
        |                range(1, CAST(k AS INTEGER) + 1),
        |                j -> phi[CAST(j AS INTEGER)]
        |                   * rs[CAST(j AS INTEGER)]),
        |              (a, b) -> a + b))
        |      END AS pk
        |    FROM it WHERE k < len(rs)) AS q
        |)
        |SELECT key, CAST(u.i AS BIGINT) AS lag, n,
        |  pacf[CAST(u.i AS INTEGER)] AS pacf
        |FROM it, UNNEST(range(1, len(pacf) + 1)) AS u(i)
        |WHERE k = len(rs)
        |ORDER BY key, lag""".stripMargin,
    // Holt mirror: the level/trend recursion replayed as a recursive CTE
    // in the operator's exact operation order. l_t is computed once and
    // reused in the b_t step — in the operator the b-step's copy of the
    // l-expression evaluates to the same deterministic double, so the
    // single-evaluation shape is bit-identical. 0.25/0.75/0.125/0.875
    // are dyadic, hence engine-exact literals.
    "c_holt_forecast" ->
      """WITH RECURSIVE f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |s AS (SELECT key,
        |    list(CAST(freq AS DOUBLE) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |it AS (
        |  SELECT key, n, vs, CAST(1 AS BIGINT) AS i, vs[1] AS l,
        |    CASE WHEN n >= 2 THEN vs[2] - vs[1] ELSE 0.0 END AS b
        |  FROM s
        |  UNION ALL
        |  SELECT key, n, vs, i + 1, lp,
        |    0.125 * (lp - l) + 0.875 * b
        |  FROM (SELECT key, n, vs, i, l, b,
        |      0.25 * vs[CAST(i + 1 AS INTEGER)] + 0.75 * (l + b) AS lp
        |    FROM it WHERE i < n) q
        |)
        |SELECT key, n, l AS level, b AS trend, l + 4.0 * b AS forecast
        |FROM it WHERE i = n ORDER BY key""".stripMargin,
    // Mann-Kendall mirror: S from list-comprehension pair comparisons
    // (exact ints, order-free), ties from an exact per-(key, value)
    // count aggregate, tau/z as the same fixed float expressions.
    "c_mann_kendall" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |sv AS (SELECT key,
        |    list(CAST(freq AS DOUBLE) ORDER BY week_start) AS vs,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |sc AS (SELECT key, n,
        |    CAST(COALESCE(list_sum(flatten(
        |      list_transform(range(1, n),
        |        i -> list_transform(range(i + 1, n + 1), j ->
        |          CASE WHEN vs[CAST(j AS INTEGER)] > vs[CAST(i AS INTEGER)]
        |                 THEN 1
        |               WHEN vs[CAST(j AS INTEGER)] < vs[CAST(i AS INTEGER)]
        |                 THEN -1
        |               ELSE 0 END)))), 0) AS BIGINT) AS s
        |  FROM sv),
        |tie AS (SELECT key,
        |    CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie
        |  FROM (SELECT key, CAST(freq AS DOUBLE) AS v,
        |      CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1, 2)
        |  GROUP BY 1),
        |m AS (SELECT sc.key AS key, sc.n AS n, sc.s AS s,
        |    CAST(sc.n * (sc.n - 1) * (2 * sc.n + 5) - tie.tie AS DOUBLE)
        |      / 18.0 AS var_s
        |  FROM sc JOIN tie ON tie.key = sc.key)
        |SELECT key, n, s,
        |  CASE WHEN n >= 2 THEN 2.0 * CAST(s AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE) END AS tau,
        |  CASE WHEN n >= 2 AND var_s > 0.0 THEN
        |    CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
        |         WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
        |         ELSE 0.0 END
        |  END AS z
        |FROM m ORDER BY key""".stripMargin,
    "c_growth_advantage" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |tot AS (SELECT key, week_start, freq,
        |    SUM(freq) OVER (PARTITION BY week_start) AS tot FROM f),
        |sh AS (SELECT key,
        |    CAST(FLOOR(ln((CAST(freq AS DOUBLE) / CAST(tot AS DOUBLE))
        |        / (1.0 - CAST(freq AS DOUBLE) / CAST(tot AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS y,
        |    CAST((week_start - MIN(week_start) OVER (PARTITION BY key)) / 7
        |      AS BIGINT) AS x
        |  FROM tot WHERE freq > 0 AND freq < tot),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM sh GROUP BY 1)
        |SELECT key, n,
        |  CASE WHEN n * sxx - sx * sx <> 0 THEN
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
        |  CASE WHEN n * sxx - sx * sx <> 0 THEN
        |    CAST(sy * sxx - sx * sxy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS intercept,
        |  CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
        |    (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
        |      / (CAST(n * sxx - sx * sx AS DOUBLE)
        |         * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
        |FROM m ORDER BY 1""".stripMargin,
    "c_ts_anomalies" ->
      ("""WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |w AS (SELECT CAST(UNNEST(generate_series(
        |    (SELECT MIN(week_start) FROM f), (SELECT MAX(week_start) FROM f),
        |    INTERVAL 7 DAY)) AS DATE) AS week_start),
        |k AS (SELECT DISTINCT key FROM f),
        |d AS (SELECT k.key, w.week_start, COALESCE(f.freq, 0) AS freq
        |  FROM k CROSS JOIN w
        |  LEFT JOIN f ON f.key = k.key AND f.week_start = w.week_start),
        |b AS (SELECT key, week_start, freq,
        |    (ROW_NUMBER() OVER (PARTITION BY key ORDER BY week_start) - 1) % 5
        |      AS season,
        |    COUNT(*) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS cnt,
        |    CAST(SUM(freq) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS tsum
        |  FROM d),
        |tt AS (SELECT *,
        |    CASE WHEN cnt = 5 THEN CAST(tsum AS DOUBLE) / 5 END AS trend,
        |    CASE WHEN cnt = 5 THEN freq * 5 - tsum END AS det_num FROM b),
        |sr AS (SELECT key, season, CAST(SUM(det_num) AS BIGINT) AS s_num,
        |    COUNT(*) AS s_cnt
        |  FROM tt WHERE det_num IS NOT NULL GROUP BY 1, 2),
        |sr2 AS (SELECT key, season,
        |    CAST(s_num AS DOUBLE) / CAST(s_cnt * 5 AS DOUBLE) AS s_raw
        |  FROM sr),
        |cen AS (SELECT key,
        |    list_reduce(list(s_raw ORDER BY season), (a, b) -> a + b)
        |      / COUNT(*) AS c
        |  FROM sr2 GROUP BY 1),
        |sea AS (SELECT sr2.key, sr2.season, s_raw - c AS seasonal
        |  FROM sr2 JOIN cen ON sr2.key = cen.key),
        |dd AS (SELECT tt.key, tt.week_start, CAST(tt.freq AS BIGINT) AS value,
        |  tt.trend, sea.seasonal,
        |  CASE WHEN tt.trend IS NOT NULL AND sea.seasonal IS NOT NULL
        |    THEN CAST(tt.freq AS DOUBLE) - tt.trend - sea.seasonal
        |  END AS remainder
        |FROM tt LEFT JOIN sea ON sea.key = tt.key AND sea.season = tt.season),
        |m AS (SELECT key, quantile_cont(remainder, 0.5) AS med
        |  FROM dd WHERE remainder IS NOT NULL GROUP BY 1),
        |m2 AS (SELECT dd.key,
        |    quantile_cont(abs(dd.remainder - m.med), 0.5) AS mad
        |  FROM dd JOIN m ON m.key = dd.key
        |  WHERE dd.remainder IS NOT NULL GROUP BY 1)
        |SELECT dd.key, dd.week_start, dd.value, dd.remainder, m.med,
        |  m2.mad,
        |  CASE WHEN dd.remainder IS NOT NULL AND m2.mad IS NOT NULL
        |    THEN abs(dd.remainder - m.med) > 2.0 * m2.mad END AS is_anomaly
        |FROM dd LEFT JOIN m ON m.key = dd.key
        |LEFT JOIN m2 ON m2.key = dd.key
        |ORDER BY 1, 2""").stripMargin,
    // Strength mirror: the decompose replay at period 3, then per key
    // two fixed-order variance folds per component (Σx, Σx² in week
    // order, var = Σx²/n − (Σx/n)²); f_trend/f_seasonal unrounded.
    "c_ts_strength" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |w AS (SELECT CAST(UNNEST(generate_series(
        |    (SELECT MIN(week_start) FROM f), (SELECT MAX(week_start) FROM f),
        |    INTERVAL 7 DAY)) AS DATE) AS week_start),
        |k AS (SELECT DISTINCT key FROM f),
        |d AS (SELECT k.key, w.week_start, COALESCE(f.freq, 0) AS freq
        |  FROM k CROSS JOIN w
        |  LEFT JOIN f ON f.key = k.key AND f.week_start = w.week_start),
        |b AS (SELECT key, week_start, freq,
        |    (ROW_NUMBER() OVER (PARTITION BY key ORDER BY week_start) - 1) % 3
        |      AS season,
        |    COUNT(*) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS cnt,
        |    CAST(SUM(freq) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS tsum
        |  FROM d),
        |tt AS (SELECT *,
        |    CASE WHEN cnt = 3 THEN CAST(tsum AS DOUBLE) / 3 END AS trend,
        |    CASE WHEN cnt = 3 THEN freq * 3 - tsum END AS det_num FROM b),
        |sr AS (SELECT key, season, CAST(SUM(det_num) AS BIGINT) AS s_num,
        |    COUNT(*) AS s_cnt
        |  FROM tt WHERE det_num IS NOT NULL GROUP BY 1, 2),
        |sr2 AS (SELECT key, season,
        |    CAST(s_num AS DOUBLE) / CAST(s_cnt * 3 AS DOUBLE) AS s_raw
        |  FROM sr),
        |cen AS (SELECT key,
        |    list_reduce(list(s_raw ORDER BY season), (a, b) -> a + b)
        |      / COUNT(*) AS c
        |  FROM sr2 GROUP BY 1),
        |sea AS (SELECT sr2.key, sr2.season, s_raw - c AS seasonal
        |  FROM sr2 JOIN cen ON sr2.key = cen.key),
        |rows AS (SELECT tt.key, tt.week_start AS t,
        |    CAST(tt.freq AS DOUBLE) - tt.trend - sea.seasonal AS r,
        |    CAST(tt.freq AS DOUBLE) - tt.trend AS srv,
        |    CAST(tt.freq AS DOUBLE) - sea.seasonal AS trv
        |  FROM tt JOIN sea ON sea.key = tt.key AND sea.season = tt.season
        |  WHERE tt.trend IS NOT NULL AND sea.seasonal IS NOT NULL),
        |a AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_complete,
        |    0.0 + list_reduce(list(r ORDER BY t), (x, y) -> x + y) AS s_r,
        |    0.0 + list_reduce(list(r * r ORDER BY t), (x, y) -> x + y)
        |      AS q_r,
        |    0.0 + list_reduce(list(srv ORDER BY t), (x, y) -> x + y)
        |      AS s_sr,
        |    0.0 + list_reduce(list(srv * srv ORDER BY t),
        |      (x, y) -> x + y) AS q_sr,
        |    0.0 + list_reduce(list(trv ORDER BY t), (x, y) -> x + y)
        |      AS s_tr,
        |    0.0 + list_reduce(list(trv * trv ORDER BY t),
        |      (x, y) -> x + y) AS q_tr
        |  FROM rows GROUP BY 1)
        |SELECT key, n_complete,
        |  CASE WHEN q_tr / CAST(n_complete AS DOUBLE)
        |      - (s_tr / CAST(n_complete AS DOUBLE))
        |        * (s_tr / CAST(n_complete AS DOUBLE)) > 0.0
        |    THEN GREATEST(0.0, 1.0
        |      - (q_r / CAST(n_complete AS DOUBLE)
        |          - (s_r / CAST(n_complete AS DOUBLE))
        |            * (s_r / CAST(n_complete AS DOUBLE)))
        |        / (q_tr / CAST(n_complete AS DOUBLE)
        |          - (s_tr / CAST(n_complete AS DOUBLE))
        |            * (s_tr / CAST(n_complete AS DOUBLE))))
        |  END AS f_trend,
        |  CASE WHEN q_sr / CAST(n_complete AS DOUBLE)
        |      - (s_sr / CAST(n_complete AS DOUBLE))
        |        * (s_sr / CAST(n_complete AS DOUBLE)) > 0.0
        |    THEN GREATEST(0.0, 1.0
        |      - (q_r / CAST(n_complete AS DOUBLE)
        |          - (s_r / CAST(n_complete AS DOUBLE))
        |            * (s_r / CAST(n_complete AS DOUBLE)))
        |        / (q_sr / CAST(n_complete AS DOUBLE)
        |          - (s_sr / CAST(n_complete AS DOUBLE))
        |            * (s_sr / CAST(n_complete AS DOUBLE))))
        |  END AS f_seasonal
        |FROM a ORDER BY key""".stripMargin,
    "c_seasonal_decompose" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |w AS (SELECT CAST(UNNEST(generate_series(
        |    (SELECT MIN(week_start) FROM f), (SELECT MAX(week_start) FROM f),
        |    INTERVAL 7 DAY)) AS DATE) AS week_start),
        |k AS (SELECT DISTINCT key FROM f),
        |d AS (SELECT k.key, w.week_start, COALESCE(f.freq, 0) AS freq
        |  FROM k CROSS JOIN w
        |  LEFT JOIN f ON f.key = k.key AND f.week_start = w.week_start),
        |b AS (SELECT key, week_start, freq,
        |    (ROW_NUMBER() OVER (PARTITION BY key ORDER BY week_start) - 1) % 5
        |      AS season,
        |    COUNT(*) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS cnt,
        |    CAST(SUM(freq) OVER (PARTITION BY key ORDER BY week_start
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS tsum
        |  FROM d),
        |tt AS (SELECT *,
        |    CASE WHEN cnt = 5 THEN CAST(tsum AS DOUBLE) / 5 END AS trend,
        |    CASE WHEN cnt = 5 THEN freq * 5 - tsum END AS det_num FROM b),
        |sr AS (SELECT key, season, CAST(SUM(det_num) AS BIGINT) AS s_num,
        |    COUNT(*) AS s_cnt
        |  FROM tt WHERE det_num IS NOT NULL GROUP BY 1, 2),
        |sr2 AS (SELECT key, season,
        |    CAST(s_num AS DOUBLE) / CAST(s_cnt * 5 AS DOUBLE) AS s_raw
        |  FROM sr),
        |cen AS (SELECT key,
        |    list_reduce(list(s_raw ORDER BY season), (a, b) -> a + b)
        |      / COUNT(*) AS c
        |  FROM sr2 GROUP BY 1),
        |sea AS (SELECT sr2.key, sr2.season, s_raw - c AS seasonal
        |  FROM sr2 JOIN cen ON sr2.key = cen.key)
        |SELECT tt.key, tt.week_start, CAST(tt.freq AS BIGINT) AS value,
        |  tt.trend, sea.seasonal,
        |  CASE WHEN tt.trend IS NOT NULL AND sea.seasonal IS NOT NULL
        |    THEN CAST(tt.freq AS DOUBLE) - tt.trend - sea.seasonal
        |  END AS remainder
        |FROM tt LEFT JOIN sea ON sea.key = tt.key AND sea.season = tt.season
        |ORDER BY 1, 2""".stripMargin,
    "a5_dense_weekly" ->
      """WITH f AS (SELECT event_type AS key,
        |    CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INTEGER) AS week_start,
        |    COUNT(*) AS freq FROM events GROUP BY 1, 2),
        |w AS (SELECT CAST(UNNEST(generate_series(
        |    (SELECT MIN(week_start) FROM f), (SELECT MAX(week_start) FROM f),
        |    INTERVAL 7 DAY)) AS DATE) AS week_start),
        |k AS (SELECT DISTINCT key FROM f)
        |SELECT k.key, w.week_start, COALESCE(f.freq, 0) AS freq
        |FROM k CROSS JOIN w
        |LEFT JOIN f ON f.key = k.key AND f.week_start = w.week_start
        |ORDER BY 1, 2""".stripMargin,
    "a11_combo_frequencies" ->
      """WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS combo
        |  FROM events GROUP BY 1, 2)
        |SELECT combo, COUNT(*) AS n FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "o1_natural_sort_sources" ->
      """SELECT source, CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) AS src_num,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY src_num""".stripMargin,
    "c14_percent_formatting" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)
        |SELECT lang, n,
        |  printf('%.4f%%', 100 * CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)) AS pct
        |FROM c ORDER BY lang""".stripMargin,
    "c15_title_case" ->
      """SELECT n_name,
        |  upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS title
        |FROM nation ORDER BY n_name""".stripMargin,
    "a15_stage_counts" ->
      """SELECT 'customer' AS stage, COUNT(*) AS n FROM customer
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |ORDER BY stage""".stripMargin,
    "a17_avg_value_by_type" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY avg_value DESC, event_type""".stripMargin,
    "a2_exact_dedup_docs" ->
      """WITH g AS (SELECT text, COUNT(*) AS cluster_size, MIN(doc_id) AS first_doc
        |  FROM documents GROUP BY 1)
        |SELECT 'Uniq' || CAST(ROW_NUMBER() OVER (
        |    ORDER BY cluster_size DESC, first_doc) AS VARCHAR) AS cluster_id,
        |  cluster_size, first_doc
        |FROM g ORDER BY cluster_size DESC, first_doc""".stripMargin,
    "a9_pivot_by_flag" ->
      """SELECT l_linenumber,
        |  SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END) AS qty_A,
        |  SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END) AS qty_N,
        |  SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS qty_R,
        |  SUM(l_quantity) AS qty_total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a10_explode_positions" ->
      """SELECT pos, COUNT(*) AS n FROM (
        |  SELECT UNNEST(generate_series(1, l_linenumber)) AS pos FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
