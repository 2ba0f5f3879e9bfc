package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The classic TPC-H join/aggregate suite, adapted to the driver's trimmed
  * schemas (no partsupp; lineitem lacks commit/receipt dates and ship
  * mode/instruct; customer lacks address/phone/comment). Q1 already lives
  * in [[Extras.aTpchQ1]]; this file adds the multi-join members — the
  * recognized stress tests of join ORDER, broadcast selection, and
  * partial aggregation that a 100-TB relational engine lives or dies on.
  *
  * Money math follows the a_tpch_q1 contract: DECIMAL(18,2) end to end,
  * exact per-row products, exact sums, ONE final double cast per output
  * column — bit-for-bit hashable against DuckDB. Revenue is always
  * `sum(price * (1 - disc))` in that exact tree.
  *
  * Scale notes per query are inline; the common spine: dimension sides
  * (region/nation, filtered customer at low SF selectivity) broadcast;
  * the lineitem scan keeps its date/flag filters at the source
  * (PushedFilters); aggregates are partial-before-shuffle hash
  * aggregates on the group keys.
  */
object Tpch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")
  /** Exact revenue term: price * (1 - discount), decimal all the way. */
  private def revenueTerm = dec("l_extendedprice") * (one - dec("l_discount"))

  /** Q3 shipping-priority (adapted: no o_shippriority column — the
    * surviving shape is segment-filter ⋈ orders ⋈ lineitem with the
    * classic anti-correlated date pair). Customer is filtered to ONE
    * market segment, so it broadcasts even at full scale (1/5 of
    * customers ≪ lineitem); lineitem keeps `l_shipdate > date` at the
    * scan. Top-10 by revenue via the exact decimal sum. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1997-06-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-06-15").cast("timestamp"))
      .select(col("l_orderkey"), revenueTerm.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("l_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5 local-supplier volume — the full 6-table star-with-a-twist: the
    * join to supplier carries the EXTRA equality `c_nationkey =
    * s_nationkey` (local supplier), which is what distinguishes Q5 from
    * a plain snowflake. region→nation (tiny) broadcast into both the
    * customer and supplier sides; the big fact join is lineitem ⋈ orders
    * on orderkey. One year of orders. */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t(s, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), revenueTerm.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q6 forecasting-revenue-change — pure scan-side arithmetic: every
    * predicate (date year band, discount band, quantity cap) pushes to
    * the parquet scan; zero joins, zero shuffles beyond the final
    * single-row reduce. The canonical "is your filter pushdown real"
    * probe. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double").as("revenue"))
  }

  /** Q10 returned-item reporting (adapted: no address/phone/comment) —
    * the classic "who returned stuff last quarter" join: one quarter of
    * orders ⋈ RETURNED lineitem rows, grouped per customer with the
    * nation name. Top-20 by lost revenue. The group-by key set includes
    * the functionally-dependent customer attributes, exactly as the spec
    * writes it — Spark's partial aggregation handles the wide key. */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenueTerm.as("rev"))
    val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14 promotion effect — conditional aggregation over one join: the
    * PROMO share of a month's revenue. part⋈lineitem with part
    * broadcast-able only at toy SF, so it is left to the planner (AQE
    * decides from runtime stats); the month filter pushes to the scan.
    * 100 * promo_rev / total_rev with the division as the single float
    * op at the end. */
  def q14PromotionEffect(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), revenueTerm.as("rev"))
    val part = t(s, dir, "part").select("p_partkey", "p_type")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("promo_rev"),
        sum(col("rev")).as("total_rev"))
      .select((lit(100.0) * col("promo_rev").cast("double") /
        col("total_rev").cast("double")).as("promo_revenue_pct"))
  }

  /** Q18 large-volume customer — the aggregate-then-join pattern: the
    * HAVING-filtered per-order quantity sum is computed FIRST (partial
    * agg on l_orderkey, the fact table's own key, so map-side combine
    * collapses each order's lines before the shuffle), and only the
    * surviving handful of orderkeys join back to orders/customer. The
    * anti-pattern (join first, filter later) would shuffle the whole
    * fact join — this shape is the scale-correct one. */
  def q18LargeVolumeCustomer(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > lit(212).cast("decimal(18,2)"))
    val ord = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = t(s, dir, "customer").select("c_custkey", "c_name")
    bigOrders
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  /** Q4 order-priority checking (adapted: no commit/receipt dates — the
    * EXISTS probes for a LATE shipment, l_shipdate more than 30 days
    * after o_orderdate). The point of Q4 is the EXISTS → left-semi plan:
    * lineitem is only ever probed, never widened into the output, and
    * the extra non-equi conjunct rides the semi join's condition. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q19 discounted-revenue (adapted to the available part attributes) —
    * the disjunctive-predicate join: ONE equi-join on partkey with an
    * OR-of-ANDs residual over both sides' columns. The planner test is
    * that the equality conjunct is extracted into a hash join and the
    * disjunction stays a post-join filter — a naive planner degrades
    * this to a nested-loop over the full cross space. */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), revenueTerm.as("rev"))
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 35)))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  /** Q7 volume shipping (adapted) — the two-sided nation-pair
    * disjunction: revenue flowing between NATION_3 and NATION_7 in
    * either direction, by supplier nation / customer nation / ship
    * year. Both nation dimensions broadcast; the disjunctive pair
    * predicate evaluates after both are attached. */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revenueTerm.as("rev"))
    li.join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 national market share (adapted): NATION_5's share of ASIA's
    * STANDARD-part import revenue per order year. Share = decimal-exact
    * conditional sum over decimal-exact total, ONE double division per
    * output row. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNationKeys = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revenueTerm.as("rev"))
    li.join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "STANDARD").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      // r15 optimization (guide §2.3): the ASIA nation filter used to run
      // AFTER the o_custkey shuffle join — pre-filtering customer with the
      // broadcast nation-key dim first (inner joins commute) shrinks the
      // customer side of that exchange to the ASIA fraction.
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(asiaNationKeys), col("c_nationkey") === col("c_nk"))
          .select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy("o_year")
      .agg((sum(when(col("supp_nation") === "NATION_5", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
        sum(col("rev")).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q13 customer order-count distribution (adapted filter:
    * non-URGENT orders) — the left-outer + double-aggregate skew
    * classic: every customer survives (zero-order customers count 0),
    * then the counts themselves are histogrammed. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    t(s, dir, "customer").select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15 top supplier — the scalar-subquery-max pattern: quarterly
    * revenue per supplier, keep the supplier(s) AT the maximum. The
    * comparison runs on the EXACT decimal sums (never the double
    * projection), and the max arrives as a broadcast one-row join, not
    * a partition-less window. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(revenueTerm).as("rev_dec"))
    val maxRev = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.join(broadcast(maxRev), col("rev_dec") === col("max_rev"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q17 small-quantity-order revenue (adapted to p_brand only) — the
    * correlated-average pattern: lineitems whose quantity is below 20%
    * of their part's average. The threshold comparison is rewritten
    * multiplication-through so it stays EXACT decimal arithmetic in
    * both engines: `qty < 0.2 * (sum/cnt)` ⟺ `5 * qty * cnt < sum`
    * (all positive) — no float division inside a predicate, which is
    * where cross-engine last-ulp drift would flip boundary rows. */
  def q17SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), dec("l_quantity").as("qty"),
        dec("l_extendedprice").as("price"))
    val brandParts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#5").select("p_partkey")
    val perPart = li.join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(col("l_partkey").as("agg_partkey"), col("sum_qty"), col("cnt"))
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(lit(5).cast("decimal(18,2)") * col("qty") * col("cnt") <
        col("sum_qty"))
      .agg((sum(col("price")).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  /** Q22 global sales opportunity (adapted: nation stands in for the
    * phone prefix) — anti join + scalar-average pattern: rich customers
    * (balance above the positive-balance average) with no orders since
    * 2000, counted per nation. The "above average" comparison is again
    * multiplication-through exact decimal: `bal * cnt > sum`. */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        dec("c_acctbal").as("bal"))
    val avgSide = cust.filter(col("bal") > lit(0).cast("decimal(18,2)"))
      .agg(sum(col("bal")).as("sum_bal"), count(lit(1)).as("cnt_bal"))
    val rich = cust.join(broadcast(avgSide),
      col("bal") * col("cnt_bal") > col("sum_bal"))
    val noOrders = rich.join(
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_anti")
    noOrders
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy("n_name")
  }

  /** Q21-SHAPE waiting supplier (adapted: no commit/receipt dates — the
    * "late" predicate becomes `l_discount > l_tax`, pure available-column
    * logic). The point is the DOUBLE-CORRELATED quantifier pair on the
    * SAME fact table, the one join pattern the registry did not yet
    * exercise: for each late lineitem l1, EXISTS another supplier's
    * lineitem in the same order (left-SEMI on orderkey with a suppkey
    * INEQUALITY residual) AND NOT EXISTS another supplier's LATE lineitem
    * in the same order (left-ANTI, same condition plus the late filter).
    *
    * Plan shape (TpchSpec-pinned): both quantifiers compile to shuffled
    * hash semi/anti joins on l_orderkey carrying `l_suppkey <>` as the
    * join residual — never a cartesian. The probe side is cut FIRST by
    * the broadcast nation-filtered supplier dim and the status semi join,
    * so the expensive pair probes only the surviving sliver. (A
    * per-order aggregate — distinct-supplier count ≥ 2 ∧ distinct-LATE-
    * supplier count = 1 — could replace both quantifiers with one
    * shuffle; the semi+anti form is kept deliberately as the canonical
    * relational shape, and because the aggregate variant loses the
    * short-circuit when the order blows past two suppliers early.) */
  def q21ShapeWaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_discount", "l_tax")
    val late = li.filter(col("l_discount") > col("l_tax"))
      .select("l_orderkey", "l_suppkey")
    val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val l3 = late.select(col("l_orderkey").as("l3_orderkey"),
      col("l_suppkey").as("l3_suppkey"))
    val fOrders = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val suppNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    late
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(l2, col("l_orderkey") === col("l2_orderkey") &&
        col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_orderkey") &&
        col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q16-SHAPE parts/supplier relationship count (adapted: no partsupp —
    * lineitem IS the part↔supplier association; no s_comment — negative
    * account balance stands in for the complaint filter). The pattern
    * under test: NOT IN (subquery) over a non-nullable key — compiled as
    * a left-ANTI join, which is only equivalent to NOT IN because
    * s_suppkey is non-nullable (a NULL in the subquery would make NOT IN
    * return no rows; the anti join would not) — feeding a
    * COUNT(DISTINCT) aggregate over a composite group.
    *
    * Scale: both the complaint list (handful of suppliers) and the
    * triple-filtered part dim broadcast; lineitem is probed narrow
    * (2 columns) and the only shuffle is the distinct-count aggregate on
    * (p_brand, p_size) — Spark expands count_distinct into a two-level
    * aggregate with map-side partials, so the key universe never
    * converges on one node. */
  def q16ShapeSupplierCount(s: SparkSession, dir: String): DataFrame = {
    val complaints = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" &&
        !col("p_type").startsWith("PROMO") &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_size")
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Q2-SHAPE minimum-cost supplier (adapted: no partsupp — the
    * part↔supplier catalog is DERIVED from lineitem, with
    * MIN(l_extendedprice) per (part, supplier) standing in for
    * ps_supplycost). The pattern under test is TPC-H's only CORRELATED
    * SCALAR subquery inside a join predicate: keep a catalog row only
    * if its cost equals (SELECT MIN(cost) over the same REGION's
    * suppliers for THIS part).
    *
    * Spark-first decorrelation: the scalar subquery becomes a per-part
    * MIN over the region-restricted catalog, equi-joined back on
    * (partkey, cost) — the groupBy-join-back Catalyst itself produces
    * when it decorrelates a scalar aggregate. The cost is exact
    * DECIMAL(18,2), so the equality join is bit-safe (never join on a
    * computed float).
    *
    * Scale: the only lineitem-sized shuffle is the catalog aggregate on
    * (partkey, suppkey) — map-side partials collapse it to |catalog|
    * before the exchange. The region supplier dim broadcasts; the
    * per-part minima relation is |parts|-sized and joins on partkey
    * (AQE is free to broadcast it at low SF). */
  def q2ShapeMinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val regionSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val sized = t(s, dir, "part")
      .filter(col("p_size") === 23).select("p_partkey")
    // r15 optimization (guide §2.3/§3.2): both final filters COMMUTE
    // with the catalog aggregate, so they now prune its input before
    // the (partkey, suppkey) exchange instead of after it:
    //   - p_size = 23 filters on l_partkey, a group key — per-part
    //     minima over region suppliers are computed from exactly the
    //     same rows for every surviving part, and non-sized parts were
    //     dropped by the final broadcast(sized) join anyway;
    //   - the EUROPE supplier restriction filters on l_suppkey, a group
    //     key, and `regional` applied it to EVERY catalog row before
    //     minc, so filtering earlier keeps minc's per-part input
    //     identical (s_suppkey is unique in supplier — a semi-filter,
    //     not a fan-out).
    // Plan diff: the full-lineitem aggregate exchange becomes a
    // doubly-pruned one (~|sized|/|parts| × EUROPE fraction of rows).
    val catalog = t(s, dir, "lineitem")
      .join(broadcast(sized.select(col("p_partkey").as("sp_partkey"))),
        col("l_partkey") === col("sp_partkey"), "left_semi")
      .join(broadcast(regionSupp.select(col("s_suppkey").as("rs_suppkey"))),
        col("l_suppkey") === col("rs_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec("l_extendedprice")).as("supplycost"))
    val regional = catalog
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
    val minc = regional.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("supplycost")).as("min_cost"))
    regional
      .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
      .join(minc, col("l_partkey") === col("m_partkey") &&
        col("supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"),
        col("supplycost").cast("double").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q11-SHAPE important stock (adapted: no partsupp — per-part "stock
    * value" is SUM(extendedprice × quantity) over ONE nation's
    * suppliers' lineitems). The pattern under test: HAVING against an
    * UNCORRELATED scalar subquery — a group survives only if its value
    * exceeds a fixed fraction of the whole filtered table's total.
    * TPC-H's only global-threshold aggregate; not expressible as a
    * window without materializing every group twice.
    *
    * Value is EXACT INTEGER money: cents = round(price×100) as BIGINT,
    * times the integral quantity — so the threshold comparison
    * `value × 10000 > total` is exact 64-bit arithmetic in both
    * engines (no decimal-width or float-division divergence; round()
    * is half-away-from-zero on positives in both).
    *
    * Scale: one shuffle (the per-part aggregate, map-side partials);
    * the scalar total is a 1-row aggregate broadcast into a
    * nested-loop filter join — the canonical way to compare every
    * group against a global without collecting either side. */
  def q11ShapeImportantStock(s: SparkSession, dir: String): DataFrame = {
    val natSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val flat = t(s, dir, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          col("l_quantity").cast("long")).as("v"))
    val perPart = flat.groupBy("l_partkey")
      .agg(sum(col("v")).as("stock_value"))
    val total = flat.agg(sum(col("v")).as("grand_total"))
    perPart.join(broadcast(total),
        col("stock_value") * lit(10000L) > col("grand_total"))
      .select(col("l_partkey"), col("stock_value"))
      .orderBy(col("stock_value").desc, col("l_partkey"))
  }

  /** Q20-SHAPE concentrated recent supplier (adapted: no partsupp /
    * availqty — the outer attribute is the pair's quantity shipped in
    * 1997, and the correlated aggregate is the pair's ALL-TIME shipped
    * quantity; "availqty > ½ recent shipments" becomes "1997 shipments
    * are more than ½ of all-time shipments"). The pattern under test is
    * Q20's TRIPLE NESTING: a semi join (s_suppkey IN …) whose subquery
    * itself compares an aggregate against a CORRELATED aggregate over a
    * second lineitem scan — aggregate-vs-correlated-aggregate, the one
    * subquery composition Q2/Q11/Q16/Q21 shapes don't cover.
    *
    * The fraction is chosen time-relative, not corpus-relative, so the
    * query stays non-degenerate at EVERY scale factor (a dominance
    * share like Q20's original availqty ratio thins to zero as rows per
    * pair grow; a temporal share does not). Quantities are integral
    * doubles — sums and the ×2 comparison are exact.
    *
    * Scale: two pair-grained aggregates over lineitem (both collapse
    * map-side), equi-joined on the pair key — the decorrelated form of
    * the inner scalar. The recent side carries its date filter and the
    * broadcast part-name dim to the scan; suppliers see only a
    * broadcast-sized distinct-suppkey semi side. */
  def q20ShapeConcentratedSupplier(s: SparkSession, dir: String): DataFrame = {
    val smallParts = t(s, dir, "part")
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val li = t(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val recent = li
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).as("recent_qty"))
    // r15 optimization (guide §2.3/§3.2): the all-time aggregate used to
    // scan FULL lineitem, but it inner-joins `recent` on the pair key and
    // every recent pair already has l_partkey ∈ smallParts — so the same
    // broadcast semi-filter prunes the all-time side's input (and its
    // pair-key exchange) to the small-part fraction without dropping any
    // matching pair or changing a surviving pair's SUM (the filter is on
    // a group key). Plan diff: both pair aggregates now sit above the
    // broadcast prune; the all-time exchange shrinks ~|small|/|parts|.
    val allTime = li
      .join(broadcast(smallParts.select(col("p_partkey").as("ap_partkey"))),
        col("l_partkey") === col("ap_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("a_partkey"),
        col("l_suppkey").as("a_suppkey"))
      .agg(sum(col("l_quantity")).as("all_qty"))
    val concentrated = recent
      .join(allTime, col("l_partkey") === col("a_partkey") &&
        col("l_suppkey") === col("a_suppkey"))
      .filter(col("recent_qty") * 2 > col("all_qty"))
      .select("l_suppkey")
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_8", "NATION_15"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(concentrated, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  /** Q9-SHAPE product-type profit (adapted: no partsupp — supply cost
    * per (part, supplier) is the same lineitem-derived MIN-price catalog
    * as Q2-shape; the part filter matches a name substring like the
    * original's '%green%'). The pattern under test: TPC-H's widest join
    * tree (fact ⋈ derived catalog ⋈ part ⋈ supplier ⋈ nation ⋈ orders)
    * feeding a SIGNED aggregate — profit = revenue − cost×qty goes
    * negative, so the query proves exact decimal SUBTRACTION and the
    * signed-sum path that Q1-style all-positive aggregates never touch.
    *
    * Scale: part/supplier/nation broadcast; the catalog joins the fact
    * on (partkey, suppkey) AFTER the broadcast part filter prunes both
    * sides; orders arrives last on the orderkey shuffle. Profit terms
    * stay DECIMAL through the sum, one double cast at the end. */
  def q9ShapeProductProfit(s: SparkSession, dir: String): DataFrame = {
    val rodParts = t(s, dir, "part")
      .filter(col("p_name").contains("rod")).select("p_partkey")
    // r15 optimization (guide §2.3/§3.2): the catalog aggregate used to
    // scan FULL lineitem — but every catalog row whose partkey fails the
    // rod filter is dropped by the downstream inner join anyway, and
    // l_partkey is a GROUP KEY, so a broadcast semi-filter before the
    // groupBy prunes the aggregate's input (and its (partkey, suppkey)
    // exchange) to the rod fraction without changing any surviving
    // group's MIN. Plan diff: the catalog-side scan now carries the
    // broadcast prune; the aggregate exchange shrinks ~|rod|/|parts|.
    val catalog = t(s, dir, "lineitem")
      .join(broadcast(rodParts.select(col("p_partkey").as("cp_partkey"))),
        col("l_partkey") === col("cp_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("c_partkey"),
        col("l_suppkey").as("c_suppkey"))
      .agg(min(dec("l_extendedprice")).as("supplycost"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revenueTerm.as("rev"), dec("l_quantity").as("qty"))
    li.join(broadcast(rodParts), col("l_partkey") === col("p_partkey"))
      .join(catalog, col("l_partkey") === col("c_partkey") &&
        col("l_suppkey") === col("c_suppkey"))
      .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name", "o_year")
      .agg(sum(col("rev") - col("supplycost") * col("qty"))
        .cast("double").as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** Q12-SHAPE shipping modes (adapted: no l_shipmode/receiptdate —
    * l_returnflag stands in for the mode and l_shipdate for the receipt
    * year). The pattern: a fact⋈orders join feeding a TWO-ARM
    * conditional count — the same CASE expression summed twice with
    * complementary predicates, which must compile into ONE aggregate
    * pass (two sum buffers), not two scans. */
  def q12ShapeShippingModes(s: SparkSession, dir: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    li.join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h9_shape_product_profit" -> (q9ShapeProductProfit _),
    "h12_shape_shipping_modes" -> (q12ShapeShippingModes _),
    "h2_shape_min_cost_supplier" -> (q2ShapeMinCostSupplier _),
    "h11_shape_important_stock" -> (q11ShapeImportantStock _),
    "h20_shape_concentrated_supplier" -> (q20ShapeConcentratedSupplier _),
    "h21_shape_waiting_supplier" -> (q21ShapeWaitingSupplier _),
    "h16_shape_supplier_count" -> (q16ShapeSupplierCount _),
    "h7_volume_shipping" -> (q7VolumeShipping _),
    "h8_market_share" -> (q8MarketShare _),
    "h13_customer_distribution" -> (q13CustomerDistribution _),
    "h15_top_supplier" -> (q15TopSupplier _),
    "h17_small_quantity_revenue" -> (q17SmallQuantityRevenue _),
    "h22_global_sales" -> (q22GlobalSales _),
    "h4_order_priority" -> (q4OrderPriority _),
    "h19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "h3_shipping_priority" -> (q3ShippingPriority _),
    "h5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "h6_forecast_revenue" -> (q6ForecastRevenue _),
    "h10_returned_items" -> (q10ReturnedItems _),
    "h14_promotion_effect" -> (q14PromotionEffect _),
    "h18_large_volume_customer" -> (q18LargeVolumeCustomer _))

  val oracle: Map[String, String] = Map(
    "h9_shape_product_profit" ->
      """WITH catalog AS (
        |  SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      - supplycost * CAST(l_quantity AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN catalog ON l_partkey = c_partkey AND l_suppkey = c_suppkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%rod%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "h12_shape_shipping_modes" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "h2_shape_min_cost_supplier" ->
      """WITH catalog AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey,
        |  CAST(supplycost AS DOUBLE) AS supplycost
        |FROM catalog c
        |JOIN supplier ON c.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON c.l_partkey = p_partkey
        |WHERE r_name = 'EUROPE' AND p_size = 23
        |  AND supplycost = (
        |    SELECT MIN(c2.supplycost)
        |    FROM catalog c2
        |    JOIN supplier s2 ON c2.l_suppkey = s2.s_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE r2.r_name = 'EUROPE' AND c2.l_partkey = c.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "h11_shape_important_stock" ->
      """WITH flat AS (
        |  SELECT l_partkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3')
        |SELECT l_partkey, CAST(SUM(v) AS BIGINT) AS stock_value
        |FROM flat GROUP BY l_partkey
        |HAVING SUM(v) * 10000 > (SELECT SUM(v) FROM flat)
        |ORDER BY stock_value DESC, l_partkey""".stripMargin,
    "h20_shape_concentrated_supplier" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_15')
        |  AND s_suppkey IN (
        |    SELECT pq.l_suppkey FROM (
        |      SELECT l_partkey, l_suppkey,
        |        SUM(l_quantity) AS recent_qty
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE p_name LIKE 'small%'
        |        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |      GROUP BY 1, 2) pq
        |    WHERE pq.recent_qty * 2 > (
        |      SELECT SUM(l2.l_quantity) FROM lineitem l2
        |      WHERE l2.l_partkey = pq.l_partkey
        |        AND l2.l_suppkey = pq.l_suppkey))
        |ORDER BY s_name""".stripMargin,
    "h21_shape_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_discount > l1.l_tax
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_discount > l3.l_tax)
        |  AND n_name = 'NATION_3'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "h16_shape_supplier_count" ->
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "h7_volume_shipping" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_7')
        |    OR (n2.n_name = 'NATION_7' AND n1.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "h8_market_share" ->
      """WITH flat AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS rev,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE) AS mkt_share
        |FROM flat GROUP BY o_year ORDER BY o_year""".stripMargin,
    "h13_customer_distribution" ->
      """WITH counts AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o.o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM counts GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "h15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "h17_small_quantity_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')),
        |agg AS (
        |  SELECT l_partkey AS agg_partkey, SUM(qty) AS sum_qty,
        |    COUNT(*) AS cnt
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(SUM(price) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM li JOIN agg ON l_partkey = agg_partkey
        |WHERE 5 * qty * cnt < sum_qty""".stripMargin,
    "h22_global_sales" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |avgside AS (
        |  SELECT SUM(bal) AS sum_bal, COUNT(*) AS cnt_bal
        |  FROM cust WHERE bal > CAST(0 AS DECIMAL(18,2)))
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM cust CROSS JOIN avgside
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal * cnt_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "h4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "h19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "h3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "h5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "h6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "h10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "h14_promotion_effect" ->
      """WITH j AS (SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00')
        |SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM(rev) AS DOUBLE) AS promo_revenue_pct
        |FROM j""".stripMargin,
    "h18_large_volume_customer" ->
      """WITH big AS (SELECT l_orderkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    > CAST(212 AS DECIMAL(18,2)))
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin)
}
