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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h4_order_priority" -> (q4OrderPriority _),
    "h19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "h3_shipping_priority" -> (q3ShippingPriority _),
    "h5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "h6_forecast_revenue" -> (q6ForecastRevenue _),
    "h10_returned_items" -> (q10ReturnedItems _),
    "h14_promotion_effect" -> (q14PromotionEffect _),
    "h18_large_volume_customer" -> (q18LargeVolumeCustomer _))

  val oracle: Map[String, String] = Map(
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
