package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The adapted TPC-H family ([[queries.Tpch]]): result-shape checks plus
  * the plan properties each query exists to exercise — Q3/Q5 broadcast
  * their dimension sides, Q6 pushes every predicate to the scan and joins
  * nothing, Q18 aggregates the fact table BEFORE any join. Values are
  * oracle-checked by the driver (h3/h5/h6/h10/h14/h18 in oracle_sql.json);
  * these tests pin the physical shapes that matter at 100 TB.
  */
class TpchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("tpch-spec")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q3: segment-filtered customer broadcasts; top-10 is deterministic") {
    val df = queries.Tpch.q3ShippingPriority(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"customer side not broadcast:\n$p")
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-_)), "not revenue-descending")
  }

  test("Q5: six-table join resolves without a cartesian; 5 Asian nations out") {
    val df = queries.Tpch.q5LocalSupplierVolume(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in Q5:\n$p")
    // the local-supplier twist (c_nationkey = s_nationkey) must be an
    // equi-join condition, not a post-join filter over a wider join
    assert(p.contains("BroadcastHashJoin"), s"dimension sides not broadcast:\n$p")
    val rows = df.collect()
    assert(rows.length <= 5 && rows.nonEmpty)
  }

  test("Q6: zero joins, all four predicates pushed to the parquet scan") {
    val df = queries.Tpch.q6ForecastRevenue(spark, sf)
    val p = plan(df)
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
    val pushed = p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"predicates not pushed: $pushed")
    assert(df.collect().length == 1)
  }

  test("Q10: one-quarter revenue report, descending, nation attached") {
    val rows = queries.Tpch.q10ReturnedItems(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("Q14: promo share is a percentage in (0, 100)") {
    val v = queries.Tpch.q14PromotionEffect(spark, sf)
      .collect()(0).getDouble(0)
    assert(v > 0.0 && v < 100.0, s"promo pct out of range: $v")
  }

  test("Q7: nation-pair disjunction yields both directions, years as int") {
    val rows = queries.Tpch.q7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
  }

  test("Q8: market share is a fraction in [0, 1] per year") {
    val rows = queries.Tpch.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r => val v = r.getDouble(1); v >= 0.0 && v <= 1.0 })
  }

  test("Q13: left outer keeps zero-order customers; distribution sums to |customer|") {
    val df = queries.Tpch.q13CustomerDistribution(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("custdist"))
      .collect()(0).getLong(0)
    val nCust = Tables(spark, sf, "customer").count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("Q15: max-revenue suppliers found via broadcast one-row join, no window") {
    val df = queries.Tpch.q15TopSupplier(spark, sf)
    val p = plan(df)
    assert(!p.contains("Window"), s"Q15 must not use a window:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
  }

  test("Q17: threshold math stays decimal — no double division in the predicate") {
    val df = queries.Tpch.q17SmallQuantityRevenue(spark, sf)
    // analyzed plan must not divide inside the filter (the predicate is
    // the multiplied-through decimal comparison)
    val analyzed = df.queryExecution.analyzed.toString
    val filterLines = analyzed.linesIterator.filter(_.contains("Filter")).mkString
    assert(!filterLines.contains("/"), s"division leaked into the filter: $filterLines")
    assert(df.collect().length == 1)
  }

  test("Q22: anti join selects a nonempty rich-and-dormant cohort") {
    val rows = queries.Tpch.q22GlobalSales(spark, sf).collect()
    assert(rows.nonEmpty, "fixture cutoff selects nobody — weak test")
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("Q21-shape: double-correlated quantifiers compile to semi + anti, no cartesian") {
    val df = queries.Tpch.q21ShapeWaitingSupplier(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quantifier degraded to a loop join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val waits = rows.map(_.getLong(1))
    assert(waits.sameElements(waits.sortBy(-_)), "not numwait-descending")
  }

  test("Q16-shape: NOT IN is an anti join; both dims broadcast; distinct-count partials") {
    val df = queries.Tpch.q16ShapeSupplierCount(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q16-shape:\n$p")
    // count_distinct must expand to the two-level aggregate (partials
    // before the shuffle): more than one HashAggregate in the plan
    assert(p.split("HashAggregate").length > 2,
      s"distinct count did not expand to partial aggregates:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("Q2-shape: correlated MIN decorrelates to agg + equi-join-back, dims broadcast") {
    val df = queries.Tpch.q2ShapeMinCostSupplier(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"supplier/part dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"min-cost equality degraded to a loop join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // every surviving row IS a per-part minimum: no part may appear with
    // two different costs
    val byPart = rows.groupBy(_.getLong(3)).values
    assert(byPart.forall(_.map(_.getDouble(4)).distinct.length == 1),
      "a part survived with two distinct costs — correlated MIN broken")
    val bals = rows.map(_.getDouble(0))
    assert(bals.sameElements(bals.sortBy(-(_: Double))), "not acctbal-descending")
  }

  test("Q11-shape: global threshold is a 1-row broadcast join; math is exact BIGINT") {
    val df = queries.Tpch.q11ShapeImportantStock(spark, sf)
    val p = plan(df)
    // the scalar total must arrive via a broadcast nested-loop join over
    // ONE row — never a shuffle or a collect
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"global threshold not a broadcast 1-row join:\n$p")
    assert(df.schema("stock_value").dataType.typeName == "long",
      "stock value must be exact integer cents, not float")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // survivors hold > 1/10000 of the total by construction
    val values = rows.map(_.getLong(1))
    assert(values.sameElements(values.sortBy(-(_: Long))), "not value-descending")
  }

  test("Q20-shape: aggregate-vs-correlated-aggregate ends in a semi join, no cartesian") {
    val df = queries.Tpch.q20ShapeConcentratedSupplier(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"IN-subquery did not become a semi join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q20-shape:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture selects no concentrated supplier — weak test")
    val names = rows.map(_.getString(0))
    assert(names.sameElements(names.sorted), "not name-ascending")
    assert(names.distinct.length == names.length,
      "semi join duplicated a supplier")
  }

  test("Q9-shape: widest join tree resolves broadcast-side, profit is signed decimal") {
    val df = queries.Tpch.q9ShapeProductProfit(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q9-shape:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the derived supply cost dwarfs revenue at qty up to 50 — profits
    // MUST go negative, proving the signed decimal subtraction path
    assert(rows.exists(_.getDouble(2) < 0), "no negative profit — fixture weak")
    // per nation, years are descending as ordered
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val ys = g.map(_.getInt(1))
      assert(ys.sameElements(ys.sortBy(-(_: Int)))) }
  }

  test("Q12-shape: both conditional counts ride ONE aggregate pass") {
    val df = queries.Tpch.q12ShapeShippingModes(spark, sf)
    val p = plan(df)
    // partial + final HashAggregate and nothing more: the two CASE sums
    // must not induce a second scan or a join of two aggregates
    assert(p.split("HashAggregate").length == 3,
      s"expected exactly 2 HashAggregate nodes (partial+final):\n$p")
    assert(!p.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 3)
    assert(rows.forall(r => r.getLong(1) + r.getLong(2) > 0))
  }

  test("Q18: quantity sum aggregates BEFORE the joins (agg below both joins)") {
    val df = queries.Tpch.q18LargeVolumeCustomer(spark, sf)
    val p = plan(df)
    // the partial-aggregate on l_orderkey must appear deeper in the tree
    // than any join operator: filter-by-sum runs on lineitem alone
    val firstJoin = p.indexOf("Join")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstJoin >= 0 && lastAgg > firstJoin,
      s"expected aggregate below the joins:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // every surviving order really does exceed the threshold
    assert(rows.forall(_.getDouble(5) > 212.0))
  }
}
