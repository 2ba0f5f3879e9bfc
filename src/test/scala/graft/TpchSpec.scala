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
