package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale properties the operators are
  * designed around (broadcasts stay broadcasts, filters reach the scan,
  * top-k is TakeOrdered, no nested-loop/cartesian joins sneak in) are
  * asserted on `.explain` output so a plan regression fails CI, not a
  * 100 TB run.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("plan-spec")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts all three dimensions — no sort-merge join") {
    val p = plan(queries.Relational.j3BroadcastStarJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$p")
  }

  test("global top-k plans as TakeOrdered, not a full sort") {
    val p = plan(queries.Relational.o4TopkParts(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"top-k missing TakeOrdered:\n$p")
  }

  test("predicate stack pushes filters into the parquet scan") {
    val p = queries.Relational.f5PredicateStack(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") &&
      p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").nonEmpty,
      s"no filters pushed to scan:\n$p")
  }

  test("column pruning reaches the scan (2-column projection reads 2 columns)") {
    val df = Tables(spark, sf, "lineitem").select("l_partkey", "l_quantity")
    val p = plan(df)
    val readSchema = p.replaceAll("(?s).*ReadSchema: ([^\\n]*).*", "$1")
    assert(readSchema.contains("l_partkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads pruned columns: $readSchema")
  }

  test("dense weekly frame broadcasts the key set — no shuffle on the big side") {
    val p = plan(queries.Relational.a5DenseWeekly(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"dense cross/left joins should broadcast the tiny sides:\n$p")
  }

  test("ANN brute force broadcasts the query side") {
    val p = plan(queries.TextLLM.sAnnBruteTop5(spark, sf))
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"ANN degraded to SMJ:\n$p")
  }

  test("near-dup pipelines never contain a cartesian product") {
    for (q <- Seq(
        queries.TextLLM.dMinhashNearDups(spark, sf),
        queries.TextLLM.dSimhashNearDups(spark, sf),
        queries.TextLLM.sAnnLshTop3(spark, sf))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    }
  }

  test("whole-stage codegen covers the scan→filter→aggregate spine") {
    val df = queries.Relational.a1SumByFlagStatus(spark, sf)
    df.collect() // AQE finalizes the plan (and codegen spans) on execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the `*(stageId)` prefix
    assert(p.contains("*(1) HashAggregate"), s"hot path fell out of codegen:\n$p")
  }
}
