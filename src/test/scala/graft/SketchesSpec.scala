package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("sketches-spec")
  override def afterAll(): Unit = spark.stop()

  test("small cardinality is EXACT; merged partials equal the whole; layout-proof") {
    import spark.implicits._
    // 3 days × overlapping user sets; true distinct over all days = 60
    val rows = for {
      day <- Seq("d1", "d2", "d3")
      u <- 0 until 50
    } yield (day, (u + (if (day == "d3") 10 else 0)).toLong)
    val df = rows.toDF("day", "user_id")

    val daily = Sketches.distinctSketch(df, Seq(col("day")), col("user_id"))
    val dailyEst = daily.select(col("day"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // coupon mode: exact at this size
    assert(dailyEst == Map("d1" -> 50L, "d2" -> 50L, "d3" -> 50L))

    // merge of per-day sketches == sketch of the union, exactly
    val merged = Sketches.mergeSketches(daily, Seq(lit(1).as("one")), col("sketch"))
      .select(Sketches.estimate(col("sketch"))).collect()(0).getLong(0)
    val whole = Sketches.distinctSketch(df, Seq(lit(1).as("one")), col("user_id"))
      .select(Sketches.estimate(col("sketch"))).collect()(0).getLong(0)
    assert(merged == whole)
    assert(merged == 60L)

    // physical layout cannot change the estimate (register-wise max is
    // order-independent)
    val reparted = Sketches.distinctSketch(df.repartition(17), Seq(col("day")), col("user_id"))
      .select(col("day"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == dailyEst)
  }

  test("large cardinality stays within the lgK=12 error bound") {
    import spark.implicits._
    val n = 200000L
    val df = spark.range(n).select((col("id") % 2).cast("string").as("g"), col("id"))
    val est = Sketches.distinctSketch(df, Seq(col("g")), col("id"))
      .select(col("g"), Sketches.estimate(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((_, e) <- est) {
      val exact = n / 2
      assert(math.abs(e - exact).toDouble / exact < 0.05,
        s"estimate $e vs exact $exact out of bound")
    }
  }
}
