package graft

import graft.operators.AsOf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("asof-spec")
  import scala.util.Random

  override def afterAll(): Unit = spark.stop()

  private def leftDf(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("t", "k", "lid")
  }
  private def rightDf(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("rt", "k", "v")
  }

  test("as-of semantics: latest at-or-before match, ties, misses, strict") {
    val left = leftDf((10L, "a", 1L), (20L, "a", 2L), (5L, "b", 3L), (7L, "c", 4L))
    val right = rightDf((10L, "a", 1.0), (15L, "a", 2.0), (9L, "b", 9.0))
    val out = AsOf.asofJoin(left, right, keys = Seq("k"),
        leftTs = "t", rightTs = "rt", payloads = Seq("rt", "v"))
      .collect().map(r => r.getLong(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((Some(10L), Some(1.0)))) // tie: rt == t matches
    assert(out(2L) == ((Some(15L), Some(2.0)))) // latest of two priors
    assert(out(3L) == ((None, None)))           // right row is later
    assert(out(4L) == ((None, None)))           // key with no right rows
    val strictOut = AsOf.asofJoin(left, right, keys = Seq("k"),
        leftTs = "t", rightTs = "rt", payloads = Seq("rt", "v"), strict = true)
      .collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(strictOut(1L).isEmpty, "strict must exclude the equal-ts row")
    assert(strictOut(2L).contains(2.0))
    val inner = AsOf.asofJoin(left, right, keys = Seq("k"),
      leftTs = "t", rightTs = "rt", payloads = Seq("v"), leftOuter = false)
    assert(inner.count() == 2)
  }

  test("payload struct is whole-row: columns never mix across right rows") {
    import spark.implicits._
    val left = leftDf((20L, "a", 1L))
    // later right row has a NULL v; a per-column carry-forward would pair
    // (tag of row2, v of row1) — the struct must deliver row2 verbatim
    val right = Seq((10L, "a", Some(1.0), "r1"), (15L, "a", None, "r2"))
      .toDF("rt", "k", "v", "tag")
    val out = AsOf.asofJoin(left, right, keys = Seq("k"),
        leftTs = "t", rightTs = "rt", payloads = Seq("v", "tag"))
      .select("v", "tag").collect().head
    assert(out.isNullAt(0) && out.getString(1) == "r2",
      s"expected (null, r2), got $out")
  }

  test("as-of matches the naive theta-join formulation on random data") {
    import spark.implicits._
    val rng = new Random(17)
    val left = (0 until 300).map(i =>
      (rng.nextInt(100).toLong, s"k${rng.nextInt(8)}", i.toLong))
    val right = (0 until 200).map(i =>
      (rng.nextInt(100).toLong, s"k${rng.nextInt(10)}", i.toDouble))
    val l = leftDf(left: _*)
    val r = rightDf(right: _*)
    // naive truth: per left row, max (rt, v) over right rows at/before —
    // max over the (rt, v) struct matches the operator's greatest-payload
    // tie policy because v is unique per (k, rt) draw... it is not, so
    // pre-aggregate ties exactly like production callers should
    val rAgg = r.groupBy("k", "rt").agg(max("v").as("v"))
    val got = AsOf.asofJoin(l, rAgg, keys = Seq("k"),
        leftTs = "t", rightTs = "rt", payloads = Seq("rt", "v"))
      .collect().map(x => x.getLong(2) ->
        (Option(x.get(3)), Option(x.get(4)))).toMap
    val naive = l.join(rAgg, l("k") === rAgg("k") && rAgg("rt") <= l("t"), "left")
      .groupBy(l("k"), col("t"), col("lid"))
      .agg(max(struct(col("rt"), col("v"))).as("m"))
      .select(col("lid"), col("m.rt"), col("m.v"))
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)), Option(x.get(2)))).toMap
    assert(got == naive)
  }

  test("intervalize: contiguous half-open intervals, null-terminated per key") {
    import spark.implicits._
    val rng = new Random(23)
    val changes = (0 until 200).map(i =>
      (rng.nextInt(50).toLong, s"k${rng.nextInt(6)}", i.toLong))
      .toDF("ts", "k", "change_id")
    val out = AsOf.intervalize(changes, Seq("k"), "ts",
        tieBreak = Seq("change_id"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.length == 200, "row count preserved")
    out.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      // each interval ends where the next begins; only the last is open
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._2),
          s"$k: interval after (${a._2},${a._3}) ends at ${a._4}, next starts ${b._2}")
        case _ =>
      }
      assert(sorted.last._4.isEmpty, s"$k: last interval must be open")
    }
  }

  test("the plan contains no join node — one shuffle, one window") {
    val l = leftDf((10L, "a", 1L))
    val r = rightDf((5L, "a", 1.0))
    val p = AsOf.asofJoin(l, r, keys = Seq("k"), leftTs = "t",
      rightTs = "rt", payloads = Seq("v")).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of planned a join:\n$p")
    assert(p.contains("Window"), s"expected a window plan:\n$p")
  }
}
