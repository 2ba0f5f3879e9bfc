package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Merge, SnapshotDiff}

/** Keyed MERGE ([[operators.Merge]]): upsert/CDC semantics, idempotence,
  * the diff↔merge inverse round trip, and the scale-shape plan contract
  * (base side crosses exactly one anti join; no cartesian anywhere).
  */
class MergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("merge-spec")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def base: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")

  private def asMap(df: DataFrame): Map[Long, (String, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("upsert replaces matched keys, inserts unmatched, keeps the rest") {
    val updates = Seq((2L, "b2", 21.0), (9L, "i", 90.0)).toDF("k", "name", "v")
    val out = asMap(Merge.upsert(base, updates, Seq("k")))
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("b2", 21.0), 3L -> ("c", 30.0),
      4L -> ("d", 40.0), 9L -> ("i", 90.0)))
  }

  test("applyChanges: I on new key inserts, I on existing key upserts, D drops") {
    val changes = Seq(
      (9L, "I", "i", 90.0),   // plain insert
      (1L, "I", "a2", 11.0),  // replayed insert on live key -> upsert
      (2L, "U", "b2", 21.0),
      (3L, "D", null.asInstanceOf[String], 0.0))
      .toDF("k", "op", "name", "v")
    val out = asMap(Merge.applyChanges(base, changes, Seq("k")))
    assert(out == Map(
      1L -> ("a2", 11.0), 2L -> ("b2", 21.0), 4L -> ("d", 40.0),
      9L -> ("i", 90.0)))
  }

  test("applyChanges rejects malformed ops instead of corrupting silently") {
    // NULL op would otherwise act as a delete (anti-joined out, then
    // dropped by =!= 'D' three-valued logic); lowercase 'd' would upsert
    for (badOp <- Seq(null.asInstanceOf[String], "d", "X")) {
      val changes = Seq((2L, badOp, "b2", 21.0)).toDF("k", "op", "name", "v")
      val e = intercept[Exception] {
        Merge.applyChanges(base, changes, Seq("k")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("invalid op")),
        s"op=$badOp should fail the guard, got: $e")
    }
  }

  test("applyChanges is idempotent: replaying the same change set is a no-op") {
    val changes = Seq((2L, "U", "b2", 21.0), (3L, "D", "x", 0.0),
      (9L, "I", "i", 90.0)).toDF("k", "op", "name", "v")
    val once = Merge.applyChanges(base, changes, Seq("k"))
    val twice = Merge.applyChanges(once, changes, Seq("k"))
    assert(asMap(once) == asMap(twice))
  }

  test("diff then merge reconstructs the new snapshot exactly (inverse pair)") {
    val old = spark.range(1000).select(col("id").as("k"),
      concat(lit("p"), col("id") % 13).as("name"),
      (col("id") % 31).cast("double").as("v"))
      .where(col("id") % 9 =!= 0)
    val neu = spark.range(10, 1010).select(col("id").as("k"),
      concat(lit("p"), col("id") % 13).as("name"),
      (when(col("id") % 17 === 0, col("id") % 31 + 1).otherwise(col("id") % 31))
        .cast("double").as("v"))
      .where(col("id") % 11 =!= 0)
    val statuses = SnapshotDiff.rowStatus(old, neu, Seq("k"), Seq("name", "v"))
    val rebuilt = Merge.applyDiff(old, statuses, neu, Seq("k"))
    assert(rebuilt.select("k", "name", "v").except(neu).isEmpty &&
      neu.except(rebuilt.select("k", "name", "v")).isEmpty,
      "diff→merge round trip diverged from the target snapshot")
    assert(rebuilt.count() == neu.count())
  }

  test("plan: base crosses one broadcast anti join; no cartesian, no SMJ on base") {
    val changes = Seq((2L, "U", "b2", 21.0)).toDF("k", "op", "name", "v")
    val p = Merge.applyChanges(base, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"anti join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in merge plan:\n$p")
    val shuffled = Merge.applyChanges(base, changes, Seq("k"),
      broadcastChanges = false).queryExecution.executedPlan.toString
    assert(shuffled.contains("LeftAnti"), s"anti join missing:\n$shuffled")
  }
}
