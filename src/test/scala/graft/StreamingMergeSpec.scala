package graft

import graft.streaming.StreamingMerge
import graft.operators.Merge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC maintenance ([[StreamingMerge]]): the versioned-snapshot
  * fold over a change stream equals one batch [[Merge.applyChanges]] of
  * the compacted whole, in-batch multi-ops resolve last-wins, and the
  * version-before-batch-id read gives replay idempotence. */
class StreamingMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("streaming-merge-spec")

  override def afterAll(): Unit = spark.stop()

  private def snapMap(dir: String): Map[Long, (String, Double)] =
    StreamingMerge.latestSnapshot(spark, dir).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("name"), r.getAs[Double]("v"))).toMap

  test("two streamed change batches fold to the batch-merge answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft_stream_merge_tgt"
    val ckpt = "/tmp/graft_stream_merge_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val input = MemoryStream[(Long, Long, String, String, Double)]
    val df = input.toDF().toDF("seq", "k", "op", "name", "v")
    val q = StreamingMerge.startCdcMergeQuery(df, Seq("k"), "op", "seq",
      dir, ckpt)
    try {
      // batch 0: inserts, including an in-batch I→U→D pile-up on key 3
      input.addData(
        (1L, 1L, "I", "a", 10.0), (2L, 2L, "I", "b", 20.0),
        (3L, 3L, "I", "c", 30.0), (4L, 3L, "U", "c2", 31.0),
        (5L, 3L, "D", "x", 0.0))
      q.processAllAvailable()
      assert(snapMap(dir) == Map(1L -> ("a", 10.0), 2L -> ("b", 20.0)),
        "in-batch last-wins compaction failed")
      // batch 1: update 1, delete 2, insert 4
      input.addData((6L, 1L, "U", "a2", 11.0), (7L, 2L, "D", "x", 0.0),
        (8L, 4L, "I", "d", 40.0))
      q.processAllAvailable()
      assert(snapMap(dir) == Map(1L -> ("a2", 11.0), 4L -> ("d", 40.0)))

      // the streamed fold == one batch applyChanges of the compacted whole
      val allChanges = Seq(
        (1L, 1L, "I", "a", 10.0), (2L, 2L, "I", "b", 20.0),
        (3L, 3L, "I", "c", 30.0), (4L, 3L, "U", "c2", 31.0),
        (5L, 3L, "D", "x", 0.0), (6L, 1L, "U", "a2", 11.0),
        (7L, 2L, "D", "x", 0.0), (8L, 4L, "I", "d", 40.0))
        .toDF("seq", "k", "op", "name", "v")
      val emptyBase = Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
      val batchAnswer = Merge.applyChanges(emptyBase,
          StreamingMerge.compactChanges(allChanges, Seq("k"), "op", "seq"),
          Seq("k"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
        .toMap
      assert(snapMap(dir) == batchAnswer)
    } finally q.stop()
  }

  test("replaying a batch rewrites an identical version (idempotent recovery)") {
    import spark.implicits._
    val dir = "/tmp/graft_stream_merge_replay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val b0 = Seq((1L, 1L, "I", "a", 10.0), (2L, 2L, "I", "b", 20.0))
      .toDF("seq", "k", "op", "name", "v")
    val b1 = Seq((3L, 1L, "U", "a2", 11.0)).toDF("seq", "k", "op", "name", "v")
    def apply(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val compacted = StreamingMerge.compactChanges(batch, Seq("k"), "op", "seq")
      val base = StreamingMerge.versionBefore(spark, dir, id) match {
        case Some(v) => spark.read.parquet(f"$dir/v$v%012d")
        case None => Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
      }
      Merge.applyChanges(base, compacted, Seq("k"))
        .write.mode("overwrite").parquet(f"$dir/v$id%012d")
    }
    apply(b0, 0); apply(b1, 1)
    val afterFirst = snapMap(dir)
    // crash-replay of batch 1: version v1 already exists, but the replay
    // reads v0 (strictly below its own id), NOT v1 — and converges
    apply(b1, 1)
    assert(snapMap(dir) == afterFirst)
    assert(afterFirst == Map(1L -> ("a2", 11.0), 2L -> ("b", 20.0)))
  }

  test("time travel reads exact versions; retention keeps the newest N") {
    import spark.implicits._
    val dir = "/tmp/graft_stream_merge_travel"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(id: Long, rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("k", "name", "v").write.parquet(f"$dir/v$id%012d")
    write(0, Seq((1L, "a", 1.0)))
    write(1, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    write(2, Seq((2L, "b", 2.0)))
    assert(StreamingMerge.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(StreamingMerge.snapshotAt(spark, dir, 1).count() == 2)
    intercept[IllegalArgumentException] {
      StreamingMerge.snapshotAt(spark, dir, 7)
    }
    val pruned = StreamingMerge.pruneVersions(spark, dir, keep = 2)
    assert(pruned == Seq(0L))
    assert(StreamingMerge.versions(spark, dir) == Seq(1L, 2L))
    // latest unaffected; keep=1 refuses — the latest version's
    // predecessor is the crash-replay base and must survive retention
    assert(StreamingMerge.latestSnapshot(spark, dir).count() == 1)
    intercept[IllegalArgumentException] {
      StreamingMerge.pruneVersions(spark, dir, keep = 1)
    }
  }

  test("compactChanges ties at equal seq prefer the delete deterministically") {
    import spark.implicits._
    val raw = Seq((5L, 9L, "I", "z", 1.0), (5L, 9L, "D", "z", 1.0))
      .toDF("seq", "k", "op", "name", "v")
    val c = StreamingMerge.compactChanges(raw, Seq("k"), "op", "seq").collect()
    assert(c.length == 1 && c(0).getAs[String]("op") == "D")
  }
}
