package graft

import graft.operators.Dedup
import graft.streaming.{StreamingDedup, StreamingMerge}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus dedup ([[StreamingDedup]]): the foreachBatch fold
  * over a document stream makes EXACTLY the keep-decisions of the batch
  * [[Dedup.incrementalDedup]] replay over the same batch sequence, and
  * the versioned state/kept trees follow the StreamingMerge layout. */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("streaming-dedup-spec")

  override def afterAll(): Unit = spark.stop()

  // distinct filler so unrelated docs share no 3-shingles
  private def mkText(seed: Long): String =
    (0 until 30).map(i => s"w${seed}x$i").mkString(" ")

  test("streamed batches keep exactly the batch-replay survivors; state matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kept = "/tmp/graft_stream_dedup_kept"
    val state = "/tmp/graft_stream_dedup_state"
    val ckpt = "/tmp/graft_stream_dedup_ckpt"
    Seq(kept, state, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))

    val b1 = Seq(
      (1L, mkText(101)), (2L, mkText(101)),            // exact pair → keep 1
      (3L, mkText(103)),
      (4L, mkText(104)), (5L, mkText(104) + " tail"))  // near pair → keep 4
    val b2 = Seq(
      (10L, mkText(103)),                              // exact dup of state 3
      (11L, mkText(104) + " tails"),                   // near dup of state 4
      (12L, mkText(112)),
      (13L, mkText(112) + " zz"), (14L, mkText(114)))  // in-batch near pair

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.startDedupQuery(df, "doc_id", "text",
      kept, state, ckpt, minJaccard = 0.5)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch replay of the same two batches through the batch operator
    val empty = Dedup.corpusState(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), col("doc_id"), col("text"))
    val s1 = Dedup.incrementalDedup(b1.toDF("doc_id", "text"),
      col("doc_id"), col("text"), empty, minJaccard = 0.5)
    val s2 = Dedup.incrementalDedup(b2.toDF("doc_id", "text"),
      col("doc_id"), col("text"), s1.state, minJaccard = 0.5)
    val wantKept = (s1.kept.collect() ++ s2.kept.collect())
      .map(_.getLong(0)).toSet

    val gotKept = StreamingDedup.keptSoFar(spark, kept)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotKept == wantKept, s"stream vs batch: $gotKept vs $wantKept")
    assert(gotKept == Set(1L, 3L, 4L, 12L, 14L))

    // kept versions carry the FULL rows, not just ids
    assert(StreamingDedup.keptSoFar(spark, kept).columns.toSeq ==
      Seq("doc_id", "text"))

    // final streamed state == batch-replay state (same rows, text-free)
    val gotState = StreamingMerge.latestSnapshot(spark, state)
    assert(gotState.columns.sorted.toSeq ==
      Seq("h256", "h64", "id", "signature"))
    val wantState = s2.state.select("id", "h64", "h256").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val gotStateKeys = gotState.select("id", "h64", "h256").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(gotStateKeys == wantState)
    s1.release(); s2.release()

    // replaying batch 1's write against its pre-batch base is idempotent:
    // version v0 re-derived from "no version below 0" = empty base, so a
    // crash between write and checkpoint-commit rewrites identical bytes
    val v0 = spark.read.parquet(f"$kept/v${0L}%012d")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(v0 == Set(1L, 3L, 4L))
  }
}
