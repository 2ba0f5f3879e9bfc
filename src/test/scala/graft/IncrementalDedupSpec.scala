package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental (state-carrying) corpus dedup: every stage-order decision
  * observable, plus idempotence — the property production snapshots rely
  * on. */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.local("incremental-dedup-spec")
  override def afterAll(): Unit = spark.stop()

  // long distinct texts so 3-shingle Jaccard behaves predictably
  private def mkText(seed: Int): String =
    (0 until 30).map(i => s"w${seed}x${(i * 7 + seed) % 13}n$i").mkString(" ")

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def keptIds(r: Dedup.IncrementalResult): Set[Long] =
    r.kept.collect().map(_.getLong(0)).toSet

  private val corpus = df((1L, mkText(1)), (2L, mkText(2)), (3L, mkText(3)))
  private lazy val state0 =
    Dedup.corpusState(corpus, col("doc_id"), col("text")).cache()

  test("fresh docs pass; exact and near dups of the state are dropped") {
    val batch = df(
      (10L, mkText(10)),                    // fresh → kept
      (11L, mkText(1)),                     // exact dup of state doc 1 → dropped
      (12L, mkText(2) + " tail"),           // near dup of state doc 2 → dropped
      (13L, mkText(13)))                    // fresh → kept
    val r = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    assert(keptIds(r) === Set(10L, 13L))
    assert(r.state.count() === 3 + 2)
  }

  test("in-batch exact keeps min id; in-batch near keeps cluster min") {
    val batch = df(
      (20L, mkText(20)), (21L, mkText(20)),          // exact pair → 20 kept
      (22L, mkText(22)), (23L, mkText(22) + " zz"),  // near pair → 22 kept
      (24L, mkText(24)))
    val r = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    assert(keptIds(r) === Set(20L, 22L, 24L))
  }

  test("a representative near the state drops its whole in-batch cluster") {
    // 30 ≈ 31 (in-batch near pair, 30 is representative) and 30 ≈ state 3:
    // stage 3 removes 31, stage 4 removes 30 — nothing of the cluster lands
    val batch = df(
      (30L, mkText(3) + " x"), (31L, mkText(3) + " x y"), (32L, mkText(32)))
    val r = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    assert(keptIds(r) === Set(32L))
  }

  test("idempotence: replaying a batch against the grown state keeps nothing") {
    val batch = df((40L, mkText(40)), (41L, mkText(41)), (42L, mkText(2)))
    val r1 = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    assert(keptIds(r1) === Set(40L, 41L))
    val r2 = Dedup.incrementalDedup(batch, col("doc_id"), col("text"),
      r1.state.cache())
    assert(keptIds(r2) === Set.empty)
    assert(r2.state.count() === r1.state.count())
  }

  test("portable Md5Minhash family agrees with the default on this fixture") {
    val batch = df((50L, mkText(50)), (51L, mkText(1)), (52L, mkText(2) + " t"))
    val xx = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    val md5State = Dedup.corpusState(corpus, col("doc_id"), col("text"),
      family = Dedup.Md5Minhash)
    val md = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), md5State,
      family = Dedup.Md5Minhash)
    assert(keptIds(xx) === keptIds(md))
  }

  test("two snapshots equal one from-scratch dedupCorpus when cross-batch dups are exact") {
    import spark.implicits._
    // in-batch NEAR pairs are allowed (both paths verify those exactly);
    // cross-batch dups are EXACT, where estimated and exact Jaccard agree
    val b1 = df((1L, mkText(101)), (2L, mkText(101) + " zz"),
      (3L, mkText(103)), (4L, mkText(104)))
    val b2 = df((10L, mkText(103)),                         // exact dup of 3
      (11L, mkText(111)), (12L, mkText(111) + " zz"),       // in-batch near pair
      (13L, mkText(113)))
    val batch = Dedup.dedupCorpus(b1.unionByName(b2), col("doc_id"), col("text"),
      minJaccard = 0.5).collect().map(_.getLong(0)).toSet
    val empty = Dedup.corpusState(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("doc_id"), col("text"))
    val s1 = Dedup.incrementalDedup(b1, col("doc_id"), col("text"), empty,
      minJaccard = 0.5)
    val s2 = Dedup.incrementalDedup(b2, col("doc_id"), col("text"), s1.state,
      minJaccard = 0.5)
    assert(keptIds(s1) ++ keptIds(s2) === batch)
    assert(batch === Set(1L, 3L, 4L, 11L, 13L))
  }

  test("compactState: identical keep-decisions at a fraction of state rows") {
    // state bootstrapped from a RAW corpus: 12 distinct texts, the first 8
    // duplicated verbatim once and the first 4 twice more — 28 rows total
    val base = (1L to 12L).map(i => (i, mkText(i.toInt)))
    val raw = df((base ++
      base.take(8).map { case (i, t) => (i + 100, t) } ++
      base.take(4).map { case (i, t) => (i + 200, t) } ++
      base.take(4).map { case (i, t) => (i + 300, t) }): _*)
    val rawState = Dedup.corpusState(raw, col("doc_id"), col("text")).cache()
    val compacted = Dedup.compactState(rawState).cache()
    val (nRaw, nCompact) = (rawState.count(), compacted.count())
    assert(nRaw === 28 && nCompact === 12,
      "each verbatim family must collapse to one row")
    // a batch exercising every decision path: fresh, exact-of-state (incl.
    // exact of a COMPACTED-AWAY id's text), near-of-state, in-batch pair
    val batch = df(
      (400L, mkText(400)),              // fresh → kept
      (401L, mkText(1)),                // exact dup of compacted family → dropped
      (402L, mkText(8)),                // exact dup of a duplicated text → dropped
      (403L, mkText(5) + " tail"),      // near dup of state → dropped
      (404L, mkText(404)), (405L, mkText(404)), // in-batch exact pair → 404
      (406L, mkText(406)))              // fresh → kept
    val viaRaw = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), rawState)
    val viaCompact = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), compacted)
    assert(keptIds(viaRaw) === keptIds(viaCompact),
      "compaction must not change any keep-decision")
    assert(keptIds(viaCompact) === Set(400L, 404L, 406L))
    // compacting a compacted state is a no-op (idempotent maintenance)
    assert(Dedup.compactState(compacted).count() === nCompact)
  }

  test("bloom front-filter: identical keep-decisions; no-hit rows bypass the state join") {
    // a batch mixing true state hits (exact + near), a would-be false
    // positive candidate space (small bitmap), and mostly fresh rows —
    // the regime the Bloom guard exists for
    val batch = df(
      (50L, mkText(50)), (51L, mkText(51)), (52L, mkText(52)), // fresh
      (53L, mkText(1)),                     // exact dup of state → dropped
      (54L, mkText(2) + " tail"),           // near dup of state → dropped
      (55L, mkText(55)), (56L, mkText(55))) // in-batch exact pair → 55
    val plain = Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state0)
    val guarded = Dedup.incrementalDedup(batch, col("doc_id"), col("text"),
      state0, stateBloomBits = Some(1 << 16))
    assert(keptIds(guarded) === keptIds(plain),
      "Bloom guard must not change any keep-decision")
    assert(keptIds(guarded) === Set(50L, 51L, 52L, 55L))

    // the short-circuit is in the PLAN: the guarded exact-vs-state stage
    // is a union whose first branch filters on the bitmap arithmetic and
    // contains NO join — no-hit rows never touch the state relation
    val stage2 = Dedup.bloomGuardedAntiJoin(
      batch.select(xxhash64(col("text")).as("h64"),
        sha2(col("text").cast("binary"), 256).as("h256")),
      state0.select("h64", "h256"), "h64", Seq("h64", "h256"),
      numBits = 1 << 16)
    val p = stage2.queryExecution.executedPlan.toString
    val lines = p.linesIterator.toVector
    val ui = lines.indexWhere(_.contains("Union"))
    assert(ui >= 0, s"no union in the guarded plan:\n$p")
    val ai = lines.indexWhere(_.contains("LeftAnti"), ui)
    assert(ai > ui, s"no anti join in the guarded plan:\n$p")
    val bypass = lines.slice(ui + 1, ai).mkString("\n")
    assert(!bypass.contains("Join"),
      s"bypass branch must not join the state:\n$bypass")

    // a saturated-beyond-useful bitmap stays CORRECT (degrades to the
    // plain join's decisions, never drops a fresh row)
    val tiny = Dedup.incrementalDedup(batch, col("doc_id"), col("text"),
      state0, stateBloomBits = Some(64))
    assert(keptIds(tiny) === keptIds(plain))
  }

  test("estimatedJaccard: 1.0 on equal, 0.0 on disjoint, fraction between") {
    import spark.implicits._
    val r = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 9L))).toDF("a", "b")
      .select(
        Dedup.estimatedJaccard(col("a"), col("a")).as("same"),
        Dedup.estimatedJaccard(col("a"), col("b")).as("half"))
      .head()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.5)
  }
}
