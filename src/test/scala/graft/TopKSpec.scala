package graft

import graft.operators.{BoundedTopK, Ranks, TopKBuf, TopKRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("topk-spec")
  override def afterAll(): Unit = spark.stop()

  private def sortedCapped(b: TopKBuf, k: Int): Unit = {
    assert(b.ords.length == b.ties.length)
    assert(b.ords.length <= k)
    for (i <- 1 until b.ords.length)
      assert(b.ords(i - 1) > b.ords(i) ||
        (b.ords(i - 1) == b.ords(i) && b.ties(i - 1) < b.ties(i)))
  }

  test("BoundedTopK buffer: capped, sorted, merge == trim(sorted union)") {
    val rnd = new Random(7)
    for (k <- Seq(1, 3, 8)) {
      val agg = new BoundedTopK(k)
      // many duplicate ords to exercise the tie path; tie keys disjoint
      // between the buffers (as in real use: a row has one partition)
      def randRows(n: Int, tieBase: Long) =
        Seq.fill(n)(TopKRow(rnd.nextInt(5).toDouble,
          tieBase + rnd.nextInt(1000).toLong)).distinct
      val a = randRows(40, 0L)
      val b = randRows(25, 10000L)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      sortedCapped(bufA, k); sortedCapped(bufB, k)
      val merged = agg.merge(bufA, bufB)
      sortedCapped(merged, k)
      def expectTop(rows: Seq[TopKRow]) = rows
        .sortBy(r => (-r.ord, r.tie)).take(k)
        .map(r => (r.ord, r.tie))
      assert(bufA.ords.zip(bufA.ties).toSeq == expectTop(a))
      // merge must equal the top-k of the union of the SURVIVORS — and
      // since each buffer already holds its source's true top-k, that is
      // the true top-k of the concatenated input
      assert(merged.ords.zip(merged.ties).toSeq == expectTop(a ++ b))
    }
  }

  test("topKPerGroup == window rank, including groups smaller than k") {
    import spark.implicits._
    val rnd = new Random(11)
    // group 0 has 1 row (< k); values collide across and within groups
    val rows = (1L to 800L).map(i =>
      (if (i == 1) 0L else 1L + rnd.nextInt(20).toLong,
        rnd.nextInt(9).toDouble, i))
    val df = rows.toDF("g", "v", "id").repartition(13)
    val got = Ranks.topKPerGroup(df, Seq("g"), col("v"), col("id"), k = 3,
        rankCol = "rn", ordName = "v", tieName = "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 3)
      .select(col("g"), col("rn").cast("int"), col("v"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == want)
    // partitioning invariance (merge order cannot change a total order)
    val again = Ranks.topKPerGroup(df.repartition(3), Seq("g"), col("v"),
        col("id"), k = 3, rankCol = "rn", ordName = "v", tieName = "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(again == got)
  }

  test("asc mode ranks smallest-first and round-trips ord exactly") {
    import spark.implicits._
    val df = Seq((1L, 0.0, 10L), (1L, 2.5, 11L), (1L, 0.0, 12L),
      (1L, -3.5, 13L)).toDF("g", "v", "id")
    val got = Ranks.topKPerGroup(df, Seq("g"), col("v"), col("id"), k = 3,
        rankCol = "rn", ordName = "v", tieName = "id", asc = true)
      .orderBy("rn")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, -3.5, 13L), (2, 0.0, 10L), (3, 0.0, 12L)))
    // 0.0 came back as +0.0, not -0.0 (the 0.0 - x negation contract)
    assert(got(1)._2.compareTo(0.0) == 0)
  }

  test("NaN ordinates keep a total order: rank first (Spark desc-sort), " +
      "layout-invariant; -0.0 ties with +0.0 on the tiebreak") {
    val k = 3
    val agg = new BoundedTopK(k)
    // NaN arriving into a non-full buffer, a full buffer, and via merge
    // must all land at position 0 (Double.compare ranks NaN above all)
    val rows = Seq(TopKRow(1.0, 1L), TopKRow(Double.NaN, 2L),
      TopKRow(5.0, 3L), TopKRow(3.0, 4L), TopKRow(9.0, 5L))
    for (perm <- rows.permutations.take(30)) {
      val buf = perm.foldLeft(agg.zero)(agg.reduce)
      sortedCappedTotal(buf, k)
      assert(buf.ords(0).isNaN && buf.ties(0) == 2L,
        s"NaN not ranked first for order $perm")
      assert(buf.ords.zip(buf.ties).drop(1).toSeq == Seq((9.0, 5L), (5.0, 3L)))
    }
    val left = Seq(TopKRow(1.0, 1L), TopKRow(9.0, 5L))
      .foldLeft(agg.zero)(agg.reduce)
    val right = Seq(TopKRow(Double.NaN, 2L), TopKRow(5.0, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(left, right)
    assert(m.ords(0).isNaN && m.ties(0) == 2L)
    // -0.0 normalizes to +0.0 (Spark sorts the zeros equal): the pair
    // is tie-broken by the tiebreak key, not by the sign bit
    val zeros = Seq(TopKRow(-0.0, 7L), TopKRow(0.0, 6L), TopKRow(-1.0, 8L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(zeros.ords.zip(zeros.ties).toSeq ==
      Seq((0.0, 6L), (0.0, 7L), (-1.0, 8L)))
    assert(java.lang.Double.doubleToRawLongBits(zeros.ords(1)) == 0L,
      "-0.0 survived normalization")
  }

  /** sortedCapped's invariant check restated under Double.compare so a
    * NaN-bearing buffer can be validated (plain > is NaN-blind). */
  private def sortedCappedTotal(b: TopKBuf, k: Int): Unit = {
    assert(b.ords.length == b.ties.length && b.ords.length <= k)
    for (i <- 1 until b.ords.length) {
      val c = java.lang.Double.compare(b.ords(i - 1), b.ords(i))
      assert(c > 0 || (c == 0 && b.ties(i - 1) < b.ties(i)))
    }
  }

  test("plan: partial-merge aggregation, no WindowExec, no full-row shuffle") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 5, i.toDouble, i)).toDF("g", "v", "id")
    val plan = Ranks.topKPerGroup(df, Seq("g"), col("v"), col("id"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window rank leaked into the plan:\n$plan")
    // typed Aggregator partial merge: an ObjectHashAggregate pair with a
    // merge-mode final stage (the map side combines before the exchange)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("merge_boundedtopk") || plan.contains("BoundedTopK"),
      plan)
  }

  test("globalTopK == orderBy.limit, layout-proof, executor-side merge plan") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (1L to 1000L).map(i => (rnd.nextInt(40).toDouble, i))
    val df = rows.toDF("v", "id").repartition(17)
    val expectDesc = rows.sortBy(r => (-r._1, r._2)).take(7)
    val got = Ranks.globalTopK(df, col("v"), col("id"), k = 7,
        ordName = "v", tieName = "id")
      .orderBy("rank").collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expectDesc)
    val expectAsc = rows.sortBy(identity).take(7)
    val gotAsc = Ranks.globalTopK(df.coalesce(3), col("v"), col("id"), k = 7,
        ordName = "v", tieName = "id", asc = true)
      .orderBy("rank").collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
    assert(gotAsc == expectAsc)
    // the merge is a 1-row executor-side aggregate, not a driver
    // TakeOrdered pulling per-partition candidates with payload
    val plan = Ranks.globalTopK(df, col("v"), col("id"), k = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("trainCentroids seed path: no Sort, no TakeOrdered, broadcast fetch") {
    import spark.implicits._
    val vecs = (0L until 300L).map(i =>
      (i, Seq.fill(4)(((i % 7) + 0.5).toFloat))).toDF("vec_id", "embedding")
      .repartition(80) // above the few-partitions cutoff: aggregator path
    val seed = graft.operators.Similarity.seedRows(vecs, 5, "vec_id", "embedding")
    val plan = seed.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered"), s"driver-merge seed leaked:\n$plan")
    assert(!plan.contains("Sort"), s"sort in seed path:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    // and the seed set itself is exactly the k smallest ids' vectors
    val got = seed.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 5L).toSeq)
    // string-id callers keep the bounded TakeOrdered path
    val svecs = vecs.withColumn("vec_id", concat(lit("d"), col("vec_id")))
    val splan = graft.operators.Similarity
      .seedRows(svecs, 5, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(splan.contains("TakeOrdered"), splan)
    // few-partitions callers (per-subspace PQ training at bench scale)
    // keep the single-job TakeOrdered path too
    val fplan = graft.operators.Similarity
      .seedRows(vecs.coalesce(8), 5, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(fplan.contains("TakeOrdered"), fplan)
  }

  test("samplePerGroup: deterministic, n per group, invariant to layout") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"g${i % 4}", i)).toDF("lang", "doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ranks.samplePerGroup(d, Seq("lang"), col("doc_id"), n = 5,
          idName = "doc_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
        .toSet
    val out = run(df)
    assert(out.size == 20) // 4 groups × 5
    assert(run(df.repartition(17)) == out)
    assert(run(df.coalesce(1)) == out)
    // priorities are ascending within a group
    val pri = Ranks.samplePerGroup(df, Seq("lang"), col("doc_id"), n = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    for ((_, rows) <- pri) {
      val ordered = rows.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
  }
}
