package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Scale-safe global ordering primitives.
  *
  * `Window.orderBy(...)` with no partition key is Spark's single-partition
  * trap: `WindowExec` moves EVERY row to one task ("No Partition Defined
  * for Window operation"), serializing the job exactly when the data gets
  * big enough to matter. [[globalRowNumber]] computes the same rank with
  * the classic two-phase shape instead: range-repartition on the sort key
  * (sampled bounds → balanced partitions), rank WITHIN each partition
  * (the window partitions by `spark_partition_id()`, so it is parallel),
  * then add per-partition prefix offsets. Range partitions are ordered by
  * the partitioner, so offset + local rank IS the global rank.
  *
  * Everything is one lazy plan in Tungsten/whole-stage codegen — no RDD
  * round-trip, no row serde, no driver collect. The offsets branch and
  * the ranking branch share the SAME range exchange (ReuseExchange
  * dedupes the identical subtrees), so the sampled partition bounds are
  * computed once and both branches see identical pids — and because the
  * partition count is explicit, AQE never coalesces the stage differently
  * per branch. The prefix sum itself is a theta self-join over the
  * ≤`parts`-row count table (≤ parts² ≈ 1k pairs — constant), broadcast
  * back onto the data.
  *
  * Correctness requires `order` to be a TOTAL order (include a unique
  * tiebreak column, e.g. the representative id) — equal keys split across
  * a range boundary would otherwise be numbered nondeterministically.
  */
object Ranks {

  /** Equivalent of `row_number().over(Window.orderBy(order: _*))` — 1-based,
    * emitted as LongType `outCol` — without a single-partition WindowExec. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // lazy localCheckpoint (r16): withPid feeds BOTH the per-partition
    // counts and the final rank join — without it the whole upstream
    // plan (often an aggregation) executed once per branch (×2) and the
    // counts branch again under offsets (×3 total; a2_exact_dedup_docs'
    // plan showed three copies of its cluster aggregate).
    val withPid = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    // per-partition sizes (≤ `parts` rows) → prefix offsets via a tiny
    // theta self-join (no window, no collect)
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    // rank within each range partition (parallel — the window IS
    // partitioned) and shift by the broadcast offset
    val local = row_number().over(
      Window.partitionBy("__pid").orderBy(order: _*)).cast("long")
    withPid.withColumn("__lrk", local)
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }

  /** Bounded top-k per group without the window-rank shuffle.
    *
    * `row_number().over(Window.partitionBy(g).orderBy(o))` + `rn <= k`
    * moves EVERY row of every group through the exchange before any row
    * can be discarded — at 100 TB that is a full-table shuffle to keep
    * three rows per nation. [[topKPerGroup]] instead aggregates with
    * [[BoundedTopK]], a typed `Aggregator` whose buffer is a sorted pair
    * of primitive arrays CAPPED AT K. Because `Aggregator` supports
    * partial merge, the map side combines first: at most k rows per group
    * PER INPUT PARTITION cross the wire, and each of those is 16 bytes of
    * (ord, tie) — the payload selection happens before the exchange, not
    * after it. Once a partition's buffer for a hot group is full, the
    * common case per row is a single compare against the current k-th
    * entry and an O(1) reject; only an improving row pays the O(k)
    * insertion copy.
    *
    * `tie` must be a unique per-row key (it makes the order total, same
    * contract as [[globalRowNumber]]) and is also the natural payload id:
    * callers needing more columns join the (≤ |groups|·k row) result back
    * on it — that join is the scale-correct shape, not widening the
    * aggregation buffer.
    *
    * `asc = true` ranks ascending (smallest first). Negation uses
    * `0.0 - x` so a zero ordinate round-trips to `+0.0`. The emitted
    * `ordName` column is bit-identical to the input value with ONE
    * exception: a `-0.0` input is emitted as `+0.0` (the buffer
    * normalizes the sign bit on insert — see [[BoundedTopK]]); the two
    * compare equal everywhere numeric, so only a raw-bit consumer can
    * tell.
    *
    * NaN ordinates are a total-order participant, not a landmine: the
    * buffer compares via `java.lang.Double.compare`, which ranks NaN
    * above every finite value — the same order Spark's descending sort
    * uses. Under `asc = true` the negation maps NaN to NaN, so NaN
    * still ranks FIRST (Spark's ascending sort would rank it last);
    * filter NaN upstream if an ascending caller can see one.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ord: Column,
      tie: Column, k: Int, rankCol: String = "rank",
      ordName: String = "ord", tieName: String = "tie",
      asc: Boolean = false, distinctTies: Boolean = false): DataFrame = {
    val agg = udaf(new BoundedTopK(k, distinctTies), Encoders.product[TopKRow])
    val ordIn = if (asc) lit(0.0) - ord.cast("double") else ord.cast("double")
    val ordOut = if (asc) lit(0.0) - col("col.o") else col("col.o")
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(ordIn, tie.cast("long")).as("__top"))
      .select(groupCols.map(col) :+
        posexplode(zip_with(col("__top.ords"), col("__top.ties"),
          (o, t) => struct(o.as("o"), t.as("t")))): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as(rankCol),
        ordOut.as(ordName), col("col.t").as(tieName)): _*)
  }

  /** Global (group-less) bounded top-k — [[topKPerGroup]] with zero
    * grouping columns, kept as a named operator because its scale story
    * differs from `orderBy(o).limit(k)` in a way worth choosing
    * deliberately. Spark plans the latter as TakeOrderedAndProject:
    * per-partition bounded heaps (good — no global sort), but the DRIVER
    * then merges the per-partition candidates, pulling k·P rows WITH
    * their full payload; at 100k partitions and a 1 KB payload that is
    * gigabytes of driver heap for a k-row answer. Here the per-partition
    * partials are 16-byte (ord, tie) pairs merged by a single one-row
    * aggregate on an EXECUTOR, so the driver never sees more than the
    * final k pairs — callers fetch payload for the k winners by joining
    * back on `tie` (the [[topKPerGroup]] payload contract).
    *
    * Use `orderBy.limit` when partitions are few or the payload is
    * narrow; use this when P·k·payload would crush the driver. */
  def globalTopK(df: DataFrame, ord: Column, tie: Column, k: Int,
      rankCol: String = "rank", ordName: String = "ord",
      tieName: String = "tie", asc: Boolean = false,
      distinctTies: Boolean = false): DataFrame =
    topKPerGroup(df, Nil, ord, tie, k, rankCol, ordName, tieName, asc,
      distinctTies)

  /** Deterministic per-group sample of up to `n` rows: rank by an
    * md5-derived 52-bit priority (uniform, seedless, engine-portable —
    * the same md5 family the dedup/sketch oracles mirror in SQL) and keep
    * the n smallest. Equivalent to a per-group reservoir sample but
    * reproducible across engines, partitionings, and reruns; shuffles
    * ≤ n·partitions rows per group, never the table. */
  def samplePerGroup(df: DataFrame, groupCols: Seq[String], idCol: Column,
      n: Int, rankCol: String = "rank", priName: String = "pri",
      idName: String = "id"): DataFrame =
    topKPerGroup(df,
      groupCols,
      conv(substring(md5(idCol.cast("string").cast("binary")), 1, 13), 16, 10)
        .cast("double"),
      idCol, n, rankCol, priName, idName, asc = true)
}

/** One (ordinate, tiebreak) candidate row for [[Ranks.topKPerGroup]]. */
case class TopKRow(ord: Double, tie: Long)

/** Buffer/result of [[BoundedTopK]]: parallel primitive arrays sorted
  * best-first (`ord` descending, `tie` ascending), length ≤ k. Primitive
  * arrays keep the partial-aggregation serde at 16 bytes/entry with no
  * per-element object boxing. */
case class TopKBuf(ords: Array[Double], ties: Array[Long])

/** Mergeable bounded top-k: the `Aggregator` behind
  * [[Ranks.topKPerGroup]]. All three operations preserve the sorted-
  * capped invariant, so `finish` is the identity and merge order cannot
  * change the result (the (ord, tie) order is total).
  *
  * `distinct = true` additionally dedupes EXACT (ord, tie) pairs on
  * insert and merge — the contract sketch-style callers need (KMV keeps
  * the k smallest DISTINCT hashes; a value seen on two partitions must
  * occupy one slot, not two). With unique ties (the topKPerGroup
  * contract) the flag is a no-op. */
class BoundedTopK(k: Int, distinct: Boolean = false)
    extends Aggregator[TopKRow, TopKBuf, TopKBuf] with Serializable {
  require(k >= 1, s"topKPerGroup needs k >= 1, got $k")
  require(k <= 100000,
    s"topKPerGroup keeps k entries per group in the aggregation buffer; " +
      s"k=$k would make the buffer the bottleneck — use a sort for that")

  // Total order via Double.compare so NaN can't break the sorted
  // invariant (plain > / == are both false against NaN, which would
  // let a NaN row slip to position 0 on a non-full buffer and make the
  // result partitioning-dependent). Double.compare ranks NaN above
  // every value — exactly Spark's sort order — but orders -0.0 BELOW
  // +0.0 where Spark's sort treats the zeros as equal; normalizing
  // -0.0 to +0.0 on insert closes that gap, so the zeros are
  // tie-broken by `tie` exactly as a Spark sort would.
  private def better(o1: Double, t1: Long, o2: Double, t2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c > 0 || (c == 0 && t1 < t2)
  }

  private def same(o1: Double, t1: Long, o2: Double, t2: Long): Boolean =
    java.lang.Double.compare(o1, o2) == 0 && t1 == t2

  def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  def reduce(b0: TopKBuf, a0: TopKRow): TopKBuf = {
    val a = if (a0.ord == 0.0) TopKRow(0.0, a0.tie) else a0 // -0.0 → +0.0
    val b = b0
    val n = b.ords.length
    if (n == k && !better(a.ord, a.tie, b.ords(n - 1), b.ties(n - 1))) b
    else {
      // binary search for the insertion point in the best-first order
      var lo = 0
      var hi = n
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (better(b.ords(m), b.ties(m), a.ord, a.tie)) lo = m + 1 else hi = m
      }
      if (distinct && lo < n && same(b.ords(lo), b.ties(lo), a.ord, a.tie))
        return b
      val outN = math.min(n + 1, k)
      val os = new Array[Double](outN)
      val ts = new Array[Long](outN)
      System.arraycopy(b.ords, 0, os, 0, lo)
      System.arraycopy(b.ties, 0, ts, 0, lo)
      os(lo) = a.ord
      ts(lo) = a.tie
      val rest = outN - lo - 1
      if (rest > 0) {
        System.arraycopy(b.ords, lo, os, lo + 1, rest)
        System.arraycopy(b.ties, lo, ts, lo + 1, rest)
      }
      TopKBuf(os, ts)
    }
  }

  def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    if (y.ords.isEmpty) x
    else if (x.ords.isEmpty) y
    else {
      val cap = math.min(x.ords.length + y.ords.length, k)
      val os = new Array[Double](cap)
      val ts = new Array[Long](cap)
      var i = 0
      var j = 0
      var o = 0
      while (o < cap && (i < x.ords.length || j < y.ords.length)) {
        if (j >= y.ords.length) { os(o) = x.ords(i); ts(o) = x.ties(i); i += 1 }
        else if (i >= x.ords.length) { os(o) = y.ords(j); ts(o) = y.ties(j); j += 1 }
        else if (distinct && same(x.ords(i), x.ties(i), y.ords(j), y.ties(j))) {
          os(o) = x.ords(i); ts(o) = x.ties(i); i += 1; j += 1
        } else if (better(x.ords(i), x.ties(i), y.ords(j), y.ties(j))) {
          os(o) = x.ords(i); ts(o) = x.ties(i); i += 1
        } else { os(o) = y.ords(j); ts(o) = y.ties(j); j += 1 }
        o += 1
      }
      if (o == cap) TopKBuf(os, ts)
      else TopKBuf(java.util.Arrays.copyOf(os, o), java.util.Arrays.copyOf(ts, o))
    }
  }

  def finish(b: TopKBuf): TopKBuf = b
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
