package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the 100 TB answer to
  * `COUNT(DISTINCT)`. An exact distinct count is a full shuffle of every
  * key and cannot be pre-aggregated across time; a DataSketches HLL
  * sketch is a fixed-size register array whose union is register-wise
  * max — associative, commutative, and insertion-order-independent — so
  * per-partition / per-day / per-source sketches are computed once,
  * stored as bytes, and COMPOSED into any rollup later without touching
  * the raw keys again. The shuffle carries kilobytes per group instead
  * of the key universe.
  *
  * No SQL-oracle face: the estimate is implementation-defined
  * (DataSketches here, a different HLL in DuckDB), so correctness is
  * pinned by SketchesSpec instead — exactness at small cardinality
  * (coupon mode IS exact), merge-equals-whole bit-equality, layout
  * independence, and rsd bounds against the exact count. */
object Sketches {

  /** Per-group HLL sketch of `col`: (groupCols..., `sketch` binary).
    * `lgK` trades size for accuracy (12 → 4 KB max, ~1.6% rsd). */
  def distinctSketch(df: DataFrame, groupCols: Seq[Column], c: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*).agg(hll_sketch_agg(c, lit(lgK)).as("sketch"))

  /** Merge already-built sketches up a coarser grouping — the rollup
    * that never revisits raw data. */
  def mergeSketches(df: DataFrame, groupCols: Seq[Column],
      sketchCol: Column): DataFrame =
    df.groupBy(groupCols: _*).agg(hll_union_agg(sketchCol).as("sketch"))

  /** Point estimate of a sketch column. */
  def estimate(sketchCol: Column): Column =
    hll_sketch_estimate(sketchCol).cast("bigint")

  // ------------------------------------------- Count-Min (frequencies)

  /** One CMS hash: `h_j(x) = md5(j || ':' || x)` first 15 hex digits mod
    * `width` — the [[graft.operators.Dedup.md5Hash60]] decode shape, so
    * both the sketch build and point estimates replay exactly in any
    * engine with md5 (the registered query's DuckDB oracle does). */
  private def cmsBucket(row: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", row, key).cast("binary")), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) of a
    * key column: `depth × width` counters as (row, bucket, cnt) rows —
    * the FREQUENCY analog of the HLL block above. Build is one narrow
    * explode over `depth` hash rows + one groupBy of at most
    * `depth × width` groups, regardless of key cardinality: at 100 TB
    * the token/URL/domain frequency question never shuffles the key
    * universe, only d·w counters. Per-partition / per-day sketches merge
    * by counter-wise ADDITION (plain `sum` after a union — associative,
    * order-free), so sketches pre-aggregate across time like the HLL
    * rollup. Estimates ([[cmsEstimate]]) are upward-biased ONLY:
    * min over d counters ≥ true count, within εN with probability
    * 1−δ at width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
    *
    * Unlike [[distinctSketch]] (implementation-defined HLL bytes), the
    * md5 hash family is engine-portable, so CMS gets a full DuckDB
    * oracle (t_cms_token_counts). */
  private[operators] def countMin(df: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(keyCol.cast("string").as("k"))
      .select(col("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("k"), width))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merge CMS sketches built with identical (depth, width, family):
    * counter-wise addition. */
  private[operators] def mergeCountMin(sketches: DataFrame*): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a set of probe keys against a [[countMin]]
    * sketch: min over the depth counters (0 when a bucket row is absent
    * — an empty counter). Output: (k, est). The probe side is tiny by
    * contract (heavy-hitter candidates, watchlists); the sketch join is
    * on (row, bucket) — at most depth × |probes| sketch rows move. */
  private[operators] def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      keyCol: Column, depth: Int = 4, width: Int = 1024): DataFrame = {
    val pr = probes.select(keyCol.cast("string").as("k")).distinct()
      .select(col("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("k"), width))
    pr.join(sketch, Seq("row", "bucket"), "left")
      .groupBy("k").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** A built Count-Min sketch BOUND to its (depth, width): estimating
    * with different parameters than the build recomputes buckets that
    * the counters never saw — the left join finds nothing, min() reads
    * 0, and the one-sided never-undercount guarantee silently inverts.
    * Binding the parameters to the counters makes that mistake
    * unrepresentable: merges require equality, estimates reuse the
    * build's own values. This is the public CMS face; the raw
    * DataFrame helpers above are operator-internal. */
  final case class CmsSketch(counters: DataFrame, depth: Int, width: Int) {
    def merge(other: CmsSketch): CmsSketch = {
      require(depth == other.depth && width == other.width,
        s"CMS merge with mismatched parameters: depth=$depth/width=$width" +
          s" vs depth=${other.depth}/width=${other.width}")
      CmsSketch(mergeCountMin(counters, other.counters), depth, width)
    }
    /** (k, est) per distinct probe key; est ≥ true count always. */
    def estimate(probes: DataFrame, keyCol: Column): DataFrame =
      cmsEstimate(counters, probes, keyCol, depth, width)
  }

  /** Build a [[CmsSketch]] over a key column. */
  def countMinSketch(df: DataFrame, keyCol: Column, depth: Int = 4,
      width: Int = 1024): CmsSketch =
    CmsSketch(countMin(df, keyCol, depth, width), depth, width)

  // ------------------------------------------- KMV distinct counting

  /** K-minimum-values distinct-count sketch — the ENGINE-PORTABLE
    * cardinality sketch the HLL row above cannot be: both the state (the
    * k smallest distinct md5-derived 52-bit hashes per group) and the
    * estimator (`(k−1) · 2^52 / h_k`, one IEEE division) are exactly
    * expressible in ANSI SQL, so unlike HLL the whole pipeline is
    * oracle-checkable bit-for-bit. Same scale shape as HLL: the state is
    * ≤ k longs per group (mergeable by union → re-min), built by
    * [[graft.operators.Ranks.topKPerGroup]]'s capped partial-merge
    * aggregator, so the key universe never shuffles — each input
    * partition contributes at most k hashes per group to the exchange.
    * Relative error ≈ 1/√(k−2) (~13% at the default k = 64; grow k for
    * tighter bounds — the state stays trivially small).
    *
    * `mins` carries the group columns plus `h`; below k distinct hashes
    * the estimate is the EXACT count (every hash is present). Hash
    * collisions at 52 bits undercount by ~n²/2^53 — negligible below
    * billions of distinct values per group, and faithfully mirrored by
    * an oracle using the same hash. */
  final case class KmvSketch(mins: DataFrame, k: Int) {
    private def groups: Seq[String] = mins.columns.filterNot(_ == "h").toSeq

    def merge(other: KmvSketch): KmvSketch = {
      require(k == other.k,
        s"KMV merge with mismatched k: $k vs ${other.k}")
      KmvSketch(rebuildMins(mins.unionByName(other.mins), groups, k), k)
    }

    /** (groupCols..., est_distinct: double) — exact below k. */
    def estimate: DataFrame = {
      val g = groups
      // (k-1)·2^52 precomputed in exact integer-double arithmetic; the
      // single runtime division is IEEE-identical across engines
      val scale = (k - 1).toDouble * 4503599627370496.0
      mins.groupBy(g.map(col): _*)
        .agg(count(lit(1)).as("__n"), max(col("h")).as("__hk"))
        .select(g.map(col) :+
          when(col("__n") < k, col("__n").cast("double"))
            .otherwise(lit(scale) / col("__hk").cast("double"))
            .as("est_distinct"): _*)
    }
  }

  /** The portable 52-bit hash shared by build and merge: 13 md5 hex
    * digits folded to a long — exactly representable as DOUBLE, so the
    * estimator's division is portable too. */
  private def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  private def rebuildMins(hashed: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    Ranks.topKPerGroup(hashed, groupCols, col("h").cast("double"), col("h"),
        k, rankCol = "__rn", ordName = "__ord", tieName = "h",
        asc = true, distinctTies = true)
      .select(groupCols.map(col) :+ col("h"): _*)

  /** Build a [[KmvSketch]] of `c` per group. `k ≤ 2048` keeps
    * `(k−1)·2^52` exact as a double. Nulls in `c` are ignored —
    * matching `COUNT(DISTINCT c)`, the exact shape KMV replaces
    * (unfiltered, a null would hash to a null that violates the
    * non-nullable top-k buffer encoder downstream). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], c: Column,
      k: Int = 64): KmvSketch = {
    require(k >= 2 && k <= 2048, s"kmvSketch needs 2 <= k <= 2048, got $k")
    KmvSketch(rebuildMins(
      df.where(c.isNotNull)
        .select(groupCols.map(col) :+ kmvHash(c).as("h"): _*),
      groupCols, k), k)
  }

  /** Jaccard resemblance between two keyed sets estimated from their
    * KMV sketches (Broder's minwise estimator on the k-min union): the
    * k smallest distinct hashes of A∪B are a uniform sample of the
    * union, so the fraction of them present in BOTH sketches estimates
    * |A∩B| / |A∪B|. Per group: ≤ 3k hash rows total are touched —
    * cross-corpus vocabulary overlap, shared-url mass, near-duplicate
    * source detection at any corpus size without the key universe ever
    * shuffling. Deterministic given the md5 hash family, so fully
    * oracle-checkable. Output: groups... + (n_mins, jaccard_est), where
    * n_mins = |union k-min sample| (= |A∪B| exactly when below k, and
    * then the estimate is exact too). */
  def kmvJaccard(a: KmvSketch, b: KmvSketch): DataFrame = {
    require(a.k == b.k,
      s"kmvJaccard with mismatched k: ${a.k} vs ${b.k}")
    val groups = a.mins.columns.filterNot(_ == "h").toSeq
    val union = kmvFromMins(a.mins.unionByName(b.mins), a.k).mins
    val inA = a.mins.withColumn("__inA", lit(1))
    val inB = b.mins.withColumn("__inB", lit(1))
    union
      .join(inA, groups :+ "h", "left")
      .join(inB, groups :+ "h", "left")
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_mins"),
        sum(when(col("__inA") === 1 && col("__inB") === 1, 1L)
          .otherwise(0L)).as("__both"))
      .select(groups.map(col) ++ Seq(col("n_mins"),
        (col("__both").cast("double") / col("n_mins")).as("jaccard_est")): _*)
  }

  /** Reconstruct a [[KmvSketch]] from a union of stored min tables
    * (the streaming / at-rest readout face): re-min to the k smallest
    * distinct hashes per group. Because the distinct-merge collapses
    * identical hashes, appending the SAME min table twice (an
    * at-least-once replay) cannot change the result — the readout is
    * replay-idempotent by construction, no batch-id guard needed. */
  def kmvFromMins(mins: DataFrame, k: Int): KmvSketch =
    KmvSketch(rebuildMins(mins,
      mins.columns.filterNot(_ == "h").toSeq, k), k)

  // ------------------------------------------- log-bucket quantiles

  /** Decimal-log bucket decomposition of a non-negative scaled-integer
    * value: `d` = digit count, `m` = the first THREE decimal digits
    * (right-padded — 100..999, or 0..99 only for values under 100). The
    * bucket `[m·10^(d-3), (m+1)·10^(d-3))` has relative width 1/m ≤ 1%,
    * and every value below 1000 is its own singleton bucket (exact).
    * Everything is digit-string arithmetic — `length`/`rpad`/
    * `substring`/`repeat` — because a float `log()` computes the SAME
    * boundaries differently in the last ulp across engines, and a value
    * sitting on a boundary would then land in different buckets in
    * Spark and the DuckDB oracle. Strings make the bucket function
    * bit-identical anywhere by construction. */
  private def qDigits(vInt: Column): Column = length(vInt.cast("string"))
  private def qPrefix(vInt: Column): Column =
    substring(rpad(vInt.cast("string"), 3, "0"), 1, 3).cast("int")

  /** Mergeable quantile sketch — the profiling primitive exact
    * `percentile` cannot provide at 100 TB: an exact per-group quantile
    * buffers and sorts EVERY value of the group, cannot pre-aggregate
    * across days, and re-reads history on every rollup. This sketch is
    * a fixed-boundary decimal-log histogram (the log-bucket idea behind
    * DDSketch, Masson et al., VLDB 2019 — with decimal digit buckets
    * instead of float `log_γ` so the boundaries are engine-exact):
    * at most 900 buckets per decade regardless of row count, merged by
    * per-bucket ADDITION (associative, order-free), quantiles answered
    * from cumulative counts with ≤ 1% relative error — and EXACTLY for
    * values under 1000 scaled units, where buckets are singletons.
    *
    * Values are fixed-point: `c` is cast to DECIMAL(18,`scale`) and
    * scaled to an integer (cents for money), so bucketing never touches
    * a float. Output rows: (groupCols..., bucket, lb, cnt) where
    * `bucket` is the order-preserving bucket id `(d−1)·900 + (m−100)`
    * and `lb` the exact scaled-integer lower bound ×100 as
    * DECIMAL(38,0) (integer by construction: `m` followed by `d−1`
    * zeros). Negative values are outside the sketch's domain (a decimal
    * digit-log has no sign) — [[quantileSketch]] excludes them at build,
    * so a caller with signed data must shift or split by sign first. */
  final case class QuantileSketch(buckets: DataFrame, scale: Int,
      groupCols: Seq[String]) {

    /** Counter-wise addition; requires identical fixed-point scale —
      * merging sketches built at different scales would add counts of
      * incomparable buckets, so it is unrepresentable, like
      * [[CmsSketch.merge]]. */
    def merge(other: QuantileSketch): QuantileSketch = {
      require(scale == other.scale && groupCols == other.groupCols,
        s"quantile merge with mismatched layout: scale=$scale/" +
          s"$groupCols vs ${other.scale}/${other.groupCols}")
      QuantileSketch(
        buckets.unionByName(other.buckets)
          .groupBy((groupCols :+ "bucket" :+ "lb").map(col): _*)
          .agg(sum(col("cnt")).as("cnt")),
        scale, groupCols)
    }

    /** Quantile estimates per group: for each q, the lower bound of the
      * bucket holding the rank-⌈q·N⌉ smallest value, in original units
      * (the sketch's ONE float op: an exact-power-of-ten division at
      * the very end). Output (groupCols..., q, quantile_est), one row
      * per group × q. The cumulative scan is a window over ≤ 900·decades
      * bucket rows per group — driver-safe at any data size. */
    def quantiles(qs: Seq[Double]): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy("bucket")
      val wAll = Window.partitionBy(groupCols.map(col): _*)
      val cum = buckets
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("total", sum(col("cnt")).over(wAll))
      val divisor = math.pow(10, 2 + scale) // lb is scaled ×10^scale ×100
      cum.crossJoin(
          cum.sparkSession.createDataFrame(
            qs.map(Tuple1(_))).toDF("q").hint("broadcast"))
        .filter(col("cum") >= ceil(col("q") * col("total")))
        .groupBy((groupCols :+ "q").map(col): _*)
        .agg((min(col("lb")).cast("double") / lit(divisor))
          .as("quantile_est"))
    }
  }

  /** Build a [[QuantileSketch]] of `c` per group. One narrow projection
    * + one bounded groupBy — the shuffle carries at most
    * `groups × 900 × decades` rows however large the input. */
  def quantileSketch(df: DataFrame, groupCols: Seq[Column], c: Column,
      scale: Int = 2): QuantileSketch = {
    // DECIMAL multiply by 10^scale keeps the cast exact; BIGINT holds
    // any DECIMAL(18,·) so the narrowing cannot overflow
    val vInt = (c.cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast("bigint")
    val base = df.select((groupCols :+ vInt.as("v")): _*)
    val names = base.columns.dropRight(1).toSeq
    QuantileSketch(
      base
        .filter(col("v") >= 0) // negative: caller contract, see scaladoc
        .withColumn("bucket",
          (qDigits(col("v")) - 1) * lit(900) + qPrefix(col("v")) - lit(100))
        .withColumn("lb", concat(qPrefix(col("v")).cast("string"),
          repeat(lit("0"), qDigits(col("v")) - 1)).cast("decimal(38,0)"))
        .groupBy((names :+ "bucket" :+ "lb").map(col): _*)
        .agg(count(lit(1)).as("cnt")),
      scale, names)
  }

  // ------------------------------------------- frequent items (exact)

  /** Per-partition Misra-Gries summaries (the classic "frequent"
    * algorithm, Misra & Gries 1982): at most `slots` live counters per
    * partition; a decrement step cancels `slots + 1` distinct
    * occurrences at once, so across ALL partitions total cancelled mass
    * ≤ N and any key with global count > N/(slots+1) survives in at
    * least one partition's summary. Built with ZERO shuffle (narrow
    * mapPartitions, ≤ slots + 1 rows emitted per partition): survivor
    * keys as (k, 0) plus ONE (null, n_p) row carrying the partition's
    * non-null row count, so [[frequentItems]] gets candidates AND the
    * corpus total from a single scan. Null keys are skipped — a null is
    * not a countable item ([[graft.operators.Bpe.tokenizeBpe]]
    * contract). */
  private[graft] def mgSummaries(df: DataFrame, keyCol: Column,
      slots: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(keyCol.cast("string").as("k")).as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        var n = 0L
        it.foreach { k =>
          if (k != null) {
            n += 1
            counts.get(k) match {
              case Some(c) => counts(k) = c + 1
              case None if counts.size < slots => counts(k) = 1L
              case None => // decrement all; drop zeros (one MG step)
                counts.keys.toArray.foreach { key =>
                  val c = counts(key)
                  if (c == 1L) counts.remove(key) else counts(key) = c - 1
                }
            }
          }
        }
        counts.keysIterator.map(k => (k, 0L)) ++ Iterator((null: String, n))
      }.toDF("k", "np")
  }

  /** Candidate keys only — the distinct union of [[mgSummaries]]
    * survivors (test seam; frequentItems consumes the summaries
    * directly so the total rides the same scan). */
  private[graft] def mgCandidates(df: DataFrame, keyCol: Column,
      slots: Int): DataFrame =
    mgSummaries(df, keyCol, slots)
      .filter(col("k").isNotNull).select("k").distinct()

  /** EXACT heavy hitters at relative frequency ≥ `minShare`, computed
    * without ever shuffling the key universe — the 100 TB answer to
    * "which tokens/URLs/domains exceed x% of the corpus". A plain
    * `GROUP BY key HAVING count ≥ sN` shuffles one row per distinct key
    * per partition (the whole vocabulary); this is the canonical
    * sketch-then-verify shape instead:
    *
    *  1. candidate pass — zero-shuffle per-partition Misra-Gries with
    *     `slots = ⌈2/minShare⌉` counters (the factor 2 halves the
    *     guarantee bound, absorbing the inequality being strict), so the
    *     candidate union provably contains every true heavy hitter; the
    *     corpus total N rides the SAME scan as per-partition (null, n_p)
    *     summary rows — the whole operator reads the keys exactly twice
    *     (summaries + verify), and only the verify aggregation shuffles,
    *     carrying ≤ slots × partitions keys;
    *  2. verify pass — one exact count restricted to the (tiny,
    *     broadcast) candidate set.
    *
    * The result is EXACT — (key, n, share) for every key with
    * n ≥ ⌈minShare · N⌉ — which is why the registered query
    * (t_heavy_hitters) can be oracle-checked against a plain
    * GROUP-BY/HAVING in DuckDB: a match certifies zero candidate-pass
    * false negatives end to end, the same certification style as
    * d_containment_pairs. `share` is the single IEEE division n/N of
    * exact longs (engine-portable). */
  def frequentItems(df: DataFrame, keyCol: Column,
      minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1,
      s"minShare must be in (0, 1], got $minShare")
    // candidate memory and broadcast scale as 1/minShare × partitions:
    // below this floor the "heavy hitter" framing itself has broken down
    // (2e6 counters per partition) — reach for the Count-Min sketch +
    // a threshold probe instead of an exact answer
    require(minShare >= 1e-6,
      s"minShare=$minShare needs ${math.ceil(2.0 / minShare).toLong} MG " +
        "counters per partition; below 1e-6 use countMinSketch (approximate, " +
        "fixed size) rather than exact frequent items")
    val slots = math.max(1, math.ceil(2.0 / minShare).toInt)
    val keys = df.select(keyCol.cast("string").as("k")).filter(col("k").isNotNull)
    // ≤ (slots + 1) × partitions rows; lazy localCheckpoint (no job at
    // construction — the Graph.pageRank lesson) so the candidate branch
    // and the total branch don't each replay the corpus scan
    val summaries = mgSummaries(keys, col("k"), slots)
      .localCheckpoint(eager = false)
    val cand = summaries.filter(col("k").isNotNull).select("k").distinct()
    val total = summaries.agg(sum(col("np")).as("n_total"))
    keys.join(broadcast(cand), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") >= ceil(lit(minShare) * col("n_total")))
      .select(col("k").as("key"), col("n"),
        (col("n").cast("double") / col("n_total").cast("double")).as("share"))
  }
}
