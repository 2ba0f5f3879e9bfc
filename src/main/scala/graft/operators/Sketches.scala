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
}
