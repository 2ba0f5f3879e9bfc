package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl/corpus curation: fixed-point PageRank
  * and degree-ordered triangle counting.
  *
  * The reference pipeline weights sources by cluster prevalence when it
  * ranks variant tables (`/root/reference/Plotting_Functions.py:700–713`
  * row-sum ordering); at web-corpus scale the analogous quality prior is
  * link-graph centrality over the host graph (the classic crawl-quality
  * signal used by corpus-curation pipelines). Both operators here are
  * engine-portable by construction so a DuckDB oracle can mirror them
  * bit for bit:
  *
  *  - PageRank runs in SCALED INTEGER arithmetic (ranks are BIGINTs in
  *    units of 1e-12): every step is integer multiply / integer floor-div,
  *    which both engines evaluate identically — no float accumulation
  *    order to diverge on. A float PageRank would hash-mismatch across
  *    engines on summation order alone.
  *  - Triangle counting canonicalizes edges to `u < v` first (the
  *    degree-ordered / oriented-edge trick): each triangle is generated
  *    exactly once as a < b < c, and a high-degree hub only ever expands
  *    pairs on its ORIENTED (smaller) side rather than its full adjacency.
  *
  * Scale posture (100 TB / 1e9-node graphs):
  *  - Each PageRank iteration is one shuffle-join of `rank ⋈ edges` on
  *    `src` plus one aggregation on `dst` — the textbook distributed
  *    PageRank plan. Edges are projected to `(src, dst)` longs before the
  *    loop, so the shuffle carries 16 bytes/edge regardless of upstream
  *    payload width. `outdeg` is folded into the edge relation once,
  *    up front, so the per-iteration join is binary, not ternary.
  *  - The iteration count is a small constant (the caller's `iterations`);
  *    plans unroll K joins rather than driver-looping over actions, so
  *    AQE still sees one job per materialization.
  *  - Triangle counting shuffles the oriented edge list twice (once per
  *    join). Orientation bounds the expansion per node by its FORWARD
  *    degree, which for power-law graphs is the standard mitigation that
  *    keeps the hub's task from going quadratic.
  */
object Graph {

  /** Ranks are integers in units of 1e-12 (so total mass ≈ SCALE). */
  val Scale: Long = 1000000000000L

  /** Fixed-point PageRank with damping 0.85 over directed `edges`
    * (`src: long, dst: long`). Returns `(node, rank)` with rank a BIGINT
    * in units of 1e-12.
    *
    * Arithmetic contract (mirrored literally by the DuckDB oracle):
    * `base = Scale div N`; each iteration
    * `rank'(v) = (15*base) div 100 + (85 * Σ_{u→v} (rank(u) div outdeg(u))) div 100`.
    * Dangling-node mass leaks (no redistribution) — deliberate, so the
    * recurrence stays a pure integer fold both engines agree on.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               materialize: Boolean = true): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    // The K iterations unroll into ONE plan in which the loop-invariant
    // relations appear at every level — without a lineage cut, the edge
    // derivation (often a join/parse pipeline upstream) re-executes K
    // times inside the final job. localCheckpoint materializes each
    // invariant once and truncates its lineage: the EDGE relation first
    // (so nodes/withDeg below derive from the materialized 16-byte rows,
    // not the upstream pipeline), then the two derived relations that
    // each iteration joins. Blocks are freed by the ContextCleaner when
    // the result frame is dropped. Caveat, deliberate: localCheckpoint
    // blocks are executor-local and unreplicated — an executor loss
    // mid-computation fails the job instead of recomputing (rerun it);
    // that trade buys not re-executing the edge pipeline K times, the
    // standard iterative-algorithm bargain. `materialize = false` opts
    // out (single-iteration or plan-inspection uses — the dumped plan
    // then shows the real scans instead of checkpointed RDDs).
    // eager = false: the cut happens when the FIRST ACTION runs, not at
    // DataFrame construction — merely building the query (plan dumps,
    // schema inspection, registry iteration) must not launch Spark jobs.
    def cut(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(eager = false) else df
    val e = cut(edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull))
    val nodes = cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    // Scalar cardinality for the teleport term. The node set is the graph
    // dimension (hosts, not documents) — counting it is a tiny aggregate,
    // not a data-sized collect.
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val base = Scale / n
    val teleport = (15L * base) / 100L
    // Fold outdeg into the edge relation once so each iteration joins two
    // relations, not three.
    val withDeg = cut(e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src")))
    var rank = nodes.withColumn("rank", lit(base))
    for (_ <- 1 to iterations) {
      val contribs = withDeg.join(rank, withDeg("src") === rank("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      rank = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"85 * coalesce(s, 0L) div 100")).as("rank"))
    }
    rank
  }

  /** Canonical undirected edge list: distinct `(u, v)` with `u < v`,
    * self-loops dropped. The orientation is what makes triangle counting
    * hub-safe and once-per-triangle. */
  def orient(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") < col("v"))
      .distinct()

  /** Total triangle count via the oriented two-join plan: wedges
    * (a<b)·(b<c) closed by the (a,c) edge. Each triangle a<b<c is
    * produced exactly once. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = orient(edges)
    val e1 = und.as("e1")
    val e2 = und.as("e2")
    val e3 = und.as("e3")
    e1.join(e2, col("e2.u") === col("e1.v"))
      .join(e3, col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node degree profile over the directed edge list: out-degree,
    * in-degree, and total, one row per node appearing anywhere. */
  def degrees(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("total_deg", col("out_deg") + col("in_deg"))
  }
}
