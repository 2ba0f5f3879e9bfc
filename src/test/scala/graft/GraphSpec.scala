package graft

import graft.operators.{Graph, SnapshotDiff}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("graph-spec")

  override def afterAll(): Unit = spark.stop()

  private def edgesDf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  /** Independent single-threaded model of the exact integer recurrence
    * pageRank declares — a differential oracle with no Spark in it. */
  private def modelPageRank(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = Graph.Scale / n
    val teleport = (15L * base) / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to iterations) {
      val contribs = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(v => v -> (teleport + 85L * contribs.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRank matches the independent integer model, bit for bit") {
    // A hub (0), a cycle (1→2→3→1), a dangling sink (4), an isolated
    // source feeding the hub (5→0).
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 0L))
    val got = Graph.pageRank(edgesDf(edges: _*), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === modelPageRank(edges, 4))
    // rank mass: every node got at least the teleport floor
    val teleport = (15L * (Graph.Scale / 6L)) / 100L
    assert(got.values.forall(_ >= teleport))
    // the cycle members fed by the hub outrank the dangling sink's feed
    assert(got(2L) > got(4L))
  }

  /** Independent model of the personalized recurrence: teleport only
    * at seeds, non-seeds start at 0. */
  private def modelPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iterations: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val inGraph = seeds.intersect(nodes.toSet)
    val base = Graph.Scale / inGraph.size
    val teleport = (15L * base) / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(v => v -> (if (inGraph(v)) base else 0L)).toMap
    for (_ <- 1 to iterations) {
      val contribs = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(v => v ->
        ((if (inGraph(v)) teleport else 0L) +
          85L * contribs.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  test("personalizedPageRank: independent model bit-for-bit; mass stays near seeds") {
    import spark.implicits._
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 0L))
    val got = Graph.personalizedPageRank(edgesDf(edges: _*),
        Seq(0L, 77L).toDF("node"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 77 is not in the graph — the model must divide mass by 1 seed
    assert(got === modelPpr(edges, Set(0L, 77L), 4))
    // seed holds teleport mass; node 5 (upstream of the seed, never
    // reached) holds exactly 0; downstream nodes hold positive rank
    assert(got(0L) > 0L && got(5L) == 0L && got(1L) > 0L && got(2L) > 0L)
    // all-absent seeds are a contract violation, not a silent zero
    val e = intercept[Exception] {
      Graph.personalizedPageRank(edgesDf(edges: _*),
        Seq(99L).toDF("node"), iterations = 2).collect()
    }
    assert(e.getMessage.contains("seed"))
  }

  /** Independent model of hits' integer propagate + L1-rescale. */
  private def modelHits(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, (Long, Long)] = {
    val de = edges.distinct
    val nodes = (de.map(_._1) ++ de.map(_._2)).distinct.sorted
    val s = Graph.HitsScale
    var hub = nodes.map(_ -> (s / nodes.size)).toMap
    var auth = nodes.map(_ -> 0L).toMap
    def step(in: Map[Long, Long], along: Seq[(Long, Long)]): Map[Long, Long] = {
      val raw = along.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => in(e._1)).sum }
      val tot = raw.values.sum
      nodes.map(v => v -> raw.getOrElse(v, 0L) * s / tot).toMap
    }
    for (_ <- 1 to iterations) {
      auth = step(hub, de)
      hub = step(auth, de.map(e => (e._2, e._1)))
    }
    nodes.map(v => v -> ((hub(v), auth(v)))).toMap
  }

  test("hits: independent integer model bit-for-bit; hub/authority split") {
    // 0 and 1 are directories pointing at content pages 2, 3, 4;
    // 4 also points back at directory 0
    val edges = Seq((0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (1L, 3L),
      (4L, 0L))
    val got = Graph.hits(edgesDf(edges: _*), iterations = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === modelHits(edges, 3))
    // the split: 0 is the best hub and a weak authority; 2/3 are pure
    // authorities (no out-edges -> hub exactly 0)
    assert(got(0L)._1 > got(2L)._1 && got(2L)._1 == 0L && got(3L)._1 == 0L)
    assert(got(2L)._2 > got(0L)._2 && got(2L)._2 > 0L)
    // duplicate edges collapse (the distinct contract)
    val dup = Graph.hits(edgesDf((edges ++ edges): _*), iterations = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(dup === got)
  }

  test("pageRank is deterministic across partitioning") {
    val edges = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12)).filter(e => e._1 != e._2)
    val a = Graph.pageRank(edgesDf(edges: _*).repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(edgesDf(edges: _*).repartition(13), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a === b)
  }

  test("orient canonicalizes, dedups, and drops self-loops") {
    val und = Graph.orient(edgesDf((1L, 2L), (2L, 1L), (3L, 3L), (2L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(und === Seq((1L, 2L), (2L, 5L)))
  }

  test("triangleCount: K4 has 4 triangles; direction and duplication don't matter") {
    // K4 with edges given in mixed directions, one duplicated
    val k4 = edgesDf((0L, 1L), (1L, 0L), (2L, 0L), (0L, 3L),
      (1L, 2L), (3L, 1L), (2L, 3L))
    assert(Graph.triangleCount(k4).collect().head.getLong(0) === 4L)
    // adding a pendant edge adds no triangle
    val k4p = edgesDf((0L, 1L), (1L, 0L), (2L, 0L), (0L, 3L),
      (1L, 2L), (3L, 1L), (2L, 3L), (3L, 9L))
    assert(Graph.triangleCount(k4p).collect().head.getLong(0) === 4L)
    // triangle-free graph counts zero
    assert(Graph.triangleCount(edgesDf((0L, 1L), (1L, 2L), (2L, 3L)))
      .collect().head.getLong(0) === 0L)
  }

  test("clusteringCoefficient: K4 is all 1.0; pendant and path nodes read right") {
    // K4 plus a pendant node 9 hanging off 3
    val g = edgesDf((0L, 1L), (1L, 0L), (2L, 0L), (0L, 3L),
      (1L, 2L), (3L, 1L), (2L, 3L), (3L, 9L))
    val lcc = Graph.clusteringCoefficient(g)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    // inside K4 every node closes 3 triangles; 0/1/2 have deg 3 →
    // lcc = 2·3/(3·2) = 1; node 3 has deg 4 (pendant) → 2·3/(4·3) = 0.5
    assert(lcc(0L) == ((3L, 3L, 1.0)) && lcc(1L) == ((3L, 3L, 1.0)) &&
      lcc(2L) == ((3L, 3L, 1.0)))
    assert(lcc(3L) == ((4L, 3L, 0.5)))
    // the pendant has deg 1 → null lcc, zero triangles
    assert(lcc(9L)._1 == 1L && lcc(9L)._2 == 0L && lcc(9L)._3.isNaN)
    // open path: middle node deg 2 but no closure → lcc 0.0 exactly
    val path = Graph.clusteringCoefficient(edgesDf((1L, 2L), (2L, 3L)))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(path(2L) == 0.0 && path(1L).isNaN)
  }

  test("adamicAdar: hand wedge, existing edges excluded, hub fail-fast") {
    // 1-3, 2-3, 1-4, 2-4: pair (1,2) shares centers {3,4}, both deg 2
    // → AA = 2/ln 2; pair (3,4) shares {1,2} the same way. No edge
    // between 1-2 or 3-4, so both pairs are candidates.
    val g = edgesDf((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    val aa = Graph.adamicAdar(g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val twoOverLn2 = (1.0 / math.log(2.0)) + (1.0 / math.log(2.0))
    assert(aa((1L, 2L)) == ((2L, twoOverLn2)))
    assert(aa((3L, 4L)) == ((2L, twoOverLn2)))
    assert(aa.size == 2)
    // connect 1-2: the pair leaves the candidate set
    val g2 = edgesDf((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (1L, 2L))
    val aa2 = Graph.adamicAdar(g2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!aa2.contains((1L, 2L)))
    // triangle: every pair adjacent → no candidates at all
    assert(Graph.adamicAdar(edgesDf((1L, 2L), (2L, 3L), (1L, 3L)))
      .collect().isEmpty)
    // hub over maxDegree raises instead of going quadratic silently
    val hub = edgesDf((0L to 5L).map(i => (100L, i)): _*)
    val err = intercept[Exception] {
      Graph.adamicAdar(hub, maxDegree = 4).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("maxDegree"))
  }

  test("bfsLayers: min-hop labels, seed restriction, depth cutoff") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a shortcut 1-4: node 4 must read hop 2 (via
    // the shortcut), NOT 3 (via the path) — the min-hop guarantee
    val g = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val out = Graph.bfsLayers(g, Seq(1L).toDF("node"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // depth cutoff: maxDepth 1 keeps only the seed and its neighbors
    val shallow = Graph.bfsLayers(g, Seq(1L).toDF("node"), maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shallow == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    // seeds not present in the graph contribute nothing; disconnected
    // components stay unreached
    val two = edgesDf((1L, 2L), (8L, 9L))
    val r = Graph.bfsLayers(two, Seq(1L, 77L).toDF("node"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L))
  }

  test("kcorePeel: pendant chain peels, clique survives, bounded rounds visible") {
    import spark.implicits._
    // K4 on 0-3 with a pendant chain 3-10-11
    val g = edgesDf((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 10L), (10L, 11L))
    val core = Graph.kcorePeel(g, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain gone in two rounds; K4 intact with residual degree 3
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k above the clique's connectivity empties the graph
    assert(Graph.kcorePeel(g, k = 4, rounds = 4).collect().isEmpty)
    // bounded rounds: one round only strips the outermost layer —
    // node 11 goes (deg 1), node 10 survives round 1 with its (now
    // residual-1) edge to 3, visible as degree < k in the output
    val partial = Graph.kcorePeel(g, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial(10L) == 1L && !partial.contains(11L))
    // layout invariance is bitwise (exact counts only)
    val shuffled = Graph.kcorePeel(
      edgesDf((2L, 3L), (10L, 11L), (1L, 3L), (0L, 1L), (3L, 10L),
        (0L, 2L), (1L, 2L), (0L, 3L)).repartition(5), k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled == core)
  }

  test("degrees covers source-only and sink-only nodes with zero fill") {
    val d = Graph.degrees(edgesDf((1L, 2L), (1L, 3L), (2L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(d === Seq((1L, 2L, 0L, 2L), (2L, 1L, 1L, 2L), (3L, 0L, 2L, 2L)))
  }

  private def snap(rows: (Long, java.lang.Double, String)*) = {
    import spark.implicits._
    rows.map { case (k, v, s) => (k, Option(v).map(_.doubleValue), s) }
      .toDF("k", "v", "tag")
  }

  test("snapshot diff classifies all four statuses, null-safe") {
    val old = snap((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, null, "a"), (4L, 4.0, "a"))
    val neu = snap((1L, 1.0, "a"), (2L, 9.0, "a"), (3L, null, "a"), (5L, 5.0, "a"))
    val got = SnapshotDiff.rowStatus(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null <=> null: not a change
      4L -> "removed", 5L -> "added"))
    // null → value counts as changed
    val g2 = SnapshotDiff.rowStatus(snap((7L, null, "a")), snap((7L, 1.0, "a")),
      Seq("k"), Seq("v")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g2 === Map(7L -> "changed"))
  }

  test("snapshot diff ignores columns outside the compare set") {
    val old = snap((1L, 1.0, "x"))
    val neu = snap((1L, 1.0, "y"))
    val got = SnapshotDiff.rowStatus(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(1))
    assert(got === Array("unchanged"))
  }

  test("digest variant agrees with the column-compare variant") {
    val old = snap((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c"), (4L, null, "d"))
    val neu = snap((1L, 1.0, "a"), (2L, 2.5, "b"), (3L, 3.0, "zz"), (4L, null, "d"))
    val cols = SnapshotDiff.rowStatus(old, neu, Seq("k"), Seq("v", "tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dig = SnapshotDiff.rowStatusDigest(old, neu, Seq("k"), Seq("v", "tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dig === cols)
    assert(cols(2L) === "changed" && cols(3L) === "changed" && cols(1L) === "unchanged")
  }

  test("registered graph queries run and have stable shapes on testdata") {
    val dir = "/root/testdata/sf0.001"
    val pr = graft.queries.GraphInfra.gPagerankHosts(spark, dir).collect()
    assert(pr.nonEmpty && pr.length <= 60)
    // total fixed-point mass stays within [teleport floor, Scale]
    val total = pr.map(_.getLong(1)).sum
    assert(total > 0L && total <= Graph.Scale)
    // the md5-mixed fixture must actually spread rank — a uniform rank
    // vector means the graph degenerated to a permutation again (the
    // affine-fixture bug this fixture replaced)
    assert(pr.map(_.getLong(1)).distinct.length > 1,
      "PageRank is uniform — host graph is degenerate")
    val tri = graft.queries.GraphInfra.gTriangleCount(spark, dir).collect()
    assert(tri.head.getLong(0) > 0L,
      "zero triangles — host graph is degenerate")
    val diff = graft.queries.GraphInfra.lSnapshotDiff(spark, dir).collect()
    val statuses = diff.map(_.getString(0)).toSet
    assert(statuses.contains("unchanged") && statuses.subsetOf(
      Set("added", "removed", "changed", "unchanged")))
  }

  test("labelPropagation: two cliques resolve to their min labels; deterministic and layout-invariant") {
    import spark.implicits._
    // two 5-cliques {0..4} and {10..14} joined by one bridge 4-10
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns; if a < b) yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) ++ Seq((4L, 10L)))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each clique every node sees the same neighbor-label
    // multiset after round 1, so both cliques stabilize on label 0
    // resp. 10; the bridge does not flip the far clique
    assert((0L to 4L).forall(n => out(n) == 0L), s"left clique: $out")
    assert((10L to 14L).forall(n => out(n) == 10L), s"right clique: $out")
    // deterministic under repartition
    val out2 = Graph.labelPropagation(edges.repartition(7), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
    // isolated pair keeps swapping? no - min-label tie-break pins the
    // 2-cycle: both adopt the smaller node's label and stay
    val pair = Seq((100L, 101L)).toDF("src", "dst")
    val p2 = Graph.labelPropagation(pair, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p2 == Map(100L -> 101L, 101L -> 100L) ||
      p2 == Map(100L -> 100L, 101L -> 100L),
      s"pair behavior changed: $p2")
  }
}
