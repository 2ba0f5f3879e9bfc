package graft

import graft.core.VariantCaller
import graft.operators.{Dedup, Filters, Merge, Quality, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Generative invariants (SURVEY.md §5.3) over seeded random inputs. */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("property-spec")

  override def afterAll(): Unit = spark.stop()

  private val AAs = "ACDEFGHIKLMNPQRSTVWY"

  private def randomAligned(rng: Random, len: Int): (String, String) = {
    // build an alignment column by column: match / sub / del / ins / double-gap
    val ref = new StringBuilder; val seq = new StringBuilder
    var refResidues = 0
    while (ref.length < len) {
      val aa = AAs(rng.nextInt(AAs.length))
      rng.nextInt(10) match {
        case 0 => ref += aa; seq += '-' // deletion column
        case 1 if refResidues > 0 => ref += '-'; seq += aa // insertion column
        case 2 => ref += aa; seq += AAs(rng.nextInt(AAs.length)) // sub or match
        case _ => ref += aa; seq += aa
      }
      if (ref.last != '-') refResidues += 1
    }
    (ref.toString, seq.toString)
  }

  test("identity alignment emits zero events (1000 random refs)") {
    val rng = new Random(1)
    for (_ <- 0 until 1000) {
      val ref = Seq.fill(20 + rng.nextInt(60))(AAs(rng.nextInt(20))).mkString
      val idx = VariantCaller.referencePosition(ref)
      assert(VariantCaller.callVariants(ref, idx, "c", 1, ref).isEmpty)
    }
  }

  test("events are ordered, non-overlapping, within bounds (2000 random rows)") {
    val rng = new Random(2)
    for (_ <- 0 until 2000) {
      val (ref, seq) = randomAligned(rng, 30 + rng.nextInt(70))
      val idx = VariantCaller.referencePosition(ref)
      val refLen = ref.count(_ != '-')
      val events = VariantCaller.callVariants(ref, idx, "c", 1, seq)
      var lastEnd = 0
      for (e <- events) {
        assert(e.msaStart >= 1 && e.msaStart <= ref.length)
        assert(e.msaEnd.forall(en => en >= e.msaStart && en <= ref.length))
        assert(e.msaStart > lastEnd, s"overlap at ${e.code} in\n$ref\n$seq")
        lastEnd = e.msaEnd.getOrElse(e.msaStart)
        assert(e.refStart.forall(r => r >= 1 && r <= refLen))
        assert(e.refEnd.forall(r => r >= 1 && r <= refLen))
      }
    }
  }

  test("dedup conservation: cluster sizes sum to input rows (random corpora)") {
    import spark.implicits._
    val rng = new Random(3)
    for (_ <- 0 until 3) {
      val n = 200 + rng.nextInt(200)
      val docs = (0 until n).map(i =>
        (i.toLong, s"doc content ${rng.nextInt(50)}")).toDF("id", "text")
      val total = Dedup.exactClusters(docs, col("id"), col("text"))
        .agg(sum("cluster_size")).head().getLong(0)
      assert(total == n)
      val survivors = Dedup.exactSurvivors(docs, col("id"), col("text")).count()
      val distinct = docs.select("text").distinct().count()
      assert(survivors == distinct)
    }
  }

  test("histogram totality: every in-range value lands in exactly one bin") {
    import spark.implicits._
    val edges = Seq(0.0, 10.0, 25.0, 50.0)
    val vals = (-5 until 120).map(_.toDouble).toDF("v")
    val labeled = vals.withColumn("bin", Filters.histogramBin(col("v"), edges))
    // below first edge → null; [0,50] → a bin; >50 → overflow
    assert(labeled.filter(col("v") < 0 && col("bin").isNotNull).count() == 0)
    assert(labeled.filter(col("v") >= 0 && col("bin").isNull).count() == 0)
    val inBand = labeled.filter(col("v") >= 0 && col("v") <= 50)
      .groupBy("bin").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inBand.keySet == Set("0 to 10", "10 to 25", "25 to 50"))
    assert(inBand.values.sum == 51)
    assert(labeled.filter(col("v") > 50)
      .select(collect_set(col("bin"))).head().getSeq[String](0) == Seq("Greater than 50"))
  }

  test("weekStart is always the preceding (or same) Sunday") {
    import spark.implicits._
    val days = (0 until 400).map(i => s"2023-06-${"%02d".format(1 + i % 28)}")
      .toDF("d").withColumn("d", to_date(col("d")))
      .withColumn("w", TimeSeries.weekStart(col("d")))
    val bad = days.filter(
      dayofweek(col("w")) =!= 1 || col("w") > col("d") ||
        datediff(col("d"), col("w")) > 6).count()
    assert(bad == 0)
  }

  test("jaccard ∈ [0,1] and is symmetric") {
    import spark.implicits._
    val rng = new Random(4)
    val rows = (0 until 300).map { _ =>
      def set() = (0 until 3 + rng.nextInt(8)).map(_ => s"w${rng.nextInt(12)}").distinct
      (set(), set())
    }.toDF("a", "b")
    val out = rows.select(Dedup.jaccard(col("a"), col("b")).as("ab"),
      Dedup.jaccard(col("b"), col("a")).as("ba")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("chunking totality: non-overlap parts reconstruct every document (300 random docs)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rng = new Random(6)
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(120))(s"t${rng.nextInt(50)}").mkString(" "))
    }
    val maxTokens = 16; val overlap = 5; val step = maxTokens - overlap
    val chunks = TextAnalysis.chunkByTokens(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), maxTokens, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val cs = chunks(id)
      // dropping each chunk's overlapping prefix (except the first)
      // re-concatenates to exactly the original token stream
      val rebuilt = (cs.head +: cs.tail.map(_.split(" ").filter(_.nonEmpty)
        .drop(overlap).mkString(" "))).filter(_.nonEmpty).flatMap(_.split(" "))
      // every chunk except the last is full-size... only when the doc has
      // enough tokens; the invariant that matters is exact reconstruction
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id reconstruction")
      val starts = cs.indices.map(_ * step)
      assert(starts.forall(st => st == 0 || st < toks.length),
        s"doc $id: chunk start beyond text")
    }
  }

  test("hashSplit totality + stability; repetition fractions bounded (random corpora)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rng = new Random(7)
    val docs = (1 to 400).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(60))(s"t${rng.nextInt(8)}").mkString(" "))
    }.toDF("doc_id", "text")
    val labels = docs.select(TextAnalysis.hashSplit(col("doc_id"),
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)).as("s"))
      .collect().map(_.getString(0))
    assert(labels.forall(Set("a", "b", "c").contains)) // total: no row unlabeled
    val reps = TextAnalysis.repetitionStats(docs, col("doc_id"), col("text"))
      .collect()
    assert(reps.length == 400)
    reps.foreach { r =>
      val (tf, dlf) = (r.getDouble(3), r.getDouble(5))
      assert(tf >= 0.0 && tf <= 1.0, s"top-ngram fraction $tf out of [0,1]")
      assert(dlf >= 0.0 && dlf <= 1.0, s"dup-line fraction $dlf out of [0,1]")
    }
  }

  test("vector dot matches an exact reference on random float vectors") {
    import spark.implicits._
    val rng = new Random(5)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(32)(rng.nextFloat() * 2 - 1)
      val b = Seq.fill(32)(rng.nextFloat() * 2 - 1)
      val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble }
      (a, b, expected)
    }
    val df = rows.toDF("a", "b", "expected")
    val bad = df.withColumn("got",
        graft.operators.Similarity.dot(col("a"), col("b")))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("packing invariants hold for random token counts (zeros, oversized, any partitioning)") {
    import spark.implicits._
    val rng = new Random(7)
    for (trial <- 0 until 5) {
      val budget = 64 + rng.nextInt(512)
      val n = 200 + rng.nextInt(800)
      // zeros, ordinary, and oversized-by-2x documents all mixed in
      val data = (0L until n.toLong).map { i =>
        (i, rng.nextInt(10) match {
          case 0 => 0
          case 1 => budget + rng.nextInt(budget)
          case _ => 1 + rng.nextInt(budget / 2)
        })
      }
      val parts = 1 + rng.nextInt(8)
      val out = graft.operators.Curation.packSequences(
          data.toDF("doc_id", "n_tokens"), col("doc_id"), col("n_tokens"),
          budget, numPartitions = parts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      // every doc exactly once
      assert(out.map(_._1).sorted.toSeq == (0L until n.toLong),
        s"trial $trial: lost or duplicated docs")
      // no pack exceeds the budget unless it holds a single oversized doc
      out.groupBy(_._3).foreach { case (pack, docs) =>
        val tot = docs.map(_._2.toLong).sum
        assert(tot <= budget || docs.count(_._2 > 0) == 1,
          s"trial $trial pack $pack: $tot > $budget with ${docs.length} docs")
      }
      // packs are contiguous id ranges within a partition slice: ids in one
      // pack are never interleaved with ids of another pack of the SAME
      // partition (greedy scans in id order)
      out.groupBy(_._3.split("_")(0)).foreach { case (_, slice) =>
        val byPack = slice.sortBy(_._1).map(_._3)
        val firstSeen = scala.collection.mutable.LinkedHashSet[String]()
        byPack.foreach(firstSeen.add)
        val expected = firstSeen.toSeq.flatMap(p => byPack.filter(_ == p))
        assert(byPack.toSeq == expected, "packs interleave within a partition")
      }
    }
  }

  /** Brute-force union-find oracle for connectedComponents. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: 50-node path graph collapses exactly (adversarial diameter)") {
    import spark.implicits._
    // Worst case for min-label propagation (50 rounds); star contraction
    // must return the EXACT component in O(log n) rounds — and must never
    // silently truncate (it throws instead).
    val pairs = (1L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // threshold 0 forces the distributed contraction — the path this test
    // is adversarial FOR (the default routes 49 edges to the driver)
    val cc = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.keySet == (1L to 50L).toSet, "every path node labeled")
    assert(cc.values.forall(_ == 1L), s"non-min labels: ${cc.filter(_._2 != 1L)}")
  }

  test("connectedComponents matches union-find on random graphs (10 trials)") {
    import spark.implicits._
    val rng = new Random(11)
    for (trial <- 0 until 10) {
      val n = 20 + rng.nextInt(60)
      val m = 1 + rng.nextInt(2 * n)
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expect = unionFind(edges)
        // BOTH execution paths must match the oracle: the driver-side
        // union-find (default threshold) and the distributed contraction
        val small = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
            smallGraphThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(small == expect, s"trial $trial (driver path): $small vs $expect")
        assert(dist == expect, s"trial $trial (distributed path): $dist vs $expect")
      }
    }
  }

  test("semanticAssign: lossless partition, bounded clusters, deterministic (random skews)") {
    import spark.implicits._
    import graft.operators.Similarity
    for (seed <- Seq(3, 7, 19)) {
      val rng = new Random(seed)
      val n = 120 + rng.nextInt(120)
      val dim = 4 + rng.nextInt(5)
      // 1–3 blobs with random (often extreme) weights — the skew shapes
      // flat assignment funnels into one oversized cluster
      val nBlobs = 1 + rng.nextInt(3)
      val centers = Seq.fill(nBlobs)(Seq.fill(dim)(rng.nextGaussian() * 6))
      val rows = (0L until n.toLong).map { i =>
        val c = centers(if (rng.nextInt(10) < 8) 0 else rng.nextInt(nBlobs))
        (i, c.map(x => (x + rng.nextGaussian()).toFloat))
      }
      val df = rows.toDF("vec_id", "embedding")
      val cents = Similarity.trainCentroids(df, k = 2, iters = 1)
      val bound = math.max(20L, n / 3L)
      def assign() = Similarity.semanticAssign(df, cents,
          maxClusterRows = bound, maxSplitDepth = 5)
        .select(col("vec_id"), col("cluster")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val a = assign()
      assert(a.keySet == rows.map(_._1).toSet,
        s"seed $seed: splitting lost or duplicated rows")
      val sizes = a.values.groupBy(identity).map(_._2.size)
      assert(sizes.forall(_ <= bound),
        s"seed $seed: final cluster over bound ${sizes.max} > $bound")
      assert(assign() == a, s"seed $seed: assignment not deterministic")
    }
  }

  test("compactState never changes incrementalDedup keep-decisions (random dup corpora)") {
    import spark.implicits._
    def text(rng: Random, id: Int): String =
      (0 until 25).map(i => s"t${id}w${(i * 11 + id) % 17}n$i").mkString(" ")
    for (seed <- Seq(5, 13)) {
      val rng = new Random(seed)
      val nDistinct = 20 + rng.nextInt(20)
      val texts = (0 until nDistinct).map(i => text(rng, i + seed * 1000))
      // raw corpus: each text appears 1–3 times under distinct ids
      val raw = texts.zipWithIndex.flatMap { case (t, i) =>
        (0 until 1 + rng.nextInt(3)).map(c => ((c * 10000 + i).toLong, t))
      }
      val rawState = Dedup.corpusState(raw.toDF("doc_id", "text"),
        col("doc_id"), col("text")).cache()
      val compacted = Dedup.compactState(rawState).cache()
      assert(compacted.count() == nDistinct,
        s"seed $seed: compaction must keep one row per distinct text")
      // batch: fresh texts + exact state copies + near copies + in-batch dup
      val fresh = (0 until 5).map(i => text(rng, 90000 + i + seed))
      val batch = (
        fresh.zipWithIndex.map { case (t, i) => ((500 + i).toLong, t) } ++
        Seq((600L, texts(rng.nextInt(nDistinct))),
            (601L, texts(rng.nextInt(nDistinct)) + " tail"),
            (602L, fresh.head))
      ).toDF("doc_id", "text")
      def kept(state: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalDedup(batch, col("doc_id"), col("text"), state)
          .kept.collect().map(_.getLong(0)).toSet
      val (kr, kc) = (kept(rawState), kept(compacted))
      assert(kr == kc, s"seed $seed: decisions diverged — raw $kr vs compact $kc")
      rawState.unpersist(); compacted.unpersist(): Unit
    }
  }

  test("canonicalUrl is idempotent and authority-case-insensitive (random URLs)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val r = new Random(61)
    val schemes = Seq("http", "HTTP", "https", "HTTPS")
    val hosts = Seq("Site.com", "a.b.co", "WWW.X.ORG", "h-1.net")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/A/b", "/x/", "/p.html", "/d//", "//")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?utm_source=t&a=1", "?ref=x")
    val frags = Seq("", "#f", "#Sec2")
    val urls = (0 until 300).map { _ =>
      schemes(r.nextInt(4)) + "://" + hosts(r.nextInt(4)) +
        ports(r.nextInt(4)) + paths(r.nextInt(5)) +
        queries(r.nextInt(5)) + frags(r.nextInt(3))
    }
    val once = urls.toDF("u")
      .select(col("u"), TextAnalysis.canonicalUrl(col("u")).as("c1"))
      .withColumn("c2", TextAnalysis.canonicalUrl(col("c1")))
      .collect()
    once.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"not idempotent: ${row.getString(0)} -> ${row.getString(1)} -> ${row.getString(2)}")
      // canonical form never keeps fragments, tracking params, or
      // uppercase authority (scheme://host[:port] = everything before
      // the first path slash after the scheme separator)
      val c = row.getString(1)
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("ref="))
      val pathStart = c.indexOf('/', c.indexOf("://") + 3)
      val auth = if (pathStart < 0) c else c.take(pathStart)
      assert(auth == auth.toLowerCase, s"authority not lowercased: $c")
    }
    // same page under different authority casing collides
    val pairs = (0 until 100).map { i =>
      val h = hosts(i % 4); val tail = paths(i % 5) + queries(i % 5)
      (s"http://${h.toUpperCase}$tail", s"http://${h.toLowerCase}$tail")
    }
    val collided = pairs.toDF("a", "b")
      .select(TextAnalysis.canonicalUrl(col("a")).as("ca"),
        TextAnalysis.canonicalUrl(col("b")).as("cb"))
      .collect()
    collided.foreach(r2 => assert(r2.getString(0) == r2.getString(1)))
  }

  test("count-min never undercounts under random corpora, widths, and splits") {
    import spark.implicits._
    import graft.operators.Sketches
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val keys = (0 until 2000).map(_ => s"k${r.nextInt(1 + r.nextInt(200))}")
      val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val depth = 1 + r.nextInt(4)
      val width = 4 + r.nextInt(64)
      val cms = Sketches.countMinSketch(keys.toDF("k"), col("k"), depth, width)
      val est = cms.estimate(exact.keys.toSeq.toDF("k"), col("k"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"seed $seed d=$depth w=$width: $k ${est(k)} < $n") }
      // arbitrary split merges to the identical counter table
      val cut = r.nextInt(keys.size)
      val merged = Sketches.countMinSketch(keys.take(cut).toDF("k"), col("k"), depth, width)
        .merge(Sketches.countMinSketch(keys.drop(cut).toDF("k"), col("k"), depth, width))
      val a = merged.counters.collect()
        .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
      val b = cms.counters.collect()
        .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(a == b, s"seed $seed: split-merge diverged from whole")
    }
  }

  test("containmentPairs equals brute-force containment (random corpora with plants)") {
    import spark.implicits._
    for (seed <- 1 to 2) {
      val r = new Random(seed)
      def words(n: Int) = Seq.fill(n)(s"w${r.nextInt(60)}").mkString(" ")
      val base = (0L until 30L).map(i => (i, words(8 + r.nextInt(30))))
      // plant containers: doc i's text embedded in filler
      val planted = base.take(8).map { case (i, t) =>
        (i + 1000L, words(5) + " " + t + " " + words(5)) }
      val corpus = base ++ planted
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"),
          col("doc_id"), col("text"), shingleK = 3, minContainment = 0.9,
          maxDf = 40)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      // brute force over normalized shingle sets
      def shingles(t: String): Set[String] = {
        val toks = t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
          .trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size < 3) Set(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sh = corpus.map { case (i, t) => i -> shingles(t) }.toMap
      val want = (for {
        a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
        inter = sh(a).intersect(sh(b)).size.toDouble
        if inter / sh(a).size >= 0.9 || inter / sh(b).size >= 0.9
      } yield (a, b)).toSet
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("CDC fold differential: applyChanges over random batches == Map model") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(100 + seed)
      var model = Map.empty[Long, (String, Double)]
      var snapshot = Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
      for (_ <- 0 until 4) {
        // random compacted batch: one op per key
        val keys = r.shuffle((0L until 40L).toList).take(10 + r.nextInt(10))
        val batch = keys.map { k =>
          val roll = r.nextInt(3)
          val op = if (roll == 0) "D" else if (roll == 1) "I" else "U"
          (k, op, s"n${r.nextInt(99)}", r.nextInt(1000).toDouble)
        }
        model = batch.foldLeft(model) {
          case (m, (k, "D", _, _)) => m - k
          case (m, (k, _, n, v)) => m + (k -> (n, v))
        }
        snapshot = Merge.applyChanges(snapshot,
          batch.toDF("k", "op", "name", "v"), Seq("k"),
          broadcastChanges = r.nextBoolean())
        val got = snapshot.collect()
          .map(x => x.getLong(0) -> (x.getString(1), x.getDouble(2))).toMap
        assert(got == model, s"seed $seed diverged from the Map model")
      }
    }
  }

  test("quality report differential: violation counts == hand counts (random dirt)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(200 + seed)
      val rows = (0 until 300).map { i =>
        val id: java.lang.Long = if (r.nextInt(10) == 0) null
          else java.lang.Long.valueOf(r.nextInt(120).toLong)
        val status = if (r.nextInt(12) == 0) null
          else Seq("ok", "warn", "junk")(r.nextInt(3))
        val v = r.nextInt(200).toDouble
        (id, status, v)
      }
      val df = rows.toDF("id", "status", "v")
      val m = Quality.report(df, Seq(
          Quality.NotNull("id"),
          Quality.InRange("v", 10.0, 150.0),
          Quality.InSet("status", Seq("ok", "warn")),
          Quality.Unique(Seq("id"))))
        .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
      assert(m("not_null(id)") == rows.count(_._1 == null))
      assert(m("in_range(v,10.0,150.0)") ==
        rows.count(x => x._3 < 10.0 || x._3 > 150.0))
      assert(m("in_set(status)") == rows.count(x =>
        x._2 != null && x._2 == "junk"))
      // SQL semantics: null keys are exempt from uniqueness (Quality
      // mirrors COUNT(DISTINCT), which skips nulls)
      val nonNullIds = rows.map(_._1).filter(_ != null)
      assert(m("unique(id)") == nonNullIds.size - nonNullIds.distinct.size)
    }
  }

  test("funnel invariants: counts non-increasing, conversions in [0,1], times ordered") {
    import spark.implicits._
    val rng = new Random(606)
    val types = Seq("view", "click", "purchase", "error")
    for (_ <- 0 until 3) {
      val rows = (0 until 3000).map { i =>
        ((rng.nextInt(80)).toLong,
          new java.sql.Timestamp(1600000000000L + rng.nextInt(1000000) * 1000L),
          types(rng.nextInt(types.size)))
      }
      val ev = rows.toDF("user_id", "ts", "event_type")
      val steps = Seq("view", "click", "purchase")
      val sum = graft.operators.Sessions.funnelSummary(ev, col("user_id"),
          col("ts"), col("event_type"), steps)
        .collect().map(r => (r.getLong(2), r.getDouble(3)))
      assert(sum.map(_._1).sliding(2).forall(p => p(0) >= p(1)),
        s"step counts must be non-increasing: ${sum.toSeq}")
      assert(sum.forall { case (_, c) => c >= 0.0 && c <= 1.0 })
      // per-user step times are non-decreasing where present, and a null
      // step forces every later step null
      val times = graft.operators.Sessions.funnelStepTimes(ev,
          col("user_id"), col("ts"), col("event_type"), steps)
        .collect().map(r => (0 to 2).map(i => Option(r.getTimestamp(i + 1))))
      times.foreach { ts =>
        val present = ts.flatten
        assert(present.sliding(2).forall(p =>
          p.size < 2 || !p(1).before(p(0))), s"unordered step times: $ts")
        val firstNull = ts.indexWhere(_.isEmpty)
        if (firstNull >= 0)
          assert(ts.drop(firstNull).forall(_.isEmpty),
            s"null step must null every later step: $ts")
      }
    }
  }

  test("weighted sampling is coordinated: dropping non-sampled rows never changes it") {
    import spark.implicits._
    val rng = new Random(707)
    val rows = (0L until 2000L)
      .map(i => (i, s"s${i % 4}", 1.0 + rng.nextInt(50)))
    val df = rows.toDF("id", "stratum", "w")
    val sample = graft.operators.Curation.weightedPrioritySample(df,
        col("id"), col("stratum"), col("w"), n = 30)
      .select("id").collect().map(_.getLong(0)).toSet
    // priorities are pure per-row functions and selection is bottom-k, so
    // removing rows OUTSIDE the sample cannot change the sample — the
    // composability that lets a distributed bottom-k (or a pre-filtered
    // re-run) agree with the global answer
    val survivors = rows.filter(r =>
      sample.contains(r._1) || rng.nextInt(3) > 0)
    val again = graft.operators.Curation.weightedPrioritySample(
        survivors.toDF("id", "stratum", "w"),
        col("id"), col("stratum"), col("w"), n = 30)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == sample)
  }
}
