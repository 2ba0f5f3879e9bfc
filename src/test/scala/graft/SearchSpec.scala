package graft

import graft.operators.Search
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("search-spec")
  override def afterAll(): Unit = spark.stop()

  private def docsDf(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private def tokenize(t: String): Seq[String] =
    t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq

  test("inverted index: exact tf/dl postings; case-insensitive") {
    val df = docsDf((1L, "The cat AND the dog"), (2L, "dog dog dog"), (3L, " "))
    val idx = Search.invertedIndex(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(idx(("the", 1L)) == ((2L, 5)))
    assert(idx(("cat", 1L)) == ((1L, 5)))
    assert(idx(("dog", 2L)) == ((3L, 3)))
    assert(!idx.keySet.exists(_._2 == 3L), "whitespace-only doc produced postings")
  }

  test("tf-idf: hand-computed weights; ubiquitous terms weigh zero") {
    val df = docsDf((1L, "cat dog"), (2L, "cat fish"), (3L, "cat cat bird"))
    val out = Search.tfIdf(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // "cat" is in all 3 docs: ln(3/3) = 0 regardless of tf
    assert(out((3L, "cat")) == ((2L, 3L, 0.0)))
    // "dog" in 1 of 3: tf=1 × ln(3). Spark's log is StrictMath-evaluated
    // and may differ from math.log in the final bit — tolerance, not
    // equality (the reason ln stays out of the SQL oracle).
    assert(out((1L, "dog"))._1 == 1L && out((1L, "dog"))._2 == 1L)
    assert(math.abs(out((1L, "dog"))._3 - math.log(3.0)) < 1e-14)
    assert(math.abs(out((3L, "bird"))._3 - math.log(3.0)) < 1e-14)
  }

  test("bm25: differential vs a naive in-memory replay, including ranks and ties") {
    val words = Vector("join", "hash", "scan", "vector", "stream", "filter",
      "batch", "merge", "sort", "spill")
    // deterministic synthetic corpus with repetition and varied lengths
    val corpus = (0L until 40L).map { i =>
      val n = 3 + (i % 7).toInt
      i -> (0 until n).map(j => words(((i * 13 + j * 7) % 10).toInt)).mkString(" ")
    }
    val queries = Seq(1L -> Seq("vector", "join"), 2L -> Seq("stream", "spill"),
      3L -> Seq("sort", "sort", "merge")) // duplicate term counts once
    val k1 = 1.5; val b = 0.75; val k = 5

    val got = Search.bm25TopK(docsDf(corpus: _*), col("doc_id"), col("text"),
        queries, k, k1, b, logIdf = true)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

    // naive replay from first principles
    val toks = corpus.map { case (id, t) => id -> tokenize(t) }
    val nDocs = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / nDocs
    val dfT = toks.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val expected = queries.flatMap { case (qid, terms) =>
      val scored = toks.map { case (id, ts) =>
        val dl = ts.size
        val s = terms.distinct.map { term =>
          val tf = ts.count(_ == term)
          if (tf == 0) 0.0
          else {
            val df = dfT(term).toDouble
            val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
            idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))
          }
        }.sum
        id -> s
      }.filter(_._2 > 0.0)
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, i + 1) -> ((id, s))
      }
    }.toMap
    assert(got.keySet == expected.keySet)
    for ((key, (id, s)) <- expected) {
      assert(got(key)._1 == id, s"doc mismatch at $key")
      assert(math.abs(got(key)._2 - s) < 1e-12, s"score mismatch at $key")
    }
  }

  test("a qid split across query entries does not double-count shared terms") {
    val df = docsDf((1L, "beta beta gamma"), (2L, "gamma delta"))
    val once = Search.bm25TopK(df, col("doc_id"), col("text"),
        Seq(7L -> Seq("beta", "gamma")), k = 5, logIdf = false)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val split = Search.bm25TopK(df, col("doc_id"), col("text"),
        Seq(7L -> Seq("beta"), 7L -> Seq("gamma", "beta")), k = 5, logIdf = false)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(split == once, "duplicate (qid, term) pairs must collapse")
  }

  test("bm25 ratio-idf face: zero-hit query absent; k bounds output") {
    val df = docsDf((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma delta"))
    val out = Search.bm25TopK(df, col("doc_id"), col("text"),
        Seq(7L -> Seq("beta"), 8L -> Seq("nosuchterm")), k = 1, logIdf = false)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(7L), "no-match query must emit nothing")
    assert(out.length == 1, "k=1 must cap each query's rows")
    assert(out.head.getDouble(3) > 0)
  }

  test("tf-idf cosine: naive replay agrees; twin docs hit cos 1; disjoint absent") {
    val df = docsDf(
      1L -> "cat dog fish cat",
      2L -> "cat dog fish cat",        // term-distribution twin of 1
      3L -> "dog fish bird",
      4L -> "zebra yak")               // shares no term with doc 1
    val qids = df.filter(col("doc_id") === 1L)
      .select(col("doc_id").as("id"))
    val got = Search.tfIdfCosineTopK(df, col("doc_id"), col("text"),
        qids, k = 4, logIdf = false)
      .collect().map(r => (r.getLong(2), r.getInt(1), r.getDouble(3)))
    // naive in-memory replay: w = tf * N/df over the same tokenization
    val texts = Map(1L -> "cat dog fish cat", 2L -> "cat dog fish cat",
      3L -> "dog fish bird", 4L -> "zebra yak")
    val n = texts.size.toDouble
    val tf = texts.map { case (id, t) =>
      id -> tokenize(t).groupBy(identity).map { case (w, xs) => w -> xs.size } }
    val dfT = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val vec = tf.map { case (id, m) =>
      id -> m.map { case (w, f) => w -> f * (n / dfT(w)) } }
    def cosine(a: Map[String, Double], b: Map[String, Double]): Double = {
      val shared = a.keySet.intersect(b.keySet).toSeq.sorted
      val dot = shared.map(w => a(w) * b(w)).sum
      dot / (math.sqrt(a.values.map(x => x * x).sum) *
        math.sqrt(b.values.map(x => x * x).sum))
    }
    val expect = Seq(2L, 3L).map(id => id -> cosine(vec(1L), vec(id))).toMap
    assert(got.length == 2, s"doc 4 shares no term, must be absent: ${got.toSeq}")
    got.foreach { case (id, _, cos) =>
      assert(math.abs(cos - expect(id)) < 1e-12, s"doc $id: $cos vs ${expect(id)}") }
    // the twin ranks first at cos ≈ 1 (identical distribution; the
    // dot/norm rounding keeps it a few ulps shy of exactly 1.0)
    val top = got.find(_._2 == 1).get
    assert(top._1 == 2L && top._3 > 1.0 - 1e-12, s"twin not top: $top")
  }

  test("rrfFuse: hand-computed fusion; consensus beats single-list; layout-exact") {
    import spark.implicits._
    def ranked(rows: (Long, Int, Long)*) =
      rows.toDF("qid", "rank", "doc_id")
    // q1: doc 10 is rank 2 in BOTH lists; docs 11/12 are rank 1 in one
    // list each and absent from the other — consensus must win under RRF
    val a = ranked((1L, 1, 11L), (1L, 2, 10L), (1L, 3, 13L))
    val b = ranked((1L, 1, 12L), (1L, 2, 10L), (1L, 3, 14L))
    val got = Search.rrfFuse(Seq(a, b), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    val byDoc = got.map(x => x._3 -> x).toMap
    assert(byDoc(10L)._2 == 1 && byDoc(10L)._5 == 2L, s"consensus lost: $got")
    assert(byDoc(10L)._4 == 1.0 / 62 + 1.0 / 62)
    assert(byDoc(11L)._4 == 1.0 / 61 && byDoc(11L)._5 == 1L)
    // rank-1-in-one (1/61) beats rank-3-in-one (1/63); doc_id tie-break
    // orders the two rank-1 singles
    assert(got.filter(_._1 == 1L).map(_._3).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    // k cuts the fused list, per qid
    val cut = Search.rrfFuse(Seq(a, b), k = 2).collect()
    assert(cut.length == 2 && cut.map(_.getLong(2)).toSet == Set(10L, 11L))
    // bit-exact under repartitioned inputs (fixed-order fold)
    val got2 = Search.rrfFuse(Seq(a.repartition(7), b.repartition(3)), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got2.sortBy(x => (x._1, x._2)) == got.sortBy(x => (x._1, x._2)).toSeq)
    // multi-query: fusion never crosses qids
    val c = ranked((1L, 1, 20L), (2L, 1, 30L))
    val d = ranked((2L, 1, 30L), (2L, 2, 20L))
    val multi = Search.rrfFuse(Seq(c, d), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(multi == Set((1L, 20L, 1L), (2L, 30L, 2L), (2L, 20L, 1L)))
  }
}
