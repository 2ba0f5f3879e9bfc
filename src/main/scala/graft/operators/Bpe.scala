package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer (Sennrich et al. 2016) — the
  * token-counting surface a training-data pipeline actually ships, where
  * [[TextAnalysis.bpeishTokens]] is only the pre-tokenizer shape.
  *
  * Scale design (SURVEY.md §4): training touches the corpus EXACTLY ONCE —
  * one distributed word-histogram aggregation — and runs the merge loop
  * over the bounded top-`maxWords` histogram on the driver, which is how
  * every production BPE trainer works (the merge loop needs the whole
  * pair-count table every iteration; the word histogram of even a 100 TB
  * corpus is millions of rows, and the cap makes the driver traffic
  * explicit). Encoding is a narrow, shuffle-free pass with the merge
  * ranks broadcast once per executor.
  *
  * Two encode paths, cross-checked in LlmOperatorsSpec:
  *  - [[tokenizeBpe]] — greedy lowest-rank merge per word via
  *    `mapPartitions` (justified: the merge loop is inherently sequential
  *    per word, and a learned table is thousands of merges — far past
  *    what a codegen'd expression chain can express);
  *  - [[applyMergesColumn]] — for SMALL FIXED merge tables, the same
  *    encoding as a chain of `replace` column functions over a
  *    `‹symbol›`-wrapped representation: whole-stage codegen, scan speed,
  *    and mirrorable 1:1 in DuckDB SQL (which is what buys the registered
  *    `t_bpe_encode` query a direct oracle).
  */
object Bpe {

  // --------------------------------------------------------------- core

  /** Merge every (leftmost-first) occurrence of `pair` in a symbol
    * sequence — one BPE merge application. */
  def mergeAll(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.size) {
      if (j < syms.size - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += pair._1 + pair._2; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Greedy BPE encode of one pre-token: repeatedly merge the
    * lowest-rank adjacent pair until none applies. Pure and total —
    * symbols absent from `ranks` pass through as single characters. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.size - 1) {
        val p = (syms(i), syms(i + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = mergeAll(syms, best)
        if (syms.size < 2) done = true
      }
    }
    syms
  }

  /** Learn `numMerges` merges from a word-frequency table: each round
    * counts adjacent symbol pairs weighted by word frequency, takes the
    * most frequent (ties broken lexicographically — deterministic across
    * runs and partitionings), and merges it everywhere. Stops early when
    * no pair is left. Pure Scala over the bounded histogram. */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.size - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeAll(syms, best), f) }
        n += 1
      }
    }
    merges.result()
  }

  // -------------------------------------------------------- distributed

  /** Distributed word histogram — the single full-corpus pass in
    * training. Shuffles (word, partial count), never documents; map-side
    * combine collapses each partition to its distinct words first. */
  def wordHistogram(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.wsTokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train on a corpus: histogram pass, then the driver-side merge loop
    * over the top-`maxWords` rows (freq desc, word asc — a deterministic
    * total order, so the learned table is stable across partitionings).
    * The limit is the explicit driver-traffic bound. */
  def trainBpe(df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    val hist = wordHistogram(df, text)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(hist, numMerges)
  }

  /** Tokenize a corpus with a learned merge table: (id, bpe_tokens).
    * Narrow mapPartitions — zero shuffle, ranks broadcast once per
    * executor; see the object doc for why this path is imperative. */
  def tokenizeBpe(df: DataFrame, idCol: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(idCol.cast("long").as("id"), text.as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        it.map { case (id, t) =>
          // null text behaves as empty (raw corpora carry nulls; the
          // sibling mapPartitions operators share this contract)
          val toks = Option(t).getOrElse("").split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap(w => encodeWord(w, ranks)).toSeq
          (id, toks)
        }
      }.toDF("id", "bpe_tokens")
  }

  // ------------------------------------------- codegen / oracle-able path

  /** `‹symbol›`-wrapped representation: every character becomes `‹c›`.
    * Newlines are left bare by `.` on both engines, which makes them
    * natural merge boundaries — identical semantics in DuckDB's
    * `regexp_replace(text, '(.)', '‹\1›', 'g')`. */
  def wrapSymbols(text: Column): Column =
    regexp_replace(text, "(.)", "‹$1›")

  /** Apply a FIXED merge table as a chain of `replace`s over the wrapped
    * representation — pure codegen string ops at scan speed.
    *
    * Exactness: in the wrapped encoding, occurrences of a two-symbol pair
    * never share characters (each symbol is bracketed), so replace-all is
    * leftmost-first non-overlapping — precisely one BPE merge
    * application. Applying merges once each, in rank order, equals the
    * greedy lowest-rank loop for any RANK-CONSISTENT table (every merge's
    * parts are single chars or products of earlier merges — what [[train]]
    * produces by construction); LlmOperatorsSpec cross-checks the two
    * paths on a trained table. */
  def applyMergesColumn(text: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(wrapSymbols(text)) { case (c, (a, b)) =>
      replace(c, lit(s"‹$a›‹$b›"), lit(s"‹$a$b›"))
    }

  /** Occurrence count of a literal in a column (length arithmetic — no
    * regex, codegen'd). */
  private def countOccurrences(c: Column, literal: String): Column =
    (length(c) - length(replace(c, lit(literal), lit("")))) / literal.length

  /** Token count from an ALREADY-ENCODED (`‹›`-wrapped, merges applied)
    * column, excluding whitespace symbols. Use this when the encoding is
    * staged as its own column and referenced more than once — inlining
    * [[bpeTokenCount]] next to the staged encoding would run the whole
    * replace chain a second time per row. */
  def bpeTokenCountFromEncoded(enc: Column): Column =
    (countOccurrences(enc, "‹") - countOccurrences(enc, "‹ ›")).cast("bigint")

  /** Token count under a fixed merge table, excluding whitespace symbols.
    * Collapse runs of whitespace first so ` ` is the only space symbol. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    bpeTokenCountFromEncoded(
      applyMergesColumn(regexp_replace(text, "\\s+", " "), merges))
}
