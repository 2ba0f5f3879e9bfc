package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline needs around the
  * dedup/quality core: benchmark decontamination and target-mixture
  * sampling.
  *
  * Both are designed scan-side for 100 TB: decontamination broadcasts the
  * (small) benchmark gram set so the corpus never shuffles, and mixture
  * sampling is a pure filter expression — no shuffle, no join, no RNG
  * state, reproducible across retries and engines.
  */
object Curation {

  /** Per-document contamination hits: training documents sharing at least
    * one word `k`-gram with the benchmark corpus, with the number of
    * distinct shared grams (`n_hits`). The GPT-3-style n-gram overlap
    * check, Spark-first: benchmark grams are a broadcast hash side
    * (an eval suite is KBs–MBs against a 100 TB corpus), so the training
    * side streams through a scan → explode → broadcast-join with no
    * corpus shuffle; only (id, hit) pairs reach the one aggregation.
    * `k` defaults to 13 — the published overlap-dedup window; the
    * registered query uses k=8 to have in-fixture hits at test SF. */
  def contaminationHits(train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchText: Column, k: Int = 13): DataFrame = {
    val trainGrams = Dedup.shinglePosting(train, trainId, trainText, k)
    val benchGrams = Dedup.shinglePosting(bench, lit(0L), benchText, k)
      .select("sh").distinct()
    trainGrams.join(broadcast(benchGrams), "sh")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  /** NEAR-duplicate (paraphrase-level) contamination:
    * [[contaminationHits]] catches verbatim k-gram overlap, but a
    * lightly reworded eval item — a substituted word every sentence, a
    * re-punctuated passage — shares no exact 13-gram with its source
    * while still leaking the benchmark. MinHash-LSH across the two
    * corpora finds it: both sides are tagged into one frame (train ids
    * prefixed `t:`, bench rows get internal `e:` ids that never surface)
    * and run through the hardened [[Dedup.minhashNearDups]] pipeline —
    * banded signatures, mega-bucket cap, exact shingle-Jaccard
    * verification — then only CROSS-corpus pairs survive. Cost is the
    * near-dup discipline, not all-pairs: shuffles carry signatures and
    * 16-byte band keys, candidates ∝ true near-dups, and the bench side
    * is vanishingly small next to the corpus.
    *
    * The benchmark participates as a SET of texts (duplicate eval rows
    * count once): bench ids are `e:md5(text)` — fully deterministic, so
    * the two plan subtrees that re-evaluate the union (candidate side,
    * verification side) always agree on ids; a generated id
    * (`monotonically_increasing_id`) could be re-assigned differently on
    * recomputation and silently pair the wrong texts.
    *
    * Output: one row per flagged train document —
    * (id = trainId as string, n_hits = distinct contaminating eval
    * texts, max_jaccard). */
  def fuzzyContaminationHits(train: DataFrame, trainId: Column,
      trainText: Column, bench: DataFrame, benchText: Column,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      minJaccard: Double = 0.5,
      family: Dedup.MinhashFamily = Dedup.XxMinhash): DataFrame = {
    val t = train.select(
      concat(lit("t:"), trainId.cast("string")).as("doc_id"),
      trainText.as("text"))
    val e = bench.select(benchText.as("text")).distinct()
      .select(concat(lit("e:"), md5(col("text").cast("binary")))
        .as("doc_id"), col("text"))
    val pairs = Dedup.minhashNearDups(t.unionByName(e), col("doc_id"),
      col("text"), shingleK, numHashes, bands, minJaccard, family)
    pairs
      .filter(substring(col("id_a"), 1, 2) =!= substring(col("id_b"), 1, 2))
      .select(when(substring(col("id_a"), 1, 2) === "t:", col("id_a"))
        .otherwise(col("id_b")).as("tid"), col("jaccard"))
      .select(expr("substring(tid, 3)").as("id"), col("jaccard"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"), max(col("jaccard")).as("max_jaccard"))
  }

  /** Drop every training document flagged by [[fuzzyContaminationHits]]
    * — same anti-join shape (and non-broadcast rationale) as
    * [[decontaminate]]. */
  def fuzzyDecontaminate(train: DataFrame, trainId: Column,
      trainText: Column, bench: DataFrame, benchText: Column,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      minJaccard: Double = 0.5,
      family: Dedup.MinhashFamily = Dedup.XxMinhash): DataFrame = {
    val flagged = fuzzyContaminationHits(train, trainId, trainText,
        bench, benchText, shingleK, numHashes, bands, minJaccard, family)
      .select(col("id").as("__fuzzy_contaminated_id"))
    train.join(flagged,
      trainId.cast("string") === col("__fuzzy_contaminated_id"), "left_anti")
  }

  /** Drop every training document flagged by [[contaminationHits]]: anti
    * join on 8-byte id keys. Deliberately NOT broadcast-hinted — the
    * flagged set is bounded by how contaminated the CORPUS is, not by the
    * benchmark's size (one boilerplate gram in the benchmark can flag
    * millions of documents), so the hint would funnel an unbounded set
    * through the driver. AQE still broadcasts it when it is actually
    * small. */
  def decontaminate(train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchText: Column, k: Int = 13): DataFrame = {
    val flagged = contaminationHits(train, trainId, trainText, bench, benchText, k)
      .select(col("id").as("__contaminated_id"))
    train.join(flagged, trainId === col("__contaminated_id"), "left_anti")
  }

  /** Deterministic domain-mixture sampling: keep a row with probability
    * `rates(domain)` (else `defaultRate`), decided by comparing the first
    * 8 md5 hex digits of the id against a per-domain threshold. A pure
    * scan-level filter: no shuffle, no join, no RNG state — the same row
    * is kept or dropped on every run, engine, and retry, which is what a
    * reproducible training-mixture spec requires. Thresholds are 32-bit
    * (hex-string compare), so rates resolve to ~2.3e-10. */
  def mixtureSample(df: DataFrame, idCol: Column, domainCol: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val hex = substring(md5(idCol.cast("string").cast("binary")), 1, 8)
    def keep(r: Double): Column =
      if (r >= 1.0) lit(true)
      else if (r <= 0.0) lit(false)
      // cap at 2^32−1: a rate within 2^-33 of 1.0 would otherwise round
      // to 2^32 = nine hex digits, which string-compares BELOW every
      // 8-digit hash and would silently keep nothing
      else hex < lit(f"${math.min(math.round(r * 4294967296.0), 4294967295L)}%08x")
    val cond = rates.toSeq.sortBy(_._1).foldRight(keep(defaultRate)) {
      case ((dom, r), acc) => when(domainCol === dom, keep(r)).otherwise(acc)
    }
    df.filter(cond)
  }

  /** Corpus-level boilerplate LINE removal (the CCNet/C4 move: a line —
    * nav text, cookie banner, license footer — appearing in ≥ `minDf`
    * DISTINCT documents is template, not content; strip it everywhere).
    *
    * Relational, three stages: (1) posexplode lines, count each line
    * hash's distinct-document frequency; (2) the boilerplate set — hashes
    * with df ≥ minDf — is usually tiny (only genuinely repeated lines),
    * but deliberately NOT broadcast-hinted: a low `minDf` over a
    * near-dup-heavy corpus can flag hundreds of millions of lines, and a
    * forced broadcast would funnel that through the driver (the same
    * reasoning as [[decontaminate]]'s flagged set). AQE still broadcasts
    * it whenever it is actually small — the plan-asserted case; (3)
    * survivors reassemble per document in
    * original line order (array_sort over (pos, line) structs — exact,
    * not insertion-order-dependent). The only full-corpus shuffles are
    * the df count (carries 8-byte hashes + the distinct (hash, id)
    * pairs) and the reassembly groupBy.
    *
    * Blank lines are kept verbatim (they carry no template signal and
    * stripping them would mangle paragraph structure). A document whose
    * every line is boilerplate comes back as the empty string, not a
    * dropped row — the caller decides whether to gate it. `idCol` must be
    * unique per row: two rows sharing an id would have their line
    * positions interleaved by the reassembly sort. `lineHash`
    * defaults to xxhash64; pass e.g. `l => md5(l.cast("binary"))` for the
    * engine-portable face the DuckDB oracle replays. */
  def removeBoilerplateLines(df: DataFrame, idCol: Column, textCol: Column,
      minDf: Int, lineHash: Column => Column = xxhash64(_)): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every non-blank line")
    val lines = df
      .select(idCol.as("id"), posexplode(split(textCol, "\n")).as(Seq("pos", "line")))
      .withColumn("lh", lineHash(col("line")))
    val boiler = lines
      .filter(length(trim(col("line"))) > 0)
      .select("lh", "id").distinct()
      .groupBy("lh").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select("lh")
    val kept = lines
      .join(boiler, Seq("lh"), "left_anti")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("ls"))
      .select(col("id"),
        concat_ws("\n", transform(col("ls"), s => s("line"))).as("text"))
    // an all-boilerplate document has no surviving lines at all — join it
    // back from the id spine as the empty string rather than dropping it
    df.select(idCol.as("id"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /** Exact-size stratified sample: the first `n` rows per domain in
    * md5-of-id order — the fixed-COUNT face of [[mixtureSample]] (which
    * fixes the RATE). The hash order is uniform, engine-portable, and
    * independent of physical row order, so the same `n` rows come back on
    * every run, plan, and engine — a reproducible "n docs per source"
    * spec. One hash-partitioned sort per domain (a window, never a
    * driver-side collect); `sampled_rank` (1-based within domain) rides
    * along in the output. Ties on the full 32-hex digest are broken by
    * id, so duplicate ids cannot make the cut nondeterministic. */
  def stratifiedSample(df: DataFrame, idCol: Column, domainCol: Column,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol)
      .orderBy(md5(idCol.cast("string").cast("binary")), idCol)
    df.withColumn("sampled_rank", row_number().over(w))
      .filter(col("sampled_rank") <= n)
  }

  /** Deterministic weight-biased sampling without replacement: the `n`
    * rows per stratum with the smallest priority `u / w`, where
    * `u ∈ (0, 1]` derives from the first 15 md5 hex digits of the id and
    * `w` is the row's weight — heavier rows draw stochastically smaller
    * priorities, so inclusion probability rises monotonically with
    * weight while staying a pure function of (id, weight): reproducible
    * across runs, engines, retries, and partitionings, like
    * [[mixtureSample]]. One partitioned window per stratum — no RNG
    * state, no shuffle beyond the window's own exchange.
    *
    * `u/w` is a single correctly-rounded IEEE division of an exact
    * 60-bit integer and the caller's weight, so the DuckDB oracle
    * (c_weighted_sample) replays it bit-for-bit. For inclusion
    * probabilities EXACTLY proportional to weight (Efraimidis–Spirtes
    * A-ES), use [[weightedSampleAES]] — its `log(u)/w` key needs libm,
    * whose last-ulp rounding is not engine-portable, which is why the
    * portable `u/w` face is the registered one. Rows with weight ≤ 0 or
    * null are excluded (they cannot be drawn). */
  def weightedPrioritySample(df: DataFrame, idCol: Column,
      strataCol: Column, weightCol: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (conv(substring(md5(idCol.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long") + 1).cast("double") / lit(1152921504606846976.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("__priority"), idCol)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__priority", u / weightCol.cast("double"))
      .withColumn("sampled_rank", row_number().over(w))
      .filter(col("sampled_rank") <= n)
      .drop("__priority")
  }

  /** Efraimidis–Spirtes A-ES weighted sampling without replacement
    * (IPL 2006): per stratum, the `n` rows with the LARGEST key
    * `u^(1/w)` — equivalently the smallest `-ln(u)/w`, the form used
    * here — drawn with probability exactly proportional to weight at
    * each draw. Same deterministic md5-uniform as
    * [[weightedPrioritySample]]; the libm `log` keeps this face out of
    * the SQL-oracle registry (CurationSpec pins its statistics
    * instead). */
  def weightedSampleAES(df: DataFrame, idCol: Column,
      strataCol: Column, weightCol: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (conv(substring(md5(idCol.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long") + 1).cast("double") / lit(1152921504606846976.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("__key"), idCol)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__key", -log(u) / weightCol.cast("double"))
      .withColumn("sampled_rank", row_number().over(w))
      .filter(col("sampled_rank") <= n)
      .drop("__key")
  }

  /** Greedy sequence packing: assign id-ordered documents to training
    * bins of at most `budget` tokens (a document larger than the budget
    * gets a bin of its own). A GLOBAL greedy pack is a serial scan by
    * definition, so the scalable contract is per-partition: documents are
    * range-partitioned by id, each partition packs its own id-sorted
    * slice, and bins never span partitions — bin ids are
    * (partition, seq) pairs. `numPartitions = 1` gives the exact global
    * greedy (the oracle-checked form at test SF); at corpus scale use
    * enough partitions that a slice fits an executor, and accept the
    * ≤ one-underfilled-bin-per-partition padding loss.
    *
    * Output: (id, n_tokens, pack_id) — one row per input document. */
  def packSequences(df: DataFrame, idCol: Column, nTokensCol: Column,
      budget: Int, numPartitions: Int = 200): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numPartitions > 0, "numPartitions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(idCol.cast("long").as("id"),
      nTokensCol.cast("int").as("n_tokens"))
    val parts =
      if (numPartitions == 1) base.coalesce(1)
      else base.repartitionByRange(numPartitions, col("id"))
    parts.sortWithinPartitions("id").as[(Long, Int)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var bin = 0L
        var acc = 0L
        it.map { case (id, n) =>
          if (acc > 0 && acc + n > budget) { bin += 1; acc = 0L }
          acc += n
          (id, n, pid, bin)
        }
      }
      .toDF("id", "n_tokens", "partition_id", "bin")
      .withColumn("pack_id",
        concat_ws("_", col("partition_id"), col("bin")))
      .drop("partition_id", "bin")
  }
}
