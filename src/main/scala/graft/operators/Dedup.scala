package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Design rules (SURVEY.md §4, pre-registered in VERDICT r1):
  *  - NEVER shuffle raw document bytes as a grouping key — group on an
  *    8-byte `xxhash64` (plus sha2 to make collisions negligible);
  *  - near-dup candidate generation is ALWAYS bucket-join shaped (LSH
  *    bands / simhash bands / rare shingles) — never an all-pairs product;
  *  - mega-buckets (boilerplate shingles shared by millions of docs) are
  *    dropped by an explicit document-frequency cap, the standard guard
  *    against quadratic bucket blowup.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup clusters, hash-bucketed: one row per distinct content with
    * `cluster_size`, the representative (minimum) id, and a `Uniq<n>` name
    * (USEARCH `fastx_uniques` contract,
    * `/root/reference/Time_Series.py:471–478`, `MSA_Reader.py:1296–1297`).
    *
    * The shuffle key is (xxhash64, sha2) — 40 bytes — not the document.
    * The `Uniq` rank is a global window, but it runs over the already
    * aggregated cluster table (|clusters| ≪ |docs|); for corpora where even
    * that is huge, callers can keep the hash as the cluster id instead.
    */
  def exactClusters(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.select(idCol.as("id"),
        xxhash64(contentCol).as("h64"), sha2(contentCol.cast("binary"), 256).as("h256"))
      .groupBy("h64", "h256")
      .agg(count(lit(1)).as("cluster_size"), min(col("id")).as("first_id"))
      .withColumn("cluster_id", concat(lit("Uniq"), row_number().over(
        Window.orderBy(col("cluster_size").desc, col("first_id").asc))))

  /** Survivors of exact dedup: the representative id per cluster. */
  def exactSurvivors(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.select(idCol.as("id"), xxhash64(contentCol).as("h64"),
        sha2(contentCol.cast("binary"), 256).as("h256"))
      .groupBy("h64", "h256").agg(min(col("id")).as("id"))
      .select("id")

  // ------------------------------------------------------------- shingles

  /** Word `k`-shingles of a text column; documents shorter than `k` tokens
    * contribute their whole text as one shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.wsTokens(TextAnalysis.normalized(text))
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature: `numHashes` independent permutations approximated
    * by seeded xxhash64; entry h = min over shingles of hash(shingle, h). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingles, sh => xxhash64(sh, h))))

  /** LSH band keys: the signature is cut into `bands` rows of
    * `numHashes/bands` entries; each band hashes to one bucket key. Two
    * documents collide in a band iff that band's sub-signature is equal. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => struct(lit(b).as("band"),
      xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))): _*)

  /** MinHash+LSH candidate pairs (`id_a < id_b`), bucket-join shaped:
    * explode band keys → self-join on (band, bucket) → distinct. Buckets
    * with more than `maxBucket` members are dropped (boilerplate guard).
    * The join shuffles 16-byte keys; there is no cross-bucket product. */
  def minhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      maxBucket: Int = 200): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val sig = minhashSignature(wordShingles(textCol, shingleK), numHashes)
    val keyed = df
      .select(idCol.as("id"), explode(lshBandKeys(sig, bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val capped = keyed.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two token-set columns:
    * |A∩B| / (|A|+|B|−|A∩B|) — int sizes, one IEEE division. */
  def jaccard(tokensA: Column, tokensB: Column): Column = {
    val inter = size(array_intersect(tokensA, tokensB))
    inter.cast("double") / (size(tokensA) + size(tokensB) - inter)
  }

  /** MinHash candidates verified with exact Jaccard ≥ `minJaccard` over
    * distinct word shingles (join back to the docs for token sets). */
  def minhashNearDups(df: DataFrame, idCol: Column, textCol: Column,
      shingleK: Int = 3, numHashes: Int = 24, bands: Int = 8,
      minJaccard: Double = 0.7): DataFrame = {
    val sets = df.select(idCol.as("id"),
      array_distinct(wordShingles(textCol, shingleK)).as("sh"))
    minhashCandidates(df, idCol, textCol, shingleK, numHashes, bands)
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens: bit i of the hash is the sign of the
    * sum over tokens of ±1 at bit i of xxhash64(token). Pure higher-order
    * column expressions — no UDF, no shuffle. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.wsTokens(TextAnalysis.normalized(text))
    val counters = aggregate(toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val delta = array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*)
        zip_with(acc, delta, (c, d) => c + d)
      })
    val powers = typedLit((0 until 64).map(i => 1L << i))
    // powers are distinct bits, so plain + is the same as bitwise OR
    aggregate(zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc + bit)
  }

  /** SimHash near-dup candidates: the 64-bit hash is cut into `bands`
    * equal bit-slices; docs agreeing exactly on any slice are candidates
    * (catches all pairs within Hamming distance < bands). Bucket-join
    * shaped like minhashCandidates. */
  def simhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
      bands: Int = 4, maxBucket: Int = 200): DataFrame = {
    val bits = 64 / bands
    val sh = simhash64(textCol)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val bandKeys = array((0 until bands).map(b => struct(lit(b).as("band"),
      shiftright(sh, b * bits).bitwiseAND(lit(mask)).as("bucket"))): _*)
    val keyed = df.select(idCol.as("id"), explode(bandKeys).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val capped = keyed.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }

  /** Hamming distance between two 64-bit hashes (bit_count of XOR). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------- n-gram Jaccard (rare)

  /** Jaccard candidate pairs via RARE shingles: only shingles whose
    * document frequency is ≤ `maxDf` participate in the join, bounding the
    * per-shingle fanout at `maxDf²` — the inverted-index analog of LSH. */
  def rareShingleCandidates(df: DataFrame, idCol: Column, textCol: Column,
      shingleK: Int = 3, maxDf: Int = 20): DataFrame = {
    val posting = df.select(idCol.as("id"),
        explode(array_distinct(wordShingles(textCol, shingleK))).as("sh"))
    val rare = posting.withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("df") <= maxDf).drop("df")
    val a = rare.as("a"); val b = rare.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }
}
