package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Codegen-native Bloom-filter join pruning.
  *
  * The classic big-join accelerator: build a Bloom filter over the small
  * side's keys, filter the big side AT THE SCAN before its shuffle, then
  * let the exact join remove the false positives. The filter is
  * semantically transparent — Bloom filters have no false negatives — so
  * any query using it as a prefilter produces byte-identical results to
  * the plain join, which is exactly how the registered query's DuckDB
  * oracle checks it.
  *
  * Implementation notes (why not `DataFrameStatFunctions.bloomFilter` +
  * a UDF): the membership test here is pure column arithmetic —
  * `xxhash64(key, seed) pmod bits` indexing into an `array<long>` bitmap
  * literal — so it stays inside whole-stage codegen; a Scala UDF would
  * break the codegen spine at the scan, the hottest path of the whole
  * join. The bitmap is built WITH Spark (hash indices computed
  * distributedly, only set bit positions reach the driver), so driver and
  * executors never need to agree on a hash implementation.
  *
  * Scale bounds: the bitmap rides in the plan as a literal — size it in
  * the low MBs (default 2^20 bits = 128 KiB ≈ 1% fpp at ~100k keys). The
  * small side must be collectable as bit positions (≤ numHashes × |keys|
  * ints) — the same "dim side fits the driver" precondition as a
  * broadcast join. AQE's runtime bloom (InjectRuntimeFilter) covers the
  * automatic case; this operator is the explicit form for when the
  * planner can't see the selectivity. */
object Bloom {

  /** Build the bitmap: `numHashes` seeded-xxhash64 bit positions per key,
    * deduplicated in Spark; only distinct positions reach the driver. */
  def buildBits(small: DataFrame, keyCol: Column,
      numBits: Int, numHashes: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    val idx = small.select(explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(keyCol, lit(i)), lit(numBits.toLong)).cast("int")): _*)).as("i"))
      .distinct().collect().map(_.getInt(0))
    val words = new Array[Long](numBits / 64)
    idx.foreach(i => words(i >> 6) |= 1L << (i & 63))
    words
  }

  /** Membership test as a pure column expression over a bitmap literal —
    * codegen'd end to end. */
  def mightContain(keyCol: Column, words: Array[Long],
      numBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val idx = pmod(xxhash64(keyCol, lit(i)), lit(numBits.toLong))
      // dynamic shift amount → call_function (the Int-arg overload of
      // shiftright only takes literals)
      call_function("shiftright",
        element_at(typedlit(words.toSeq), (idx / 64).cast("int") + 1),
        (idx % 64).cast("int")).bitwiseAND(1) === 1
    }.reduce(_ && _)

  /** Prune `big` to rows whose key might be in `small`'s key set: a
    * scan-level filter that cuts the big side's shuffle volume before an
    * exact join. Guaranteed superset of the true semi join.
    *
    * The small key is CAST to the big key's type before hashing:
    * xxhash64 is type-sensitive (int 42 and bigint 42 hash differently),
    * so mismatched key types would otherwise make every membership probe
    * miss — silent false negatives on a filter whose whole contract is
    * "no false negatives". */
  def prune(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bigType = big.select(bigKey).schema.head.dataType
    val bits = buildBits(small, smallKey.cast(bigType), numBits, numHashes)
    big.filter(mightContain(bigKey, bits, numBits, numHashes))
  }
}
