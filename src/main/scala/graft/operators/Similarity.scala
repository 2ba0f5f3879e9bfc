package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against
  *    every base vector; one scan, no base-side shuffle, top-k per query
  *    via a window over the (|queries| × k)-bounded candidate set.
  *  - [[lshTopK]] — scale path: random-hyperplane LSH. Base vectors are
  *    bucketed by sign-bit signature (one scan, deterministic planes from
  *    a seed); queries probe their own bucket plus all 1-bit-flip
  *    neighbors (multi-probe), so only bucket-collision pairs are scored.
  *    Candidate volume per query ≈ |base| × (numBits+1) / 2^numBits.
  *
  * All vector math is `zip_with` + `aggregate` over the array column in
  * DOUBLE precision — codegen'd, sequential per row, bit-deterministic.
  */
object Similarity {

  /** Dot product of two array<numeric> columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm vectors map to 0 (not NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * (it is broadcast); base never shuffles until the per-query window,
    * whose input is already cut to k per partition by the rank filter
    * running AFTER a partial sort — Spark plans window + filter(rn<=k)
    * with a rank-limit pushdown (WindowGroupLimit) so only k rows per
    * query survive each map task. */
  def bruteForceTopK(base: DataFrame, queries: DataFrame, k: Int,
      baseId: String = "vec_id", baseVec: String = "embedding",
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    val scored = base.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(baseId))
      .withColumn("cos", cosine(col(queryVec), col(baseVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(baseId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(baseId).as("nid"), col("cos"))
  }

  /** Deterministic random hyperplanes: `numBits` unit-free Gaussian-ish
    * vectors of dimension `dim`, from a seeded generator. */
  def randomPlanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit signature of a vector under the planes: bit i set iff
    * dot(vec, plane_i) ≥ 0. */
  def planeSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Buckets a query signature probes: its own and every 1-bit flip. */
  def probeBuckets(sig: Column, numBits: Int): Column =
    array(sig +: (0 until numBits).map(i => sig.bitwiseXOR(lit(1L << i))): _*)

  /** LSH-bucketed approximate top-k: join on bucket equality only, score
    * only collisions, then per-query top-k. No cartesian product appears
    * in the plan at any scale. */
  def lshTopK(base: DataFrame, queries: DataFrame, k: Int, numBits: Int = 10,
      dim: Int = 64, seed: Long = 42L,
      baseId: String = "vec_id", baseVec: String = "embedding",
      queryId: String = "qid", queryVec: String = "qvec"): DataFrame = {
    val planes = randomPlanes(numBits, dim, seed)
    val baseB = base.withColumn("bucket", planeSignature(col(baseVec), planes))
    val queryB = queries
      .withColumn("bucket",
        explode(probeBuckets(planeSignature(col(queryVec), planes), numBits)))
    val scored = baseB.join(broadcast(queryB), Seq("bucket"))
      .filter(col(queryId) =!= col(baseId))
      .withColumn("cos", cosine(col(queryVec), col(baseVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(baseId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(baseId).as("nid"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs within a bounded id subset —
    * the exact-verification tail of an embedding-dedup pipeline. For the
    * full corpus use [[lshTopK]]-style bucketing first; this all-pairs form
    * is only for already-bucketed candidate groups. */
  def cosineNearDupPairs(vectors: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }
}
