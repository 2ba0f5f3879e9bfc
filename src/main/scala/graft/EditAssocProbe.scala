package graft

import org.apache.spark.sql.functions._

/** Candidate-growth probes for the round-12 candidate-generating joins
  * (the jaccardPrefixCandidates methodology: measure the operator's own
  * candidate stage at 1× and 4× input and report the growth EXPONENT,
  * because "works on the fixture" says nothing about the self-join's
  * tail). One JSON line per stage; findings land in SCALE.md.
  *
  *  - `editDistanceJoin`: candidates are deletion-variant hash-bucket
  *    pairs — growth tracks Σ_bucket C(|bucket|, 2). Distinct strings
  *    with a bounded typo rate keep buckets O(1), so candidates should
  *    grow ~linearly in distinct strings.
  *  - `jaroWinklerJoin`: candidates are Σ_block C(|block|, 2) — with a
  *    FIXED key universe (first byte × length bucket) block sizes grow
  *    ∝ corpus, so candidates are quadratic BY DESIGN; the probe
  *    measures it so the number is on the record next to the honest
  *    blocking contract (pick finer keys for bigger corpora).
  *  - `associationRules`: pair candidates are Σ_basket C(|b|, 2) —
  *    with bounded basket sizes (the contract the maxBasketItems guard
  *    enforces) growth is linear in baskets.
  */
object EditAssocProbe {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-edit-assoc-probe")
    import spark.implicits._

    def timed(stage: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"""{"stage":"$stage","rows":$rows,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    // distinct short strings, every 10th with a planted single-edit twin
    // (an ADDITIONAL row — the true-pair count is n/10 by construction)
    def nameCorpus(n: Long) = spark.range(n).flatMap { i =>
      val id = i.toLong
      val r = new scala.util.Random(id)
      val base = (0 until 12).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      if (id % 10 == 0)
        Seq[(Long, String)]((id, base), (id + 10000000L, base.updated(3, 'q')))
      else Seq[(Long, String)]((id, base))
    }.toDF("id", "s")

    // JIT/codegen warmup so the 1x stage isn't charged for first-run
    // compilation (the min-of-warm-reps lesson)
    graft.operators.Dedup.editDistanceJoin(
      nameCorpus(5000), col("id"), col("s")).count(): Unit
    for (n <- Seq(100000L, 400000L)) {
      timed(s"edit1_join_${n / 1000}k") {
        graft.operators.Dedup.editDistanceJoin(
          nameCorpus(n), col("id"), col("s"), maxBucket = 100000).count()
      }
    }

    // jaro-winkler with the DEFAULT (first byte, length-bucket) blocking:
    // quadratic by design under a fixed key universe — measure it
    graft.operators.Dedup.jaroWinklerJoin(
      nameCorpus(5000), col("id"), col("s"), 0.9).count(): Unit
    for (n <- Seq(20000L, 80000L)) {
      timed(s"jw_join_${n / 1000}k_default_blocking") {
        graft.operators.Dedup.jaroWinklerJoin(
          nameCorpus(n), col("id"), col("s"), threshold = 0.9,
          maxBlock = 1000000).count()
      }
      // and with a 3-byte prefix key: the block universe scales with
      // the corpus and candidates drop back toward linear
      timed(s"jw_join_${n / 1000}k_prefix3_blocking") {
        graft.operators.Dedup.jaroWinklerJoin(
          nameCorpus(n), col("id"), col("s"), threshold = 0.9,
          blockKey = s => substring(s, 1, 3), maxBlock = 1000000).count()
      }
    }

    // baskets with bounded size (≤ 24 items from a 1k-item catalog);
    // "rows" here is Σ n_both = the TOTAL CANDIDATE PAIR count (the
    // actual Σ_b C(|b|,2) work), not the saturated output-key count
    def basketCorpus(n: Long) = spark.range(n).flatMap { b =>
      val bk = b.toLong
      val r = new scala.util.Random(bk)
      (0 until 8 + r.nextInt(16)).map(_ => (bk, s"i${r.nextInt(1000)}"))
    }.toDF("bk", "it")

    graft.operators.Assoc.associationRules(
      basketCorpus(5000), col("bk"), col("it")).count(): Unit
    for (n <- Seq(100000L, 400000L)) {
      timed(s"assoc_rules_${n / 1000}k_baskets_candidates") {
        graft.operators.Assoc.associationRules(
            basketCorpus(n), col("bk"), col("it"))
          .filter(col("antecedent") < col("consequent"))
          .agg(sum("n_both")).head().getLong(0)
      }
    }

    spark.stop()
  }
}
