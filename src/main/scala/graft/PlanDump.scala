package graft

import java.nio.file.{Files, Paths}

/** Writes PLANS.md: `explain("formatted")` for the headline queries, so
  * the chosen physical plans are reviewable without running Spark.
  * Run: `sbt "runMain graft.PlanDump"`. */
object PlanDump {

  val headline = Seq(
    "j3_broadcast_star_join" -> "star join — all dimensions broadcast, single partial-agg shuffle",
    "o4_topk_parts" -> "global top-k — TakeOrderedAndProject, no full sort",
    "j6_range_join_exec" -> "range join — optimizer-rewritten to BroadcastRangeJoin (binary search per probe row, no nested loop)",
    "w3_share_normalization" -> "week normalization — one shuffle + window, no second scan",
    "a5_dense_weekly" -> "dense key×week frame — sequence() + broadcast key set",
    "a2_exact_dedup_docs" -> "exact dedup — groupBy content, rank over aggregated clusters",
    "d_minhash_neardups" -> "minhash near-dups — explode/hash/aggregate, bucket self-join, no cartesian",
    "s_ann_brute_top5" -> "ANN brute force — broadcast queries, codegen'd vector dot, rank-limit window",
    "t_decontaminate" -> "benchmark decontamination — eval grams broadcast, corpus never shuffles",
    "j_bloom_prefilter_join" -> "bloom prefilter — codegen'd bitmap test at the scan, then exact join",
    "t_bpe_encode" -> "BPE encode — codegen replace chain at scan speed, no UDF, no shuffle before the sort",
    "s_ann_pq_top3" -> "PQ ADC search — per-query lookup table staged once, base scanned as codes, rank-limit window",
    "s_ann_ivfpq_top3" -> "IVF-PQ search — broadcast probes equi-join the coarse lists (nProbe/k of the codes per query), ADC table lookups, rank-limit window",
    "t_tfidf_cosine_top3" -> "TF-IDF cosine — sparse dots as a posting equi-join on term, sorted-order fold, only term-sharing pairs scored",
    "j_asof_prior_view" -> "as-of join — union-tag + one window per key, NO join node in the plan",
    "a6_grouping_sets" -> "grouping sets — all three levels in ONE Expand pass + one aggregate, not three unioned scans",
    "c_session_stats" -> "sessionization — lag + running sum over ONE sort, no second exchange",
    "t_bm25_top5" -> "BM25 search — broadcast query terms + broadcast corpus stats, cost ∝ matched postings",
    "t_langid_confusion" -> "language ID — tokens and all four votes materialized once, pure scan + one agg shuffle",
    "d_incremental_dedup" -> "incremental dedup — batch vs state joins on 40-byte hash keys and 16-byte band keys; the corpus text never shuffles",
    "g_pagerank_hosts" -> "fixed-point PageRank — K unrolled join+agg rounds over a 16-byte (node, rank) relation, outdeg folded into the edges once",
    "l_merge_apply" -> "keyed MERGE (bulk-backfill form, broadcastChanges=false) — ONE shuffled left-anti hash join against the change keys + shuffle-free union; the trickle form broadcasts instead (MergeSpec pins both)",
    "l_quality_report" -> "data-quality gate — six constraints of five kinds in ONE aggregation pass over one scan; uniqueness rides the same pass as count - count_distinct",
    "h13_customer_distribution" -> "TPC-H Q13 — left outer preserves zero-order customers, then the counts themselves aggregate; the skew classic",
    "h15_top_supplier" -> "TPC-H Q15 — scalar max via a broadcast one-row join on the EXACT decimal sums, not a partition-less window",
    "h17_small_quantity_revenue" -> "TPC-H Q17 — correlated per-part average as an aggregate-then-join, threshold multiplied through to exact decimal",
    "h5_local_supplier_volume" -> "TPC-H Q5 — the fact join shuffles once on orderkey; every dimension side is a BroadcastExchange",
    "h6_forecast_revenue" -> "TPC-H Q6 — no join node; date/discount/quantity predicates pushed to the parquet scan",
    "h18_large_volume_customer" -> "TPC-H Q18 — HashAggregate on l_orderkey BELOW both joins: the HAVING filter collapses the fact table before anything widens",
    "h4_order_priority" -> "TPC-H Q4 — EXISTS as a left-semi hash join; the late-shipment non-equi conjunct rides the join condition",
    "h19_disjunctive_revenue" -> "TPC-H Q19 — equi-conjunct extracted into the hash join, OR-of-ANDs residual as a post-join filter, no nested loop",
    "h21_shape_waiting_supplier" -> "TPC-H Q21 shape — double-correlated EXISTS/NOT-EXISTS as shuffled hash LEFT-SEMI + LEFT-ANTI on l_orderkey with the suppkey inequality as join residual; probe side cut first by the broadcast nation dim",
    "h16_shape_supplier_count" -> "TPC-H Q16 shape — NOT IN over a non-nullable key as a broadcast LEFT-ANTI, feeding a two-level (partial) count-distinct aggregate",
    "a_quantile_sketch" -> "mergeable quantile sketch — two batch sketches (≤900·decades bucket rows each) union + re-aggregate; the cumulative window runs over bucket counters, never raw values")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-plan-dump")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.PlanDump\"` at sf0.001. The\n")
    sb.append("properties these plans must keep are asserted in PlanSpec.\n")
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
