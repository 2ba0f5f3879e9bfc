package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter, JASA 1969)
  * — the principled scorer the dedup block's candidate generators feed:
  * blocking joins (minhash bands, deletion variants, Jaro–Winkler
  * blocks) SAY which pairs to look at; this says HOW STRONGLY the
  * field-level evidence supports a merge, as a sum of per-field
  * log-likelihood-ratio weights learned from labeled pairs:
  *
  *   w_agree(f)    = ln( m_f / u_f )
  *   w_disagree(f) = ln( (1−m_f) / (1−u_f) )
  *
  * with m_f = P(field f agrees | match) and u_f = P(agrees | non-match)
  * estimated as smoothed exact-count ratios. A pair's score is the sum
  * of its fields' weights — positive evidence accumulates, chance
  * agreements (high u) contribute little, disagreement on a reliable
  * field pulls strongly negative.
  *
  * Portability: counts are exact BIGINTs; m/u are fixed two-op ratios;
  * the weights carry ln, so registered faces compare them (and scores)
  * at 12 decimals — the ln-ulp convention. Scoring folds the per-field
  * contributions in FIXED field order (the Stats order-pinning), so the
  * sum is deterministic.
  *
  * Scale: training is ONE aggregation over the labeled pairs (the field
  * array explodes to |fields| rows per pair, combined map-side);
  * scoring joins the tiny weights table as a broadcast onto the same
  * explode and re-groups by the pair key — candidate pairs stream
  * through, nothing driver-side.
  */
object Linkage {

  private def fieldArray(fields: Seq[(String, Column)]): Column = {
    require(fields.nonEmpty && fields.size <= 64,
      s"Linkage needs 1 <= fields <= 64, got ${fields.size}")
    array(fields.map { case (n, agree) =>
      struct(lit(n).as("field"), agree.cast("boolean").as("agree"))
    }: _*)
  }

  /** Estimate per-field m/u probabilities and agreement weights from
    * labeled pairs. `fields` maps a field name to its agreement
    * predicate over the pair row; `smoothing` is the add-k that keeps
    * a perfectly-(dis)agreeing field's weight finite. Pairs where a
    * field's predicate is null are excluded from THAT field's counts
    * (missing data is no evidence either way).
    *
    * Output: (field, n_match, n_nonmatch, agree_match, agree_nonmatch,
    * m, u, w_agree, w_disagree). */
  def trainWeights(labeled: DataFrame, matchCol: Column,
      fields: Seq[(String, Column)], smoothing: Int = 1): DataFrame =
    weightsFromCounts(agreementCounts(labeled, matchCol, fields),
      smoothing)

  /** The PARTIAL behind [[trainWeights]]: per-field exact agreement
    * counts — four associative BIGINT sums, so batch-sliced partials
    * re-summed per field are exactly the one-shot table (the at-rest
    * incremental artifact; state is |fields| rows). */
  def agreementCounts(labeled: DataFrame, matchCol: Column,
      fields: Seq[(String, Column)]): DataFrame = {
    val f = col("__f")
    labeled.filter(matchCol.isNotNull)
      .select(matchCol.cast("boolean").as("__m"),
        explode(fieldArray(fields)).as("__f"))
      .filter(f.getField("agree").isNotNull)
      .groupBy(f.getField("field").as("field"))
      .agg(
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_match"),
        sum(when(!col("__m"), 1L).otherwise(0L)).as("n_nonmatch"),
        sum(when(col("__m") && f.getField("agree"), 1L).otherwise(0L))
          .as("agree_match"),
        sum(when(!col("__m") && f.getField("agree"), 1L).otherwise(0L))
          .as("agree_nonmatch"))
  }

  /** Merge [[agreementCounts]] tables: component-wise BIGINT re-sum. */
  def mergeAgreementCounts(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col("field"))
      .agg(sum(col("n_match")).as("n_match"),
        sum(col("n_nonmatch")).as("n_nonmatch"),
        sum(col("agree_match")).as("agree_match"),
        sum(col("agree_nonmatch")).as("agree_nonmatch"))

  /** Finalize a (possibly merged) [[agreementCounts]] table into the
    * [[trainWeights]] schema — the streaming-readout face. */
  def weightsFromCounts(counts: DataFrame, smoothing: Int = 1): DataFrame = {
    require(smoothing >= 1 && smoothing <= 1000,
      s"Linkage needs 1 <= smoothing <= 1000, got $smoothing")
    val s = smoothing.toLong
    counts
      .withColumn("m", (col("agree_match") + s).cast("double") /
        (col("n_match") + 2L * s).cast("double"))
      .withColumn("u", (col("agree_nonmatch") + s).cast("double") /
        (col("n_nonmatch") + 2L * s).cast("double"))
      .withColumn("w_agree", log(col("m") / col("u")))
      .withColumn("w_disagree",
        log((lit(1.0) - col("m")) / (lit(1.0) - col("u"))))
  }

  /** Score candidate pairs with a trained weights table: per pair, the
    * FIXED-field-order sum of w_agree / w_disagree (0 when the field's
    * predicate is null — missing data is no evidence). `idCols` is the
    * pair key (e.g. id_a, id_b). Adds (n_fields, link_score).
    *
    * The weights join is a LEFT join with a raise_error on an unmatched
    * field: an inner join would silently drop any field absent from the
    * weights table (e.g. weights trained with a different field set)
    * from both n_fields and link_score — a field/weights mismatch must
    * fail fast, not produce silently partial scores. */
  def score(pairs: DataFrame, idCols: Seq[Column], weights: DataFrame,
      fields: Seq[(String, Column)]): DataFrame = {
    val exploded = pairs
      .select(idCols :+ explode(fieldArray(fields)).as("__f"): _*)
    val idNames = exploded.columns.dropRight(1).toSeq
    val f = col("__f")
    exploded
      .join(broadcast(weights.select(col("field"), col("w_agree"),
        col("w_disagree"))), f.getField("field") === col("field"), "left")
      .withColumn("__c",
        when(col("field").isNull, raise_error(concat(
          lit("Linkage.score: field '"), f.getField("field"),
          lit("' has no row in the weights table — fields and weights " +
            "were built from different field sets"))).cast("double"))
          .when(f.getField("agree").isNull, lit(0.0))
          .when(f.getField("agree"), col("w_agree"))
          .otherwise(col("w_disagree")))
      .groupBy(idNames.map(col): _*)
      .agg(count(lit(1)).as("n_fields"),
        // contributions fold in FIXED field order — the Stats pinning
        sort_array(collect_list(struct(col("field"), col("__c"))))
          .as("__cs"))
      .withColumn("link_score", aggregate(col("__cs"), lit(0.0),
        (acc, c) => acc + c.getField("__c")))
      .drop("__cs")
  }

  /** UNSUPERVISED m/u estimation by EM over unlabeled candidate pairs
    * (Winkler 1988's application of Dempster–Laird–Rubin to the
    * Fellegi–Sunter model) — real-world linkage rarely has the labeled
    * pairs [[trainWeights]] needs; EM recovers the two latent classes
    * from the agreement-pattern mixture itself under conditional
    * independence of fields given match status.
    *
    *  - E-step (in-plan, per pair): posterior
    *    g = λ·Πf P(γ_f|M) / (λ·Πf P(γ_f|M) + (1−λ)·Πf P(γ_f|U)),
    *    where a field's factor is m (γ=true), 1−m (false), 1 (null — no
    *    evidence), multiplied in FIXED declared field order.
    *  - M-step (one aggregation): λ, m_f, u_f re-estimated as
    *    posterior-weighted agreement ratios with the same add-k
    *    smoothing as the supervised face.
    *
    * Portability (the logisticFit discipline, Stats.scala): posteriors
    * are quantized to exact BIGINTs in-plan — qg = floor(g·quantScale),
    * qu = floor((1−g)·quantScale) — so every M-step sum is associative
    * integer arithmetic, immune to row order; the new parameters are
    * single IEEE divisions of exact longs. Each iteration consumes ONE
    * aggregated row on the driver and embeds the new parameters as
    * literals in the next plan, so a fixed-iteration run replays in SQL
    * as chained CTEs and the final weights hash bit-for-bit.
    *
    * Scale: `iters` sequential jobs, each one map-side-combined
    * aggregation over the pairs (4 BIGINTs per field + 2 global);
    * nothing driver-side beyond the (fields × 4)-long parameter row.
    *
    * Output: one row per field — (field, m, u, w_agree, w_disagree,
    * lambda), lambda repeated (it is a model-level scalar). */
  def emTrainWeights(pairs: DataFrame, fields: Seq[(String, Column)],
      iters: Int = 3, smoothing: Int = 1, quantScale: Double = 1e6,
      initM: Double = 0.9, initU: Double = 0.1,
      initLambda: Double = 0.5): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in 1..20, got $iters")
    require(fields.nonEmpty && fields.size <= 16,
      s"emTrainWeights needs 1 <= fields <= 16, got ${fields.size}")
    require(quantScale >= 1e3 && quantScale <= 1e9,
      s"quantScale in [1e3, 1e9], got $quantScale")
    // lambda's denominator uses quantScale as an exact Long; a
    // fractional scale would truncate there while floor(g·q) kept the
    // true scale — the two quantizations must agree exactly.
    require(quantScale == math.floor(quantScale),
      s"quantScale must be integral, got $quantScale")
    require(smoothing >= 1 && smoothing <= 1000,
      s"smoothing in 1..1000, got $smoothing")
    val q = quantScale
    val sQ = (smoothing * q).toLong // q ≤ 1e9, s ≤ 1e3 ⇒ exact long
    val names = fields.map(_._1)
    var m = names.map(_ => initM).toArray
    var u = names.map(_ => initU).toArray
    var lambda = initLambda
    var nPairs = 0L
    for (_ <- 1 to iters) {
      // E-step: fixed-order product of per-field likelihood factors.
      // reduce is a left fold, matching the SQL mirror's left-assoc
      // product — term ORDER is part of the float contract.
      val pm = fields.zip(m.toSeq).map { case ((_, g), mf) =>
        when(g.isNull, lit(1.0)).when(g, lit(mf)).otherwise(lit(1.0 - mf))
      }.reduce(_ * _)
      val pu = fields.zip(u.toSeq).map { case ((_, g), uf) =>
        when(g.isNull, lit(1.0)).when(g, lit(uf)).otherwise(lit(1.0 - uf))
      }.reduce(_ * _)
      val num = lit(lambda) * pm
      val g = num / (num + lit(1.0 - lambda) * pu)
      val qg = floor(g * lit(q)).cast("long")
      val qu = floor((lit(1.0) - g) * lit(q)).cast("long")
      // M-step: per-field posterior-mass sums, all exact BIGINTs
      val perField = fields.flatMap { case (n, gCol) => Seq(
        sum(when(gCol === true, qg).otherwise(0L)).as(s"gm_$n"),
        sum(when(gCol.isNotNull, qg).otherwise(0L)).as(s"gt_$n"),
        sum(when(gCol === true, qu).otherwise(0L)).as(s"um_$n"),
        sum(when(gCol.isNotNull, qu).otherwise(0L)).as(s"ut_$n")) }
      val aggs = perField ++ Seq(sum(qg).as("g_all"),
        count(lit(1)).as("n"))
      val row = pairs.agg(aggs.head, aggs.tail: _*).head()
      nPairs = row.getAs[Long]("n")
      require(nPairs > 0, "emTrainWeights: no pairs to fit on")
      // long→double must stay exact for the divisions to be portable
      require(nPairs.toDouble * q < math.pow(2, 53),
        s"emTrainWeights: n·quantScale = ${nPairs * q} risks inexact " +
          "long→double — lower quantScale")
      m = names.map(n => (row.getAs[Long](s"gm_$n") + sQ).toDouble /
        (row.getAs[Long](s"gt_$n") + 2 * sQ).toDouble).toArray
      u = names.map(n => (row.getAs[Long](s"um_$n") + sQ).toDouble /
        (row.getAs[Long](s"ut_$n") + 2 * sQ).toDouble).toArray
      lambda = (row.getAs[Long]("g_all") + sQ).toDouble /
        (nPairs * q.toLong + 2 * sQ).toDouble
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("field", StringType, nullable = false),
      StructField("m", DoubleType, nullable = false),
      StructField("u", DoubleType, nullable = false),
      StructField("w_agree", DoubleType, nullable = false),
      StructField("w_disagree", DoubleType, nullable = false),
      StructField("lambda", DoubleType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(names.indices.map { i =>
        org.apache.spark.sql.Row(names(i), m(i), u(i),
          math.log(m(i) / u(i)),
          math.log((1.0 - m(i)) / (1.0 - u(i))), lambda)
      }: _*)
    pairs.sparkSession.createDataFrame(rows, schema)
  }

  /** End-to-end UNSUPERVISED entity resolution — the composed pipeline
    * every stage of this file and the dedup block already provides,
    * shipped as one operator:
    *
    *   1. candidates: MinHash/LSH banding over `blockTextCol`
    *      ([[Dedup.minhashCandidatesFromSigs]] — banded bucket join,
    *      mega-buckets capped, cartesian-free);
    *   2. pair features: each candidate pair picks up both records'
    *      `attrs` (as `a_<name>` / `b_<name>`) and evaluates the
    *      caller's `fields` agreement expressions over them;
    *   3. weights: [[emTrainWeights]] fits Fellegi–Sunter m/u/λ on the
    *      UNLABELED candidate pairs (Winkler 1988);
    *   4. scores: [[score]] sums the learned log-likelihood-ratio
    *      weights per pair in fixed field order;
    *   5. entities: pairs with `link_score > threshold` feed
    *      [[Dedup.connectedComponents]] (min-id labels); records never
    *      linked keep themselves as their entity.
    *
    * Scale shape: candidate generation is the only stage that touches
    * text (shingled once); EM is `emIters` one-aggregation passes over
    * candidate pairs (NOT all pairs — blocking bounds the quadratic);
    * scoring is a broadcast of the |fields|-row weight table; CC runs
    * on the matched-pair graph only. No stage is new — this operator
    * is the composition contract, and its spec measures precision/
    * recall against planted duplicates.
    *
    * `fields` agreement expressions must reference the pair frame's
    * `a_<name>` / `b_<name>` columns (null ⇒ "comparison not possible"
    * — the EM/score missing-field contract).
    *
    * Output: one row per input record — (id, entity_id), entity_id =
    * the min record id of its linked component (own id if unlinked). */
  def resolveEntities(records: DataFrame, idCol: Column,
      blockTextCol: Column, attrs: Seq[(String, Column)],
      fields: Seq[(String, Column)], threshold: Double = 0.0,
      emIters: Int = 3, shingleK: Int = 3, numHashes: Int = 24,
      bands: Int = 8, maxBucket: Int = 200,
      family: Dedup.MinhashFamily = Dedup.XxMinhash): DataFrame = {
    val (base, pairs, fieldRefs) = erCandidatePairs(records, idCol,
      blockTextCol, attrs, fields, shingleK, numHashes, bands,
      maxBucket, family)
    val weights = emTrainWeights(pairs, fieldRefs, iters = emIters)
    erFinish(base, pairs, fieldRefs, weights, threshold)
  }

  /** [[resolveEntities]] under a FROZEN, caller-supplied weights table
    * (same schema as [[emTrainWeights]]/[[trainWeights]] output) — the
    * model-serving face: candidates → features → score → components,
    * no re-training. This is the batch equivalent the incremental
    * entity-resolution stream is held to: under frozen weights every
    * edge is a deterministic fact of the two records' content, which is
    * what makes append-only edge state sound. */
  def resolveEntitiesWithWeights(records: DataFrame, idCol: Column,
      blockTextCol: Column, attrs: Seq[(String, Column)],
      fields: Seq[(String, Column)], weights: DataFrame,
      threshold: Double = 0.0, shingleK: Int = 3, numHashes: Int = 24,
      bands: Int = 8, maxBucket: Int = 200,
      family: Dedup.MinhashFamily = Dedup.XxMinhash): DataFrame = {
    val (base, pairs, fieldRefs) = erCandidatePairs(records, idCol,
      blockTextCol, attrs, fields, shingleK, numHashes, bands,
      maxBucket, family)
    erFinish(base, pairs, fieldRefs, weights, threshold)
  }

  /** Stages 1–2 of entity resolution: blocked candidate pairs with the
    * caller's field-agreement features evaluated. */
  private def erCandidatePairs(records: DataFrame, idCol: Column,
      blockTextCol: Column, attrs: Seq[(String, Column)],
      fields: Seq[(String, Column)], shingleK: Int, numHashes: Int,
      bands: Int, maxBucket: Int, family: Dedup.MinhashFamily)
      : (DataFrame, DataFrame, Seq[(String, Column)]) = {
    require(attrs.nonEmpty && attrs.size <= 16,
      s"resolveEntities needs 1 <= attrs <= 16, got ${attrs.size}")
    require(attrs.map(_._1).distinct.size == attrs.size,
      "attr names must be distinct")
    val base = records.select(
      idCol.as("__id") +: blockTextCol.as("__text") +:
        attrs.map { case (n, c) => c.as(n) }: _*)
    val cands = Dedup.minhashCandidates(base, col("__id"), col("__text"),
      shingleK, numHashes, bands, maxBucket, family)
    val aSide = base.select(
      col("__id").as("__ia") +:
        attrs.map { case (n, _) => col(n).as(s"a_$n") }: _*)
    val bSide = base.select(
      col("__id").as("__ib") +:
        attrs.map { case (n, _) => col(n).as(s"b_$n") }: _*)
    val pairs = cands
      .join(aSide, col("id_a") === col("__ia"))
      .join(bSide, col("id_b") === col("__ib"))
      .select(col("id_a") +: col("id_b") +:
        fields.map { case (n, expr) => expr.as(s"__f_$n") }: _*)
    (base, pairs, fields.map { case (n, _) => n -> col(s"__f_$n") })
  }

  /** Stages 4–5: score under `weights`, threshold, components. */
  private def erFinish(base: DataFrame, pairs: DataFrame,
      fieldRefs: Seq[(String, Column)], weights: DataFrame,
      threshold: Double): DataFrame = {
    val scored = score(pairs, Seq(col("id_a"), col("id_b")), weights,
      fieldRefs)
    val matched = scored.filter(col("link_score") > threshold)
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(matched)
    base.select(col("__id").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("entity_id"))
  }
}
