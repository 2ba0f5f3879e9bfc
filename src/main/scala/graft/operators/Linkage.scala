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
    * pair key (e.g. id_a, id_b). Adds (n_fields, link_score). */
  def score(pairs: DataFrame, idCols: Seq[Column], weights: DataFrame,
      fields: Seq[(String, Column)]): DataFrame = {
    val exploded = pairs
      .select(idCols :+ explode(fieldArray(fields)).as("__f"): _*)
    val idNames = exploded.columns.dropRight(1).toSeq
    val f = col("__f")
    exploded
      .join(broadcast(weights.select(col("field"), col("w_agree"),
        col("w_disagree"))), f.getField("field") === col("field"))
      .withColumn("__c",
        when(f.getField("agree").isNull, lit(0.0))
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
}
