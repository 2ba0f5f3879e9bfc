package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining — the classic co-occurrence OLAP
  * face (Agrawal et al. 1993): which items appear together in the same
  * basket more than chance predicts. For training-data work the
  * "basket" is a user's event set, a document's tag/domain set, a
  * session's pages — the support/confidence/lift triple is the standard
  * first look at any categorical co-occurrence question.
  *
  * Portability: every statistic is a ratio of EXACT BIGINT counts
  * (basket-distinct item counts, pair counts, basket total), each float
  * column one fixed division/expression over their casts — so the
  * registered query hashes against DuckDB with no tolerance.
  *
  * Scale shape: (basket, item) pairs deduplicate first (one hash agg);
  * pair candidates come from a self equi-join ON BASKET, so the work is
  * Σ_b |b|² — bounded by the `maxBasketItems` fail-fast (a degenerate
  * hub basket must raise, not silently run quadratic); item/basket
  * totals are two more narrow aggregations. Item names shuffle, text
  * never does. Higher-order itemsets compose by re-joining rules'
  * survivors (the a-priori property: a frequent triple's pairs are all
  * frequent) — deliberately out of scope here, stated rather than half
  * built.
  */
object Assoc {

  /** Directed association rules over co-occurring item pairs.
    *
    * The deduplicated (basket, item) set feeds three consumers (guard +
    * pair join, item totals, basket total) — three scans of the dedup
    * aggregate, which Catalyst cannot share across actions of one plan
    * tree. At corpus scale, materialize it first (localCheckpoint or a
    * staging table) and the three passes read columnar parquet instead
    * of re-deduplicating; at fixture scale the re-computation is noise.
    *
    * Output: (antecedent, consequent, n_ante, n_cons, n_both,
    * n_baskets, support, confidence, lift) — two rows per unordered
    * co-occurring pair (one per direction), pairs with
    * `n_both < minPairCount` dropped. support = n_both/n_baskets,
    * confidence = n_both/n_ante, lift = (n_both·n_baskets)/(n_ante·n_cons). */
  def associationRules(df: DataFrame, basketCol: Column, itemCol: Column,
      minPairCount: Long = 1, maxBasketItems: Int = 1000): DataFrame = {
    require(minPairCount >= 1 && maxBasketItems >= 2,
      "minPairCount >= 1, maxBasketItems >= 2")
    val bi = df.filter(basketCol.isNotNull && itemCol.isNotNull)
      .select(basketCol.as("bk"), itemCol.as("it")).distinct()
    val guarded = bi
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("bk")))
      .filter(assert_true(col("__bn") <= maxBasketItems,
        lit(s"associationRules: a basket holds more than " +
          s"maxBasketItems=$maxBasketItems distinct items — pair " +
          "candidates grow as |basket|**2; filter the hub basket or " +
          "raise maxBasketItems")).isNull)
      .drop("__bn")
    val nBaskets = bi.select(countDistinct(col("bk")).as("n_baskets"))
    val itemN = bi.groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    val pairN = guarded.as("l").join(guarded.as("r"),
        col("l.bk") === col("r.bk") && col("l.it") < col("r.it"))
      .groupBy(col("l.it").as("it_a"), col("r.it").as("it_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)
    val directed = pairN.select(col("it_a").as("antecedent"),
        col("it_b").as("consequent"), col("n_both"))
      .unionByName(pairN.select(col("it_b").as("antecedent"),
        col("it_a").as("consequent"), col("n_both")))
    directed
      .join(itemN.select(col("it").as("antecedent"),
        col("n_it").as("n_ante")), "antecedent")
      .join(itemN.select(col("it").as("consequent"),
        col("n_it").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .withColumn("support",
        col("n_both").cast("double") / col("n_baskets").cast("double"))
      .withColumn("confidence",
        col("n_both").cast("double") / col("n_ante").cast("double"))
      .withColumn("lift",
        (col("n_both").cast("double") * col("n_baskets").cast("double")) /
          (col("n_ante").cast("double") * col("n_cons").cast("double")))
      .select("antecedent", "consequent", "n_ante", "n_cons", "n_both",
        "n_baskets", "support", "confidence", "lift")
  }
}
