package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-touch channel attribution by EXACT Shapley value (Shapley 1953;
  * the marketing formulation of Dalessandro et al. 2012): each
  * conversion is credited across the channels that touched the
  * converting user, as that channel's average marginal contribution
  * over all orderings of the channel set — the unique credit scheme
  * that is efficient (credits sum to the attributable conversions),
  * symmetric, and gives a never-contributing channel exactly zero.
  *
  * Characteristic function: v(S) = conversions among users whose
  * touched-channel set ⊆ S (coalition S "explains" exactly those
  * users). Then
  *
  *   φᵢ = Σ_{S ⊆ N∖{i}} s!·(k−1−s)!/k! · (v(S ∪ {i}) − v(S))
  *
  * Exactness: v is an integer conversion COUNT, the factorial weights
  * are exact longs (k ≤ 12 ⇒ weight ≤ 11! < 2²⁶), so φᵢ's numerator
  * Σ w·Δv is an exact BIGINT; the single division by k! at the end is
  * the only float op — φ hashes unrounded and Σφᵢ·k! == v(N)·k!
  * EXACTLY (the efficiency axiom, asserted by the spec as integers).
  *
  * Scale shape: ONE data-sized aggregation (user → touched-set bitmask
  * + converted flag) and one more to conversion counts per observed
  * mask (≤ 2ᵏ rows). Everything after runs on coalition frames bounded
  * by 2ᵏ ≤ 4096 rows — the subset-sum and the k·2ᵏ⁻¹ marginal pairs
  * are broadcast nested-loop joins over those constant-bounded frames,
  * never over data. Users touching NO listed channel are excluded
  * (their conversions are unattributable by construction — v(∅) = 0).
  *
  * `channels` is the explicit touch universe (ordering fixes the bit
  * indexing; touches outside it are ignored — list the conversion
  * event itself outside the universe).
  *
  * Output: one row per channel — (channel, phi_num, phi), with
  * phi_num the exact BIGINT numerator (φ·k!).
  */
object Attribution {

  private def factorial(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  def shapley(df: DataFrame, userCol: Column, channelCol: Column,
      convertedCol: Column, channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 12,
      s"shapley needs 1 <= channels <= 12, got $k")
    require(channels.distinct.size == k, "channels must be distinct")
    val spark = df.sparkSession

    // channel → 2^index power (null for non-universe touches)
    val pw = channels.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (name, i)) => when(channelCol === name, lit(1L << i))
        .otherwise(acc)
    }
    val perUser = df.filter(userCol.isNotNull)
      .select(userCol.as("__u"), pw.as("__pw"),
        convertedCol.cast("boolean").as("__cv"))
      .groupBy("__u")
      // powers are distinct bits, so SUM(DISTINCT) == bitwise OR, exact
      .agg(sum_distinct(col("__pw")).as("mask"),
        max(when(col("__cv"), 1L).otherwise(0L)).as("cv"))
    val vObs = perUser.filter(col("mask") > 0)
      .groupBy("mask").agg(sum(col("cv")).as("conv"))

    // v(S) = Σ_{T ⊆ S} conv(T) over all 2^k coalitions — a subset-sum
    // theta join on constant-bounded frames (≤ 2^k rows each side)
    val coalitions = spark.range(1L << k).select(col("id").as("s"))
    val v = coalitions
      .join(vObs, vObs("mask").bitwiseAND(coalitions("s")) === vObs("mask"),
        "left")
      .groupBy("s").agg(coalesce(sum(col("conv")), lit(0L)).as("v"))

    // marginal pairs: channel i × coalition S with i ∉ S, weighted by
    // s!(k−1−s)! — exact longs via a k-entry literal lookup
    val weights = typedLit((0 until k).map(s =>
      factorial(s) * factorial(k - 1 - s)))
    val names = typedLit(channels)
    val powers = typedLit((0 until k).map(1L << _))
    val chan = spark.range(k).select(col("id").cast("int").as("i"))
      .withColumn("__p", element_at(powers, col("i") + 1))
    val v1 = v.select(col("s").as("s0"), col("v").as("v0"))
    val v2 = v.select(col("s").as("s1"), col("v").as("v1"))
    chan
      .join(v1, col("__p").bitwiseAND(col("s0")) === 0L)
      .join(v2, col("s1") === col("s0") + col("__p"))
      .withColumn("__w", element_at(weights, bit_count(col("s0")) + 1))
      .groupBy(col("i"))
      .agg(sum(col("__w") * (col("v1") - col("v0"))).as("phi_num"))
      .select(element_at(names, col("i") + 1).as("channel"),
        col("phi_num"),
        (col("phi_num").cast("double") /
          lit(factorial(k).toDouble)).as("phi"))
  }
}
