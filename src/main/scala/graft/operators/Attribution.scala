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
    shapleyFromVObs(df.sparkSession,
      maskConversionCounts(df, userCol, channelCol, convertedCol,
        channels), channels)
  }

  /** The coalition tail shared by [[shapley]] and
    * [[shapleyFromMaskCounts]]: subset-sum v(S), factorial-weighted
    * marginals, the single /k! — everything on 2ᵏ-bounded frames. */
  private def shapleyFromVObs(spark: org.apache.spark.sql.SparkSession,
      vObs: DataFrame, channels: Seq[String]): DataFrame = {
    val k = channels.size

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

  /** The PARTIAL behind [[shapley]]: conversions per exact touched-
    * channel bitmask over CLOSED users — one associative BIGINT sum
    * per observed mask (≤ 2ᵏ rows of state), so batch-sliced partials
    * re-summed per mask are exactly the one-shot table. The streaming
    * contract matches [[graft.operators.Stats.survivalCounts]]: a
    * user's (mask, converted) pair is an immutable FACT only once the
    * user is closed — an open user's mask and conversion status would
    * both mutate. */
  def maskConversionCounts(df: DataFrame, userCol: Column,
      channelCol: Column, convertedCol: Column,
      channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 12,
      s"maskConversionCounts needs 1 <= channels <= 12, got $k")
    // symmetric with transitionCounts: a duplicated channel would
    // silently map every touch to the LAST-listed bit during ingestion
    // and only fail at readout, after state accumulated under the
    // wrong masks — reject at the ingestion face.
    require(channels.distinct.size == k, "channels must be distinct")
    // channel → 2^index power (null for non-universe touches)
    val pw = channels.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (name, i)) => when(channelCol === name, lit(1L << i))
        .otherwise(acc)
    }
    df.filter(userCol.isNotNull)
      .select(userCol.as("__u"), pw.as("__pw"),
        convertedCol.cast("boolean").as("__cv"))
      .groupBy("__u")
      // powers are distinct bits, so SUM(DISTINCT) == bitwise OR, exact
      .agg(sum_distinct(col("__pw")).as("mask"),
        max(when(col("__cv"), 1L).otherwise(0L)).as("cv"))
      .filter(col("mask") > 0)
      .groupBy("mask").agg(sum(col("cv")).as("conv"))
  }

  /** Merge [[maskConversionCounts]] tables: BIGINT re-sum per mask. */
  def mergeMaskCounts(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col("mask")).agg(sum(col("conv")).as("conv"))

  /** Finalize a (possibly merged) [[maskConversionCounts]] table into
    * the [[shapley]] schema — the streaming-readout face. */
  def shapleyFromMaskCounts(counts: DataFrame,
      channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 12,
      s"shapleyFromMaskCounts needs 1 <= channels <= 12, got $k")
    require(channels.distinct.size == k, "channels must be distinct")
    shapleyFromVObs(counts.sparkSession, counts, channels)
  }

  /** Markov-chain removal-effect attribution (Anderl et al. 2016) —
    * the path-aware complement of [[shapley]]: user touch paths become
    * a first-order Markov chain (START → touches in event order →
    * CONV/NULL), and channel i's credit is how much the chain's
    * START→CONV absorption probability drops when i is removed
    * (its state pinned to 0 — mass routed through i is lost):
    *
    *   effect(i) = 1 − P_removed(i) / P_full
    *
    * Exactness contract (the logisticFit discipline): transition
    * counts are exact BIGINTs from ONE aggregation; probabilities are
    * single divisions; the absorption probabilities come from a FIXED
    * `iters`-step value iteration x ← T·x (+ conversion column) whose
    * per-state update sums terms in fixed declared-channel order — so
    * a mirror replaying the same recursion is bit-identical whether or
    * not the iteration has converged. The (k+1)² count matrix is
    * collected to the driver (constant-bounded, like logisticFit's
    * aggregated row); the k+1 value iterations are O(iters·k²) driver
    * flops.
    *
    * Path semantics: the path is ALL of a user's universe touches
    * ordered by (tsCol, tieCol) — `tieCol` must make the order total
    * (duplicate timestamps would make transition counts ambiguous);
    * conversion is the user-level `convertedCol` label (same contract
    * as [[shapley]]); users with no universe touch are excluded.
    *
    * Output: one row per channel — (channel, p_full, p_removed,
    * removal_effect), effect null when P_full = 0. */
  def markovRemoval(df: DataFrame, userCol: Column, channelCol: Column,
      tsCol: Column, tieCol: Column, convertedCol: Column,
      channels: Seq[String], iters: Int = 60): DataFrame =
    markovFromCounts(
      transitionCounts(df, userCol, channelCol, tsCol, tieCol,
        convertedCol, channels),
      channels, iters)

  /** The PARTIAL behind [[markovRemoval]]: exact (from, to) transition
    * counts over CLOSED users' paths — one associative BIGINT sum per
    * cell (≤ (k+1)(k+2) rows of state), so batch-sliced partials
    * re-summed per cell are exactly the one-shot matrix. The streaming
    * contract matches [[maskConversionCounts]]: a user's path and
    * conversion label are immutable FACTS only once the user is closed
    * — an open user's transitions would mutate with every new touch. */
  def transitionCounts(df: DataFrame, userCol: Column,
      channelCol: Column, tsCol: Column, tieCol: Column,
      convertedCol: Column, channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 16,
      s"transitionCounts needs 1 <= channels <= 16, got $k")
    require(channels.distinct.size == k, "channels must be distinct")

    val isTouch = channelCol.isin(channels: _*)
    val perUser = df.filter(userCol.isNotNull)
      .groupBy(userCol.as("__u"))
      .agg(sort_array(collect_list(when(isTouch && tsCol.isNotNull,
          struct(tsCol.as("ts"), tieCol.as("tie"),
            channelCol.as("ch"))))).as("__path"),
        max(when(convertedCol.cast("boolean"), 1L).otherwise(0L))
          .as("__cv"))
      .filter(size(col("__path")) > 0)
    // transitions: START→first, touch→next touch, last→CONV/NULL
    val path = transform(col("__path"), x => x.getField("ch"))
    val trans = perUser.select(explode(concat(
      array(struct(lit("START").as("from"),
        element_at(path, 1).as("to"))),
      // guard: Spark sequence(1, 0) DESCENDS instead of being empty
      when(size(path) > 1,
        transform(sequence(lit(1), size(path) - 1), i =>
          struct(element_at(path, i).as("from"),
            element_at(path, i + 1).as("to"))))
        .otherwise(array().cast("array<struct<from:string,to:string>>")),
      array(struct(element_at(path, size(path)).as("from"),
        when(col("__cv") === 1L, lit("CONV")).otherwise(lit("NULL"))
          .as("to"))))).as("__t"))
      .groupBy(col("__t.from").as("from"), col("__t.to").as("to"))
      .agg(count(lit(1)).as("n"))
    trans
  }

  /** Merge [[transitionCounts]] tables: BIGINT re-sum per (from, to). */
  def mergeTransitionCounts(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col("from"), col("to")).agg(sum(col("n")).as("n"))

  /** Finalize a (possibly merged) [[transitionCounts]] matrix into the
    * [[markovRemoval]] schema — the streaming-readout face. The driver
    * collect is the constant-bounded count matrix, nothing else. */
  def markovFromCounts(trans: DataFrame, channels: Seq[String],
      iters: Int = 60): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 16,
      s"markovFromCounts needs 1 <= channels <= 16, got $k")
    require(channels.distinct.size == k, "channels must be distinct")
    require(iters >= 1 && iters <= 1000, s"iters in 1..1000, got $iters")
    val spark = trans.sparkSession
    // constant-bounded collect: ≤ (k+1)(k+2) transition cells
    val cells = trans.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromStates = "START" +: channels
    val toChannels = channels
    // fail fast on a counts table built under a DIFFERENT channel
    // universe — silently dropping unknown cells from the row totals
    // would renormalize the transition probabilities (same discipline
    // as Linkage.score's raise_error on missing weights).
    val validFrom = fromStates.toSet
    val validTo = channels.toSet + "CONV" + "NULL"
    val unknown = cells.keys.filter { case (f, t) =>
      !validFrom.contains(f) || !validTo.contains(t) }
    require(unknown.isEmpty,
      s"markovFromCounts: transition cells outside the declared " +
        s"channel universe: ${unknown.take(5).mkString(", ")}")
    def cnt(f: String, t: String): Long = cells.getOrElse((f, t), 0L)
    val totals = fromStates.map(f =>
      f -> (toChannels.map(cnt(f, _)) ++
        Seq(cnt(f, "CONV"), cnt(f, "NULL"))).sum).toMap
    def p(f: String, t: String): Double = {
      val tot = totals(f)
      if (tot == 0L) 0.0 else cnt(f, t).toDouble / tot.toDouble
    }
    // fixed-iteration value iteration; removed = index into channels
    // whose state is pinned to 0 (-1 = none). Term order is the float
    // contract: channels in declared order, then the CONV term.
    def absorb(removed: Int): Double = {
      val x = Array.fill(fromStates.size)(0.0) // x(0)=START, x(1+i)=ch i
      for (_ <- 1 to iters) {
        val xNew = new Array[Double](fromStates.size)
        for (si <- fromStates.indices) {
          val f = fromStates(si)
          var acc = 0.0
          for (ci <- toChannels.indices)
            acc += p(f, toChannels(ci)) *
              (if (ci == removed) 0.0 else x(1 + ci))
          acc += p(f, "CONV")
          xNew(si) = acc
        }
        if (removed >= 0) xNew(1 + removed) = 0.0
        Array.copy(xNew, 0, x, 0, x.length)
      }
      x(0)
    }
    val pFull = absorb(-1)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_full", DoubleType, nullable = false),
      StructField("p_removed", DoubleType, nullable = false),
      StructField("removal_effect", DoubleType, nullable = true)))
    val out: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(channels.indices.map { i =>
        val pr = absorb(i)
        val eff: Any = if (pFull > 0.0) 1.0 - pr / pFull else null
        org.apache.spark.sql.Row(channels(i), pFull, pr, eff)
      }: _*)
    spark.createDataFrame(out, schema)
  }

  /** Position-based + time-decay attribution baselines — the four
    * heuristic credit models practitioners sanity-check [[shapley]] /
    * [[markovRemoval]] against, all from ONE pass over the SAME
    * ordered per-user touch paths [[transitionCounts]] builds:
    *
    *  - first_touch / last_touch: 1 credit to the first / last touch —
    *    exact BIGINT counts, no quantization needed.
    *  - u_shaped: 40% first / 40% last / 20% split over middles
    *    (1 touch → 100%, 2 touches → 50/50). Per-touch credit is a
    *    pure function of (position, path length), quantized
    *    floor(credit·10⁶) per touch and BIGINT-summed — no cross-user
    *    float accumulation, so the hash is exact.
    *  - time_decay: a STEP half-life — each touch is halved once per
    *    full `halfLifeDays` elapsed before the path's last touch,
    *    capped at 40 halvings. The weight 2^(−steps) is a dyadic
    *    rational (exactly representable), and with ≤ `maxTouches` ≤
    *    2¹² touches the per-user weight sum stays under 2⁵³ of the
    *    common denominator — EXACT regardless of summation order, so
    *    both the Spark window sum and a SQL mirror's agree bit-for-bit
    *    without an ordered fold. The normalized share w/Σw is one
    *    float division, then the same floor(·10⁶) quantization.
    *
    * Only CONVERTED users' paths earn credit (same user-level
    * conversion contract as [[shapley]]); channels never touched by a
    * converter appear with all-zero credit (the null-player readout).
    * Efficiency: Σ first_touch = Σ last_touch = converting users with
    * a path, exactly; Σ u_num and Σ td_num are within |path|·1 of
    * 10⁶·conversions (floor loss only — asserted by the spec).
    *
    * Scale shape: one data-sized per-user aggregation (the path
    * collect), one in-row weight pass over ≤ maxTouches elements, one
    * ≤ k-row final aggregation. Output: one row per declared channel —
    * (channel, first_touch, last_touch, u_num, u_shaped, td_num,
    * time_decay). */
  def positionAttribution(df: DataFrame, userCol: Column,
      channelCol: Column, tsCol: Column, tieCol: Column,
      convertedCol: Column, channels: Seq[String],
      halfLifeDays: Double = 7.0, maxTouches: Int = 1024): DataFrame =
    positionFromCredits(
      positionCreditCounts(df, userCol, channelCol, tsCol, tieCol,
        convertedCol, channels, halfLifeDays, maxTouches),
      channels)

  /** The PARTIAL behind [[positionAttribution]]: per-channel exact
    * BIGINT credit sums (first/last counts, quantized U-shaped and
    * decay numerators) over CLOSED users' paths — four associative
    * sums (≤ k rows of state), so batch-sliced partials re-summed per
    * channel are exactly the one-shot table. Same closed-user contract
    * as [[maskConversionCounts]]: an open user's path (and hence every
    * positional credit on it) would mutate with each new touch. */
  def positionCreditCounts(df: DataFrame, userCol: Column,
      channelCol: Column, tsCol: Column, tieCol: Column,
      convertedCol: Column, channels: Seq[String],
      halfLifeDays: Double = 7.0, maxTouches: Int = 1024): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 16,
      s"positionCreditCounts needs 1 <= channels <= 16, got $k")
    require(channels.distinct.size == k, "channels must be distinct")
    require(halfLifeDays > 0.0, s"halfLifeDays > 0, got $halfLifeDays")
    require(maxTouches >= 1 && maxTouches <= 4096,
      s"maxTouches in 1..4096, got $maxTouches") // 2^12·2^40 < 2^53
    val q = 1000000L

    val isTouch = channelCol.isin(channels: _*)
    val perUser = df.filter(userCol.isNotNull)
      .groupBy(userCol.as("__u"))
      .agg(sort_array(collect_list(when(isTouch && tsCol.isNotNull,
          struct(tsCol.as("ts"), tieCol.as("tie"),
            channelCol.as("ch"))))).as("__path"),
        max(when(convertedCol.cast("boolean"), 1L).otherwise(0L))
          .as("__cv"))
      .filter(size(col("__path")) > 0 && col("__cv") === 1L)
      .filter(assert_true(size(col("__path")) <= maxTouches,
        lit(s"positionAttribution: a user exceeds maxTouches=" +
          s"$maxTouches touches — cap or sample paths first")).isNull)

    val path = col("__path")
    val kP = size(path)
    val kD = kP.cast("double")
    val tLast = unix_timestamp(element_at(path, kP).getField("ts"))
    // dyadic step-decay weights; Σ is exact (order-insensitive)
    val weights = transform(path, x => {
      val steps = least(lit(40L),
        floor((tLast - unix_timestamp(x.getField("ts"))).cast("double") /
          lit(86400.0) / lit(halfLifeDays)).cast("long"))
      // 2^(−steps) via shift + one division — exact in any engine,
      // no libm pow in the float contract
      lit(1.0) / call_function("shiftleft", lit(1L), steps.cast("int"))
        .cast("double")
    })
    // per-touch credit rows: (ch, ft, lt, uq, tdq). __w/__sw are STAGED
    // attributes (r16): both were single-reference expression trees that
    // CollapseProject inlined INTO the per-touch lambda below, so
    // interpreted HOF eval rebuilt the whole weight array AND re-ran the
    // sum fold once per touch — O(touches²) timestamp math per user
    // (measured 3.3 s → 0.74 s on c_position_attribution at sf0.1). The
    // assert between the projections is a true invariant (the last
    // touch's decay weight is exactly 1.0, so Σ ≥ 1) and doubles as the
    // Project boundary that keeps __sw from being collapsed back in.
    val rows = transform(sequence(lit(1), kP), i => {
      val uq = when(kP === 1, lit(q))
        .when(kP === 2, lit(500000L))
        .when(i === 1 || i === kP, lit(400000L))
        .otherwise(floor(lit(0.2) / (kD - lit(2.0)) * lit(1.0e6))
          .cast("long"))
      val tdq = floor(element_at(col("__w"), i) / col("__sw") * lit(1.0e6))
        .cast("long")
      struct(element_at(path, i).getField("ch").as("ch"),
        when(i === 1, 1L).otherwise(0L).as("ft"),
        when(i === kP, 1L).otherwise(0L).as("lt"),
        uq.as("uq"), tdq.as("tdq"))
    })
    perUser
      .withColumn("__w", weights)
      .withColumn("__sw", aggregate(col("__w"), lit(0.0), (a, w) => a + w))
      .filter(assert_true(col("__sw") >= 1.0,
        lit("positionAttribution: decay-weight sum below 1 — the last " +
          "touch must weigh exactly 1.0")).isNull)
      .withColumn("__r", explode(rows))
      .groupBy(col("__r.ch").as("channel"))
      .agg(sum(col("__r.ft")).as("first_touch"),
        sum(col("__r.lt")).as("last_touch"),
        sum(col("__r.uq")).as("u_num"),
        sum(col("__r.tdq")).as("td_num"))
  }

  /** Merge [[positionCreditCounts]] tables: BIGINT re-sum per channel. */
  def mergePositionCredits(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col("channel"))
      .agg(sum(col("first_touch")).as("first_touch"),
        sum(col("last_touch")).as("last_touch"),
        sum(col("u_num")).as("u_num"),
        sum(col("td_num")).as("td_num"))

  /** Finalize a (possibly merged) [[positionCreditCounts]] table into
    * the [[positionAttribution]] schema — the streaming-readout face:
    * zero-fill the declared universe (the null-player readout) and
    * derive the /10⁶ doubles. */
  def positionFromCredits(credited: DataFrame,
      channels: Seq[String]): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 16,
      s"positionFromCredits needs 1 <= channels <= 16, got $k")
    require(channels.distinct.size == k, "channels must be distinct")
    val spark = credited.sparkSession
    val names = typedLit(channels)
    val universe = spark.range(k)
      .select(element_at(names, col("id").cast("int") + 1).as("channel"))
    universe.join(credited, Seq("channel"), "left")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("u_num"), lit(0L)).as("u_num"),
        (coalesce(col("u_num"), lit(0L)).cast("double") /
          lit(1.0e6)).as("u_shaped"),
        coalesce(col("td_num"), lit(0L)).as("td_num"),
        (coalesce(col("td_num"), lit(0L)).cast("double") /
          lit(1.0e6)).as("time_decay"))
  }
}
