package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cox proportional-hazards regression (Cox, JRSS-B 1972) with the
  * Breslow tie convention — the multivariate closer of the survival
  * block: where Kaplan–Meier/Nelson–Aalen DESCRIBE one curve and the
  * log-rank family TESTS two, Cox explains hazard with covariates:
  *
  *   λ(t | x) = λ₀(t) · exp(x·β)
  *
  * fit by Newton–Raphson on the Breslow partial log-likelihood
  *
  *   l(β) = Σ_events [ xᵢ·β − ln S0(tᵢ) ],  S0(t) = Σ_{tⱼ ≥ t} exp(xⱼ·β)
  *
  * with gradient Σ_events [xᵢ − S1/S0] and information
  * Σ_events d·[S2/S0 − (S1/S0)(S1/S0)ᵀ] (tied events share their
  * time's risk-set sums).
  *
  * Determinism contract (the logisticFit/EM discipline, adapted):
  * covariates are quantized ONCE to qx = floor(x·xQuant) — the model
  * is FIT ON THE QUANTIZED COVARIATES, a documented part of the
  * contract — and each iteration quantizes the per-subject hazard
  * weight to qw = floor(exp(η)·wQuant). Every per-(group, t) cell sum
  * is then an EXACT integer: Σqw, Σqw·qx and Σqw·qx·qx accumulate as
  * DECIMAL(38,0) (the triple product reaches ~1e26 — past BIGINT,
  * comfortably inside decimal-128). Suffix risk-set sums fold over the
  * ≤ maxTimes time cells IN-ROW in descending-time order, so gradient/
  * information/log-likelihood are fixed-order float expressions over
  * exact integers — bit-reproducible across layouts and cluster sizes.
  * `exp` keeps this operator out of the SQL oracle registry (the
  * PCA/HLL convention): CoxSpec pins it with a bitwise single-threaded
  * replay instead.
  *
  * Scale shape: per iteration, ONE data-sized aggregation thins
  * subjects to the per-(group, t) cell grid, then one ≤ maxTimes
  * in-row fold per group; β reaches the executors as a BROADCAST
  * (group → coefficients) table, and the driver holds (p²+2p+2)
  * numbers per group for the p×p Newton solve (p ≤ 4). Groups are
  * strata, each with its own β; the per-iteration collect is one row
  * per group, so strata stay bounded (maxGroups, require-guarded).
  *
  * Output: one row per (group, covariate) — (groups..., covariate,
  * beta, se, z, hazard_ratio, n_subjects, n_events, loglik); se from
  * the inverse information at the final β. Group columns are emitted
  * as strings (strata labels). */
object Cox {

  private val Sep = "\u0001" // raw control chars stay out of source

  def coxPh(df: DataFrame, groupCols: Seq[String], durationCol: Column,
      eventCol: Column, covariates: Seq[(String, Column)],
      iters: Int = 8, maxTimes: Int = 1000, xQuant: Double = 1e4,
      wQuant: Double = 1e6, maxEta: Double = 20.0,
      maxGroups: Int = 10000): DataFrame = {
    val p = covariates.size
    require(p >= 1 && p <= 4, s"coxPh needs 1 <= covariates <= 4, got $p")
    require(covariates.map(_._1).distinct.size == p,
      "covariate names must be distinct")
    require(iters >= 1 && iters <= 50, s"iters in 1..50, got $iters")
    require(maxTimes >= 1 && maxTimes <= 10000,
      s"maxTimes in 1..10000, got $maxTimes")
    require(xQuant >= 1.0 && xQuant <= 1e6 &&
      xQuant == math.floor(xQuant), "xQuant integral in [1, 1e6]")
    require(wQuant >= 1.0 && wQuant <= 1e9 &&
      wQuant == math.floor(wQuant), "wQuant integral in [1, 1e9]")
    require(maxEta > 0.0 && maxEta <= 20.0,
      "maxEta in (0, 20] (exp(20)·wQuant must stay a safe BIGINT)")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val ev = eventCol.cast("boolean")
    val dec18 = DataTypes.createDecimalType(18, 0)
    val dec38 = DataTypes.createDecimalType(38, 0)
    val upper = for (j <- 0 until p; k <- j until p) yield (j, k)

    // quantize covariates ONCE; |qx| bound keeps qw·qx·qx ≤ ~1e26,
    // inside DECIMAL(38,0) with 10+ digits of summing headroom
    val base = df
      .filter(durationCol.isNotNull && ev.isNotNull &&
        covariates.map(_._2.isNotNull).reduce(_ && _))
      .select(Seq(concat_ws(Sep, g.map(_.cast("string")): _*).as("__k"),
        durationCol.cast("double").as("t"),
        when(ev, 1L).otherwise(0L).as("d")) ++
        covariates.zipWithIndex.map { case ((_, c), j) =>
          floor(c.cast("double") * lit(xQuant)).cast("long").as(s"qx$j")
        }: _*)
      .filter(assert_true(
        covariates.indices.map(j => abs(col(s"qx$j")))
          .reduce(greatest(_, _)) <= lit(1000000L),
        lit("coxPh: |x*xQuant| must stay <= 1e6 — standardize or " +
          "rescale covariates, or lower xQuant")).isNull)
    base.persist()
    try {
      val keys = base.select(col("__k")).distinct()
        .collect().map(_.getString(0)).sorted
      require(keys.length >= 1, "coxPh: no usable subjects")
      require(keys.length <= maxGroups,
        s"coxPh: ${keys.length} strata exceed maxGroups=$maxGroups — " +
          "the per-iteration Newton state is driver-held per stratum")

      // ---- one Newton iteration: per-group (n, events, grad, upper
      // info triangle, loglik) under the given per-group β
      def iterate(beta: Map[String, Array[Double]]): Map[String,
          (Long, Long, Array[Double], Array[Double], Double)] = {
        val betaRows: java.util.List[Row] = java.util.Arrays.asList(
          beta.toSeq.sortBy(_._1).map { case (k, b) =>
            Row.fromSeq(k +: b.toSeq) }: _*)
        val betaSchema = StructType(
          StructField("__k", StringType, nullable = false) +:
            covariates.indices.map(j =>
              StructField(s"__b$j", DoubleType, nullable = false)))
        val betaDf = spark.createDataFrame(betaRows, betaSchema)
        val joined = base.join(broadcast(betaDf), Seq("__k"))
        val eta = covariates.indices
          .map(j => col(s"qx$j").cast("double") / lit(xQuant) *
            col(s"__b$j"))
          .reduce(_ + _)
        val withW = joined
          .withColumn("__eta", eta)
          .filter(assert_true(abs(col("__eta")) <= lit(maxEta),
            lit(s"coxPh: |x*beta| exceeded maxEta=$maxEta — " +
              "diverging fit or unscaled covariates (exp would " +
              "overflow the exact-integer contract)")).isNull)
          .withColumn("__qw",
            floor(exp(col("__eta")) * lit(wQuant)).cast("long"))
        // per-(group, t) exact cells
        val cellAggs =
          Seq(sum(col("d")).as("cd"), count(lit(1)).as("cn"),
            sum(col("__qw").cast(dec18)).as("cw")) ++
          covariates.indices.map(j =>
            sum(when(col("d") === 1L, col(s"qx$j")).otherwise(0L))
              .as(s"sx$j")) ++
          covariates.indices.map(j =>
            sum(col("__qw").cast(dec18) * col(s"qx$j").cast(dec18))
              .as(s"cwx$j")) ++
          upper.map { case (j, k) =>
            sum(col("__qw").cast(dec18) * col(s"qx$j").cast(dec18) *
              col(s"qx$k").cast(dec18)).as(s"cwxx${j}_$k") }
        val cells = withW.groupBy(col("__k"), col("t"))
          .agg(cellAggs.head, cellAggs.tail: _*)
        val cellStruct = struct(Seq(col("t"), col("cd"), col("cn"),
          col("cw")) ++
          covariates.indices.map(j => col(s"sx$j")) ++
          covariates.indices.map(j => col(s"cwx$j")) ++
          upper.map { case (j, k) => col(s"cwxx${j}_$k") }: _*)
        val grouped = cells.groupBy(col("__k"))
          .agg(reverse(sort_array(collect_list(cellStruct))).as("__s"),
            sum(col("cn")).as("__n"), sum(col("cd")).as("__ne"))
          .filter(assert_true(size(col("__s")) <= maxTimes,
            lit(s"coxPh: a group exceeds maxTimes=$maxTimes distinct " +
              "times — bin durations coarser first")).isNull)
          .join(broadcast(betaDf), Seq("__k"))
        val accInit = struct(
          Seq(lit(0L).cast(dec38).as("s0")) ++
          covariates.indices.map(j =>
            lit(0L).cast(dec38).as(s"s1_$j")) ++
          upper.map { case (j, k) =>
            lit(0L).cast(dec38).as(s"s2_${j}_$k") } ++
          covariates.indices.map(j => lit(0.0).as(s"g_$j")) ++
          upper.map { case (j, k) => lit(0.0).as(s"h_${j}_$k") } ++
          Seq(lit(0.0).as("ll")): _*)
        val fin = aggregate(col("__s"), accInit, (acc, x) => {
          // the risk set at a time includes the time itself
          val s0 = acc.getField("s0") + x.getField("cw").cast(dec38)
          val s1 = covariates.indices.map(j =>
            acc.getField(s"s1_$j") + x.getField(s"cwx$j").cast(dec38))
          val s2 = upper.map { case (j, k) =>
            acc.getField(s"s2_${j}_$k") +
              x.getField(s"cwxx${j}_$k").cast(dec38) }
          val d = x.getField("cd")
          val dD = d.cast("double")
          val informative = d > 0L
          val s0D = s0.cast("double")
          def r1(j: Int): Column = // S1/S0 in TRUE x units
            s1(j).cast("double") / s0D / lit(xQuant)
          val gNew = covariates.indices.map { j =>
            acc.getField(s"g_$j") + when(informative,
              x.getField(s"sx$j").cast("double") / lit(xQuant) -
                dD * r1(j)).otherwise(lit(0.0)) }
          val hNew = upper.zipWithIndex.map { case ((j, k), i) =>
            acc.getField(s"h_${j}_$k") + when(informative,
              dD * (s2(i).cast("double") / s0D / lit(xQuant) /
                lit(xQuant) - r1(j) * r1(k))).otherwise(lit(0.0)) }
          // loglik: Σ_{events at t} x·β recovered from the sx sums;
          // true ln S0 = ln(s0D) − ln(wQuant)
          val betaDot = covariates.indices.map(j =>
            x.getField(s"sx$j").cast("double") / lit(xQuant) *
              col(s"__b$j")).reduce(_ + _)
          val llNew = acc.getField("ll") + when(informative,
            betaDot - dD * (log(s0D) - lit(math.log(wQuant))))
            .otherwise(lit(0.0))
          struct(
            Seq(s0.as("s0")) ++
            covariates.indices.map(j => s1(j).as(s"s1_$j")) ++
            upper.zipWithIndex.map { case ((j, k), i) =>
              s2(i).as(s"s2_${j}_$k") } ++
            gNew.zipWithIndex.map { case (c, j) => c.as(s"g_$j") } ++
            upper.zipWithIndex.map { case ((j, k), i) =>
              hNew(i).as(s"h_${j}_$k") } ++
            Seq(llNew.as("ll")): _*)
        })
        grouped
          .withColumn("__f", fin)
          .select(Seq(col("__k"), col("__n"), col("__ne")) ++
            covariates.indices.map(j =>
              col("__f").getField(s"g_$j").as(s"g_$j")) ++
            upper.map { case (j, k) =>
              col("__f").getField(s"h_${j}_$k").as(s"h_${j}_$k") } ++
            Seq(col("__f").getField("ll").as("ll")): _*)
          .collect()
          .map { r =>
            val grad = covariates.indices
              .map(j => r.getAs[Double](s"g_$j")).toArray
            val info = upper.map { case (j, k) =>
              r.getAs[Double](s"h_${j}_$k") }.toArray
            r.getAs[String]("__k") ->
              ((r.getAs[Long]("__n"), r.getAs[Long]("__ne"), grad,
                info, r.getAs[Double]("ll")))
          }.toMap
      }

      // ---- deterministic p×p solve (partial-pivot Gaussian elim)
      def solve(infoUpper: Array[Double],
          rhs: Array[Double]): Array[Double] = {
        val a = Array.ofDim[Double](p, p)
        var idx = 0
        for (j <- 0 until p; k <- j until p) {
          a(j)(k) = infoUpper(idx); a(k)(j) = infoUpper(idx); idx += 1
        }
        val m = Array.tabulate(p, p + 1)((i, c) =>
          if (c < p) a(i)(c) else rhs(i))
        for (c <- 0 until p) {
          var piv = c
          for (r <- c + 1 until p)
            if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
          if (math.abs(m(piv)(c)) < 1e-12)
            throw new IllegalStateException(
              "coxPh: singular information matrix — collinear or " +
                "constant covariates in a stratum")
          val tmp = m(c); m(c) = m(piv); m(piv) = tmp
          for (r <- 0 until p; if r != c) {
            val f = m(r)(c) / m(c)(c)
            for (cc <- c to p) m(r)(cc) -= f * m(c)(cc)
          }
        }
        Array.tabulate(p)(i => m(i)(p) / m(i)(i))
      }
      def inverse(infoUpper: Array[Double]): Array[Array[Double]] = {
        val cols = (0 until p).map { j =>
          val e = Array.fill(p)(0.0); e(j) = 1.0
          solve(infoUpper, e)
        }
        Array.tabulate(p, p)((i, j) => cols(j)(i))
      }

      var beta: Map[String, Array[Double]] =
        keys.map(_ -> Array.fill(p)(0.0)).toMap
      for (_ <- 1 to iters) {
        val stats = iterate(beta)
        beta = beta.map { case (k, b) =>
          val (_, _, grad, info, _) = stats(k)
          val step = solve(info, grad)
          k -> Array.tabulate(p)(j => b(j) + step(j))
        }
      }
      // standard errors + loglik from the information at the FINAL β
      val finalStats = iterate(beta)

      val schema = StructType(
        groupCols.map(n => StructField(n, StringType, nullable = true)) ++
        Seq(StructField("covariate", StringType, nullable = false),
          StructField("beta", DoubleType, nullable = false),
          StructField("se", DoubleType, nullable = false),
          StructField("z", DoubleType, nullable = false),
          StructField("hazard_ratio", DoubleType, nullable = false),
          StructField("n_subjects", LongType, nullable = false),
          StructField("n_events", LongType, nullable = false),
          StructField("loglik", DoubleType, nullable = false)))
      val rows: Seq[Row] = keys.toSeq.flatMap { k =>
        val (n, ne, _, info, ll) = finalStats(k)
        val inv = inverse(info)
        val parts = k.split(Sep, -1).toSeq
        covariates.indices.map { j =>
          val b = beta(k)(j)
          val se = math.sqrt(inv(j)(j))
          Row.fromSeq(parts ++ Seq(covariates(j)._1, b, se, b / se,
            math.exp(b), n, ne, ll))
        }
      }
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally base.unpersist()
  }
}
