package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the standard
  * dimensionality-reduction / decorrelation step before ANN indexing at
  * corpus scale (the rotation OPQ applies before product quantization,
  * the whitening SemDeDup-style pipelines run before cosine thresholds).
  *
  * Scale shape: the ONLY distributed work is one aggregation pass that
  * reduces the corpus to a d(d+3)/2-double summary (count, per-dimension
  * sums, upper-triangle co-moment sums) through a mergeable typed
  * `Aggregator` — partial buffers combine map-side, so at 100 TB the
  * exchange carries one ~d²/2 buffer per partition and nothing else; the
  * eigen-decomposition runs on the DRIVER over the d×d matrix (d ≤ 512
  * enforced — embeddings, not feature explosions), and projection is a
  * broadcast-literal [[Similarity.dot]] per component, codegen'd at scan
  * speed with no shuffle and no UDF.
  *
  * Float sums are order-dependent in the last bits (unlike the exact
  * integer moments in [[Stats]]), so PCA results are reproducible to
  * ~1e-12 relative — not bit-identical — across partitionings; this
  * operator therefore stays OUT of the oracle registry (the HLL
  * convention: no engine-portable oracle exists) and is spec-pinned by
  * differentials instead (PcaSpec: covariance vs naive, eigenpairs vs
  * A·v = λ·v, variance ordering, reconstruction-error monotonicity).
  */
object Pca {

  /** One input vector for the covariance aggregator. */
  final case class VecIn(v: Array[Double])

  /** Covariance buffer: `n`, per-dim sums `s` (length d), upper-triangle
    * co-moment sums `p` (length d(d+1)/2, row-major: (i,j≥i) at
    * i·d − i(i−1)/2 + (j−i)). */
  final case class CovBuf(n: Long, s: Array[Double], p: Array[Double])

  /** Corpus summary from one aggregation pass: row count, mean vector,
    * and the SAMPLE covariance matrix (n−1 denominator). */
  final case class CovarianceModel(n: Long, mean: Array[Double],
      cov: Array[Array[Double]])

  /** Fitted rotation: top-k eigenpairs of the covariance (eigenvalues
    * descending, components row-wise, each unit-norm) plus the mean for
    * centering. */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  private class CovAgg(dim: Int)
      extends Aggregator[VecIn, CovBuf, CovBuf] with Serializable {
    private val tri = dim * (dim + 1) / 2
    def zero: CovBuf = CovBuf(0L, new Array[Double](dim), new Array[Double](tri))
    def reduce(b: CovBuf, a: VecIn): CovBuf = {
      val v = a.v
      require(v.length == dim,
        s"covariance: vector of length ${v.length}, expected $dim")
      // buffers are owned by this aggregator instance between serde
      // points, so in-place accumulation is safe (the BoundedTopK
      // convention) and avoids a tri-sized allocation per row
      var i = 0; var o = 0
      while (i < dim) {
        b.s(i) += v(i)
        var j = i
        while (j < dim) { b.p(o) += v(i) * v(j); j += 1; o += 1 }
        i += 1
      }
      CovBuf(b.n + 1, b.s, b.p)
    }
    def merge(x: CovBuf, y: CovBuf): CovBuf = {
      if (x.n == 0L) return y
      if (y.n == 0L) return x
      var i = 0
      while (i < dim) { x.s(i) += y.s(i); i += 1 }
      var o = 0
      while (o < tri) { x.p(o) += y.p(o); o += 1 }
      CovBuf(x.n + y.n, x.s, x.p)
    }
    def finish(r: CovBuf): CovBuf = r
    def bufferEncoder: org.apache.spark.sql.Encoder[CovBuf] =
      Encoders.product[CovBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[CovBuf] =
      Encoders.product[CovBuf]
  }

  /** One-pass mean + sample covariance of `vecCol` (array of
    * float/double, fixed length `dim`). Null vectors are dropped;
    * a wrong-length vector hard-errors (silent truncation would skew
    * every co-moment). Needs n ≥ 2. */
  def covariance(df: DataFrame, vecCol: Column, dim: Int): CovarianceModel =
    covarianceFromPartials(covariancePartials(df, vecCol, dim), dim)

  /** The PARTIAL summary behind [[covariance]]: ONE row (n, s, p) per
    * call — the at-rest artifact for incremental refits (store one row
    * per arriving batch, [[covarianceFromPartials]] the union later;
    * the streaming face is
    * [[graft.streaming.StreamingTimeSeries.startCovarianceQuery]]). */
  def covariancePartials(df: DataFrame, vecCol: Column,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 512,
      s"covariance supports 1 <= dim <= 512 embeddings, got $dim " +
        "(the d x d summary must stay driver-sized)")
    val agg = udaf(new CovAgg(dim), Encoders.product[VecIn])
    df.filter(vecCol.isNotNull)
      .select(agg(vecCol.cast("array<double>")).as("b"))
      .select(col("b.n").as("n"), col("b.s").as("s"), col("b.p").as("p"))
  }

  /** Finalize a table of [[covariancePartials]] rows into a
    * [[CovarianceModel]]. The driver fold runs in a DETERMINISTIC order
    * (rows sorted by (n, s) before summing) so a given set of stored
    * partials always reads back the same model — float addition makes
    * the merged model ~1e-12-relative equal to a one-shot fit, not
    * bit-identical (a single-partial table IS bit-identical, which is
    * what [[covariance]] routes through). */
  def covarianceFromPartials(partials: DataFrame,
      dim: Int): CovarianceModel = {
    val spark = partials.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val rows = partials.select(col("n"), col("s"), col("p"))
      .as[(Long, Array[Double], Array[Double])]
      .collect()
      .filter(_._1 > 0)
      .sortBy { case (n0, s0, _) => (n0, s0.toSeq) }(
        Ordering.Tuple2(Ordering.Long, Ordering.Implicits.seqOrdering))
    require(rows.nonEmpty, "covariance: no partial rows")
    rows.foreach { case (_, s0, p0) =>
      require(s0.length == dim && p0.length == tri,
        s"covariance partials for dim ${s0.length}, expected $dim") }
    val n = rows.map(_._1).sum
    require(n >= 2, s"covariance needs at least 2 vectors, got $n")
    val s = new Array[Double](dim)
    val p = new Array[Double](tri)
    rows.foreach { case (_, s0, p0) =>
      var i = 0
      while (i < dim) { s(i) += s0(i); i += 1 }
      var o = 0
      while (o < tri) { p(o) += p0(o); o += 1 }
    }
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var o = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        // sample covariance: (Σ x_i x_j − n·m_i·m_j) / (n − 1)
        val c = (p(o) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; o += 1
      }
      i += 1
    }
    CovarianceModel(n, mean, cov)
  }

  /** Cyclic Jacobi eigen-decomposition of the symmetric covariance —
    * driver-side, deterministic (fixed sweep order, fixed iteration
    * budget, convergence on off-diagonal norm). Returns the top `k`
    * eigenpairs by eigenvalue. */
  def principalComponents(model: CovarianceModel, k: Int): PcaModel = {
    val d = model.cov.length
    require(k >= 1 && k <= d, s"need 1 <= k <= $d, got $k")
    val a = Array.tabulate(d, d)((i, j) => model.cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offNorm(a); sweep += 1
    }
    // eigenvalues on the diagonal, vectors in v's COLUMNS; sort desc
    // with index tiebreak so equal eigenvalues order deterministically
    val order = (0 until d).sortBy(i => (-a(i)(i), i)).take(k)
    PcaModel(model.mean,
      order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** One Jacobi rotation zeroing a(p)(q), updating A and the
    * accumulated eigenvector matrix in place. */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    if (apq == 0.0) return
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = math.signum(theta) match {
      case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
      case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  /** Project a vector column onto the model's components (centered):
    * `out_j = (x − mean) · comp_j = x · comp_j − mean · comp_j`, with the
    * constant offset folded on the driver — k broadcast-literal
    * [[Similarity.dot]]s per row, codegen'd, no shuffle. Output:
    * array<double> of length k. */
  def project(vec: Column, model: PcaModel): Column =
    array(model.components.map { comp =>
      val offset = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      Similarity.dot(vec, typedLit(comp.toSeq)) - lit(offset)
    }: _*)

  /** PCA whitening: [[project]] with each component scaled by
    * 1/√eigenvalue, so the output has identity covariance — the
    * decorrelation step before cosine-threshold dedup or PQ codebook
    * training. Components with eigenvalue ≤ `minEigenvalue` are REJECTED
    * (a near-null direction would blow up to noise amplified by 1/√λ —
    * truncate k below them instead). */
  def whiten(vec: Column, model: PcaModel,
      minEigenvalue: Double = 1e-9): Column = {
    require(model.eigenvalues.forall(_ > minEigenvalue),
      s"whiten: an eigenvalue <= $minEigenvalue would amplify noise by >" +
        f" ${1 / math.sqrt(minEigenvalue)}%.0f - truncate k above the " +
        "near-null directions")
    array(model.components.zip(model.eigenvalues).map { case (comp, ev) =>
      val offset = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      (Similarity.dot(vec, typedLit(comp.toSeq)) - lit(offset)) /
        lit(math.sqrt(ev))
    }: _*)
  }

  /** Exact-integer covariance in LONG FORM — the ORACLE-CHECKABLE face
    * of [[covariance]], the same move [[graft.operators.Sketches]] makes
    * with KMV vs HLL: float covariance sums are merge-order-dependent in
    * their last bits, so instead quantize each coordinate to
    * `floor(x · quant)` (floor over doubles is IEEE-exact and
    * engine-portable) and aggregate EXACT BIGINT co-moments; the one
    * closing division is a fixed float expression, so every output
    * value hashes identically across engines, partitionings, and
    * reruns — the registered query has a full DuckDB mirror.
    *
    * Scale shape: each row fans out to its d(d+1)/2 upper-triangle
    * products through two chained generators, but the hash aggregate
    * combines map-side, so only d² partial rows per partition cross the
    * exchange — the corpus itself never shuffles. Overflow bound: with
    * |x·quant| ≤ B, the dominant terms are n·Σxy and Σx·Σy, each bounded
    * by n²·B², so their difference needs 2·n²·B² < 2⁶³ — guaranteed by
    * n·B < 2³¹ (n ≲ 2.1e9/B; e.g. B = 500 allows n up to ~4.3e6 rows
    * per dimension pair). A runtime guard (same move as chiSquare2x2 /
    * gini) aggregates the exact max |x·quant| and RAISES when n·B
    * reaches 2³¹, because Spark's non-ANSI BIGINT sum wraps silently —
    * the exact hazard this oracle-checkable face exists to rule out.
    * Beyond the bound, widen to DECIMAL(38,0) (the [[Stats]]
    * convention). n (count) and max are themselves overflow-free, so
    * the guard stays sound even when the sums have already wrapped.
    *
    * Output: (i, j, n, cov_num, cov) for j ≥ i, where
    * cov_num = n·Σxy − Σx·Σy (exact BIGINT, in quant² units) and
    * cov = cov_num / (n·(n−1)) as one IEEE division. */
  def exactCovarianceLongForm(df: DataFrame, vecCol: Column,
      quant: Double = 100.0): DataFrame = {
    val q = df.filter(vecCol.isNotNull)
      .select(transform(vecCol.cast("array<double>"),
        x => floor(x * lit(quant)).cast("bigint")).as("v"))
    val left = q.select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
    val pairs = left.select(col("i"), col("xi"),
        posexplode(slice(col("v"), col("i") + 1, size(col("v"))))
          .as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        col("xi"), col("xj"))
      // pairwise deletion (the momentPartials rule): a null element must
      // not enter n while the sums skip it, or cov is silently wrong
      .filter(col("xi").isNotNull && col("xj").isNotNull)
    pairs.groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"),
        sum(col("xj")).as("sy"), sum(col("xi") * col("xj")).as("sxy"),
        max(greatest(abs(col("xi")), abs(col("xj")))).as("__maxabs"))
      // overflow guard: count and max are exact, so this fires whenever
      // the 2·n²·B² < 2⁶³ bound is violated — even if the wrapped sums
      // above already happened, the row errors instead of lying
      .withColumn("cov_num",
        // the guard product is compared in DOUBLE so the comparison
        // itself cannot wrap (n·maxabs near 2³¹ is well inside the 2⁵³
        // exact-integer range; far beyond it, precision loss only ever
        // lands on the raising side)
        when(col("n").cast("double") * col("__maxabs").cast("double") >=
            lit((1L << 31).toDouble),
          raise_error(concat(lit("exactCovarianceLongForm: n*max|x*quant| "),
            (col("n").cast("double") * col("__maxabs").cast("double"))
              .cast("string"),
            lit(" >= 2^31 - BIGINT co-moments may wrap; lower quant or " +
              "widen to DECIMAL(38,0)"))).cast("bigint"))
          .otherwise(col("n") * col("sxy") - col("sx") * col("sy")))
      .withColumn("cov",
        when(col("n") > 1, col("cov_num").cast("double") /
          (col("n") * (col("n") - 1)).cast("double")))
      .select("i", "j", "n", "cov_num", "cov")
  }

  /** OPQ-lite: PQ codebooks trained in the WHITENED space — the move
    * that makes the r11 PCA machinery load-bearing for the ANN path.
    * Plain PQ splits the raw vector into m contiguous subspaces and
    * gives each the same k-entry budget; under a skewed covariance the
    * high-variance (correlated) directions dominate a few subspaces and
    * the fixed budget quantizes them coarsely while low-variance
    * subspaces waste entries — exactly the imbalance OPQ's learned
    * rotation corrects (Ge et al., CVPR 2013). [[whiten]] is the
    * closed-form lite version: decorrelate AND equalize variance, so
    * every subspace carries the same unit-scale mass and the m×k budget
    * spreads evenly. Scoring runs in the whitened space too — whitened
    * cosine is itself a better retrieval metric on anisotropic
    * embeddings (the BERT-whitening observation, Su et al. 2021), and
    * ADC fidelity against it is what the balanced codebooks buy.
    *
    * Returns (model, codebooks) for [[whitenedPqEncode]] /
    * [[whitenedPqTopK]]. `kDims` truncates the rotation below near-null
    * directions (must leave eigenvalues > minEigenvalue for [[whiten]];
    * truncation is also how dim % m is satisfied post-rotation). Scale
    * shape unchanged from the parts: one covariance pass + per-subspace
    * k-means; whitening itself is codegen'd literal dots. */
  def whitenedPqTrain(base: DataFrame, dim: Int, m: Int, k: Int,
      kDims: Int = 0, iters: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding",
      minEigenvalue: Double = 1e-9): (PcaModel, Seq[Seq[Seq[Double]]]) = {
    val kd = if (kDims > 0) kDims else dim
    require(kd % m == 0, s"kDims $kd not divisible into $m subspaces")
    val model = principalComponents(covariance(base, col(vecCol), dim), kd)
    val whitened = base.select(col(idCol),
      whiten(col(vecCol), model, minEigenvalue).as(vecCol))
    (model, Similarity.trainPqCodebooks(whitened, kd, m, k, iters,
      idCol, vecCol))
  }

  /** PQ-encode the base in the whitened space: m code bytes + the
    * whitened norm per vector — the at-rest artifact, same 100 TB
    * compression story as [[Similarity.pqEncode]]. */
  def whitenedPqEncode(base: DataFrame, model: PcaModel,
      codebooks: Seq[Seq[Seq[Double]]], idCol: String = "vec_id",
      vecCol: String = "embedding",
      minEigenvalue: Double = 1e-9): DataFrame =
    Similarity.pqEncode(
      base.withColumn(vecCol, whiten(col(vecCol), model, minEigenvalue)),
      codebooks, vecCol = vecCol)

  /** ADC top-k over [[whitenedPqEncode]]d codes: queries are whitened by
    * the same model, then scored by [[Similarity.pqTopK]] — whitened
    * cosine via m table lookups per row, never reopening full vectors. */
  def whitenedPqTopK(encoded: DataFrame, queries: DataFrame, k: Int,
      model: PcaModel, codebooks: Seq[Seq[Seq[Double]]],
      baseId: String = "vec_id", queryId: String = "qid",
      queryVec: String = "qvec",
      minEigenvalue: Double = 1e-9): DataFrame =
    Similarity.pqTopK(encoded,
      queries.withColumn(queryVec, whiten(col(queryVec), model,
        minEigenvalue)),
      k, codebooks, baseId = baseId, queryId = queryId,
      queryVec = queryVec)

  /** Squared Mahalanobis distance of each vector from the corpus
    * distribution — the embedding-space outlier score for curation
    * (flag vectors far from the fitted mass before they pollute
    * dedup/ANN stats). With the full-rank eigendecomposition,
    * (x−m)ᵀ Σ⁻¹ (x−m) = Σ_j ((x−m)·v_j)² / λ_j — i.e. the sum of
    * squared WHITENED coordinates, so the score is the same k
    * broadcast-literal dots as [[project]], codegen'd at scan speed.
    * Fit with k = d for the true distance; a truncated model scores
    * distance within the retained subspace (standard practice when
    * trailing eigenvalues are noise). Same `minEigenvalue` rejection as
    * [[whiten]]. */
  def mahalanobisSq(vec: Column, model: PcaModel,
      minEigenvalue: Double = 1e-9): Column = {
    val w = whiten(vec, model, minEigenvalue)
    aggregate(transform(w, x => x * x), lit(0.0), (acc, x) => acc + x)
  }
}
