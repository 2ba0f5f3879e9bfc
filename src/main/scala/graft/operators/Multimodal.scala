package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata. The payload
  * column stays `binary` end-to-end; only metadata is ever a shuffle key. */
case class MediaItem(
    media_id: Long,
    mime: String,
    payload: Array[Byte],
    width: Int,
    height: Int,
    n_frames: Int)

/** Decoded-frame features (one row per sampled frame). */
case class FrameFeatures(
    media_id: Long,
    frame_idx: Int,
    feature: Array[Float])

/** Multimodal column handling (images/audio/video as opaque binary).
  *
  * The Spark-side plumbing — schema, batch iteration, partition shape,
  * explode-per-frame — is real and tested. Two codec tiers (round 6):
  * [[decodeFrameImageIO]] is a REAL image decoder — `javax.imageio` ships
  * PNG/BMP/GIF/JPEG readers in the JDK, zero new dependencies — whose
  * features come from actual pixels; [[decodeFrame]] remains the
  * md5-derived deterministic stub (expressible in SQL, so the driver's
  * oracle can check the extract-features flow over arbitrary payloads).
  * Audio/video codecs are genuinely absent from this container; swapping
  * one in changes ONE function, not the pipeline.
  *
  * Design points for 100 TB of media:
  *  - payloads never appear in a join/groupBy key — operations key on
  *    `media_id` and carry the binary column alongside;
  *  - per-frame work is `flatMap`-shaped (narrow, zero shuffle);
  *  - decode runs batched inside `mapPartitions`, the JVM analog of an
  *    Arrow-batched scalar UDF: per-partition setup (codec init) happens
  *    once, then rows stream through in groups of `batchSize`.
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB codec: deterministic pseudo-features from payload bytes. A real
    * build replaces the body with an actual decode (e.g. JPEG → pixels →
    * pooled features); the signature and everything downstream stay.
    *
    * The fake is md5-derived (feature i = the first 12 bits of
    * `md5(md5hex(payload):frameIdx:i)` over 4096) so it is expressible in
    * SQL — the driver's DuckDB oracle checks the whole extract-features
    * flow, not just its row counts. The payload is digested ONCE and the
    * per-feature hashes derive from its 32-char hex — a multi-MB media
    * payload is not re-hashed FeatureDim times per frame. 12-bit/4096
    * values are exact in Float, and their sums stay exact in Double, so
    * cross-engine aggregation compares bit-for-bit. */
  def decodeFrame(payload: Array[Byte], frameIdx: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val payloadHex = md.digest(payload).map(b => f"${b & 0xff}%02x").mkString
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      md.reset()
      val d = md.digest(
        s"$payloadHex:$frameIdx:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = (((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)) / 4096.0f
      i += 1
    }
    out
  }

  /** Whole-image pixel statistics from a REAL decode. `None` when the
    * payload is not a decodable image (wrong magic bytes, truncated
    * stream) — callers decide whether to drop or fall back to the stub. */
  final case class ImageStats(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long)

  /** Decode an image payload with `javax.imageio` (PNG/BMP/GIF/JPEG
    * readers are part of the JDK) and reduce it to per-channel pixel
    * sums. Integer sums of 8-bit channels — exact, so results computed
    * from actual pixels can still be compared bit-for-bit against an
    * oracle that knows the expected pixel values. */
  def decodeImageStats(payload: Array[Byte]): Option[ImageStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val p = im.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      ImageStats(im.getWidth, im.getHeight, sr, sg, sb)
    }
  }

  /** Encode a PNG from a pixel function (`rgb(x, y)` packs 0xRRGGBB) —
    * PNG is lossless, so a decode of the result returns exactly these
    * values. Used to synthesize deterministic real-image payloads in
    * tests and the registered round-trip query. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a REAL JPEG (DCT + quantization + Huffman via the JDK's
    * ImageIO writer) from a pixel function, at an explicit quality.
    * JPEG is lossy in general — decoded pixels are codec arithmetic, not
    * the input — EXCEPT for constant-gray images: r=g=b=v maps to a
    * constant Y plane (the RGB→YCbCr weights sum to exactly 1) with both
    * chroma planes pinned at 128, every 8×8 block is DC-only, and the DC
    * coefficient survives quantization round-trip, so the decode returns
    * v exactly (verified exhaustively for all 256 gray levels at
    * quality ≥ 0.9). That class is what makes a JPEG decode path
    * oracle-checkable with exact integer arithmetic. */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int,
      quality: Float = 1.0f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Perceptual difference hash (dHash) of an image payload: decode with
    * the real codec, sample down to a 9×8 grid with the same exact floor
    * index math as [[resizeImage]] (`sx = tx·w / 9`, `sy = ty·h / 8` —
    * integer division), integer-luminance each sample
    * (`(299·r + 587·g + 114·b) / 1000`), then one bit per horizontally
    * adjacent pair (`gray(x+1, y) > gray(x, y)`), 64 bits row-major.
    *
    * Near-identical images — re-encodes, small edits, brightness shifts —
    * land within a few bits of each other, so the EXISTING 64-bit band
    * machinery ([[graft.operators.Dedup.simhashCandidatesFromSigs]] +
    * [[graft.operators.Dedup.hamming64]]) turns image near-duplicate
    * detection into the same bucket-join shape as text simhash: no
    * all-pairs anywhere, candidates ∝ true near-dups. Every step is
    * integer-exact, so over lossless payloads the hash is replayable in
    * SQL from the pixel formula alone. None for undecodable payloads. */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      val w = im.getWidth; val h = im.getHeight
      def gray(tx: Int, ty: Int): Int = {
        val p = im.getRGB(tx * w / 9, ty * h / 8)
        (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000
      }
      var hash = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x + 1, y) > gray(x, y)) hash |= 1L << bit
          bit += 1
          x += 1
        }
        y += 1
      }
      hash
    }
  }

  /** Column face of [[dHash64]]: `(id, simhash)` per decodable payload —
    * named to feed [[graft.operators.Dedup.simhashCandidatesFromSigs]]
    * directly. Narrow mapPartitions (codec work is not Column-expressible);
    * undecodable payloads drop out, mirroring zero-token docs in the text
    * simhash. */
  def imageDHashes(df: DataFrame, idCol: Column, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"), payloadCol.as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => dHash64(p).map(id -> _) })
      .toDF("id", "simhash")
  }

  /** Fixed-point DCT-II basis for [[pHash64]]: T(u)(x) =
    * rint(cos(π(2x+1)u/64)·2¹⁴) for u < 8, x < 32. `rint` (half-even)
    * is symmetric, so the odd-u rows cancel pairwise exactly —
    * uniform-brightness shifts move only the (near-zero) even-u sums.
    * These INTEGERS are the single source of truth for both engines:
    * the SQL mirror interpolates them literally, so no cosine is ever
    * evaluated inside a registered query. */
  val DctT: Array[Array[Long]] = Array.tabulate(8, 32)((u, x) =>
    math.rint(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 16384.0).toLong)

  /** Perceptual DCT hash (pHash) — the frequency-domain complement of
    * [[dHash64]]: dHash bits are LOCAL horizontal gradients (robust to
    * global shifts, flipped by local edits near sampled pixels); pHash
    * thresholds the 63 lowest-frequency DCT coefficients of the whole
    * 32×32 luma plane against their exact median, so scattered
    * single-pixel noise perturbs every coefficient a little and
    * usually no bit at all — the classic re-encode/watermark/noise
    * detector (pHash.org's algorithm, integer-exact here).
    *
    * Pipeline: real-codec decode → 32×32 nearest sample (the
    * [[dHash64]] floor index math) → integer luma → exact BIGINT DCT
    * via [[DctT]] (|F| ≤ 1024·255·2²⁸ < 2⁴⁷, no overflow) → the 63
    * AC coefficients of the top-left 8×8 block threshold against
    * their 32nd-smallest (exact order statistic) → 63 bits, row-major
    * (v·8+u−1). Every step replayable in SQL from a pixel formula.
    * None for undecodable payloads. */
  def pHash64(payload: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      val w = im.getWidth; val h = im.getHeight
      val gray = Array.tabulate(32, 32) { (x, y) =>
        val p = im.getRGB(x * w / 32, y * h / 32)
        ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000).toLong
      }
      // separable exact DCT: G(u)(y) = Σ_x T(u)(x)·gray(x)(y), then
      // F(u)(v) = Σ_y T(v)(y)·G(u)(y) — integer sums, any association
      val g2 = Array.tabulate(8, 32) { (u, y) =>
        var s = 0L; var x = 0
        while (x < 32) { s += DctT(u)(x) * gray(x)(y); x += 1 }; s
      }
      val f = Array.tabulate(8, 8) { (u, v) =>
        var s = 0L; var y = 0
        while (y < 32) { s += DctT(v)(y) * g2(u)(y); y += 1 }; s
      }
      val ac = (for (v <- 0 until 8; u <- 0 until 8; if u != 0 || v != 0)
        yield f(u)(v)).toArray
      val med = ac.sorted.apply(31) // 32nd smallest of 63
      var hash = 0L
      for (v <- 0 until 8; u <- 0 until 8; if u != 0 || v != 0)
        if (f(u)(v) > med) hash |= 1L << (v * 8 + u - 1)
      hash
    }
  }

  /** Column face of [[pHash64]] — same (id, simhash) shape as
    * [[imageDHashes]] so the banded candidate machinery applies
    * unchanged. */
  def imagePHashes(df: DataFrame, idCol: Column, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"), payloadCol.as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => pHash64(p).map(id -> _) })
      .toDF("id", "simhash")
  }

  /** One decoded animation frame reduced to exact integer pixel sums —
    * the video analog of [[ImageStats]]. */
  final case class FrameStats(frameIdx: Int, width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long)

  /** Encode a REAL multi-frame animated GIF from a per-frame pixel
    * function returning GRAY levels 0–255. GIF is palettized, so frames
    * are built as TYPE_BYTE_INDEXED over an explicit 256-gray palette —
    * the encoder then stores exactly those colors and a decode returns
    * them bit-for-bit (an RGB source would be quantized unpredictably).
    * Animation structure comes from the writer's standard image metadata
    * (graphic-control delay per frame). */
  def encodeGif(width: Int, height: Int, nFrames: Int,
      gray: (Int, Int, Int) => Int): Array[Byte] = {
    require(nFrames > 0, "need at least one frame")
    // Empirical JDK quirk (probed exhaustively on 17.0.20): the bundled
    // GIF writer silently zeroes every row after the first 1–4 when the
    // image has FEWER THAN 5 ROWS, at any width; ≥ 5 rows round-trips
    // exactly. Refuse the corrupting case rather than encode garbage.
    require(height >= 5,
      s"height $height < 5: the JDK GIF writer corrupts images under 5 rows")
    val palette = Array.tabulate(256)(identity[Int])
    val cm = new java.awt.image.IndexColorModel(8, 256,
      palette.map(_.toByte), palette.map(_.toByte), palette.map(_.toByte))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = gray(f, x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Decode every frame of a multi-frame image payload (animated GIF —
    * the "video" face of the codec layer) into exact per-frame pixel
    * sums. `None` when the payload is not a decodable multi-frame image.
    * Frame count comes from the container (`getNumImages(true)`), not
    * metadata guessing. */
  def decodeGifStats(payload: Array[Byte]): Option[Seq[FrameStats]] = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (iis == null) return None
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      Some((0 until n).map { f =>
        val im = reader.read(f)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            val p = im.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        FrameStats(f, im.getWidth, im.getHeight, sr, sg, sb)
      })
    } catch { case _: Exception => None }
    finally { reader.dispose(); iis.close() }
  }

  /** Parsed 16-bit PCM WAV reduced to exact integer sample statistics —
    * like [[ImageStats]], exactness is what lets a formula-knowing oracle
    * verify that the numbers came from actually-decoded samples. */
  final case class WavStats(sampleRate: Int, nSamples: Long,
      sumSamples: Long, minSample: Int, maxSample: Int)

  /** Encode mono 16-bit PCM as a real RIFF/WAVE byte payload (44-byte
    * canonical header + little-endian samples). PCM is lossless, so a
    * decode returns exactly these samples. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Shared RIFF chunk walk behind [[decodeWavStats]] and
    * [[audioDHash64]]: real chunk walking (arbitrary chunk order,
    * unknown chunks skipped by their declared length, word-aligned per
    * the RIFF spec), locating the PCM-16 sample span. Returns
    * (sampleRate, dataAt, dataLen); None for anything not a well-formed
    * PCM-16 WAV. */
  private def wavPcm16(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(payload, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var fmtOk = false
    var sampleRate = 0
    var dataAt = -1
    var dataLen = 0
    while (pos + 8 <= payload.length) {
      val tag = tag4(pos)
      val len = bb.getInt(pos + 4)
      // Long math: a hostile len near Int.MaxValue wraps `pos + 8 + len`
      // negative and would sail past this guard into an out-of-bounds read
      if (len < 0 || pos.toLong + 8 + len > payload.length) return None
      tag match {
        case "fmt " if len >= 16 =>
          val audioFormat = bb.getShort(pos + 8)
          val bits = bb.getShort(pos + 8 + 14)
          sampleRate = bb.getInt(pos + 8 + 4)
          fmtOk = audioFormat == 1 && bits == 16
        case "data" => dataAt = pos + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataAt < 0 || dataLen % 2 != 0) None
    else Some((sampleRate, dataAt, dataLen))
  }

  /** Exact integer stats over a RIFF/WAVE payload's raw PCM-16 samples
    * (via [[wavPcm16]]'s chunk walk, regardless of channel count).
    * Returns None for anything not a well-formed PCM-16 WAV — callers
    * fall back to the stub, same policy as [[decodeFrameImageIO]]. */
  def decodeWavStats(payload: Array[Byte]): Option[WavStats] = {
    val (sampleRate, dataAt, dataLen) = wavPcm16(payload) match {
      case Some(t) => t
      case None => return None
    }
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    while (i < dataLen) {
      val s = bb.getShort(dataAt + i).toInt
      sum += s
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 2
    }
    val n = dataLen / 2
    if (n == 0) Some(WavStats(sampleRate, 0, 0, 0, 0))
    else Some(WavStats(sampleRate, n.toLong, sum, mn, mx))
  }

  /** Audio difference hash — the [[dHash64]] analog for sound. Decode
    * PCM-16 via the real chunk walk, reduce the absolute-amplitude
    * envelope to 65 windows with the same exact floor index math as
    * dHash's grid (`window w spans [w·n/65, (w+1)·n/65)`, integer
    * division), per-window energy = Σ|sample| (long, overflow-free), one
    * bit per adjacent-window energy INCREASE, 64 bits.
    *
    * The delta-of-envelope form makes the hash invariant to exact
    * uniform volume scaling (ordering of window sums is preserved), and
    * near-identical audio — re-encodes, small edits, level changes —
    * lands within a few bits, so the existing 64-bit band machinery
    * ([[graft.operators.Dedup.simhashCandidatesFromSigs]] +
    * [[graft.operators.Dedup.hamming64]]) gives audio near-duplicate
    * detection the same bucket-join shape as text simhash and image
    * dHash: no all-pairs anywhere. Every step is integer-exact, so over
    * lossless PCM the hash is replayable in SQL from the sample formula
    * alone. None for undecodable payloads. */
  def audioDHash64(payload: Array[Byte]): Option[Long] =
    wavPcm16(payload).map { case (_, dataAt, dataLen) =>
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = dataLen / 2
      val e = new Array[Long](65)
      var w = 0
      while (w < 65) {
        var i = (w.toLong * n / 65).toInt
        val end = ((w + 1).toLong * n / 65).toInt
        var acc = 0L
        while (i < end) {
          acc += math.abs(bb.getShort(dataAt + i * 2).toInt).toLong
          i += 1
        }
        e(w) = acc
        w += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (e(b + 1) > e(b)) hash |= 1L << b
        b += 1
      }
      hash
    }

  /** Column face of [[audioDHash64]]: `(id, simhash)` per decodable
    * payload, named to feed
    * [[graft.operators.Dedup.simhashCandidatesFromSigs]] directly —
    * mirrors [[imageDHashes]]. */
  def audioFingerprints(df: DataFrame, idCol: Column,
      payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"), payloadCol.as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => audioDHash64(p).map(id -> _) })
      .toDF("id", "simhash")
  }

  /** REAL codec behind the [[decodeFrame]] signature: decodable payloads
    * get features from actual pixels — channel means, mean luminance,
    * and a 12-bin luminance histogram (fractions of pixel count) — and
    * anything `javax.imageio` cannot read falls back to the md5 stub, so
    * mixed image/non-image corpora flow through one code path. Still
    * images ignore `frameIdx` (one frame). */
  def decodeFrameImageIO(payload: Array[Byte], frameIdx: Int): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) decodeFrame(payload, frameIdx)
    else {
      val w = img.getWidth; val h = img.getHeight; val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      val hist = new Array[Long](FeatureDim - 4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          // integer Rec.601 luma in [0, 255]
          val luma = (r * 299 + g * 587 + b * 114) / 1000
          sr += r; sg += g; sb += b; sl += luma
          hist(luma * hist.length / 256) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](FeatureDim)
      out(0) = sr.toFloat / n / 255f
      out(1) = sg.toFloat / n / 255f
      out(2) = sb.toFloat / n / 255f
      out(3) = sl.toFloat / n / 255f
      var i = 0
      while (i < hist.length) { out(4 + i) = hist(i).toFloat / n; i += 1 }
      out
    }
  }

  /** Evenly-spaced frame indices: `n` samples from [0, nFrames). */
  def sampleFrameIndices(nFrames: Int, n: Int): Seq[Int] =
    if (nFrames <= n) 0 until nFrames
    else (0 until n).map(i => (i.toLong * nFrames / n).toInt)

  /** Per-frame feature extraction: one output row per sampled frame.
    * Narrow flatMap over batched partitions — no shuffle, codec state
    * initialized once per partition. `codec` defaults to the stub;
    * pass [[decodeFrameImageIO]] for real image corpora. */
  def extractFeatures(items: Dataset[MediaItem], framesPerItem: Int,
      batchSize: Int = 64,
      codec: (Array[Byte], Int) => Array[Float] = decodeFrame): Dataset[FrameFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition codec setup would go here (once, not per row)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          sampleFrameIndices(m.n_frames, framesPerItem).iterator.map { f =>
            FrameFeatures(m.media_id, f, codec(m.payload, f))
          }
        }
      }
    }
  }

  /** Metadata/typing pass over a raw binary table: payload size, content
    * hash, aspect ratio — all computed without the payload ever leaving
    * the scan stage. */
  def describe(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("content_sha", sha2(col(payloadCol), 256))
      .withColumn("aspect",
        when(col("height") > 0, col("width").cast("double") / col("height")))

  /** Downscale-to-fit output dimensions (never upscales), in EXACT
    * integer math: `ceil(dim * maxDim / max(w, h))` as
    * `(dim * maxDim + max - 1) / max`. Integer (not float `ceil`) so the
    * same dims are reproducible in plain SQL — the resize oracle replays
    * this formula. */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxDim > 0, s"dims must be positive: ($w, $h, $maxDim)")
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (((w.toLong * maxDim + m - 1) / m).toInt,
          ((h.toLong * maxDim + m - 1) / m).toInt)
  }

  /** REAL image resize: decode with `javax.imageio`, nearest-neighbor
    * resample with floor integer index math (`srcX = x * srcW / outW`),
    * re-encode as lossless PNG. `None` when the payload is not a
    * decodable image. The index math is replayable in plain SQL, which is
    * what lets the registered resize query be oracle-checked end to end
    * from the pixel formula. */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, s"target dims must be positive: ($outW, $outH)")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      val out = new java.awt.image.BufferedImage(outW, outH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        val sy = y * im.getHeight / outH
        var x = 0
        while (x < outW) {
          out.setRGB(x, y, im.getRGB(x * im.getWidth / outW, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** "Resize": metadata transform keeping payload opaque (see
    * [[resizeImage]] for the real pixel path over decodable payloads). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  // ----------------------------------------------------------- EXIF/TIFF

  /** EXIF tag names by (IFD context, tag id) — the standard subset a
    * training-data pipeline filters/attributes on (camera, timestamps,
    * dimensions, orientation, GPS presence). Unknown tags are skipped,
    * not errored: real-world EXIF is full of vendor tags. */
  private val ExifIfdTags: Map[Int, String] = Map(
    0x010F -> "Make", 0x0110 -> "Model", 0x0112 -> "Orientation",
    0x011A -> "XResolution", 0x011B -> "YResolution",
    0x0132 -> "DateTime", 0x0131 -> "Software",
    0x829A -> "ExposureTime", 0x829D -> "FNumber",
    0x8827 -> "ISOSpeedRatings", 0x9003 -> "DateTimeOriginal",
    0x9004 -> "DateTimeDigitized", 0x920A -> "FocalLength",
    0xA002 -> "PixelXDimension", 0xA003 -> "PixelYDimension")
  private val GpsIfdTags: Map[Int, String] = Map(
    0x0001 -> "GPSLatitudeRef", 0x0003 -> "GPSLongitudeRef",
    0x0005 -> "GPSAltitudeRef")

  /** Parse the EXIF metadata of a JPEG (APP1 "Exif") or bare TIFF
    * payload — a pure byte-walk with the same real-codec discipline as
    * the RIFF/WAVE and PNG paths: byte-order-aware TIFF header, IFD0
    * entry scan, the Exif and GPS sub-IFDs followed through their
    * pointer tags (depth-1 — no arbitrary IFD chains), BYTE / ASCII /
    * SHORT / LONG / RATIONAL values decoded inline or via the data
    * area. Returns the known tags ([[ExifIfdTags]]/[[GpsIfdTags]]) as
    * name → rendered string (ASCII NUL-trimmed; integers decimal;
    * rationals "num/den"; multi-count values space-joined). `None` — an
    * honest null, never a throw — on anything malformed: no/short
    * payload, no APP1 Exif segment, bad TIFF magic, out-of-bounds
    * offsets or counts. Bounds: ≤ 256 entries per IFD, count ≤ 4096. */
  def exifTags(payload: Array[Byte]): Option[Map[String, String]] = {
    if (payload == null || payload.length < 8) return None
    def u8(i: Int): Int = payload(i) & 0xFF
    // locate the TIFF block: bare TIFF, or JPEG marker walk to APP1
    val tiffBase: Int =
      if (u8(0) == 0x49 && u8(1) == 0x49 || u8(0) == 0x4D && u8(1) == 0x4D) 0
      else if (u8(0) == 0xFF && u8(1) == 0xD8) {
        var pos = 2
        var base = -1
        var guard = 0
        while (base < 0 && pos + 4 <= payload.length && guard < 64) {
          guard += 1
          if (u8(pos) != 0xFF) return None // marker desync ⇒ corrupt
          val marker = u8(pos + 1)
          if (marker == 0xD9 || marker == 0xDA) return None // EOI/SOS: no EXIF
          val len = (u8(pos + 2) << 8) | u8(pos + 3) // includes the 2 len bytes
          if (len < 2 || pos + 2 + len > payload.length) return None
          if (marker == 0xE1 && len >= 8 &&
            new String(payload, pos + 4, 4, "US-ASCII") == "Exif" &&
            u8(pos + 8) == 0 && u8(pos + 9) == 0) base = pos + 10
          else pos += 2 + len
        }
        if (base < 0) return None
        base
      } else return None
    if (tiffBase + 8 > payload.length) return None
    val little = u8(tiffBase) == 0x49 && u8(tiffBase + 1) == 0x49
    val big = u8(tiffBase) == 0x4D && u8(tiffBase + 1) == 0x4D
    if (!little && !big) return None
    def u16(i: Int): Int =
      if (i < tiffBase || i + 2 > payload.length) -1
      else if (little) u8(i) | (u8(i + 1) << 8)
      else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < tiffBase || i + 4 > payload.length) -1L
      else if (little) u8(i) | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2) << 8) | u8(i + 3)
    if (u16(tiffBase + 2) != 42) return None
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var exifPtr = -1L
    var gpsPtr = -1L
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 => 4
      case 5 | 10 => 8; case _ => 0
    }
    // returns false on a structural violation (the whole parse is voided)
    def walkIfd(off: Long, names: Map[Int, String]): Boolean = {
      val at = tiffBase + off.toInt
      if (off < 0 || off > Int.MaxValue || at + 2 > payload.length) return false
      val n = u16(at)
      if (n < 0 || n > 256 || at + 2 + n * 12 + 4 > payload.length) return false
      var e = 0
      while (e < n) {
        val ent = at + 2 + e * 12
        val tag = u16(ent)
        val typ = u16(ent + 2)
        val count = u32(ent + 4)
        val sz = typeSize(typ)
        if (sz == 0 || count < 0 || count > 4096) return false
        val byteLen = sz * count.toInt
        val valAt =
          if (byteLen <= 4) ent + 8
          else {
            val o = u32(ent + 8)
            if (o < 0 || o > Int.MaxValue) return false
            tiffBase + o.toInt
          }
        if (valAt < tiffBase || valAt + byteLen > payload.length) return false
        if (tag == 0x8769 && typ == 4) exifPtr = u32(valAt)
        else if (tag == 0x8825 && typ == 4) gpsPtr = u32(valAt)
        else names.get(tag).foreach { name =>
          val rendered: Option[String] = typ match {
            case 1 => // BYTE: decimal integers (GPSAltitudeRef is one)
              Some((0 until count.toInt)
                .map(k => u8(valAt + k)).mkString(" "))
            case 2 => // ASCII: trim at the first NUL
              val raw = new String(payload, valAt, byteLen, "US-ASCII")
              val nul = raw.indexOf('\u0000')
              Some(if (nul >= 0) raw.substring(0, nul) else raw)
            case 3 => Some((0 until count.toInt)
              .map(k => u16(valAt + 2 * k)).mkString(" "))
            case 4 => Some((0 until count.toInt)
              .map(k => u32(valAt + 4 * k)).mkString(" "))
            case 5 => Some((0 until count.toInt).map(k =>
              s"${u32(valAt + 8 * k)}/${u32(valAt + 8 * k + 4)}")
              .mkString(" "))
            case _ => None // unexpected-typed known tag: skip the entry
          }
          rendered.foreach(out(name) = _)
        }
        e += 1
      }
      true
    }
    if (!walkIfd(u32(tiffBase + 4), ExifIfdTags)) return None
    if (exifPtr >= 0 && !walkIfd(exifPtr, ExifIfdTags)) return None
    if (gpsPtr >= 0 && !walkIfd(gpsPtr, GpsIfdTags)) return None
    Some(out.toMap)
  }

  /** Encode a REAL minimal EXIF JPEG — SOI + APP1("Exif\0\0" + TIFF) +
    * EOI — for fixtures and round-trip tests: IFD0 (Make, Model,
    * Orientation, XResolution, DateTime) + Exif sub-IFD (ExposureTime,
    * ISO, PixelXDimension) + optional GPS sub-IFD (GPSLatitudeRef),
    * with out-of-line ASCII/RATIONAL values in a proper data area and
    * both byte orders supported. */
  def encodeExifJpeg(littleEndian: Boolean, make: String, model: String,
      orientation: Int, dateTime: String, xResolution: (Long, Long),
      exposure: (Long, Long), iso: Int, pixelX: Long,
      gpsLatRef: Option[String],
      gpsAltRef: Option[Int] = None): Array[Byte] = {
    val data = scala.collection.mutable.ArrayBuffer[Byte]()
    def p16(v: Int): Array[Byte] =
      if (littleEndian) Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      else Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def p32(v: Long): Array[Byte] =
      if (littleEndian) Array(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF).map(_.toByte)
      else Array((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF,
        v & 0xFF).map(_.toByte)
    // entry builders return 12-byte entries; out-of-line values append
    // to `data` and record their offset RELATIVE to the data area start
    // (fixed up once the IFD sizes are known)
    final case class Ent(tag: Int, typ: Int, count: Int,
        inline: Option[Array[Byte]], dataOff: Int)
    def ascii(tag: Int, s: String): Ent = {
      val bytes = (s + "\u0000").getBytes("US-ASCII")
      if (bytes.length <= 4)
        Ent(tag, 2, bytes.length, Some(bytes.padTo(4, 0.toByte)), -1)
      else { val off = data.size; data ++= bytes; Ent(tag, 2, bytes.length, None, off) }
    }
    def short(tag: Int, v: Int): Ent =
      Ent(tag, 3, 1, Some(p16(v) ++ Array[Byte](0, 0)), -1)
    def long(tag: Int, v: Long): Ent = Ent(tag, 4, 1, Some(p32(v)), -1)
    def rational(tag: Int, num: Long, den: Long): Ent = {
      val off = data.size; data ++= p32(num); data ++= p32(den)
      Ent(tag, 5, 1, None, off)
    }
    def byte1(tag: Int, v: Int): Ent = // type-1 BYTE, inline (≤4 bytes)
      Ent(tag, 1, 1, Some(Array[Byte](v.toByte, 0, 0, 0)), -1)
    val gps = gpsLatRef.map(r => Seq(ascii(0x0001, r)) ++
      gpsAltRef.map(v => byte1(0x0005, v)).toSeq)
    val exifEnts = Seq(rational(0x829A, exposure._1, exposure._2),
      short(0x8827, iso), long(0xA002, pixelX))
    def ifdSize(n: Int) = 2 + n * 12 + 4
    val nIfd0 = 5 + 1 + (if (gps.isDefined) 1 else 0) // fields + pointers
    val ifd0Off = 8L
    val exifOff = ifd0Off + ifdSize(nIfd0)
    val gpsOff = exifOff + ifdSize(exifEnts.size)
    val dataStart = gpsOff + gps.map(g => ifdSize(g.size).toLong).getOrElse(0L)
    val ifd0Ents = Seq(
      ascii(0x010F, make), ascii(0x0110, model),
      short(0x0112, orientation),
      rational(0x011A, xResolution._1, xResolution._2),
      ascii(0x0132, dateTime),
      long(0x8769, exifOff)) ++
      gps.map(_ => long(0x8825, gpsOff)).toSeq
    def renderIfd(ents: Seq[Ent]): Array[Byte] = {
      val sorted = ents.sortBy(_.tag)
      p16(sorted.size) ++ sorted.flatMap(e =>
        p16(e.tag) ++ p16(e.typ) ++ p32(e.count.toLong) ++
          e.inline.getOrElse(p32(dataStart + e.dataOff))) ++ p32(0L)
    }
    val tiff =
      (if (littleEndian) Array[Byte](0x49, 0x49) ++ p16(42)
       else Array[Byte](0x4D, 0x4D) ++ p16(42)) ++
        p32(ifd0Off) ++ renderIfd(ifd0Ents) ++ renderIfd(exifEnts) ++
        gps.map(renderIfd).getOrElse(Array.empty[Byte]) ++ data
    val app1Body = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff
    val len = app1Body.length + 2
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ app1Body ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
  }

  /** Column face of [[exifTags]]: one (id, tag, value) row per parsed
    * tag, tag-sorted within an id by the output's consumers' orderBy.
    * Unparseable/EXIF-less payloads contribute NO rows — the honest-
    * null convention of the other codec faces. Narrow mapPartitions
    * (byte-walking is not Column-expressible). */
  def exifFields(df: DataFrame, idCol: Column, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"), payloadCol.as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        exifTags(p).toSeq.flatMap(_.map { case (t, v) => (id, t, v) }) })
      .toDF("id", "tag", "value")
  }

  /** Synthesize a deterministic MediaItem table from the documents table
    * (texts become payload bytes) — the test/demo input shape. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        concat(lit("media/"), element_at(split(col("lang"), ""), 1)).as("mime"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(480)) + 32).cast("int").as("height"),
        (pmod(col("doc_id"), lit(24)) + 1).cast("int").as("n_frames"))
      .as[MediaItem]
  }
}
