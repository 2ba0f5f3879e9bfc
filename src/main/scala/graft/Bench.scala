package graft

/** Benchmark main — times the `SparkEntry.headline` query subset against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query runs `reps` times (default 3). The headline per-query number
  * and total use the MIN of the warm reps: min-of-warm-reps measures the
  * code, while median/mean also measure the machine — BENCH_r05's driver
  * run showed 8–13× phantom "regressions" on untouched queries that
  * reproduced at normal speed locally, i.e. ambient load on the driver
  * host, which a min is immune to as long as one rep runs uncontended.
  *
  * Reps are ROUND-ROBIN (sweep q1..qN once per rep round), not per-query
  * bursts: r10/r11 both showed a contiguous execution-order cluster of
  * phantom regressions from a sustained multi-minute contention episode
  * that swallowed all three consecutive reps of each query it touched.
  * Round-robin separates a query's reps by whole sweeps, so an episode
  * costs at most one rep per query. A calibration probe runs before every
  * rep; queries whose every probe read >1.5× the session idle median get
  * ONE deferred retry rep after the final sweep ([[needsRetry]]).
  *
  * THE STDOUT LINE MUST STAY SHORT. The driver retains only the last
  * ~2000 characters of stdout and parses the JSON line out of that tail:
  * BENCH_r06/r07 came back `parsed: null` because round 6 added
  * per-query medians + raw reps to the line and it outgrew the window
  * (the r07 tail starts mid-line). So the line now carries only the
  * compact essentials — total, per-query min seconds (3 decimals),
  * errors, scope metadata — and everything else (medians, every raw rep)
  * goes to a details FILE (`$SPARK_GRAFT_BENCH_DETAILS`, default
  * /tmp/graft_bench_details.json). [[render]] is unit-tested to stay
  * under the window even with generous headroom for sbt's trailing
  * "[success] ..." line.
  */
object Bench {

  /** The driver retains only the last ~this many characters of stdout
    * and parses the JSON line out of that tail. Single source of truth —
    * HarnessContractSpec derives its bound from these same constants, so
    * a driver-window change is a one-place edit. */
  val TailWindow = 2000
  /** Headroom for sbt's own "[success] Total time: ..." trailer. */
  val SbtTrailer = 200
  /** Length budget for the rendered bench line. */
  val LineBudget: Int = TailWindow - SbtTrailer

  /** Fixed CPU-bound spin (single thread, dependent xorshift ops — not
    * eliminable, no allocation): its wall time scales directly with host
    * contention, so a loaded driver host is machine-readable as elevated
    * `calibration_sec` in the details file instead of judge-forensic
    * phantom query regressions (BENCH_r05/r08 pattern). ~0.1 s idle. */
  def calibrate(iters: Long = 150000000L): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    // data-dependent sink so the loop cannot be dead-code-eliminated
    if (x == 42L) System.err.println("calibration sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Multi-core capacity probe — the instrument the round-14 drift
    * adjudication was missing: [[calibrate]] is SINGLE-threaded, so a
    * host whose one-core speed is intact but whose 32-wide capacity is
    * degraded (SMT-sibling / LLC / memory-bandwidth contention from a
    * hypervisor neighbor) reads "calibration flat" while every 32-thread
    * Spark stage runs 10–15% slow — exactly the r13→r14 committed-clean
    * signature (33.88s → 38.59s at cal 0.320→0.323, and 43.4s at cal
    * 0.299 on the r15-open host). Each thread runs the same dependent
    * xorshift spin; the wall time for ALL to finish ≈ the single-thread
    * time when the host has `threads` real cores free, and degrades
    * proportionally with whatever capacity is missing. */
  def calibrateParallel(threads: Int = 32,
      iters: Long = 150000000L): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { seed =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + seed
        var i = 0L
        while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        sink.addAndGet(x): Unit
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    if (sink.get == 42L) System.err.println("calibration sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Shared buffer for [[calibrateMemory]] — allocated once so the probe
    * measures bandwidth, not allocation/GC. 256 MB of longs. */
  private lazy val memProbeBuf: Array[Long] = {
    val a = new Array[Long](32 * 1024 * 1024)
    var i = 0
    while (i < a.length) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }

  /** Memory-bandwidth probe: `threads` threads stream-sum disjoint
    * slices of a shared 256 MB array, `passes` times. One-core cache
    * spins don't see a neighbor saturating the memory controller; this
    * does — the second axis of host capacity the single-thread
    * calibration is blind to. */
  def calibrateMemory(threads: Int = 32, passes: Int = 4): Double = {
    val buf = memProbeBuf
    val slice = buf.length / threads
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { ti =>
      val th = new Thread(() => {
        var s = 0L
        var p = 0
        while (p < passes) {
          var i = ti * slice
          val end = i + slice
          while (i < end) { s += buf(i); i += 1 }
          p += 1
        }
        sink.addAndGet(s): Unit
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    if (sink.get == 42L) System.err.println("calibration sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Compact one-line JSON for the driver's stdout tail. Pure so
    * BenchRenderSpec can assert length + parseability. */
  def render(mins: Seq[(String, Double)], totalMedian: Double, reps: Int,
      errors: Seq[(String, String)], sfDir: String,
      calMedian: Double = 0.0, calParMedian: Double = 0.0,
      calMemMedian: Double = 0.0): String = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    // Locale.ROOT: a comma-decimal default locale would render 1.234 as
    // "1,234" and hand the driver invalid JSON — the exact parsed:null
    // failure this line exists to avoid
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)
    def obj(m: Seq[(String, String)]) =
      m.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val qs = obj(mins.map { case (k, v) => k -> fmt(v) })
    // calp/calm do NOT ride the stdout line: at 57 headline queries the
    // line sits within ~30 chars of the driver's tail window, and the
    // two extra fields pushed it into the truncated fallback (measured —
    // the per-query map is worth more than a duplicate of what the
    // committed details file already carries in cal_parallel_sec /
    // cal_memory_sec).
    val _ = (calParMedian, calMemMedian)
    def line(es: String) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""stat":"min_of_warm_reps","total_median":${fmt(totalMedian)},""" +
        s""""cal":${fmt(calMedian)},""" +
        s""""scope":"headline","n_queries":${mins.size},"reps":$reps,""" +
        s""""queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""
    // errors are capped ADAPTIVELY: the queries map grows with the
    // headline set, so a fixed error budget would eventually blow the
    // line past the driver's ~2000-char tail window and take the whole
    // bench signal down with it. Full messages live in the details file;
    // here we shrink count/length until the line fits.
    val budget = LineBudget
    val attempts = Seq((3, 60), (3, 40), (2, 40), (1, 40), (1, 20), (0, 0))
    attempts.iterator.map { case (n, len) =>
      line(obj(errors.take(n).map { case (k, v) => k -> jstr(v.take(len)) }))
    }.find(_.length <= budget).getOrElse {
      // Even the zero-error line overflows ⇒ the headline set itself has
      // outgrown the tail window. Drop the per-query map (it lives in
      // full in the details file) rather than ship an unparseable line —
      // the driver keeps total/median/cal, which is the core signal.
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""stat":"min_of_warm_reps","total_median":${fmt(totalMedian)},""" +
        s""""cal":${fmt(calMedian)},"scope":"headline_truncated",""" +
        s""""n_queries":${mins.size},"reps":$reps,"queries":{},""" +
        s""""errors":{},"sf":${jstr(sfDir)}}"""
    }
  }

  /** True when a query has no uncontended rep: every calibration probe
    * taken immediately before one of its reps exceeded 1.5× the session's
    * idle (median) probe time, so even the min rep measured the machine.
    * Such queries get one deferred retry rep after the final sweep. */
  def needsRetry(probes: Seq[Double], idleMedian: Double): Boolean =
    probes.nonEmpty && probes.forall(_ > idleMedian * 1.5)

  /** Per-query JVM/executor counters sampled around each rep sweep —
    * the diagnostics VERDICT r10 asked for after nine untouched queries
    * "regressed" 3–4.7×: if that cluster reappears, the details file now
    * says whether GC time spiked (heap pressure from neighboring
    * queries), storage memory was full (cache eviction), or neither
    * (host contention ⇒ trust `cal`, not the wall time).
    *
    * @param gcDeltaMs  JVM GC time accumulated DURING this query's reps
    * @param heapUsedMb JVM heap in use when the sweep started
    * @param storageUsedMb block-manager storage memory in use at start
    */
  final case class QueryCounters(gcDeltaMs: Long, heapUsedMb: Long,
      storageUsedMb: Long)

  /** Cumulative JVM garbage-collection milliseconds (all collectors). */
  def gcMillis(): Long = {
    val it = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.iterator()
    var sum = 0L
    while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) sum += t }
    sum
  }

  /** Cumulative Janino compilations this JVM — the counter behind the
    * r12 d_minhash adjudication (cold codegen vs cache hit). A rep with
    * delta 0 ran fully cache-warm; a nonzero delta names the recompile
    * cost that rep paid. Sampled per rep like [[gcMillis]]. */
  def codegenCompiles(): Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

  /** Generated classes loaded so far (codegen class-count side of the
    * registry-growth audit — VERDICT r13 task #7). */
  def codegenClasses(): Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount

  /** Metaspace in use (MB) — generated classes live here, so registry
    * growth shows up as a rising floor across sweeps. */
  def metaspaceUsedMb(): Long = {
    val it = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.iterator()
    var used = 0L
    while (it.hasNext) {
      val p = it.next()
      if (p.getName.contains("Metaspace")) used += p.getUsage.getUsed
    }
    used >> 20
  }

  /** Extract the per-query raw reps from a BENCH_DETAILS json payload
    * (the `"reps_sec":{"q":[...],...}` object) without a JSON library —
    * names and numerals contain no braces, so the object ends at the
    * first `}` after its opener. Pure so HarnessContractSpec can lock
    * the round-trip against [[renderDetails]] output. */
  def parseRepsSec(detailsJson: String): Map[String, Seq[Double]] = {
    val key = "\"reps_sec\":{"
    val at = detailsJson.indexOf(key)
    if (at < 0) return Map.empty
    val start = at + key.length
    val end = detailsJson.indexOf('}', start)
    if (end < 0) return Map.empty
    val body = detailsJson.substring(start, end)
    val entry = """"([^"]+)":\[([^\]]*)\]""".r
    entry.findAllMatchIn(body).map { m =>
      val ts = m.group(2).split(',').toSeq.filter(_.nonEmpty)
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      m.group(1) -> ts
    }.toMap
  }

  /** The `"sf"` field of a details payload — the drift anchor is only
    * valid when the committed clean run used the SAME scale-factor dir
    * as this run (an sf0.001 probe against an sf0.1 anchor retried 22
    * queries for nothing when this rule first shipped without it). */
  def parseSf(detailsJson: String): Option[String] = {
    val m = """"sf":"([^"]*)"""".r.findFirstMatchIn(detailsJson)
    m.map(_.group(1))
  }

  /** Clean-run-drift retry rule (VERDICT r13 task #1): BENCH_r13's
    * a11_combo_frequencies had all three reps ≥1.94s — mutually within
    * 2×, so the spread rule stayed silent — while the committed clean
    * run had it at 0.49s. Reps that AGREE with each other can still all
    * be contended; the committed clean-run min is the reference the
    * spread rule lacks. A query whose session min is >2× its clean min
    * (and at least `floorSec` absolute over it, so micro-queries don't
    * retry on noise) gets one deferred retry rep even at low spread. */
  def cleanDrift(sessionMin: Double, cleanMin: Double,
      factor: Double = 2.0, floorSec: Double = 0.10): Boolean =
    cleanMin > 0.0 && sessionMin > factor * cleanMin &&
      sessionMin - cleanMin > floorSec

  /** Verbose payload for the details file (not stdout): per-query medians
    * and every raw rep, so an outlier run is diagnosable post-hoc.
    *
    * @param calByQuery the calibration probe taken immediately before each
    *                   of a query's reps (round-robin order), so a slow rep
    *                   is attributable to host load at THAT moment
    * @param retried    queries that got the deferred retry rep because
    *                   every in-sweep probe read contended
    */
  def renderDetails(results: Seq[(String, Seq[Double])], reps: Int,
      errors: Seq[(String, String)], sfDir: String,
      calibration: Seq[Double] = Nil,
      counters: Seq[(String, QueryCounters)] = Nil,
      calByQuery: Seq[(String, Seq[Double])] = Nil,
      retried: Seq[String] = Nil,
      gcByRep: Seq[(String, Seq[Long])] = Nil,
      compilesByRep: Seq[(String, Seq[Long])] = Nil,
      jvm: Seq[(String, Long)] = Nil,
      calParallel: Seq[Double] = Nil,
      calMemory: Seq[Double] = Nil): String = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", d)
    def obj(m: Seq[(String, String)]) =
      m.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val medians = results.map { case (k, ts) =>
      k -> (if (ts.isEmpty) 0.0 else ts.sorted.apply(ts.size / 2)) }
    val qmed = obj(medians.map { case (k, v) => k -> fmt(v) })
    val raw = obj(results.map { case (k, ts) =>
      k -> ts.map(fmt).mkString("[", ",", "]") })
    val es = obj(errors.map { case (k, v) => k -> jstr(v) })
    val cal = calibration.map(fmt).mkString("[", ",", "]")
    val calQ = obj(calByQuery.map { case (k, ts) =>
      k -> ts.map(fmt).mkString("[", ",", "]") })
    val rt = retried.map(jstr).mkString("[", ",", "]")
    val ctr = obj(counters.map { case (k, c) =>
      k -> (s"""{"gc_ms":${c.gcDeltaMs},"heap_mb":${c.heapUsedMb},""" +
        s""""storage_mb":${c.storageUsedMb}}""")
    })
    val gcR = obj(gcByRep.map { case (k, gs) =>
      k -> gs.mkString("[", ",", "]") })
    val cmpR = obj(compilesByRep.map { case (k, cs) =>
      k -> cs.mkString("[", ",", "]") })
    val jvmO = obj(jvm.map { case (k, v) => k -> v.toString })
    val calP = calParallel.map(fmt).mkString("[", ",", "]")
    val calM = calMemory.map(fmt).mkString("[", ",", "]")
    s"""{"metric":"bench_details","reps":$reps,"queries_median":$qmed,""" +
      s""""reps_sec":$raw,"calibration_sec":$cal,"cal_by_query":$calQ,""" +
      s""""cal_parallel_sec":$calP,"cal_memory_sec":$calM,""" +
      s""""retried":$rt,"counters":$ctr,"gc_by_rep":$gcR,""" +
      s""""compiles_by_rep":$cmpR,"jvm":$jvmO,""" +
      s""""errors":$es,"sf":${jstr(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val detailsPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAILS",
      "/tmp/graft_bench_details.json")
    val spark = GraftSession.local("graft-bench")
    // the committed clean-run anchor for the drift-retry rule — read
    // BEFORE the run, because this run overwrites the repo copy at exit
    val repoCopy = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAILS_REPO",
      "BENCH_DETAILS_latest.json")
    val cleanMins: Map[String, Double] =
      try {
        val p = java.nio.file.Paths.get(repoCopy)
        if (java.nio.file.Files.exists(p)) {
          val js = java.nio.file.Files.readString(p)
          if (parseSf(js).contains(sfDir)) // anchor must be same-SF
            parseRepsSec(js)
              .collect { case (k, ts) if ts.nonEmpty => k -> ts.min }
          else Map.empty
        } else Map.empty
      } catch { case _: Throwable => Map.empty }
    // warm the JVM + parquet footers so the first timed query isn't
    // charged for session/codegen startup
    SparkEntry.entry(spark).count()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val missing = SparkEntry.headline.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"headline names not in queries: ${missing.mkString(",")}")
    val headline = SparkEntry.queries.view.filterKeys(SparkEntry.headline.contains).toMap
    val ordered = headline.toSeq.sortBy(_._1)

    // ROUND-ROBIN rep sweeps (q1..qN, q1..qN, ...), not per-query rep
    // bursts: r10 and r11 both lost a contiguous alphabetical window of
    // queries to a sustained multi-minute host-contention episode, and
    // with consecutive reps ALL of a query's reps land inside the
    // episode, so min-of-warm-reps is defenseless. Round-robin separates
    // a query's reps by the full sweep length (~minutes), so a contention
    // window now costs at most one rep per query and the min recovers.
    val calibration = scala.collection.mutable.ArrayBuffer(calibrate())
    val calByQuery = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val times = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val gcDelta = scala.collection.mutable.LinkedHashMap[String, Long]()
    val gcReps = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Long]]()
    val compileReps = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Long]]()
    val heapAtStart = scala.collection.mutable.LinkedHashMap[String, Long]()
    val storageAtStart = scala.collection.mutable.LinkedHashMap[String, Long]()
    ordered.foreach { case (name, _) =>
      calByQuery(name) = scala.collection.mutable.ArrayBuffer[Double]()
      times(name) = scala.collection.mutable.ArrayBuffer[Double]()
      gcDelta(name) = 0L
      gcReps(name) = scala.collection.mutable.ArrayBuffer[Long]()
      compileReps(name) = scala.collection.mutable.ArrayBuffer[Long]()
    }
    // registry-growth JVM audit (VERDICT r13 task #7): class/metaspace
    // floor at sweep start vs end says whether codegen-cache pressure is
    // building as the headline set grows
    val metaspace0 = metaspaceUsedMb()
    val classes0 = codegenClasses()
    val compiles0 = codegenCompiles()
    // multi-core + memory-bandwidth capacity samples at sweep
    // boundaries (the sweeps themselves keep only the cheap 1-thread
    // probe): four samples each bracket the session
    val calPar = scala.collection.mutable.ArrayBuffer(calibrateParallel())
    val calMem = scala.collection.mutable.ArrayBuffer(calibrateMemory())
    def storageMb(): Long = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, rem) => max - rem }.sum >> 20 // one BM in local[*]
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit = {
      // contention probe immediately before THIS rep — an elevated sample
      // pinpoints the rep that was contended, not just the query
      val cal = calibrate()
      calibration += cal
      calByQuery(name) += cal
      val gc0 = gcMillis()
      val cc0 = codegenCompiles()
      if (!heapAtStart.contains(name)) {
        val rt = Runtime.getRuntime
        heapAtStart(name) = (rt.totalMemory() - rt.freeMemory()) >> 20
        storageAtStart(name) = storageMb()
      }
      val t0 = System.nanoTime()
      // collect() forces full materialization of every output row;
      // results are aggregated/small by construction
      try { fn(spark, sfDir).collect(); times(name) += (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
      val gcd = gcMillis() - gc0
      gcDelta(name) += gcd
      gcReps(name) += gcd // per-rep: a slow rep with flat GC ⇒ host, not heap
      // per-rep Janino compiles: 0 ⇒ cache-warm rep; nonzero names the
      // recompile cost this rep paid (the d_minhash-adjudication receipt)
      compileReps(name) += codegenCompiles() - cc0
    }
    (1 to reps).foreach { _ =>
      ordered.foreach { case (name, fn) => runOnce(name, fn) }
      calPar += calibrateParallel()
      calMem += calibrateMemory()
    }

    // Deferred retry sweep: a query whose EVERY in-sweep probe exceeded
    // 1.5× the session's idle calibration median has no uncontended rep,
    // so its min still measures the machine — give it one more rep now,
    // after the episode has (usually) passed.
    val idleCal = calibration.sorted.apply(calibration.size / 2)
    val suspectCal = ordered.filter { case (name, _) =>
      needsRetry(calByQuery(name).toSeq, idleCal) }
    // Spread retry (round 13): BENCH_r12's d_minhash_neardups reps were
    // [6.7, 4.7, 12.7] — rep1 cold codegen, rep3 inside a contention
    // episode that also hit ten alphabetically-adjacent queries 2.5–14×,
    // leaving a contended rep2 as the "min"; its probes [0.32, 0.34,
    // 0.32] never tripped the all-probes rule. A query whose reps spread
    // >2× has an untrustworthy min by construction (either its cold rep
    // dominates — retry harmless — or an episode swallowed its good
    // reps — retry heals the min), so it gets one extra rep too,
    // worst-spread first, capped to bound the extra sweep.
    val suspectSpread = ordered.filter { case (name, _) =>
      val ts = times(name)
      ts.size >= 2 && ts.max > 2.0 * ts.min }
      .sortBy { case (name, _) => -times(name).max / times(name).min }
      .take(16)
    // Clean-run-drift retry (round 14): BENCH_r13's a11_combo_frequencies
    // had reps [1.94, 2.62, 2.45] — within 2× of each other (spread rule
    // silent) and probes mostly calm (all-probes rule silent) — yet 4×
    // the committed clean-run min. Reps that agree can still ALL be
    // contended; the committed anchor catches what intra-session rules
    // structurally cannot. Worst drift first, capped like spread.
    val suspectDrift = ordered.filter { case (name, _) =>
      val ts = times(name)
      ts.nonEmpty && cleanMins.get(name).exists(c => cleanDrift(ts.min, c)) }
      .sortBy { case (name, _) => -times(name).min / cleanMins(name) }
      .take(16)
    val suspect = (suspectCal ++ suspectSpread ++ suspectDrift).distinct
    suspect.foreach { case (name, fn) => runOnce(name, fn) }

    val results = ordered.map { case (name, _) => name -> times(name).toSeq }
    val counters = ordered.map { case (name, _) =>
      name -> QueryCounters(gcDelta(name), heapAtStart.getOrElse(name, 0L),
        storageAtStart.getOrElse(name, 0L)) }
    val mins = results.map { case (k, ts) =>
      k -> (if (ts.isEmpty) 0.0 else ts.min) }
    val totalMedian = results.map { case (_, ts) =>
      if (ts.isEmpty) 0.0 else ts.sorted.apply(ts.size / 2) }.sum
    val calMedian = calibration.sorted.apply(calibration.size / 2)
    val details = renderDetails(results, reps, errors.toSeq, sfDir,
      calibration.toSeq, counters,
      calByQuery = ordered.map { case (n, _) => n -> calByQuery(n).toSeq },
      retried = suspect.map(_._1),
      gcByRep = ordered.map { case (n, _) => n -> gcReps(n).toSeq },
      compilesByRep = ordered.map { case (n, _) => n -> compileReps(n).toSeq },
      jvm = Seq(
        "metaspace_start_mb" -> metaspace0,
        "metaspace_end_mb" -> metaspaceUsedMb(),
        "codegen_classes_start" -> classes0,
        "codegen_classes_end" -> codegenClasses(),
        "codegen_compiles_sweep" -> (codegenCompiles() - compiles0)),
      calParallel = calPar.toSeq,
      calMemory = calMem.toSeq)
    // write the details BOTH to the driver-side path and into the repo,
    // so adjudicating a flagged round never depends on /tmp surviving
    // it. The repo copy anchors on build.sbt in the CWD (sbt runs from
    // the repo root) — if launched from elsewhere, it falls back to the
    // CWD and SAYS SO with the absolute path, rather than silently
    // scattering the adjudication artifact
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt")))
      System.err.println("[bench] cwd is not the repo root; details repo " +
        s"copy lands at ${java.nio.file.Paths.get(repoCopy).toAbsolutePath}")
    Seq(detailsPath, repoCopy).foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), details): Unit
      catch { case e: Throwable =>
        System.err.println(s"[bench] details write to $p failed: ${e.getMessage}")
      }
    }
    def med(xs: Seq[Double]) =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)
    println(render(mins, totalMedian, reps, errors.toSeq, sfDir, calMedian,
      calParMedian = med(calPar.toSeq), calMemMedian = med(calMem.toSeq)))
    spark.stop()
  }
}
