package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Guards the two driver-facing stdout contracts.
  *
  * The driver retains only the last ~2000 characters of a run's stdout
  * and parses its JSON line out of that tail (BENCH_r06/r07 came back
  * `parsed: null` after the line outgrew the window; the stored r07 tail
  * starts mid-line). sbt appends its own "[success] Total time: ..."
  * trailer (~100 chars) after our line, so the line itself must stay
  * comfortably under the window.
  */
class HarnessContractSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  // single source of truth lives next to the renderer it constrains
  private val TailWindow = Bench.TailWindow
  private val SbtTrailer = Bench.SbtTrailer

  private def realisticMins: Seq[(String, Double)] =
    SparkEntry.headline.map(n => n -> 1.2345).toSeq

  test("bench stdout line fits the driver tail for the current headline set") {
    val line = Bench.render(realisticMins, 40.0, 3, Nil, "/root/testdata/sf0.1")
    assert(line.length <= TailWindow - SbtTrailer,
      s"bench line ${line.length} chars — exceeds the ${TailWindow - SbtTrailer} budget")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("queries").size == SparkEntry.headline.size)
    assert(node.get("value").asDouble > 0.0)
  }

  test("bench stdout line stays bounded even with failing queries") {
    val errs = SparkEntry.headline.take(10).map(n => n -> ("x" * 500)).toSeq
    val line = Bench.render(realisticMins, 40.0, 3, errs, "/root/testdata/sf0.1")
    assert(line.length <= TailWindow - SbtTrailer,
      s"bench line with errors ${line.length} chars — errors must be capped")
    assert(mapper.readTree(line).get("errors").size <= 3)
  }

  test("an oversized headline set degrades to a parseable truncated line") {
    // 200 fictional queries — far past the tail window even error-free
    val mins = (1 to 200).map(i => f"q_fictional_query_number_$i%03d" -> 1.2345)
    val line = Bench.render(mins, 250.0, 3, Nil, "/sf")
    assert(line.length <= TailWindow - SbtTrailer,
      s"fallback line still oversized: ${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("scope").asText == "headline_truncated")
    assert(node.get("n_queries").asInt == 200)
    assert(node.get("value").asDouble > 0.0)
    assert(node.get("queries").size == 0)
  }

  test("bench details payload is valid JSON with medians, raw reps, calibration") {
    val results = SparkEntry.headline.map(n => n -> Seq(3.0, 1.0, 2.0)).toSeq
    val js = Bench.renderDetails(results, 3, Seq("q" -> "boom \"quoted\""), "/sf",
      calibration = Seq(0.11, 0.12),
      counters = Seq("q1" -> Bench.QueryCounters(120L, 512L, 64L)))
    val node = mapper.readTree(js)
    assert(node.get("queries_median").get(SparkEntry.headline.head).asDouble == 2.0)
    assert(node.get("reps_sec").get(SparkEntry.headline.head).size == 3)
    assert(node.get("calibration_sec").size == 2)
    val c = node.get("counters").get("q1")
    assert(c.get("gc_ms").asLong == 120L)
    assert(c.get("heap_mb").asLong == 512L)
    assert(c.get("storage_mb").asLong == 64L)
  }

  test("details payload carries per-rep calibration and the retry list") {
    val js = Bench.renderDetails(Seq("q1" -> Seq(1.0)), 3, Nil, "/sf",
      calByQuery = Seq("q1" -> Seq(0.1, 0.45, 0.12)), retried = Seq("q1"))
    val node = mapper.readTree(js)
    assert(node.get("cal_by_query").get("q1").size == 3)
    assert(node.get("retried").get(0).asText == "q1")
  }

  test("deferred retry triggers only when every probe read contended") {
    // all three probes above 1.5× idle ⇒ no clean rep exists ⇒ retry
    assert(Bench.needsRetry(Seq(0.5, 0.6, 0.7), idleMedian = 0.3))
    // one clean probe ⇒ that rep's min is trustworthy ⇒ no retry
    assert(!Bench.needsRetry(Seq(0.5, 0.31, 0.7), idleMedian = 0.3))
    // errored-out query (no reps) must not retry-loop
    assert(!Bench.needsRetry(Nil, idleMedian = 0.3))
  }

  test("parseRepsSec round-trips renderDetails output") {
    val js = Bench.renderDetails(
      Seq("q1" -> Seq(3.0, 1.0, 2.0), "q2" -> Seq(0.5)), 3, Nil, "/sf")
    val reps = Bench.parseRepsSec(js)
    assert(reps("q1") == Seq(3.0, 1.0, 2.0))
    assert(reps("q2") == Seq(0.5))
    // garbage and missing-key inputs degrade to empty, never throw
    assert(Bench.parseRepsSec("not json").isEmpty)
    assert(Bench.parseRepsSec("""{"metric":"bench_details"}""").isEmpty)
    // sf extraction: the drift anchor is only valid same-SF
    assert(Bench.parseSf(js).contains("/sf"))
    assert(Bench.parseSf("not json").isEmpty)
  }

  test("clean-run-drift retry fires on the BENCH_r13 a11 signature") {
    // reps [1.94, 2.62, 2.45]: spread < 2x (silent), clean min 0.49
    assert(Bench.cleanDrift(sessionMin = 1.94, cleanMin = 0.49))
    // at its clean level ⇒ no retry
    assert(!Bench.cleanDrift(sessionMin = 0.55, cleanMin = 0.49))
    // micro-query noise: 2x but only 60ms absolute ⇒ no retry
    assert(!Bench.cleanDrift(sessionMin = 0.10, cleanMin = 0.04))
    // no clean anchor (0.0 / absent) ⇒ no retry
    assert(!Bench.cleanDrift(sessionMin = 5.0, cleanMin = 0.0))
  }

  test("details payload carries per-rep compiles and the JVM audit row") {
    val js = Bench.renderDetails(Seq("q1" -> Seq(1.0)), 3, Nil, "/sf",
      compilesByRep = Seq("q1" -> Seq(82L, 0L, 0L)),
      jvm = Seq("metaspace_start_mb" -> 210L, "codegen_classes_end" -> 4100L))
    val node = mapper.readTree(js)
    assert(node.get("compiles_by_rep").get("q1").get(0).asLong == 82L)
    assert(node.get("compiles_by_rep").get("q1").get(1).asLong == 0L)
    assert(node.get("jvm").get("metaspace_start_mb").asLong == 210L)
    assert(node.get("jvm").get("codegen_classes_end").asLong == 4100L)
  }

  test("codegen and metaspace samplers are monotone/plausible") {
    assert(Bench.codegenCompiles() >= 0L)
    assert(Bench.codegenClasses() >= 0L)
    val m = Bench.metaspaceUsedMb()
    assert(m > 0L && m < 65536L) // a running suite JVM always has some
  }

  test("gcMillis is monotone non-negative and cheap to sample") {
    val a = Bench.gcMillis()
    assert(a >= 0L)
    assert(Bench.gcMillis() >= a)
  }

  test("VERDICT-flagged regression queries cannot be rotated out of headline") {
    // round-over-round comparability: a query the judge marked `weak` on
    // performance must keep producing a BENCH_r{N} number until a later
    // verdict clears it (then it may be removed from benchPinned first)
    val missing = SparkEntry.benchPinned.filterNot(SparkEntry.headline.contains)
    assert(missing.isEmpty,
      s"benchPinned queries rotated out of headline: ${missing.mkString(", ")}")
    val unknown = SparkEntry.benchPinned.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty,
      s"benchPinned names not in the registry: ${unknown.mkString(", ")}")
  }

  test("calibration spin returns a plausible positive wall time") {
    val t = Bench.calibrate(iters = 10000000L)
    assert(t > 0.0 && t < 10.0)
    val line = Bench.render(realisticMins, 40.0, 3, Nil, "/sf", calMedian = t)
    assert(mapper.readTree(line).get("cal").asDouble > 0.0)
  }

  test("every oracle query name is a legal filename stem for dual-key sidecars") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(k.matches("[A-Za-z0-9_]+"), s"oracle key '$k' not filename-safe")
      assert(!k.endsWith(".parquet"), s"oracle key '$k' already suffixed")
    }
  }

  test("oracle map covers every registered query or is declared rows-only") {
    // rows-only queries (no SQL oracle) are the seeded ANN pair; anything
    // else missing an oracle entry silently downgrades its driver check
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.subsetOf(Set("s_ann_lsh_top3", "s_ann_ivf_top3")),
      s"queries without oracle SQL: ${rowsOnly.mkString(", ")}")
  }
}
