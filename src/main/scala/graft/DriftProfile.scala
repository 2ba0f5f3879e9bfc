package graft

/** Drift-adjudication profiler (VERDICT r14 task #1): distinguishes
  * "a query's floor rises as the session accumulates state" (structural
  * — registry growth, old-gen creep, fixture caches) from "the whole
  * host is slower for 32-wide work this session" (environmental).
  *
  * Protocol, one JVM:
  *   A. capacity probes (1-thread spin, 32-thread spin, memory stream);
  *   B. `reps` consecutive reps of the target query COLD-SESSION, with
  *      per-rep GC deltas split young/old generation;
  *   C. one full sweep of every headline query (the state-accumulation
  *      payload a real bench session runs);
  *   D. `reps` more reps of the target LATE-SESSION, same counters;
  *   E. probes again.
  *
  * If min(D) ≈ min(B), nothing the session accumulated taxes the query
  * — any committed-clean drift is host-side, and the capacity probes
  * say which axis. If min(D) > min(B) with old-gen GC up, the session
  * itself is the cause and the fix is structural. */
object DriftProfile {

  private def gcByGen(): Map[String, (Long, Long)] = {
    val it = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.iterator()
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    while (it.hasNext) {
      val b = it.next()
      out(b.getName) = (b.getCollectionCount, b.getCollectionTime)
    }
    out.toMap
  }

  private def heapMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) >> 20
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val target = sys.env.getOrElse("SPARK_GRAFT_PROFILE_QUERY",
      "h2_shape_min_cost_supplier")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "12").toInt
    val spark = GraftSession.local("graft-drift-profile")
    SparkEntry.entry(spark).count() // session/codegen warmup
    val fn = SparkEntry.queries(target)

    def probes(tag: String): Unit = {
      val c1 = Bench.calibrate(); val cp = Bench.calibrateParallel()
      val cm = Bench.calibrateMemory()
      println(f"[probe $tag] cal1=$c1%.3f calp=$cp%.3f calm=$cm%.3f")
    }
    def block(tag: String): Double = {
      var best = Double.MaxValue
      (1 to reps).foreach { i =>
        val g0 = gcByGen(); val h0 = heapMb()
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val g1 = gcByGen()
        val gcs = g1.map { case (k, (c, ms)) =>
          val (c0, ms0) = g0.getOrElse(k, (0L, 0L))
          f"${k.replaceAll(" Generation", "")}:+${c - c0}/${ms - ms0}ms"
        }.mkString(" ")
        println(f"[$tag rep$i%02d] $sec%.3f s heap0=${h0}MB $gcs")
        if (sec < best) best = sec
      }
      println(f"[$tag] min=$best%.3f")
      best
    }

    probes("start")
    val early = block("cold")
    // the state-accumulation payload: every headline query once
    val t0 = System.nanoTime()
    SparkEntry.queries.view
      .filterKeys(SparkEntry.headline.contains).toSeq.sortBy(_._1)
      .foreach { case (_, f) => f(spark, sfDir).collect(): Unit }
    println(f"[sweep] all-headline once in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    probes("mid")
    val late = block("late")
    probes("end")
    println(f"""{"metric":"drift_profile","query":"$target","early_min":$early%.3f,"late_min":$late%.3f,"ratio":${late / early}%.3f}""")
    spark.stop()
  }
}
