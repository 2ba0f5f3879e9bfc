package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the d_minhash_neardups regression (VERDICT r12
  * task #1). Hypothesis under test: the round-robin bench (r11 task #1)
  * interleaves ~56 other headline queries between this query's reps, and
  * Spark's JVM-wide generated-class cache holds only
  * `spark.sql.codegen.cache.maxEntries` (default 100) compiled classes —
  * so every rep re-Janino-compiles the minhash pipeline's (large)
  * generated code from scratch. Per-query-burst reps (r10) hit the cache
  * on reps 2–3, which is why r10's min looked 4× faster with identical
  * code and an identical plan.
  *
  * The probe times minhash reps bracketed by full sweeps of the other
  * headline queries, and samples CodegenMetrics (compile count +
  * cumulative bytecode) around each rep — the counters-backed
  * attribution VERDICT r12 asked for. Run with
  * SPARK_GRAFT_CODEGEN_CACHE set to compare cache sizes.
  */
object MinhashProfile {
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def compileCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

  private def compileMs: Double = {
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    h.getSnapshot.getMean * h.getCount / 1e6 // ns → ms (mean × n ≈ sum)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = GraftSession.builder("minhash-profile")
      .master(s"local[${GraftSession.cpus}]")
      .config("spark.sql.codegen.cache.maxEntries", cache)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"PROF codegen.cache.maxEntries=$cache")

    val others = SparkEntry.headline.filterNot(_ == "d_minhash_neardups")

    def minhashRep(tag: String): Unit = {
      val c0 = compileCount; val m0 = compileMs; val g0 = gcMs
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d_minhash_neardups")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF minhash $tag ${sec}%.3f s rows=$n " +
        f"compiles=${compileCount - c0} compile_ms=${compileMs - m0}%.0f " +
        s"gc=${gcMs - g0} ms")
    }

    def sweep(tag: String): Unit = {
      val t0 = System.nanoTime()
      others.foreach { q =>
        try SparkEntry.queries(q)(spark, dir).count()
        catch { case e: Exception => println(s"PROF sweep-err $q: ${e.getMessage.take(80)}") }
      }
      println(f"PROF sweep $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    minhashRep("cold")     // JVM cold: codegen + JIT + first-scan cost
    minhashRep("warm0")    // immediately after: per-query-burst profile (r10)
    sweep("s1")            // 56 other queries — thrash the codegen cache
    minhashRep("interleaved1") // round-robin profile (r12)
    sweep("s2")
    minhashRep("interleaved2")
    minhashRep("burst_after") // back-to-back rep right after: cache warm again?

    spark.stop()
  }
}
