package graft

import org.apache.spark.sql.SparkSession

/** Single place to build a correctly-configured SparkSession.
  *
  * All entry points (Bench, Verify, tests) go through here so that
  * session-level settings — UTC timezone, shuffle parallelism sized to the
  * local core count, AQE, and the `nanosAsLong` legacy flag needed to read
  * the driver-generated `events.parquet` (TIMESTAMP(NANOS)) — are applied
  * once, before any scan is planned, instead of being mutated mid-query.
  */
object GraftSession {

  /** Cores to size local parallelism with (driver exports SPARK_GRAFT_CPUS). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // custom Catalyst expressions (graft_vector_dot, plans.VectorDot)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is written as parquet TIMESTAMP(NANOS); Spark reads it
      // as a long (ns since epoch) under this flag — Tables truncates to µs.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // Generated-class cache. The default (100 entries) thrashes under
      // Bench's round-robin sweeps: ~56 other headline queries run
      // between one query's reps, so every rep re-Janino-compiles its
      // whole-stage code from scratch — measured at 22 recompiles per
      // d_minhash_neardups rep (MinhashProfile, round 13), a flat
      // ~0.3–0.5 s tax per rep that lands on every codegen-heavy query
      // and shows up as the r12 "mid-pack drift". 4096 entries hold the
      // full registry's generated classes; they are small (KBs of
      // bytecode), so the metaspace cost is negligible next to an 8 GB
      // heap. Static conf — must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Local session for harness mains and tests. */
  def local(appName: String): SparkSession = {
    val s = builder(appName).master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
