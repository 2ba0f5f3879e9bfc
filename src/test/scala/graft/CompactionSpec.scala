package graft

import graft.sinks.Compaction
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: selectivity (only violating leaves rewritten),
  * data fidelity, partition-layout preservation, and temp-dir hygiene. */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.local("compaction-spec")
  override def afterAll(): Unit = spark.stop()

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath // does not exist yet
  }

  private def listParquet(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter { f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")
    }
  }

  test("violating partitions shrink to the target; data identical") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 1000L).map(i => (i, s"k${i % 3}", s"v$i")).toDF("id", "k", "v")
      .repartition(10)
      .write.partitionBy("k").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect()
    assert(listParquet(dir).size === 30, "fixture: 10 files per partition")

    val results = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(results.size === 3 && results.forall(_.filesAfter === 1))
    assert(listParquet(dir).size === 3)
    // partition directories still hive-style and prunable
    val pruned = spark.read.parquet(dir).filter(col("k") === "k1")
    assert(pruned.count() === before.count(_.getAs[String]("k") == "k1"))
    assert(spark.read.parquet(dir).orderBy("id").collect() === before)
  }

  test("compliant leaves are untouched (same files, same mtimes)") {
    import spark.implicits._
    val dir = freshDir()
    // one partition already compact, one fragmented
    Seq((1L, "good", "a")).toDF("id", "k", "v")
      .coalesce(1).write.partitionBy("k").parquet(dir)
    (0L until 200L).map(i => (i, "bad", s"v$i")).toDF("id", "k", "v")
      .repartition(8).write.mode("append").partitionBy("k").parquet(dir)
    val goodFiles = listParquet(dir + "/k=good").map(f => f.getName -> f.lastModified)

    val results = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(results.map(_.dir).forall(_.endsWith("k=bad")))
    assert(listParquet(dir + "/k=good").map(f => f.getName -> f.lastModified)
      === goodFiles)
    assert(listParquet(dir + "/k=bad").size === 1)
  }

  test("plan is listing-only and reports non-violating leaves") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(5).write.parquet(dir)
    val plans = Compaction.plan(spark, dir, targetBytes = 1L << 30)
    assert(plans.size === 1 && plans.head.files === 5
      && plans.head.targetFiles === 1 && plans.head.rewrite)
    val noop = Compaction.plan(spark, dir, targetBytes = 1L)
    // every file already exceeds 1 byte per target file: nothing to gain
    assert(noop.forall(!_.rewrite))
  }

  test("a crashed run's hidden temp dir is never treated as data") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    // simulate a crashed previous compaction: stale temp with parquet in it
    val stale = new java.io.File(dir, ".compact-stale")
    (0L until 10L).map(i => (i + 100000L, "stale")).toDF("id", "v")
      .coalesce(1).write.parquet(stale.getAbsolutePath)
    val results = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(results.size === 1)
    val ids = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 100L).toSet, "stale temp rows must not leak in")
  }
}
