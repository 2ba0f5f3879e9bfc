package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Z-order clustered writes (sinks.Clustered): the parquet footer stats
  * must become tight on EVERY clustering column simultaneously (that is
  * the whole point — a single-column sort can't), the data must survive
  * the re-arrangement untouched, and a two-column band filter must
  * actually skip most rows at scan time.
  */
class ClusteredSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("clustered-spec")

  override def afterAll(): Unit = spark.stop()

  /** Per-file (min, max) of an int column from the parquet footers. */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.toSeq.map { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), new Configuration())
      val reader = ParquetFileReader.open(in)
      try {
        val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column)
            .map(_.getStatistics)
        }
        val mins = stats.map(_.genericGetMin.asInstanceOf[Number].longValue())
        val maxs = stats.map(_.genericGetMax.asInstanceOf[Number].longValue())
        (mins.min, maxs.max)
      } finally reader.close()
    }
  }

  private def avgCoverage(ranges: Seq[(Long, Long)], domain: Double): Double =
    ranges.map { case (lo, hi) => (hi - lo).toDouble / domain }.sum / ranges.size

  test("z-order makes per-file ranges tight on BOTH columns; linear sort cannot") {
    import spark.implicits._
    val r = new scala.util.Random(42)
    val df = (1 to 40000).map(_ => (r.nextInt(1000), r.nextInt(1000)))
      .toDF("x", "y")

    val zdir = "/tmp/clustered_spec_z"
    sinks.Clustered.writeZOrdered(df, zdir, Seq("x", "y"), nFiles = 16, bits = 10)
    val zx = avgCoverage(fileRanges(zdir, "x"), 999.0)
    val zy = avgCoverage(fileRanges(zdir, "y"), 999.0)
    assert(zx < 0.5 && zy < 0.5,
      f"z-order per-file coverage should be tight on both dims: x=$zx%.2f y=$zy%.2f")

    val ldir = "/tmp/clustered_spec_linear"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)
    val lx = avgCoverage(fileRanges(ldir, "x"), 999.0)
    val ly = avgCoverage(fileRanges(ldir, "y"), 999.0)
    assert(lx < 0.2, f"sanity: linear sort is tight on its own column ($lx%.2f)")
    assert(ly > 0.8, f"sanity: linear sort has no stats on the other column ($ly%.2f)")
    assert(zy < ly / 2, "z-order must beat the linear layout on the second column")

    // the re-arrangement is a permutation, not a transformation
    val back = spark.read.parquet(zdir)
    assert(back.count() === 40000)
    assert(back.groupBy().agg(sum("x"), sum("y")).collect()(0).toSeq
      === df.groupBy().agg(sum("x"), sum("y")).collect()(0).toSeq)
  }

  test("a two-column band filter skips most rows at scan time") {
    val zdir = "/tmp/clustered_spec_z" // written above
    val q = spark.read.parquet(zdir)
      .filter(col("x") < 100 && col("y") < 100)
    // execute this exact queryExecution — count() plans a separate one
    // whose metrics this scan node would never see
    val n = q.queryExecution.toRdd.count()
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val scanned = scan.metrics("numOutputRows").value
    assert(n > 0)
    assert(scanned < 40000 / 2,
      s"scan returned $scanned of 40000 rows — footer stats not skipping")
  }

  test("bench-scale lineitem: z-order serves a two-column band from a fraction of the files a single sort needs") {
    // The end-to-end proof-of-benefit at sf0.1: the same table written
    // z-ordered on (l_partkey, l_suppkey) vs range-sorted on l_partkey
    // alone, probed by a band predicate selective on BOTH columns. The
    // sorted layout prunes the partkey dimension only — every file's
    // suppkey interval spans the domain — while the z-order prunes both,
    // so the servable-file count (footer intervals overlapping the
    // predicate box, the listing-level skipping measure) must be a
    // multiple smaller. Scan-level confirmation via numOutputRows: the
    // pushed band filter skips row groups the same way.
    val nFiles = 64
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    val Array(pMax, sMax) = li.agg(max("l_partkey"), max("l_suppkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    // LONG literals: a double band would cast the bigint column and the
    // cast blocks parquet predicate pushdown — no row-group skipping
    val (pBand, sBand) = ((pMax / 4).toLong, (sMax / 4).toLong) // ~1/16 of 2-D space

    val zdir = "/tmp/clustered_spec_li_z"
    val ldir = "/tmp/clustered_spec_li_sorted"
    sinks.Clustered.writeZOrdered(li, zdir, Seq("l_partkey", "l_suppkey"),
      nFiles = nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ldir)

    // listing-level measure: files whose footer box overlaps the predicate
    def servableFiles(dir: String): Int = {
      val byFile = sinks.Layout
        .fileColumnStats(spark, dir, Seq("l_partkey", "l_suppkey"))
        .groupBy(_.file)
      byFile.count { case (_, ss) =>
        ss.forall(s => s.column match {
          case "l_partkey" => s.min < pBand
          case "l_suppkey" => s.min < sBand
        })
      }
    }
    val (zFiles, lFiles) = (servableFiles(zdir), servableFiles(ldir))
    info(s"servable files: z-order $zFiles/$nFiles vs sorted $lFiles/$nFiles")
    assert(zFiles * 2 <= lFiles,
      s"z-order must serve the 2-D band from far fewer files: $zFiles vs $lFiles")

    // scan-level measure: rows surviving row-group skipping + pushed filter
    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("l_partkey") < pBand && col("l_suppkey") < sBand)
      // execute THIS queryExecution (count() would plan a separate one
      // whose metrics the assertion below would never see)
      q.queryExecution.toRdd.count()
      q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val (zRows, lRows) = (scannedRows(zdir), scannedRows(ldir))
    info(s"scan rows after skipping: z-order $zRows vs sorted $lRows of $total")
    assert(zRows <= lRows,
      s"z-order scan must not read more than the sorted scan: $zRows vs $lRows")
    assert(zRows < total / 4,
      s"z-order scan read $zRows of $total — no effective skipping")

    // clusteringReport tells the same story from footers alone: the
    // sorted layout's suppkey overlap depth is ~n_files (no skipping
    // possible), the z-order's is a small multiple of perfectly disjoint
    val depth = (dir: String) => sinks.Layout
      .clusteringReport(spark, dir, Seq("l_partkey", "l_suppkey"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val (zd, ld) = (depth(zdir), depth(ldir))
    info(f"overlap depth: z partkey=${zd("l_partkey")}%.1f suppkey=${zd("l_suppkey")}%.1f; " +
      f"sorted partkey=${ld("l_partkey")}%.1f suppkey=${ld("l_suppkey")}%.1f")
    assert(ld("l_suppkey") > nFiles * 0.9,
      "sorted layout must report no suppkey clustering")
    assert(zd("l_suppkey") < nFiles * 0.5,
      "z-order must report real suppkey clustering")
  }

  test("null and constant clustering columns don't break the curve") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (if (i % 10 == 0) None else Some(i), 7)).toDF("x", "c")
    val out = "/tmp/clustered_spec_nulls"
    sinks.Clustered.writeZOrdered(df, out, Seq("x", "c"), nFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() === 100)
    assert(back.filter(col("x").isNull).count() === 10)
  }

  test("Layout.clusteringReport: sorted layout near depth 1, random layout near n_files") {
    import spark.implicits._
    val df = (1 to 40000).map(i => (i, i * 31 % 40000)).toDF("a", "b")

    // range-partitioned on a: per-file a-intervals are disjoint → the
    // report must say every a-lookup opens ~1 file, while b (random
    // w.r.t. a) spans everything
    val sortedDir = java.nio.file.Files.createTempDirectory("layout_s").toString
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sortedDir)
    val rep = sinks.Layout.clusteringReport(spark, sortedDir, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    val (nA, depthA) = rep("a")
    assert(nA >= 8 && depthA <= 2.0,
      s"disjoint ranges must report depth ~1, got $depthA over $nA files")
    val (nB, depthB) = rep("b")
    assert(depthB >= nB * 0.9,
      s"random column must report depth ~n_files, got $depthB of $nB")

    // round-robin layout: every file spans the whole a-domain too
    val randDir = java.nio.file.Files.createTempDirectory("layout_r").toString
    df.repartition(8).write.mode("overwrite").parquet(randDir)
    val rand = sinks.Layout.clusteringReport(spark, randDir, Seq("a"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    val (nR, depthR) = rand("a")
    assert(depthR >= nR * 0.9,
      s"unclustered layout must report depth ~n_files, got $depthR of $nR")

    // bounds sanity: min/max in the report span the true domain
    val full = sinks.Layout.clusteringReport(spark, sortedDir, Seq("a"))
      .collect()(0)
    assert(full.getDouble(2) == 1.0 && full.getDouble(3) == 40000.0)
  }
}
