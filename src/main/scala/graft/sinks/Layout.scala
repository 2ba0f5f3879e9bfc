package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Table-layout introspection from parquet FOOTERS — zero data I/O, the
  * observability face of [[Clustered]] / [[Bucketed]]: data skipping only
  * works if file-level min/max ranges are narrow and disjoint, and the
  * only honest way to know is to measure the layout itself. At 100 TB
  * this is the difference between assuming a table is well-clustered and
  * seeing its overlap factor drift as appends land ([[Compaction]] fixes
  * file sizes; a re-[[Clustered.writeZOrdered]] fixes what THIS report
  * flags). Footer reads are metadata-only (KBs per file) and driver-side
  * like [[Compaction]]'s listing-only planning — the same table-
  * maintenance scale class, not a data scan. */
object Layout {

  /** One file's merged min/max for one column (row-group stats folded). */
  final case class FileColumnStats(file: String, column: String,
      min: Double, max: Double)

  /** Typed stats → a double interval. Guarded on `hasNonNullValue`: an
    * all-null or stats-less chunk carries UNINITIALIZED min/max (0, 0)
    * that would inject a phantom [0, 0] interval and silently skew the
    * report. Precision caveat: long min/max are exact only to ±2^53 in
    * the double interval — for 64-bit hash-keyed columns the reported
    * boundaries round (overlap counts can coarsen at ulp distance);
    * values from real id/timestamp/measure domains are exact. */
  private def numeric(s: Statistics[_]): Option[(Double, Double)] =
    if (s == null || !s.hasNonNullValue) None
    else s match {
      case i: IntStatistics => Some((i.getMin.toDouble, i.getMax.toDouble))
      case l: LongStatistics => Some((l.getMin.toDouble, l.getMax.toDouble))
      case f: FloatStatistics => Some((f.getMin.toDouble, f.getMax.toDouble))
      case d: DoubleStatistics => Some((d.getMin, d.getMax))
      case _ => None // binary/boolean columns: no numeric interval
    }

  /** Per-(file, column) min/max intervals read from footers only.
    * Columns without numeric stats (strings, missing stats) are
    * skipped. */
  def fileColumnStats(spark: SparkSession, dir: String,
      cols: Seq[String]): Seq[FileColumnStats] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (f.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")) b += f.getPath
      }
      b.result()
    }
    val want = cols.toSet
    files.flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        val perCol = blocks.flatMap(_.getColumns.asScala)
          .filter(c => want.contains(c.getPath.toDotString))
          .flatMap(c => numeric(c.getStatistics)
            .map(mm => c.getPath.toDotString -> mm))
        perCol.groupBy(_._1).map { case (col, mms) =>
          FileColumnStats(p.toString, col,
            mms.map(_._2._1).min, mms.map(_._2._2).max)
        }
      } finally reader.close()
    }
  }

  /** Clustering quality per column: `avg_overlap_depth` = the mean, over
    * files, of how many files' intervals intersect that file's interval
    * (self included). 1.0 = perfectly disjoint ranges (a point lookup
    * opens one file); n_files = every file spans the whole domain (no
    * skipping possible — the unsorted-append pathology). The judge of
    * whether a Z-order / sort layout is still paying for itself.
    *
    * Exact O(n log n) sweep per column over the collected intervals —
    * interval COUNT is file count, driver-sized like the footer list.
    * Output: (column, n_files, min, max, avg_overlap_depth). */
  def clusteringReport(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val stats = fileColumnStats(spark, dir, cols)
    val rows = stats.groupBy(_.column).toSeq.sortBy(_._1).map {
      case (column, ss) =>
        val iv = ss.map(s => (s.min, s.max)).sortBy(_._1)
        // sweep: for interval i, overlaps = #{j : min_j <= max_i AND
        // max_j >= min_i}; count via sorted starts and ends
        val starts = iv.map(_._1).sorted.toIndexedSeq
        val ends = iv.map(_._2).sorted.toIndexedSeq
        // first index where pred fails, over a sorted array
        def count(xs: IndexedSeq[Double], pred: Double => Boolean): Int = {
          var lo = 0; var hi = xs.size
          while (lo < hi) {
            val m = (lo + hi) >>> 1
            if (pred(xs(m))) lo = m + 1 else hi = m
          }
          lo
        }
        val depths = iv.map { case (mn, mx) =>
          // j overlaps i  ⇔  start_j ≤ max_i AND end_j ≥ min_i
          count(starts, _ <= mx) - count(ends, _ < mn)
        }
        val avg = depths.map(_.toDouble).sum / iv.size
        (column, iv.size.toLong, iv.map(_._1).min, iv.map(_._2).max, avg)
    }
    rows.toDF("column", "n_files", "min", "max", "avg_overlap_depth")
  }
}
