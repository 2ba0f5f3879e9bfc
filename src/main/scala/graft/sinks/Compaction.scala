package graft.sinks

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet tables — the table-maintenance
  * operator every long-lived 100 TB dataset needs: streaming appends,
  * per-snapshot incremental writes and fine partition keys all accrete
  * kilobyte part-files, and a scan's task count (and the namenode/object-
  * store listing cost) grows with FILE count, not byte count.
  *
  * Scale posture:
  *  - **selective**: only leaf directories that actually violate the
  *    layout target are rewritten; a petabyte table with one hot
  *    partition rewrites one partition. [[plan]] is listing-only (no data
  *    read) and is the unit the caller can parallelize or schedule.
  *  - **layout-preserving**: each leaf is rewritten in place to
  *    `ceil(bytes / targetBytes)` files; hive-style `k=v` partition
  *    directories keep their paths, so readers and partition pruning are
  *    unaffected.
  *  - **validated swap**: new files are written to a dot-prefixed temp dir
  *    (invisible to Spark/Hive/pyarrow/DuckDB readers), row-count
  *    validated against the originals, then swapped in. NOT transactional
  *    — run in a maintenance window (concurrent readers between the
  *    delete and the final rename see a partial leaf; that is the
  *    documented contract of log-less parquet maintenance, same as
  *    Hive's `CONCATENATE`).
  *
  * The reference has no analog (its outputs are one-shot single files,
  * e.g. `/root/reference/Protein_File_Splitter.py` writing per-cluster
  * FASTAs); this operator exists for the engine's own sinks —
  * [[Sinks]]/[[Clustered]] outputs and streaming `foreachBatch` appends.
  */
object Compaction {

  /** One leaf directory's layout facts + the rewrite decision. */
  final case class LeafPlan(dir: String, files: Int, bytes: Long,
      targetFiles: Int, rewrite: Boolean)

  /** Post-[[compact]] accounting, one row per rewritten leaf. */
  final case class LeafResult(dir: String, filesBefore: Int,
      filesAfter: Int, bytes: Long, rows: Long)

  private def isDataFile(f: FileStatus): Boolean = {
    val n = f.getPath.getName
    f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
  }

  /** True when any path component strictly below `root` is hidden
    * (`.`/`_`-prefixed) — Spark/Hive/pyarrow readers skip those, and so
    * must the compactor (a crashed run's `.compact-*` temp dir must never
    * be mistaken for a data leaf). */
  private def underHidden(p: Path, root: Path): Boolean = {
    var d = p.getParent
    while (d != null && d != root) {
      val n = d.getName
      if (n.startsWith(".") || n.startsWith("_")) return true
      d = d.getParent
    }
    false
  }

  /** Leaf directories (those holding parquet data files) under `root`,
    * found with ONE recursive remote listing — on S3A/ABFS a recursive
    * list is a flat LIST call per few thousand keys, where a per-directory
    * walk is one round-trip per directory. */
  private def leaves(fs: FileSystem, root: Path): Map[Path, Seq[FileStatus]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (isDataFile(f) && !underHidden(f.getPath, root)) out += f
    }
    out.toSeq.groupBy(_.getPath.getParent)
  }

  /** Listing-only compaction plan: a leaf is rewritten when it could hold
    * the same bytes in fewer files — i.e. it has more than
    * `ceil(bytes / targetBytes)` data files AND more than one file.
    * `minSmallFiles` (default 2) lets callers demand a worse violation
    * before paying a rewrite. */
  def plan(spark: SparkSession, root: String,
      targetBytes: Long = 128L << 20, minSmallFiles: Int = 2): Seq[LeafPlan] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    leaves(fs, rootPath).toSeq.sortBy(_._1.toString).map { case (dir, files) =>
      val bytes = files.map(_.getLen).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      LeafPlan(dir.toString, files.size, bytes, target,
        rewrite = files.size > target && files.size >= minSmallFiles)
    }
  }

  /** Execute a [[plan]]: rewrite each violating leaf to its target file
    * count, leaving compliant leaves byte-for-byte untouched. Returns one
    * [[LeafResult]] per rewritten leaf. */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L << 20, minSmallFiles: Int = 2): Seq[LeafResult] = {
    val rootPath = new Path(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = rootPath.getFileSystem(conf)
    plan(spark, root, targetBytes, minSmallFiles).filter(_.rewrite).map { lp =>
      val dir = new Path(lp.dir)
      // read THIS leaf only — hive-style partition values live in the
      // directory NAME, not in the files, so a leaf-local read/write
      // round-trips exactly the file columns and the path keeps carrying
      // the partition values afterwards
      val df = spark.read.parquet(lp.dir)
      val tmp = new Path(dir, s".compact-${java.util.UUID.randomUUID}")
      df.coalesce(lp.targetFiles).write.parquet(tmp.toString)
      val newFiles = fs.listStatus(tmp).filter(isDataFile)
      // validated swap: row counts must agree before any original is gone
      val before = df.count()
      val after = spark.read.parquet(tmp.toString).count()
      if (before != after) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"compaction of ${lp.dir}: rewrote $after rows, expected $before — aborted, originals untouched")
      }
      val originals = fs.listStatus(dir).filter(isDataFile)
      originals.foreach(f => fs.delete(f.getPath, false))
      // rename can return false without throwing (object-store FileSystems
      // especially) — and at this point the originals are already gone, so
      // a silently failed rename would lose the leaf's data. Fail before
      // deleting the temp dir: the compacted files stay recoverable there.
      newFiles.foreach { f =>
        val dest = new Path(dir, f.getPath.getName.stripPrefix("."))
        if (!fs.rename(f.getPath, dest))
          throw new IllegalStateException(
            s"compaction of ${lp.dir}: rename ${f.getPath} -> $dest failed; " +
              s"originals are deleted but all compacted data is intact under $tmp — recover manually")
      }
      fs.delete(tmp, true)
      LeafResult(lp.dir, lp.files, newFiles.length, lp.bytes, after)
    }
  }
}
