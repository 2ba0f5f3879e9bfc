package graft

/** Developer utility: run ONE registered query against a scale-factor dir
  * and print its rows (comma-joined, `ROW:`-prefixed so logs grep clean).
  * The fast inner loop for authoring a new `SparkEntry.queries` entry —
  * full [[Verify]] replays all of them.
  *
  * Usage: runMain graft.RunQuery <name> [sfDir] [maxRows]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RunQuery <name> [sfDir] [maxRows]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val maxRows = args.lift(2).map(_.toInt).getOrElse(1000)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val spark = GraftSession.local("graft-runquery")
    val rows = fn(spark, sfDir).limit(maxRows + 1).collect()
    val shown = rows.take(maxRows)
    shown.foreach(r => println("ROW:" + r.mkString(",")))
    println(s"COUNT:${shown.length}" +
      (if (rows.length > maxRows) s" (truncated at $maxRows; more exist)"
       else ""))
    spark.stop()
  }
}
