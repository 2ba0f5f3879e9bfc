package graft

import java.nio.file.{Files, Paths}

/** Round-15 optimization evidence: dump `explain("formatted")` for the
  * named queries into plans/<round>/<query>_<tag>.txt so before/after
  * plan claims in OPTIMIZATION_r15.md are checkable without Spark.
  *
  * Usage: runMain graft.PlanSnapshot <tag> <query1,query2,...> [sfDir] [round]
  */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(sys.error(
      "usage: PlanSnapshot <tag> <q1,q2,...> [sfDir] [round]"))
    val names = args.lift(1).getOrElse(sys.error("query list required"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val round = args.lift(3).getOrElse("r15")
    val spark = GraftSession.local("graft-plan-snapshot")
    val dir = Paths.get(s"plans/$round")
    Files.createDirectories(dir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val txt = fn(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote plans/$round/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
