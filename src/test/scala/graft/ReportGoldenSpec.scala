package graft

import graft.core.VariantCaller
import graft.operators.Reports
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Differential test for the report block: tools/gen_report_golden.py ran
  * the REFERENCE's own mutation_csv and mutation_count_table
  * (/root/reference/MSA_Reader.py:968–1162, in main()'s call order) on a
  * 51-row synthetic MSA; this spec replays the same alignment through the
  * engine (legacy-truthiness caller mode) and requires value-identical
  * CSVs — positions, counts, and `{:.4%}` strings included. */
class ReportGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("report-golden-spec")

  override def afterAll(): Unit = spark.stop()

  private def res(name: String): List[String] = {
    val in = getClass.getResourceAsStream("/" + name)
    assert(in != null, s"missing resource $name — run tools/gen_report_golden.py")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  private def events() = {
    import spark.implicits._
    val rows = res("report_golden_alignment.tsv").map { l =>
      val Array(id, seq) = l.split("\t", -1); (id, seq)
    }
    val ref = rows.head._2
    val refIndex = VariantCaller.referencePosition(ref)
    val evs = rows.flatMap { case (id, seq) =>
      val clusterId = id.split(";")(0)
      val clusterSize = id.split("=")(1).split(";")(0).toInt
      VariantCaller.callVariants(ref, refIndex, clusterId, clusterSize, seq,
        legacyFlankTruthiness = true)
    }
    val total = rows.map(_._1.split("=")(1).split(";")(0).toInt).sum
    (evs.toDS(), ref.replace("-", ""), total.toLong)
  }

  test("mutation_csv matches the reference's output row-for-row, IN ORDER") {
    val (evs, _, total) = events()
    // no sort on either side: the emitted row order itself is the contract
    // (Position asc, then first-appearance within a position)
    val mine = Reports.mutationCsv(evs, total).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toList
    val golden = res("report_golden_all_by_code.csv").drop(1).map { l =>
      val f = l.split(",", -1)
      (f(0).toInt, f(1), f(2), f(3).toLong, f(4))
    }
    assert(mine.length == golden.length,
      s"row count: mine=${mine.length} golden=${golden.length}")
    mine.zip(golden).zipWithIndex.foreach { case ((m, g), i) =>
      assert(m == g, s"row $i: mine=$m golden=$g") }
  }

  test("variant_counts table matches the reference's output value-for-value") {
    val (evs, refGapless, total) = events()
    val mine = Reports.perPositionTable(evs, refGapless, total).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val golden = res("report_golden_variant_counts.csv").drop(1).map { l =>
      val f = l.split(",", -1)
      (f(0).toInt, f(1).toLong, f(2), f(3).toLong, f(4).toLong,
        f(5).toLong, f(6).toLong, f(7).toLong)
    }
    assert(mine.length == golden.length)
    mine.zip(golden).foreach { case (m, g) => assert(m == g, s"mine=$m golden=$g") }
  }
}
