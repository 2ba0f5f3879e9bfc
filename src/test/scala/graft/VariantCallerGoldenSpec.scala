package graft

import graft.core.VariantCaller
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Differential test: tools/gen_variant_golden.py runs the REFERENCE's own
  * variant-caller code (/root/reference/MSA_Reader.py, Biopython stubbed) on
  * 1500 random alignments (~7.5k rows, ~50k events) and records every
  * emitted raw-variant line. This spec replays the identical rows through
  * the Scala port in legacy-truthiness mode and requires byte-identical
  * events — the strongest branch-fidelity evidence we can get without the
  * reference's runtime. (Inputs on which the reference itself crashes —
  * flankless insertions via its index-0 truthiness bug — are excluded by
  * the generator and covered by VariantCallerSpec instead.)
  */
class VariantCallerGoldenSpec extends AnyFunSuite {

  private def res(name: String): List[String] = {
    val in = getClass.getResourceAsStream("/" + name)
    assert(in != null, s"missing test resource $name — run tools/gen_variant_golden.py")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  test("10k+ fuzzed events match the reference implementation byte-for-byte") {
    val alignments = res("variant_golden_alignments.tsv")
    val expected = res("variant_golden_events.tsv")

    val produced = List.newBuilder[String]
    var lastRef: String = null
    var refIndex: Array[Int] = null
    for (line <- alignments) {
      val Array(id, seq, ref) = line.split("\t", -1)
      if (ref != lastRef) { lastRef = ref; refIndex = VariantCaller.referencePosition(ref) }
      val clusterId = id.split(";")(0)
      val clusterSize = id.split("=")(1).split(";")(0).toInt
      val events = VariantCaller.callVariants(ref, refIndex, clusterId,
        clusterSize, seq, legacyFlankTruthiness = true)
      events.foreach { e =>
        produced += List(e.clusterId, e.clusterSize, e.varType, e.code,
          e.refAA, e.varAA, e.msaStart,
          e.msaEnd.map(_.toString).getOrElse("-"),
          e.refStart.map(_.toString).getOrElse("-"),
          e.refEnd.map(_.toString).getOrElse("-")).mkString("\t")
      }
    }
    val got = produced.result()
    assert(got.size == expected.size,
      s"event count mismatch: got ${got.size}, expected ${expected.size}")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"event $i differs:\n  scala : $g\n  python: $e")
    }
  }
}
