package graft

import graft.core.{VariantCaller, VariantEvent}
import org.scalatest.funsuite.AnyFunSuite

/** Branch-exhaustive unit tests for the variant-caller state machine —
  * the SURVEY.md §5.1 plan. Expected values hand-derived from the
  * reference's recorders (`/root/reference/MSA_Reader.py:173–622`).
  */
class VariantCallerSpec extends AnyFunSuite {

  private def call(ref: String, seq: String, legacy: Boolean = false): List[VariantEvent] =
    VariantCaller.callVariants(ref, VariantCaller.referencePosition(ref),
      "Uniq1", 7, seq, legacyFlankTruthiness = legacy)

  test("reference_position maps gaps to -1 and counts residues 1-based") {
    assert(VariantCaller.referencePosition("M-F-V").toSeq == Seq(1, -1, 2, -1, 3))
  }

  test("identity row emits zero events") {
    assert(call("MFVF", "MFVF").isEmpty)
    assert(call("M-VF", "M-VF").isEmpty) // shared gap column is not a variant
  }

  test("single substitution") {
    val List(e) = call("MFVF", "MTVF")
    assert(e == VariantEvent("Uniq1", 7, "sub", "F2T", "F", "T", 2, None, Some(2), None))
  }

  test("adjacent substitutions emit one event each") {
    val es = call("MFVF", "MTAF")
    assert(es.map(_.code) == List("F2T", "V3A"))
  }

  test("single-residue deletion") {
    val List(e) = call("MFVF", "MF-F")
    assert(e == VariantEvent("Uniq1", 7, "del", "V3del", "V", "-", 3, None, Some(3), None))
  }

  test("multi-residue deletion") {
    val List(e) = call("MFVFL", "M--FL")
    assert(e == VariantEvent("Uniq1", 7, "del", "F2_V3del", "FV", "-", 2, Some(3), Some(2), Some(3)))
  }

  test("deletion at sequence end (no C flank, MSA_Reader.py:227-230)") {
    val List(e) = call("MFVF", "MF--")
    assert(e == VariantEvent("Uniq1", 7, "del", "V3_F4del", "VF", "-", 3, Some(4), Some(3), Some(4)))
  }

  test("deletion backward-scan skips double-gap columns (MSA_Reader.py:248-259)") {
    // ref MF V - F ; seq M- - - F : deletion of F2..V3; column 3 is gap/gap.
    val List(e) = call("MFV-F", "M---F")
    assert(e == VariantEvent("Uniq1", 7, "del", "F2_V3del", "FV", "-", 2, Some(3), Some(2), Some(3)))
  }

  test("single-residue interior insertion") {
    val List(e) = call("MF-VF", "MFAVF")
    assert(e == VariantEvent("Uniq1", 7, "ins", "F2_V3insA", "-", "A", 3, None, Some(2), Some(3)))
  }

  test("multi-residue insertion with internal double gap") {
    val List(e) = call("MF---VF", "MFA-BVF")
    assert(e == VariantEvent("Uniq1", 7, "ins", "F2_V3insAB", "-", "AB", 3, Some(5), Some(2), Some(3)))
  }

  test("N-terminal extension (MSA_Reader.py:367-373)") {
    val List(e) = call("--MF", "ABMF")
    assert(e == VariantEvent("Uniq1", 7, "ext", "M1extAB", "-", "AB", 1, Some(2), None, Some(1)))
  }

  test("C-terminal extension") {
    val List(e) = call("MF--", "MFAB")
    assert(e == VariantEvent("Uniq1", 7, "ext", "F2extAB", "-", "AB", 3, Some(4), Some(2), None))
  }

  test("delins entered from the deletion path (MSA_Reader.py:241-246)") {
    val List(e) = call("MFV-F", "M--AF")
    assert(e == VariantEvent("Uniq1", 7, "delins", "F2_V3delinsA", "FV-", "--A", 2, Some(4), Some(2), Some(3)))
  }

  test("delins entered from the insertion path (MSA_Reader.py:343-347)") {
    val List(e) = call("M-FV", "MA-V")
    assert(e == VariantEvent("Uniq1", 7, "delins", "F2delinsA", "-F", "A-", 2, Some(3), Some(2), None))
  }

  test("delins at sequence end (no C flank)") {
    val List(e) = call("MFV-", "M--A")
    assert(e.varType == "delins" && e.code == "F2_V3delinsA")
    assert(e.msaStart == 2 && e.msaEnd == Some(4))
  }

  test("insertion flanked at index 0: intent mode calls it ins, legacy mode ext (SURVEY.md §7.4)") {
    val List(intent) = call("M-FV", "MAFV")
    assert(intent.varType == "ins" && intent.code == "M1_F2insA")
    assert(intent.refStart == Some(1) && intent.refEnd == Some(2))
    val List(legacy) = call("M-FV", "MAFV", legacy = true)
    assert(legacy.varType == "ext" && legacy.code == "F1extA")
    assert(legacy.refStart.isEmpty)
  }

  test("mixed row: sub + del + ins in one pass, MSA order") {
    // ref: M F V - F L   seq: M T V A F -
    val es = call("MFV-FL", "MTVAF-")
    assert(es.map(_.code) == List("F2T", "V3_F4insA", "L5del"))
    assert(es.map(_.varType) == List("sub", "ins", "del"))
  }

  test("events never overlap and stay within reference length (property)") {
    val rnd = new scala.util.Random(42)
    val alpha = "ACDEFGHIKLMNPQRSTVWY-"
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(40)
      def row() = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val ref = row()
      if (ref.exists(_ != '-')) {
        val seq = row()
        val refLen = ref.count(_ != '-')
        val es = call(ref, seq)
        es.foreach { e =>
          assert(e.msaStart >= 1 && e.msaStart <= n)
          e.msaEnd.foreach(end => assert(end >= e.msaStart && end <= n))
          e.refStart.foreach(s => assert(s >= 1 && s <= refLen))
          e.refEnd.foreach(s => assert(s >= 1 && s <= refLen))
        }
        // events are emitted in nondecreasing MSA order
        assert(es.map(_.msaStart) == es.map(_.msaStart).sorted)
      }
    }
  }
}
