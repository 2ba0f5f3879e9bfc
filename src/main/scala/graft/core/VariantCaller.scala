package graft.core

/** One variant event emitted by the caller — mirrors the 10-field raw-TSV
  * contract of the reference (`/root/reference/MSA_Reader.py:50`,
  * `write_line` at `MSA_Reader.py:91–93`). `None` fields render as the
  * `"-"` sentinel only at the sink.
  */
case class VariantEvent(
    clusterId: String,
    clusterSize: Int,
    varType: String, // sub | del | ins | ext | delins
    code: String, // HGVS-style, formats per /root/reference/MSA_Reader.py:195,495,519,558,567,572,605,609
    refAA: String,
    varAA: String,
    msaStart: Int,
    msaEnd: Option[Int],
    refStart: Option[Int],
    refEnd: Option[Int])

/** Pure-Scala port of the reference's MSA variant-calling state machine
  * (`/root/reference/MSA_Reader.py:116–462` + recorders `:464–622`).
  *
  * The reference iterates a whole in-memory alignment row-major on a single
  * thread; here the unit of work is ONE aligned row vs the (broadcast)
  * reference row, so Spark can run it as an embarrassingly-parallel
  * `flatMap` over a `Dataset[AlignedSeq]` with zero shuffle.
  *
  * Semantics intentionally preserved from the reference:
  *  - substitution / deletion / insertion / extension / delins detection and
  *    the exact skip-ahead resume indices (`MSA_Reader.py:266, 378, 462`);
  *  - deletion backward scan over double-gaps (`MSA_Reader.py:248–259`);
  *  - delins switchover from both the deletion path (`MSA_Reader.py:241–246`)
  *    and the insertion path (`MSA_Reader.py:343–347`);
  *  - HGVS-ish code formats incl. single/multi variants and N/C extensions.
  *
  * Documented divergence (SURVEY.md §7.4): the reference tests flank indices
  * with Python truthiness (`i_Nflank if i_Nflank else None`,
  * `MSA_Reader.py:370–373, 378`), so a valid flank at index 0 is treated as
  * absent — e.g. an insertion at MSA position 2 with an extant reference
  * residue at position 1 is misclassified as an N-terminal extension. We use
  * `Option[Int]` and honor index-0 flanks (the documented intent). Set
  * `legacyFlankTruthiness = true` to reproduce the reference bit-for-bit.
  */
object VariantCaller {

  /** MSA column → 1-based reference residue number; -1 where the aligned
    * reference has a gap. Port of `reference_position`
    * (`/root/reference/MSA_Reader.py:99–114`).
    */
  def referencePosition(reference: String): Array[Int] = {
    val out = new Array[Int](reference.length)
    var pos = 1
    var i = 0
    while (i < reference.length) {
      if (reference.charAt(i) != '-') { out(i) = pos; pos += 1 }
      else out(i) = -1
      i += 1
    }
    out
  }

  /** Compare one aligned row to the aligned reference, emitting events in
    * MSA order. `ref.length == seq.length` is required (both come from the
    * same alignment).
    */
  def callVariants(
      ref: String,
      refIndex: Array[Int],
      clusterId: String,
      clusterSize: Int,
      seq: String,
      legacyFlankTruthiness: Boolean = false): List[VariantEvent] = {
    require(ref.length == seq.length,
      s"aligned row length ${seq.length} != reference length ${ref.length}")
    val n = ref.length
    val out = List.newBuilder[VariantEvent]

    // Python-truthiness emulation: `Some(0)` counts as absent in legacy mode.
    def defined(f: Option[Int]): Boolean =
      if (legacyFlankTruthiness) f.exists(_ != 0) else f.isDefined

    def emit(varType: String, code: String, refAA: String, varAA: String,
        msaStart: Int, msaEnd: Option[Int], refStart: Option[Int],
        refEnd: Option[Int]): Unit =
      out += VariantEvent(clusterId, clusterSize, varType, code, refAA, varAA,
        msaStart, msaEnd, refStart, refEnd)

    /** Variant-row residues in [iStart, iEnd] with alignment gaps removed —
      * `AA_blank_remover` (`MSA_Reader.py:624–646`). */
    def gapless(iStart: Int, iEnd: Int): String = {
      val sb = new StringBuilder
      var i = iStart
      while (i <= iEnd) { if (seq.charAt(i) != '-') sb += seq.charAt(i); i += 1 }
      sb.result()
    }

    /** Reference residues in [iStart, iEnd] with gaps removed —
      * `deletion_ref_AA` (`MSA_Reader.py:648–660`). */
    def gaplessRef(iStart: Int, iEnd: Int): String = {
      val sb = new StringBuilder
      var i = iStart
      while (i <= iEnd) { if (ref.charAt(i) != '-') sb += ref.charAt(i); i += 1 }
      sb.result()
    }

    // --- recorders -------------------------------------------------------

    // record_deletion_info (MSA_Reader.py:464–524)
    def recordDeletion(iStart: Int, iEnd: Int): Unit =
      if (iStart == iEnd) {
        val refAA = ref.charAt(iEnd).toString
        val refStart = refIndex(iEnd)
        emit("del", s"$refAA${refStart}del", refAA, "-",
          iEnd + 1, None, Some(refStart), None)
      } else {
        val code =
          s"${ref.charAt(iStart)}${refIndex(iStart)}_${ref.charAt(iEnd)}${refIndex(iEnd)}del"
        emit("del", code, gaplessRef(iStart, iEnd), "-",
          iStart + 1, Some(iEnd + 1), Some(refIndex(iStart)), Some(refIndex(iEnd)))
      }

    // record_insertion_info (MSA_Reader.py:526–580)
    def recordInsertion(iStart: Int, iEnd: Int,
        nFlank: Option[Int], cFlank: Option[Int]): Unit = {
      val msaStart = iStart + 1
      val (msaEnd, varAA) =
        if (iStart == iEnd) (None, seq.charAt(iStart).toString)
        else (Some(iEnd + 1), gapless(iStart, iEnd))
      val nDef = defined(nFlank)
      val cDef = defined(cFlank)
      val refStart = if (nDef) Some(refIndex(nFlank.get)) else None
      val refEnd = if (cDef) Some(refIndex(cFlank.get)) else None
      val nAA = if (nDef) ref.charAt(nFlank.get).toString else ""
      val cAA = if (cDef) ref.charAt(cFlank.get).toString else ""
      if (cDef && nDef) // interior insertion
        emit("ins", s"$nAA${refStart.get}_$cAA${refEnd.get}ins$varAA", "-",
          varAA, msaStart, msaEnd, refStart, refEnd)
      else if (cDef) // N-terminal extension (MSA_Reader.py:558–567)
        emit("ext", s"${cAA}1ext$varAA", "-", varAA, msaStart, msaEnd,
          refStart, refEnd)
      else if (nDef) // C-terminal extension (MSA_Reader.py:569–572)
        emit("ext", s"$nAA${refStart.get}ext$varAA", "-", varAA, msaStart,
          msaEnd, refStart, refEnd)
      else
        throw new IllegalStateException(
          "insertion with neither flank: all-gap reference row")
    }

    // record_delins_info (MSA_Reader.py:582–622)
    def recordDelins(iStart: Int, iEnd: Int, iFirst: Int, iLast: Int,
        inserted: String): Unit = {
      val refStart = refIndex(iFirst)
      val code =
        if (iFirst != iLast)
          s"${ref.charAt(iFirst)}${refStart}_${ref.charAt(iLast)}${refIndex(iLast)}delins$inserted"
        else s"${ref.charAt(iFirst)}${refStart}delins$inserted"
      val refEnd = if (iFirst != iLast) Some(refIndex(iLast)) else None
      // ref/var residue fields keep alignment gaps (raw slice) per
      // MSA_Reader.py:612–615.
      emit("delins", code, ref.substring(iStart, iEnd + 1),
        seq.substring(iStart, iEnd + 1), iStart + 1, Some(iEnd + 1),
        Some(refStart), refEnd)
    }

    // --- case handlers; each returns the resume index ---------------------

    // delins_case (MSA_Reader.py:380–462)
    def delinsCase(iStart: Int): Int = {
      var i = iStart
      var cFlank: Option[Int] = None
      var done = false
      while (!done) { // step 1: find C flank of the whole indel region
        val r = ref.charAt(i); val a = seq.charAt(i)
        if (r != '-' && a != '-') { cFlank = Some(i); done = true }
        else if (i == n - 1) { cFlank = None; done = true }
        else i += 1
      }
      var iEnd = -1 // step 2: backward scan to last inserted-or-deleted codon
      var k = cFlank.getOrElse(n - 1)
      while (iEnd < 0 && k >= iStart) {
        val r = ref.charAt(k); val a = seq.charAt(k)
        if ((r != '-' && a == '-') || (r == '-' && a != '-')) iEnd = k
        k -= 1
      }
      var iFirst = iStart // step 3.1: first deleted (extant-ref) codon
      while (ref.charAt(iFirst) == '-') iFirst += 1
      var iLast = iEnd // step 3.2: last deleted codon
      while (ref.charAt(iLast) == '-') iLast -= 1
      recordDelins(iStart, iEnd, iFirst, iLast, gapless(iStart, iEnd))
      cFlank.getOrElse(n)
    }

    // deletion_case (MSA_Reader.py:202–266)
    def deletionCase(iStart: Int): Int = {
      var i = iStart
      var cFlank: Option[Int] = None
      var switched = -1
      var done = false
      while (!done) { // step 1: forward to first both-extant codon
        val r = ref.charAt(i); val a = seq.charAt(i)
        if (a == '-') { // still deleted, or double gap
          if (i == n - 1) { cFlank = None; done = true } else i += 1
        } else if (r != '-') { cFlank = Some(i); done = true }
        else { switched = delinsCase(iStart); done = true } // ins inside del
      }
      if (switched >= 0) return switched
      var iEnd = -1 // step 2: backward over double-gaps to deletion end
      var k = cFlank.getOrElse(n - 1)
      while (iEnd < 0 && k >= iStart) {
        val r = ref.charAt(k); val a = seq.charAt(k)
        if (r != '-' && a == '-') iEnd = k
        k -= 1
      }
      recordDeletion(iStart, iEnd)
      cFlank.getOrElse(n)
    }

    // insertion_case (MSA_Reader.py:268–378)
    def insertionCase(iStart: Int): Int = {
      // step 2: backward scan for the N-terminal flanking reference codon
      var nFlank: Option[Int] = None
      if (iStart != 0) {
        var idx = iStart - 1
        var stop = false
        while (!stop && idx >= 0) {
          if (ref.charAt(idx) != '-') { nFlank = Some(idx); stop = true }
          else idx -= 1
        }
      }
      // step 3: forward to the C-terminal flank (or delins switchover)
      var i = iStart
      var cFlank: Option[Int] = None
      var switched = -1
      var done = false
      while (!done) {
        val r = ref.charAt(i); val a = seq.charAt(i)
        if (r == '-') { // insertion continues, or double gap
          if (i == n - 1) { cFlank = None; done = true } else i += 1
        } else if (a == '-') { switched = delinsCase(iStart); done = true }
        else { cFlank = Some(i); done = true }
      }
      if (switched >= 0) return switched
      // step 4: backward from (C flank - 1) to last inserted codon
      var iEnd = -1
      var idx = if (defined(cFlank)) cFlank.get - 1 else n - 1
      val floor = if (defined(nFlank)) nFlank.get else -1 // exclusive
      while (iEnd < 0 && idx > floor) {
        if (seq.charAt(idx) != '-') iEnd = idx
        idx -= 1
      }
      recordInsertion(iStart, iEnd, nFlank, cFlank)
      if (defined(cFlank)) cFlank.get else n
    }

    // --- main scan (msa_iterator, MSA_Reader.py:136–171) ------------------
    var i = 0
    while (i < n) {
      val r = ref.charAt(i); val a = seq.charAt(i)
      if (r == a) i += 1
      else if (r != '-' && a != '-') { // substitution (MSA_Reader.py:173–200)
        val refPos = refIndex(i)
        emit("sub", s"$r$refPos$a", r.toString, a.toString, i + 1, None,
          Some(refPos), None)
        i += 1
      } else if (a == '-') i = deletionCase(i)
      else i = insertionCase(i)
    }
    out.result()
  }
}
