package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Jaro and Jaro–Winkler similarity kernels (Winkler 1990,
  * the record-linkage standard for short name/title fields), pinned
  * BIT-FOR-BIT to DuckDB's `jaro_similarity`/`jaro_winkler_similarity`
  * so the oracle can certify the whole operator, float output included.
  *
  * The DuckDB contract, established empirically against 1.x and encoded
  * here deliberately:
  *  - BYTE semantics, not codepoints: "aéb" vs "aeb" compares the UTF-8
  *    byte arrays (lengths 4 and 3). Matches UTF8String's storage, so no
  *    decode happens on either engine.
  *  - either string empty → 0.0 (not the classical both-empty = 1.0).
  *  - match window = max(l1,l2)/2 − 1, floored at 0; a window of 0
  *    still admits same-position matches ("ab" vs "ba" → 0.0).
  *  - transpositions t = (mismatched aligned match pairs)/2, integer.
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3, evaluated in exactly that
  *    left-to-right IEEE order (each step correctly rounded, so a fixed
  *    expression tree is engine-portable).
  *  - Winkler boost ONLY when jaro > 0.7 (strict): jw = j + p·0.1·(1−j)
  *    with p = common byte prefix capped at 4, again in that exact
  *    operation order.
  *
  * WHY an Expression (the [[VectorDot]] rationale): in a similarity
  * join the scorer IS the hot loop (O(candidates × l1 × window) byte
  * compares); a Scala UDF would pay serialization + boxing per pair and
  * break whole-stage codegen. Codegen emits a static call on the UTF8
  * bytes — no row-to-JVM-string decode, no lambda dispatch — so the
  * surrounding join stage stays one codegen span.
  */
object JaroKernel {

  /** Jaro similarity over raw UTF-8 bytes. O(l1 · window) with two
    * boolean scratch arrays — strings here are short fields (names,
    * titles, URLs); document-scale inputs belong to the shingle/MinHash
    * family, not an edit-similarity scorer. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val w = {
      val x = (if (l1 > l2) l1 else l2) / 2 - 1
      if (x < 0) 0 else x
    }
    val fa = new Array[Boolean](l1)
    val fb = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = if (i - w > 0) i - w else 0
      val hi = if (i + w < l2 - 1) i + w else l2 - 1
      var found = false
      while (j <= hi && !found) {
        if (!fb(j) && a(i) == b(j)) {
          fa(i) = true; fb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tt = t / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - tt).toDouble / m) / 3.0
  }

  /** Winkler prefix boost on top of [[jaro]] — strict > 0.7 gate,
    * prefix capped at 4 bytes, scaling 0.1 (the DuckDB constants). */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j > 0.7) {
      val cap = {
        val n = if (a.length < b.length) a.length else b.length
        if (n < 4) n else 4
      }
      var p = 0
      while (p < cap && a(p) == b(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  // static-forwarder entry points for generated code (UTF8String in,
  // no JVM-String decode)
  def jaroSim(a: UTF8String, b: UTF8String): Double =
    jaro(a.getBytes, b.getBytes)
  def jaroWinklerSim(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.getBytes, b.getBytes)
}

abstract class JaroBase extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  /** Fully-qualified static method the codegen calls. */
  protected def kernel: String
  override def nullSafeEval(l: Any, r: Any): Any = null // overridden below
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroKernel.$kernel($a, $b)")
}

/** `graft_jaro(s1, s2)` — DuckDB-bit-identical Jaro similarity. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends JaroBase {
  override protected def kernel: String = "jaroSim"
  override def nullSafeEval(l: Any, r: Any): Any =
    JaroKernel.jaroSim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaro"
}

/** `graft_jaro_winkler(s1, s2)` — DuckDB-bit-identical Jaro–Winkler. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends JaroBase {
  override protected def kernel: String = "jaroWinklerSim"
  override def nullSafeEval(l: Any, r: Any): Any =
    JaroKernel.jaroWinklerSim(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaro_winkler"
}
