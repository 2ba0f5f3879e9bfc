package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization as native expressions — a gap in
  * Spark's function surface (no builtin normalizes at all), and the
  * FIRST step of any serious text-dedup pipeline: "café" composed and
  * "café" decomposed are different byte strings, so every hash-based
  * operator upstream (exact dedup, MinHash shingles, fingerprints,
  * URL canonicalization) silently treats equal-looking text as
  * distinct unless someone normalizes first.
  *
  * `graft_nfc` / `graft_nfd` apply UAX #15 canonical
  * composition/decomposition via `java.text.Normalizer` (the JDK's
  * ICU-derived tables). Canonical normalization is fully specified by
  * the standard — composition, canonical REORDERING of combining marks
  * (a cedilla sorts before an acute), Hangul composition — so the JDK
  * and DuckDB's utf8proc produce identical results by construction,
  * which is what lets the registered oracle hash `graft_nfc` against
  * DuckDB's `nfc_normalize` (probed: composition, reordering, Hangul,
  * and the deliberate NON-folding of compatibility forms like ﬃ all
  * agree). Compatibility (NFKC/NFKD) forms are intentionally not
  * exposed: no oracle exists in the comparison engine, and K-folding
  * is a lossy editorial choice, not canonical equivalence.
  *
  * Codegen calls the static kernel — the unavoidable String
  * round-trip is the normalizer API's, but the expression stays inside
  * whole-stage codegen (no UDF serialization, no row boxing), and
  * already-normalized ASCII (the common case) short-circuits via
  * `Normalizer.isNormalized`'s quick check. */
object NfcKernel {
  private val NfcForm = java.text.Normalizer.Form.NFC
  private val NfdForm = java.text.Normalizer.Form.NFD

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NfcForm)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NfcForm))
  }

  def nfd(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NfdForm)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NfdForm))
  }
}

abstract class NormalizeBase extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.simpleString}")
  }
  protected def kernel: String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcKernel.$kernel($c)")
}

/** `graft_nfc(s)` — UAX #15 canonical composition. */
case class NfcNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfc"
  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
  override def prettyName: String = "graft_nfc"
}

/** `graft_nfd(s)` — UAX #15 canonical decomposition. */
case class NfdNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfd"
  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfd(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): NfdNormalize = copy(child = newChild)
  override def prettyName: String = "graft_nfd"
}
