package graft.plans

import graft.core.VariantCaller
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-facing generator for the variant caller (SURVEY.md §7.3 optional
  * Catalyst exposure of E1):
  *
  * {{{
  * SELECT cluster_id, v.* FROM msa
  * LATERAL VIEW variant_events(ref, seq, cluster_id, cluster_size) v
  * }}}
  *
  * One aligned row in → N `VariantEvent` rows out, same pure core as the
  * typed `flatMap` path (`operators.VariantCalling`). `CodegenFallback`
  * is standard for generators; the cost is dominated by the O(len) scan
  * itself. The reference-position index is memoized per distinct
  * reference string (it is constant across an alignment). */
case class VariantEventsGenerator(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 4)
      TypeCheckResult.TypeCheckFailure(
        "variant_events(ref, seq, cluster_id, cluster_size) takes 4 arguments")
    else if (children.take(3).exists(_.dataType != StringType) ||
        children(3).dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "variant_events expects (string, string, string, int)")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("var_type", StringType),
    StructField("code", StringType),
    StructField("ref_aa", StringType),
    StructField("var_aa", StringType),
    StructField("msa_start", IntegerType),
    StructField("msa_end", IntegerType),
    StructField("ref_start", IntegerType),
    StructField("ref_end", IntegerType)))

  @transient private var lastRef: String = _
  @transient private var lastIndex: Array[Int] = _

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val refU = children(0).eval(input)
    val seqU = children(1).eval(input)
    if (refU == null || seqU == null) return Nil
    val ref = refU.asInstanceOf[UTF8String].toString
    val seq = seqU.asInstanceOf[UTF8String].toString
    val cid = Option(children(2).eval(input))
      .map(_.asInstanceOf[UTF8String].toString).getOrElse("")
    val csz = Option(children(3).eval(input))
      .map(_.asInstanceOf[Int]).getOrElse(0)
    if (lastIndex == null || ref != lastRef) {
      lastRef = ref
      lastIndex = VariantCaller.referencePosition(ref)
    }
    def oi(o: Option[Int]): Any = o.map(i => i: Any).getOrElse(null)
    VariantCaller.callVariants(ref, lastIndex, cid, csz, seq).map { e =>
      InternalRow(
        UTF8String.fromString(e.varType),
        UTF8String.fromString(e.code),
        UTF8String.fromString(e.refAA),
        UTF8String.fromString(e.varAA),
        e.msaStart,
        oi(e.msaEnd),
        oi(e.refStart),
        oi(e.refEnd))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VariantEventsGenerator =
    copy(children = newChildren)

  override def prettyName: String = "variant_events"
}
