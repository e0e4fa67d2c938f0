package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) — the text-cleanup primitive every multi-source corpus
  * ingest runs before fingerprinting/dedup, since the same visible text
  * arrives precomposed from one source and decomposed (base char +
  * combining marks) from another and would otherwise hash apart.
  * Semantics match DuckDB's `nfc_normalize` (both implement Unicode
  * NFC), which is what makes the operator oracle-checkable.
  *
  * Codegen is a single static call, so the expression stays inside
  * WholeStageCodegen spans. Pure-ASCII rows — the overwhelming majority
  * of real corpora — return the input buffer untouched (ASCII is
  * NFC-invariant): numBytes == numChars ⟺ every code point is 1 byte
  * ⟺ ASCII, so the common case allocates nothing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression):
      NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** ASCII fast path returns the input UTF8String unchanged; otherwise
    * one round-trip through java.text.Normalizer (Unicode NFC). */
  def normalize(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }
}
