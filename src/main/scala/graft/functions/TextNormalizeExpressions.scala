package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as native Catalyst expressions.
  *
  * Corpus ingestion at 100 TB sees the same logical text spelled as
  * different byte sequences (composed `é` vs `e`+U+0301), which
  * breaks exact dedup, shingle hashing, and token statistics — all of
  * which key on bytes. Normalizing to NFC first makes those keys
  * canonical. The reference reaches normalization through its SQL
  * engine's string layer (DataFusion exposes none natively, so its
  * pipelines pre-normalize at ingest); here it is a first-class
  * codegen'd column expression usable anywhere in a plan.
  *
  * Kernel contract: `java.text.Normalizer` implements Unicode
  * normalization exactly as published (UAX #15); DuckDB's
  * `nfc_normalize` (utf8proc) implements the same algorithm, and the
  * Unicode stability policy freezes NFC results for assigned
  * codepoints — so the two engines agree bit-for-bit, which the t41
  * oracle and the fuzz spec rely on. Verified against composition
  * exclusions (U+1E9B), post-composition marks, Hangul jamo, and
  * multi-mark reorderings.
  *
  * Already-normalized text (the overwhelming majority of any real
  * corpus) takes the `isNormalized` fast path: one scan, zero
  * allocation, input buffer returned as-is.
  */
object TextNormalizeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfd(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFD))
  }

  def isNfc(s: UTF8String): Boolean =
    Normalizer.isNormalized(s.toString, Normalizer.Form.NFC)
}

/** Base class holds NO constructor state: Spark plans serialize with
  * Java serialization, where a non-serializable superclass must expose
  * a no-arg constructor — a ctor parameter here turns into
  * InvalidClassException("no valid constructor") at task deserialize.
  */
private[functions] sealed abstract class NormalizeBase
    extends UnaryExpression {
  protected def kernel: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalizeKernels.$kernel($c)")
}

/** Canonical composition (NFC) of a string column. */
case class NfcNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfc"
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    TextNormalizeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Canonical decomposition (NFD) — the inverse direction, used by the
  * specs to synthesize decomposed inputs and assert the roundtrip.
  */
case class NfdNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfd"
  override def prettyName: String = "nfd_normalize"
  override def nullSafeEval(input: Any): Any =
    TextNormalizeKernels.nfd(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfdNormalize =
    copy(child = newChild)
}

object TextNormalizeExpressions {
  def nfc(c: Column): Column = ExprBridge.column(NfcNormalize(ExprBridge.expression(c)))
  def nfd(c: Column): Column = ExprBridge.column(NfdNormalize(ExprBridge.expression(c)))
}
