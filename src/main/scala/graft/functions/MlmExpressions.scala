package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MLM-mask kernel — the imperative spelling of
  * [[graft.pipeline.TextAnalysis.mlmMask]]'s composable HOF chain
  * (zip_with + per-element md5 + two array_join/md5 rebuilds), which
  * evaluated INTERPRETED per token and profiled near the top of the
  * bench (t46 ~2.3 s driver-measured at sf0.1). The kernel reuses one
  * MessageDigest per row for the per-position mask decisions and
  * STREAMS the masked sequence and target stream through two more
  * digests — no per-token expression dispatch, no joined-string
  * materialization.
  *
  * Semantics pinned IDENTICAL to the chain (Round12Spec
  * differential): position i (1-based over the single-space token
  * stream of the pre-normalized input, where an empty input is the
  * single empty token) masks iff the first hex digit of
  * md5("id:i") is in `maskNibbles`; masked_md5 fingerprints the
  * sequence with masked tokens replaced by `[MASK]` joined by
  * spaces; targets_md5 fingerprints the masked-out tokens joined by
  * '|'. The t46 oracle replays every decision in SQL, so the kernel
  * is hash-proven against DuckDB through the declared query.
  *
  * @param maskNibbles the mask-decision nibble set (first md5 hex
  *        digit values 0-15)
  */
case class MlmMaskSummary(left: Expression, right: Expression,
    maskNibbles: Set[Int])
    extends BinaryExpression with CodegenFallback {
  require(maskNibbles.nonEmpty && maskNibbles.forall(n => n >= 0 && n <= 15),
    "mlm_mask: nibble set must be non-empty hex digit values")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"mlm_mask expects (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("masked_md5", StringType, nullable = false),
    StructField("targets_md5", StringType, nullable = false)))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(idAny: Any, textAny: Any): Any = {
    // the id arrives as its STRING form (the caller casts), so the
    // decision hash agrees with the composable chain's
    // `cast(id as string)` for EVERY id type — a long-cast here made
    // zero-padded string ids ('007') silently diverge (ADVICE r10)
    val idBytes = idAny.asInstanceOf[UTF8String].getBytes
    val text = textAny.asInstanceOf[UTF8String].toString
    val decide = java.security.MessageDigest.getInstance("MD5")
    val maskedDig = java.security.MessageDigest.getInstance("MD5")
    val targetDig = java.security.MessageDigest.getInstance("MD5")
    val maskBytes = "[MASK]".getBytes("UTF-8")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var nTokens = 0L
    var nMasked = 0L
    var start = 0
    val len = text.length
    var firstTarget = true
    // token stream: single-space splits of the pre-normalized text;
    // an empty input is ONE empty token (Java split semantics the
    // HOF chain relies on)
    while (start <= len) {
      var end = start
      while (end < len && text.charAt(end) != ' ') end += 1
      nTokens += 1
      val tokBytes = text.substring(start, end).getBytes("UTF-8")
      decide.reset()
      decide.update(idBytes)
      decide.update(':'.toByte)
      decide.update(String.valueOf(nTokens).getBytes(ascii))
      val nibble = (decide.digest()(0) >> 4) & 0xf
      if (nTokens > 1L) maskedDig.update(' '.toByte)
      if (maskNibbles.contains(nibble)) {
        nMasked += 1
        maskedDig.update(maskBytes)
        if (!firstTarget) targetDig.update('|'.toByte)
        firstTarget = false
        targetDig.update(tokBytes)
      } else {
        maskedDig.update(tokBytes)
      }
      start = end + 1
    }
    InternalRow(nTokens, nMasked, hex(maskedDig.digest()),
      hex(targetDig.digest()))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object MlmExpressions {
  /** (n_tokens, n_masked, masked_md5, targets_md5) struct over the
    * pre-normalized token stream — see [[MlmMaskSummary]].
    */
  def mlmMaskSummary(id: Column, normText: Column,
      maskHex: Seq[String]): Column = {
    val nibbles = maskHex.map(h => Integer.parseInt(h, 16)).toSet
    ExprBridge.column(MlmMaskSummary(
      ExprBridge.expression(id), ExprBridge.expression(normText), nibbles))
  }
}
