package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass CDC chunk-digest kernel — the imperative spelling of
  * [[graft.pipeline.Dedup.cdcChunkDedupComposable]]'s boundary HOF
  * chain (a per-position window-hash spelled as array HOFs over the
  * char-code array), which evaluated INTERPRETED per position and
  * paid a ~4.5× dispatch constant at the 10× smoke scale (the same
  * shape t46 profiled 5.1× slower before [[MlmMaskSummary]]). The
  * kernel makes ONE code-point scan per document, computes each
  * window hash in a tight long loop, and streams every chunk's UTF-8
  * bytes through one reused MessageDigest — no per-position
  * expression dispatch, no char-code array materialization.
  *
  * Semantics pinned IDENTICAL to the chain (Round14Spec
  * differential) for inputs with ≥ `window` code points (the only
  * inputs [[graft.pipeline.Dedup.cdcChunkDedup]] feeds it): position
  * i (1-based over code points, i ≥ W) ends a chunk when
  * H(i) ≡ 0 (mod `modulus`), H(i) = (Σ_{j<W} cp[i−j]·31ʲ) mod 2³¹ —
  * exact integer arithmetic, each term < 2⁵², W-term sum < 2⁵⁶, so
  * the single end-of-sum mod reproduces the composable chain (and
  * the DuckDB oracle) bit-for-bit. The final position is always a
  * boundary. Each chunk emits (fp = md5 hex of its UTF-8 bytes,
  * clen = its code-point length).
  *
  * Shorter inputs stay total rather than reproducing the chain's
  * degenerate descending-`sequence` branch: 0 code points → empty
  * array, 0 < n < W → one whole-text chunk.
  */
case class CdcChunkDigests(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 2 && modulus >= 2, "cdc_chunk_digests: bad cdc params")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_digests expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("clen", LongType, nullable = false))), containsNull = false)

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

  override def nullSafeEval(textAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val charLen = text.length
    // one pass: code points + the char offset where each starts, so
    // chunk extraction is a plain substring over char indices
    var n = 0
    var ci = 0
    while (ci < charLen) {
      ci += Character.charCount(text.codePointAt(ci))
      n += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cp = new Array[Long](n)
    val charOff = new Array[Int](n + 1)
    ci = 0
    var k = 0
    while (ci < charLen) {
      val c = text.codePointAt(ci)
      cp(k) = c.toLong
      charOff(k) = ci
      ci += Character.charCount(c)
      k += 1
    }
    charOff(n) = charLen
    val M = 2147483648L // 2^31
    val pows = new Array[Long](window)
    var p = 1L
    var j = 0
    while (j < window) { pows(j) = p; p = p * 31 % M; j += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0 // code-point index after the last boundary
    var i = window // 1-based window end position
    while (i <= n) {
      var sum = 0L
      var jj = 0
      while (jj < window) { sum += cp(i - 1 - jj) * pows(jj); jj += 1 }
      if (i == n || sum % M % modulus == 0L) {
        md.reset()
        md.update(text.substring(charOff(prev), charOff(i))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out += InternalRow(hex(md.digest()), (i - prev).toLong)
        prev = i
      }
      i += 1
    }
    if (prev < n) { // n < window: the final-position boundary never ran
      md.reset()
      md.update(text.substring(charOff(prev), charLen)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out += InternalRow(hex(md.digest()), (n - prev).toLong)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CdcExpressions {
  /** array<struct<fp: md5 hex, clen: code-point length>> of the
    * content-defined chunks of `text` — see [[CdcChunkDigests]].
    */
  def cdcChunkDigests(text: Column, window: Int, modulus: Int): Column =
    ExprBridge.column(CdcChunkDigests(ExprBridge.expression(text),
      window, modulus))
}
