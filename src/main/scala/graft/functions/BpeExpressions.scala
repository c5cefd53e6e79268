package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE ENCODE kernel — the imperative spelling of
  * [[graft.pipeline.TextAnalysis.bpeEncode]]'s composable
  * double-space/replace/collapse chain, which runs k full regex
  * passes over a doubled copy of every document and profiled as the
  * bench's slowest query (t45 ~4 s isolated at sf0.1; this kernel is
  * one char scan + k array passes, no regex, no string doubling).
  *
  * Semantics are pinned IDENTICAL to the chain (Round11Spec
  * differential): lowercase, `[a-z]+` word runs joined by a `|`
  * boundary symbol, each merge rule applied to the symbol array
  * leftmost non-overlapping in induction order, output symbols joined
  * by single spaces. The t45 oracle replays the chain in SQL, so the
  * kernel is hash-proven against DuckDB through the declared query.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  require(merges.nonEmpty, "bpe_encode: merge list must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  // rules as arrays for allocation-free per-row access
  @transient private lazy val lefts = merges.map(_._1).toArray
  @transient private lazy val rights = merges.map(_._2).toArray
  @transient private lazy val merged = merges.map(m => m._1 + m._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    // initial symbol stream: each [a-z] char its own symbol, words
    // separated by a single "|" boundary symbol
    var syms = new java.util.ArrayList[String](text.length)
    var i = 0
    val len = text.length
    var inWord = false
    while (i < len) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z') {
        if (!inWord && !syms.isEmpty) syms.add("|"): Unit
        inWord = true
        syms.add(String.valueOf(c)): Unit
      } else if (inWord) inWord = false
      i += 1
    }
    // trailing boundary guard: a non-word tail never appended '|'
    // (boundaries only ever sit BETWEEN words by construction)
    var k = 0
    while (k < lefts.length) {
      val l = lefts(k); val r = rights(k); val m = merged(k)
      val out = new java.util.ArrayList[String](syms.size())
      var j = 0
      val n = syms.size()
      while (j < n) {
        if (j < n - 1 && syms.get(j) == l && syms.get(j + 1) == r) {
          out.add(m): Unit
          j += 2
        } else {
          out.add(syms.get(j)): Unit
          j += 1
        }
      }
      syms = out
      k += 1
    }
    val sb = new java.lang.StringBuilder()
    var t = 0
    val n = syms.size()
    while (t < n) {
      if (t > 0) sb.append(' ')
      sb.append(syms.get(t))
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ExprBridge.column(BpeEncode(ExprBridge.expression(text), merges))
}
