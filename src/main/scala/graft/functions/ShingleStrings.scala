package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle *strings* of a document, one pass —
  * the string-materializing sibling of [[ShingleHashes]], for
  * operators whose downstream math is defined over the shingle TEXT
  * (e.g. [[graft.pipeline.Dedup.minHashLshMd5]], whose md5 slot
  * minima an external engine reproduces byte-for-byte).
  *
  * Semantically equal to: canonicalize (lowercase, collapse `\s+`,
  * trim), split on single spaces, join every n consecutive tokens
  * with one space, distinct. The composable
  * `transform`/`slice`/`array_join` chain allocates an array slice
  * and a join buffer per shingle and stays outside whole-stage
  * codegen; this expression is one imperative scan per document with
  * exactly one output string per DISTINCT shingle.
  *
  * Whitespace is Java regex `\s` (incl. ``), matching
  * [[ShingleHashes]] and every Spark-side `\s+` normalization in the
  * repo. DuckDB's RE2 `\s` excludes `` — a latent oracle edge
  * shared by the whole shingle family, moot on corpora without
  * vertical tabs (the fixtures).
  */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle_strings: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(text.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s <= nTok - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(text, starts.get(s + t), ends.get(s + t))
        t += 1
      }
      seen.add(sb.toString): Unit
      s += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleStrings {
  def apply(text: Column, n: Int): Column =
    ExprBridge.column(ShingleStrings(ExprBridge.expression(text), n))
}
