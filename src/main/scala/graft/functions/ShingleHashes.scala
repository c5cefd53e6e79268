package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle *hashes* of a document, one pass.
  *
  * Semantically equal to: canonicalize (lowercase, collapse `\s+`,
  * trim), split on single spaces, join every n consecutive tokens
  * with one space, distinct, hash each shingle to 64 bits — i.e. the
  * composable `transform`/`slice`/`array_join`/`array_distinct`
  * chain in [[graft.pipeline.Dedup.shingles]], minus the string
  * materialization. Higher-order functions don't participate in
  * whole-stage codegen and allocate a string per shingle; this
  * expression is one imperative scan per document (lowercase via
  * `UTF8String.toLowerCase` = Spark's `lower`, whitespace = Java
  * regex `\s`), hashing token windows with 64-bit FNV-1a.
  *
  * The hash only ever serves as a Spark-side join/aggregation key;
  * set sizes and intersections are what correctness (the DuckDB
  * jaccard oracle) depends on, and those are hash-invariant absent
  * collisions (~1e-9 at 1e6 shingles).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    // token boundaries on \s+ runs (leading/trailing runs = trim)
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
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var s = 0
    while (s <= nTok - n) {
      // FNV-1a over the n tokens with a single ' ' between them —
      // the same byte stream as hashing the joined shingle string
      var h = FnvOffset
      var t = 0
      while (t < n) {
        if (t > 0) { h ^= ' '.toLong; h *= FnvPrime }
        var j = starts.get(s + t)
        val e = ends.get(s + t)
        while (j < e) {
          val c = text.charAt(j)
          // hash UTF-16 code units (distinctness-preserving)
          h ^= (c & 0xffL); h *= FnvPrime
          h ^= ((c >> 8) & 0xffL); h *= FnvPrime
          j += 1
        }
        t += 1
      }
      if (seen.add(h)) out.add(h)
      s += 1
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  def apply(text: Column, n: Int): Column =
    ExprBridge.column(ShingleHashes(ExprBridge.expression(text), n))
}
