package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass xxhash64 token/bigram kernels for the LM-score family.
  *
  * The composable spelling — `split(text, " ")` then a `transform`
  * lambda with per-element `xxhash64`/`concat_ws` — is semantically
  * right but evaluates INTERPRETED (higher-order functions don't
  * participate in codegen or common-subexpression elimination) and
  * allocates a token string, a struct, and for bigrams a joined
  * string per element. At corpus scale that interpreted per-element
  * work dominated the whole LM-score family (t19/t22/t27/t29/t31 —
  * the top of the bench). These kernels walk the document's UTF-8
  * bytes once and hash SLICES in place, zero per-token allocation.
  *
  * Hash-identical to the composable chain by construction:
  *  - tokens are `split(text, " ")` semantics — split at EVERY
  *    single 0x20 byte, empty tokens kept (UTF-8 multi-byte
  *    sequences never contain 0x20, so byte split == char split);
  *  - token hashes are Spark's own `xxhash64` (XXH64, seed 42) over
  *    the token's UTF-8 bytes;
  *  - the bigram string `concat_ws(" ", w1, w2)` is BYTE-IDENTICAL
  *    to the contiguous input slice from w1's first byte to w2's
  *    last (the separator is exactly one space), so its hash is a
  *    slice hash too — the joined string is never materialized.
  *
  * Correctness doesn't ride on the hash VALUES (they are join keys
  * only; the DuckDB oracles aggregate the strings), but equality
  * with the previous spelling keeps every declared query's plan
  * semantics unchanged. CodegenFallback like [[ShingleHashes]]: one
  * imperative call per ROW is cheap; it is per-ELEMENT interpretation
  * the kernels remove.
  */
private[functions] object TokenHashKernels {
  final val Seed = 42L // Spark's xxhash64 default seed

  /** Token boundaries: (starts, ends) byte offsets, empties kept. */
  def boundaries(s: UTF8String): (Array[Int], Array[Int]) = {
    val n = s.numBytes
    var nTok = 1
    var i = 0
    while (i < n) { if (s.getByte(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (s.getByte(i) == ' '.toByte) {
        ends(t) = i; t += 1; starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = n
    (starts, ends)
  }

  def slice(s: UTF8String, from: Int, until: Int): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + from, until - from, Seed)
}

/** `array<long>` of per-token xxhash64 values, in order, empties
  * kept — hash-equal to `transform(split(text,' '), t -> xxhash64(t))`.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val (starts, ends) = TokenHashKernels.boundaries(s)
    val out = new Array[Long](starts.length)
    var t = 0
    while (t < starts.length) {
      out(t) = TokenHashKernels.slice(s, starts(t), ends(t))
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenHashes {
  def apply(text: Column): Column =
    ExprBridge.column(TokenHashes(ExprBridge.expression(text)))
}

/** `array<struct<h1,h2,h12>>` — per bigram, the xxhash64 of the first
  * token, the second token, and the joined "w1 w2" string (hashed as
  * the contiguous input slice). Documents with fewer than two tokens
  * yield an empty array, matching the composable `sequence`/`size>=2`
  * guard.
  */
case class BigramHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_hashes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("h12", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val (starts, ends) = TokenHashKernels.boundaries(s)
    val nTok = starts.length
    if (nTok < 2) return new GenericArrayData(Array.empty[Any])
    // token hashes computed once, reused as both h1 and h2
    val th = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      th(t) = TokenHashKernels.slice(s, starts(t), ends(t))
      t += 1
    }
    val rows = new Array[Any](nTok - 1)
    var i = 0
    while (i < nTok - 1) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        th(i), th(i + 1), TokenHashKernels.slice(s, starts(i), ends(i + 1)))
      i += 1
    }
    new GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BigramHashes {
  def apply(text: Column): Column =
    ExprBridge.column(BigramHashes(ExprBridge.expression(text)))
}

/** `array<long>` of per-n-gram xxhash64 values — hash-equal to
  * `transform(idxs, i -> xxhash64(array_join(slice(toks, i+1, n), " ")))`
  * over `split(text, " ")`: the joined n-gram string is the
  * contiguous input slice from token i's first byte to token
  * (i+n−1)'s last, hashed in place. Documents with fewer than n
  * tokens yield an empty array (the `size >= n` guard).
  */
case class NgramSliceHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"ngram_slice_hashes: n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_slice_hashes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val (starts, ends) = TokenHashKernels.boundaries(s)
    val nTok = starts.length
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = TokenHashKernels.slice(s, starts(i), ends(i + n - 1))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NgramSliceHashes {
  def apply(text: Column, n: Int): Column =
    ExprBridge.column(NgramSliceHashes(ExprBridge.expression(text), n))
}

/** The quality-gate's tagged stream in one pass:
  * `array<struct<kind,h,len>>` with one `(0, xxhash64(tok), length(tok))`
  * entry per token followed by one `(1, xxhash64(n-gram), 0)` entry
  * per n-gram — hash- and length-equal to the two `transform`s it
  * replaces (`len` counts CODEPOINTS like Spark's `length`, i.e.
  * bytes that are not UTF-8 continuations).
  */
case class TokenGramEntries(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"token_gram_entries: n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_gram_entries expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val (starts, ends) = TokenHashKernels.boundaries(s)
    val nTok = starts.length
    val nGrams = math.max(0, nTok - n + 1)
    val rows = new Array[Any](nTok + nGrams)
    var t = 0
    while (t < nTok) {
      var chars = 0
      var b = starts(t)
      while (b < ends(t)) {
        if ((s.getByte(b) & 0xc0) != 0x80) chars += 1
        b += 1
      }
      rows(t) = org.apache.spark.sql.catalyst.InternalRow(
        0, TokenHashKernels.slice(s, starts(t), ends(t)), chars)
      t += 1
    }
    var i = 0
    while (i < nGrams) {
      rows(nTok + i) = org.apache.spark.sql.catalyst.InternalRow(
        1, TokenHashKernels.slice(s, starts(i), ends(i + n - 1)), 0)
      i += 1
    }
    new GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenGramEntries {
  def apply(text: Column, n: Int): Column =
    ExprBridge.column(TokenGramEntries(ExprBridge.expression(text), n))
}
