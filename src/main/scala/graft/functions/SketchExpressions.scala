package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document sketch kernels (MinHash signatures, SimHash).
  *
  * The composable formulations (explode the tokens/shingles, then a
  * 64-aggregate groupBy) are semantically right but turn a per-row
  * O(len) computation into a full shuffle of every token: at 100 TB
  * that shuffle IS the job. These kernels keep the whole sketch
  * computation inside the scan stage — the only thing that ever moves
  * between executors is the finished 8-byte signature (SimHash) or
  * the k×8-byte signature array (MinHash).
  */
object SketchExpressions {

  /** MinHash signature of a shingle-hash set: out[i] = min over the
    * set of XXH64(shingle, seed=i). Identical input sets produce
    * identical signatures under any per-slot hash family, which is
    * the property LSH banding (and its recall-1.0-on-exact-dups
    * guarantee) rests on.
    *
    * Empty input → null (a doc too short to have shingles has no
    * signature, mirroring the exploded formulation where such docs
    * simply produce no rows).
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<long>, got ${other.catalogString}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val n = xs.numElements()
      if (n == 0) return null
      val sig = new Array[Long](numHashes)
      java.util.Arrays.fill(sig, Long.MaxValue)
      var i = 0
      while (i < n) {
        val sh = xs.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashLong(sh, k.toLong)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a document: tokens split on single spaces
    * (empties skipped), token hash = XXH64 of the token's UTF-8 bytes
    * with Spark's default seed 42 — the same hash as
    * `xxhash64(tok)` — bit j of the result set iff more than half the
    * tokens have bit j set in their hash (strict majority, matching
    * `2·cnt_j > n`).
    *
    * Null for documents with zero tokens (the exploded formulation
    * drops them).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${other.catalogString}")
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      // UTF-8 multi-byte sequences never contain 0x20, so a byte scan
      // splits exactly like split(text, " ")
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val counts = new Array[Int](64)
      var nTok = 0
      var i = 0
      val len = bytes.length
      while (i < len) {
        while (i < len && bytes(i) == ' '.toByte) i += 1
        if (i < len) {
          val start = i
          while (i < len && bytes(i) != ' '.toByte) i += 1
          val h = XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
          nTok += 1
          var j = 0
          while (j < 64) {
            counts(j) += ((h >>> j) & 1L).toInt
            j += 1
          }
        }
      }
      if (nTok == 0) return null
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (2 * counts(j) > nTok) sig |= (1L << j)
        j += 1
      }
      sig
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Sign-LSH bucket id in one pass: bit p of the result is the sign
    * of the projection of the vector onto pseudo-random hyperplane p,
    * where component h(p,d) replicates
    * `pmod(xxhash64(lit(p), d), 1000003) / 1000003.0 - 0.5` exactly
    * (XXH64 of two ints, seed 42, like the `xxhash64` SQL function) —
    * bit-identical to the composable fold in
    * [[graft.pipeline.Similarity.lshBucketFold]], which is nPlanes
    * interpreted higher-order folds per row; this is one JVM loop.
    */
  case class SignLshBucket(child: Expression, nPlanes: Int)
      extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bucket expects array<float|double>, got ${other.catalogString}")
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    // lazy: child.dataType is only safe to ask after resolution
    private lazy val elemIsFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    // row-invariant: seed for plane p = XXH64(p, 42), hoisted off the
    // per-row hot path
    private lazy val planeSeeds: Array[Long] =
      Array.tabulate(nPlanes)(p => XXH64.hashInt(p, 42L))

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val n = xs.numElements()
      val projs = new Array[Double](nPlanes)
      var d = 0
      while (d < n) {
        // a null element nulls every fold projection, and the fold's
        // when(proj >= 0, bit).otherwise(0) then drops every bit —
        // mirror that: bucket 0
        if (xs.isNullAt(d)) return 0L
        val x = if (elemIsFloat) xs.getFloat(d).toDouble else xs.getDouble(d)
        var p = 0
        while (p < nPlanes) {
          val h = XXH64.hashInt(d, planeSeeds(p))
          val m = 1000003L
          val pm = ((h % m) + m) % m
          projs(p) += x * (pm.toDouble / 1000003.0 - 0.5)
          p += 1
        }
        d += 1
      }
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        if (projs(p) >= 0) bucket += (1L << p)
        p += 1
      }
      bucket
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-API wrappers ------------------------------------------

  def minHashSig(shingles: Column, numHashes: Int): Column =
    ExprBridge.column(MinHashSig(ExprBridge.expression(shingles), numHashes))
  def simHash64(text: Column): Column =
    ExprBridge.column(SimHash64(ExprBridge.expression(text)))
  def signLshBucket(vec: Column, nPlanes: Int): Column =
    ExprBridge.column(SignLshBucket(ExprBridge.expression(vec), nPlanes))
}
