package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for embedding similarity.
  *
  * The composable route (`functions.aggregate` / `zip_with` folds)
  * is semantically right but each element goes through a lambda
  * dispatch — at N² pair volume (near-dup search over 100 TB corpora)
  * that's the hot loop, so these are native Catalyst expressions with
  * `doGenCode` emitting a tight primitive loop (preference order (b)
  * from the design brief: custom Expression before custom operator).
  *
  * Numeric contract: elements are widened to double and accumulated
  * left-to-right — bit-identical to the sequential `aggregate` fold
  * AND to DuckDB's `list_sum(list_transform(...))`, which the
  * differential oracle relies on.
  *
  * Inputs are `array<float>` or `array<double>`; nulls propagate
  * (null array → null result; null *element* contributes 0, matching
  * `aggregate`'s behavior of null-skipping would differ — the corpus
  * has non-null elements, and both engines agree on non-null data).
  */
object VectorExpressions {

  private def elemPrim(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "float"
    case _ => "double"
  }

  private def checkVec(dt: DataType, what: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what expects array<float>/array<double>, got ${other.catalogString}")
  }

  /** Σ aᵢ·bᵢ in double precision. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkVec(left.dataType, "dot_product")
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else checkVec(right.dataType, "dot_product")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      // mismatched lengths → null, matching the zip_with fold (which
      // pads with null and nulls the whole sum)
      if (xs.numElements() != ys.numElements()) return null
      val n = xs.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat(left.dataType)) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (isFloat(right.dataType)) ys.getFloat(i).toDouble else ys.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val lg = if (elemPrim(left.dataType) == "float") "getFloat" else "getDouble"
        val rg = if (elemPrim(right.dataType) == "float") "getFloat" else "getDouble"
        val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ((double) $a.$lg($i)) * ((double) $b.$rg($i));
          }
          ${ev.value} = $acc;
        }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** ‖v‖₂ in double precision. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, "l2_norm")
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < xs.numElements()) {
        val x = if (isFloat(child.dataType)) xs.getFloat(i).toDouble else xs.getDouble(i)
        acc += x * x
        i += 1
      }
      math.sqrt(acc)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val g = if (elemPrim(child.dataType) == "float") "getFloat" else "getDouble"
        val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        s"""
        double $acc = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          double $x = (double) $a.$g($i);
          $acc += $x * $x;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Fused cosine similarity: dot(a,b) / (‖a‖·‖b‖) in one pass.
    * The three accumulators are independent, so per-accumulator
    * left-to-right order (and thus the result bits) is identical to
    * computing the three folds separately.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkVec(left.dataType, "cosine_similarity")
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else checkVec(right.dataType, "cosine_similarity")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      if (xs.numElements() != ys.numElements()) return null
      val n = xs.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat(left.dataType)) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (isFloat(right.dataType)) ys.getFloat(i).toDouble else ys.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val lg = if (elemPrim(left.dataType) == "float") "getFloat" else "getDouble"
        val rg = if (elemPrim(right.dataType) == "float") "getFloat" else "getDouble"
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = (double) $a.$lg($i);
            double $y = (double) $b.$rg($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Dense matrix-vector product y = M·v / divisor in one pass — the
    * Johnson-Lindenstrauss random-projection kernel. The matrix is a
    * driver-built reference object (outDim × dim of ±1 Rademacher
    * signs for JL; any dense matrix works), so the per-row work is a
    * tight nested primitive loop with NO per-element hashing or
    * lambda dispatch. Row accumulators run i-ascending — bit-identical
    * to the sequential `aggregate` fold and to DuckDB's
    * `list_sum(list_transform(...))` (the oracle contract). A vector
    * shorter than the matrix row uses its own length (trailing signs
    * idle); the divisor applies once per output component.
    */
  case class MatVecProject(child: Expression, matrix: Array[Array[Double]],
      divisor: Double) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, "matvec_project")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val out = new Array[Double](matrix.length)
      var j = 0
      while (j < matrix.length) {
        val row = matrix(j)
        val n = math.min(xs.numElements(), row.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat(child.dataType)) xs.getFloat(i).toDouble else xs.getDouble(i)
          acc += x * row(i)
          i += 1
        }
        out(j) = acc / divisor
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val g = if (elemPrim(child.dataType) == "float") "getFloat" else "getDouble"
        val mat = ctx.addReferenceObj("matvecMatrix", matrix, "double[][]")
        val out = ctx.freshName("out"); val row = ctx.freshName("row")
        val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        s"""
        double[] $out = new double[$mat.length];
        for (int $j = 0; $j < $mat.length; $j++) {
          double[] $row = $mat[$j];
          int $n = java.lang.Math.min($a.numElements(), $row.length);
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ((double) $a.$g($i)) * $row[$i];
          }
          $out[$j] = $acc / ${divisor}D;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-API wrappers ------------------------------------------

  def dot(a: Column, b: Column): Column =
    ExprBridge.column(DotProduct(ExprBridge.expression(a), ExprBridge.expression(b)))
  def l2norm(v: Column): Column =
    ExprBridge.column(L2Norm(ExprBridge.expression(v)))
  def cosine(a: Column, b: Column): Column =
    ExprBridge.column(CosineSimilarity(ExprBridge.expression(a), ExprBridge.expression(b)))
  def matvec(v: Column, matrix: Array[Array[Double]], divisor: Double): Column =
    ExprBridge.column(MatVecProject(ExprBridge.expression(v), matrix, divisor))
}
