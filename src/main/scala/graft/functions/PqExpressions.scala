package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels.
  *
  * The composable formulation (an unrolled `greatest` over ksub
  * literal-centroid structs per subspace) generates O(m·ksub·subDim)
  * BYTECODE — at m=16, ksub=32 it crosses Janino's 64 KB method limit
  * and Spark silently falls back to interpreted eval, exactly the
  * hot-path regression the design brief warns about. These
  * expressions keep the codebook as a REFERENCED constant object and
  * emit a tight three-level loop instead: bytecode size is constant
  * in m/ksub, and the whole stage stays codegen.
  *
  * Interpreted eval mirrors the generated loop operation-for-
  * operation, so both paths produce identical bits.
  */
object PqExpressions {

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `array<int>` of length m: per subspace, the index of the
    * L2-nearest codebook centroid (ties to the lower index via strict
    * `<` scan order). Null if the vector length is not divisible into
    * the codebook's subspaces.
    */
  case class PqEncode(child: Expression,
      codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "empty codebooks")
    private val m = codebooks.length
    private val sub = codebooks.head.head.length
    // Parquet list columns read as containsNull=true even when no null
    // elements exist; a null slot nulls the whole row (both paths) so
    // interpreted and generated code stay bit-identical.
    private lazy val elemNullable: Boolean = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float>/array<double>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      if (xs.numElements() != m * sub) return null
      if (elemNullable) {
        var i = 0
        while (i < m * sub) {
          if (xs.isNullAt(i)) return null
          i += 1
        }
      }
      val fl = isFloat(child.dataType)
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var best = Double.PositiveInfinity
        var bi = 0
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0
          var i = 0
          while (i < sub) {
            val x = (if (fl) xs.getFloat(j * sub + i).toDouble
                     else xs.getDouble(j * sub + i)) - cent(i)
            d += x * x
            i += 1
          }
          if (d < best) { best = d; bi = c }
          c += 1
        }
        codes(j) = bi
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val books = ctx.addReferenceObj("pqBooks", codebooks, "double[][][]")
        val g = if (isFloat(child.dataType)) "getFloat" else "getDouble"
        val codes = ctx.freshName("codes")
        val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val i = ctx.freshName("i"); val d = ctx.freshName("d")
        val x = ctx.freshName("x"); val best = ctx.freshName("best")
        val bi = ctx.freshName("bi"); val cb = ctx.freshName("cb")
        val cent = ctx.freshName("cent")
        // Null-element scan emitted only when the schema admits null
        // slots — a containsNull=false input keeps the tight loop.
        val nullScan = if (elemNullable) {
          val ni = ctx.freshName("ni")
          s"""
          for (int $ni = 0; $ni < ${m * sub} && !${ev.isNull}; $ni++) {
            if ($a.isNullAt($ni)) { ${ev.isNull} = true; }
          }
          """
        } else ""
        s"""
        if ($a.numElements() != ${m * sub}) {
          ${ev.isNull} = true;
        }
        $nullScan
        if (!${ev.isNull}) {
          int[] $codes = new int[$m];
          for (int $j = 0; $j < $m; $j++) {
            double[][] $cb = $books[$j];
            double $best = Double.POSITIVE_INFINITY;
            int $bi = 0;
            for (int $c = 0; $c < $cb.length; $c++) {
              double[] $cent = $cb[$c];
              double $d = 0.0;
              for (int $i = 0; $i < $sub; $i++) {
                double $x = ((double) $a.$g($j * $sub + $i)) - $cent[$i];
                $d += $x * $x;
              }
              if ($d < $best) { $best = $d; $bi = $c; }
            }
            $codes[$j] = $bi;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($codes);
        }
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `array<double>` of length m: per subspace, the squared L2
    * distance to the NEAREST codebook centroid — the quantization
    * error the encoder would commit to. Same scan order and argmin
    * discipline as [[PqEncode]] (i-ascending accumulation, strict `<`
    * so ties keep the lower code), so the per-subspace error is the
    * `d` of the code [[PqEncode]] picks, bit-for-bit. Null on a
    * length mismatch or null slot, like the encoder.
    */
  case class PqSubErrors(child: Expression,
      codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "empty codebooks")
    private val m = codebooks.length
    private val sub = codebooks.head.head.length
    private lazy val elemNullable: Boolean = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_sub_errors expects array<float>/array<double>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      if (xs.numElements() != m * sub) return null
      if (elemNullable) {
        var i = 0
        while (i < m * sub) {
          if (xs.isNullAt(i)) return null
          i += 1
        }
      }
      val fl = isFloat(child.dataType)
      val errs = new Array[Double](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var best = Double.PositiveInfinity
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0
          var i = 0
          while (i < sub) {
            val x = (if (fl) xs.getFloat(j * sub + i).toDouble
                     else xs.getDouble(j * sub + i)) - cent(i)
            d += x * x
            i += 1
          }
          if (d < best) best = d
          c += 1
        }
        errs(j) = best
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(errs)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val books = ctx.addReferenceObj("pqBooks", codebooks, "double[][][]")
        val g = if (isFloat(child.dataType)) "getFloat" else "getDouble"
        val errs = ctx.freshName("errs")
        val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val i = ctx.freshName("i"); val d = ctx.freshName("d")
        val x = ctx.freshName("x"); val best = ctx.freshName("best")
        val cb = ctx.freshName("cb"); val cent = ctx.freshName("cent")
        val nullScan = if (elemNullable) {
          val ni = ctx.freshName("ni")
          s"""
          for (int $ni = 0; $ni < ${m * sub} && !${ev.isNull}; $ni++) {
            if ($a.isNullAt($ni)) { ${ev.isNull} = true; }
          }
          """
        } else ""
        s"""
        if ($a.numElements() != ${m * sub}) {
          ${ev.isNull} = true;
        }
        $nullScan
        if (!${ev.isNull}) {
          double[] $errs = new double[$m];
          for (int $j = 0; $j < $m; $j++) {
            double[][] $cb = $books[$j];
            double $best = Double.POSITIVE_INFINITY;
            for (int $c = 0; $c < $cb.length; $c++) {
              double[] $cent = $cb[$c];
              double $d = 0.0;
              for (int $i = 0; $i < $sub; $i++) {
                double $x = ((double) $a.$g($j * $sub + $i)) - $cent[$i];
                $d += $x * $x;
              }
              if ($d < $best) { $best = $d; }
            }
            $errs[$j] = $best;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($errs);
        }
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** ADC cosine approximation from a codes column:
    * `Σ dotTab[j][code_j] / (qNorm · sqrt(Σ nrm2Tab[j][code_j]))`.
    * The tables (m×ksub doubles) are referenced constants — two array
    * lookups per subspace, loop bytecode constant in m/ksub.
    */
  case class PqAdcScore(child: Expression,
      dotTab: Array[Array[Double]], nrm2Tab: Array[Array[Double]],
      qNorm: Double) extends UnaryExpression {
    require(dotTab.length == nrm2Tab.length && dotTab.nonEmpty,
      "table shapes disagree")
    private val m = dotTab.length
    private lazy val elemNullable: Boolean = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects array<int> codes, got ${other.catalogString}")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      if (codes.numElements() != m) return null
      var dot = 0.0; var nrm2 = 0.0
      var j = 0
      while (j < m) {
        if (elemNullable && codes.isNullAt(j)) return null
        val c = codes.getInt(j)
        // invalid input degrades to null like the length guard — an
        // out-of-range code (encoded against a different codebook)
        // must not AIOOBE the executor
        if (c < 0 || c >= dotTab(j).length) return null
        dot += dotTab(j)(c)
        nrm2 += nrm2Tab(j)(c)
        j += 1
      }
      dot / (qNorm * math.sqrt(nrm2))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val dt = ctx.addReferenceObj("pqDotTab", dotTab, "double[][]")
        val nt = ctx.addReferenceObj("pqNrm2Tab", nrm2Tab, "double[][]")
        val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val dot = ctx.freshName("dot"); val nrm2 = ctx.freshName("nrm2")
        s"""
        if ($a.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $nrm2 = 0.0;
          for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
            ${if (elemNullable)
              s"if ($a.isNullAt($j)) { ${ev.isNull} = true; continue; }"
            else ""}
            int $c = $a.getInt($j);
            if ($c < 0 || $c >= $dt[$j].length) {
              ${ev.isNull} = true;
            } else {
              $dot += $dt[$j][$c];
              $nrm2 += $nt[$j][$c];
            }
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / (${qNorm}D * java.lang.Math.sqrt($nrm2));
          }
        }
        """
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // Column-API wrappers ------------------------------------------

  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExprBridge.column(PqEncode(ExprBridge.expression(v), codebooks))
  def pqSubErrors(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExprBridge.column(PqSubErrors(ExprBridge.expression(v), codebooks))
  def pqAdcScore(codes: Column, dotTab: Array[Array[Double]],
      nrm2Tab: Array[Array[Double]], qNorm: Double): Column =
    ExprBridge.column(PqAdcScore(ExprBridge.expression(codes), dotTab,
      nrm2Tab, qNorm))
}
