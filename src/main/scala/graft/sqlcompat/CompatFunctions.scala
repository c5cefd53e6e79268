package graft.sqlcompat

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** DataFusion-45 function-surface compatibility for Spark SQL.
  *
  * The reference delegates all SQL to DataFusion
  * (`lib/src/context/session.rs:658-673`), so its scalar/aggregate
  * function names are DataFusion 45's. Most have identical Spark
  * names; this object supplies the deltas as thin, codegen-friendly
  * compositions of built-in catalyst expressions (no Scala UDFs) and
  * registers SQL-callable shims for the renamed ones.
  *
  * Shim list derived from SURVEY.md §2.B ("Aggregate functions",
  * "Scalar: date/time", …).
  */
object CompatFunctions {

  // ---------------------------------------------------------------
  // date_bin (DataFusion: date_bin(stride, ts, origin)) — bins a
  // timestamp into fixed-width buckets anchored at `origin`.
  // Spark has window() (grouping-only) but no scalar equivalent.
  // Pure long arithmetic on epoch micros => whole-stage codegen,
  // no shuffle, exact floor semantics for ts < origin too.
  // ---------------------------------------------------------------

  /** date_bin with stride in seconds, anchored at `origin`. */
  def dateBin(strideSeconds: Long, ts: Column, origin: Column): Column = {
    val strideUs = strideSeconds * 1000000L
    val diff = unix_micros(ts) - unix_micros(origin)
    // floor-division via pmod keeps bins correct below the origin.
    val binned = diff - pmod(diff, lit(strideUs))
    timestamp_micros(unix_micros(origin) + binned)
  }

  /** date_bin anchored at the unix epoch (1970-01-01, a Thursday).
    * Note: for strides that divide 86400s this is bin-compatible with
    * DuckDB/TimescaleDB `time_bucket`, whose default origin
    * (2000-01-03) is a whole number of days from the epoch.
    */
  def dateBin(strideSeconds: Long, ts: Column): Column = {
    val strideUs = strideSeconds * 1000000L
    val us = unix_micros(ts)
    timestamp_micros(us - pmod(us, lit(strideUs)))
  }

  /** DataFusion `to_unixtime` — seconds since epoch as long. */
  def toUnixtime(ts: Column): Column = unix_seconds(ts)

  /** DataFusion `iszero`. */
  def isZero(c: Column): Column = c === lit(0)

  /** DataFusion `sha256(x)` → hex string (Spark: sha2(x, 256)). */
  def sha256(c: Column): Column = sha2(c, 256)

  /** DataFusion `strpos(string, substring)` (1-based, 0 = absent).
    * Spark's `locate`/`instr` have the same semantics; `locate`
    * flips the argument order.
    */
  def strpos(s: Column, sub: Column): Column = instr(s, sub)

  /** DataFusion `string_agg(expr, delim)`. */
  def stringAgg(c: Column, delim: String): Column =
    array_join(collect_list(c), delim)

  /** DataFusion `generate_series(start, stop[, step])` → array. */
  def generateSeries(start: Column, stop: Column, step: Column): Column =
    sequence(start, stop, step)

  // ---------------------------------------------------------------
  // SQL-callable registration. Uses FunctionRegistry so the shims
  // stay catalyst expressions (codegen) rather than UDFs. Spark 4.1
  // already ships many DataFusion names natively (array_agg, btrim,
  // median, regr_*, bool_and/or, split_part, …): we only register
  // what's missing, and never overwrite a built-in.
  // ---------------------------------------------------------------

  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr, _}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.types.LongType

    val fr = spark.sessionState.functionRegistry
    val parser = spark.sessionState.sqlParser

    def ifMissing(name: String)(builder: Seq[CExpr] => CExpr): Unit =
      if (!fr.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        fr.createOrReplaceTempFunction(name, builder, "scala_udf")

    // approx_distinct(x) = approx_count_distinct(x)  (HLL++)
    ifMissing("approx_distinct") { es =>
      new HyperLogLogPlusPlus(es.head).toAggregateExpression()
    }
    // approx_percentile_cont(x, p) = percentile_approx(x, p, default acc.)
    ifMissing("approx_percentile_cont") { es =>
      new ApproximatePercentile(es(0), es(1)).toAggregateExpression()
    }
    // sha256(x) = sha2(x, 256)
    ifMissing("sha256") { es => Sha2(es.head, Literal(256)) }
    // iszero(x)
    ifMissing("iszero") { es => EqualTo(es.head, Literal(0)) }
    // to_unixtime(ts) — seconds since epoch
    ifMissing("to_unixtime") { es => UnixSeconds(Cast(es.head, org.apache.spark.sql.types.TimestampType)) }
    // strpos(s, sub) = instr(s, sub) (same argument order)
    ifMissing("strpos") { es => StringInstr(es(0), es(1)) }
    // generate_series(a, b[, step]) = sequence(a, b[, step])
    ifMissing("generate_series") { es =>
      if (es.length >= 3) new Sequence(es(0), es(1), es(2)) else new Sequence(es(0), es(1))
    }
    // date_bin(stride_seconds, ts[, origin]) — long-micros arithmetic.
    ifMissing("date_bin") { es =>
      val strideUs = Multiply(Cast(es(0), LongType), Literal(1000000L))
      val tsUs = UnixMicros(Cast(es(1), org.apache.spark.sql.types.TimestampType))
      val originUs: CExpr =
        if (es.length >= 3) UnixMicros(Cast(es(2), org.apache.spark.sql.types.TimestampType))
        else Literal(0L)
      val diff = Subtract(tsUs, originUs)
      val binned = Subtract(diff, Pmod(diff, strideUs))
      MicrosToTimestamp(Add(originUs, binned))
    }
    // to_hex(n): DataFusion renders lowercase; Spark's Hex is
    // uppercase, so wrap in Lower for dialect parity
    ifMissing("to_hex") { es => Lower(Hex(es.head)) }
    // random() = rand() (both uniform [0,1))
    ifMissing("random") { es => if (es.isEmpty) new Rand() else new Rand(es.head) }
    // DataFusion array_* names Spark spells differently
    ifMissing("array_has") { es => ArrayContains(es(0), es(1)) }
    ifMissing("array_has_any") { es => ArraysOverlap(es(0), es(1)) }
    // has_all(a, b): every element of b is in a ⇔ b \ a = ∅
    ifMissing("array_has_all") { es =>
      EqualTo(Size(ArrayExcept(es(1), es(0))), Literal(0))
    }
    ifMissing("array_length") { es => Size(es.head) }
    ifMissing("array_element") { es => ElementAt(es(0), es(1)) }
    // arrow_cast(x, 'Int64') — DataFusion's Arrow-typed cast; the type
    // name is a string literal mapped onto the Spark SQL type
    ifMissing("arrow_cast") { es =>
      val typeName = es(1) match {
        case Literal(v, _) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"arrow_cast expects a literal type name, got $other")
      }
      Cast(es(0), arrowTypeToSpark(typeName))
    }
    // The engine's codegen vector/text kernels, SQL-callable: an API
    // user querying the embeddings/documents tables over the server's
    // SQL route gets the same expressions the pipeline operators
    // compile to (not UDFs — whole-stage codegen applies).
    ifMissing("cosine_similarity") { es =>
      graft.functions.VectorExpressions.CosineSimilarity(es(0), es(1))
    }
    ifMissing("dot_product") { es =>
      graft.functions.VectorExpressions.DotProduct(es(0), es(1))
    }
    ifMissing("l2_norm") { es =>
      graft.functions.VectorExpressions.L2Norm(es.head)
    }
    ifMissing("shingle_hashes") { es =>
      val n = es(1) match {
        // integral literals only: a double like 2.0 must be a clean
        // request error, not a NumberFormatException → HTTP 500
        case Literal(v: Int, _) => v
        case Literal(v: Long, _) =>
          // toInt on an out-of-range Long truncates silently (5e9 →
          // 705032704) and would sail past the n >= 1 guard below
          require(v >= 1L && v <= Int.MaxValue.toLong,
            s"shingle_hashes: n must be in [1, ${Int.MaxValue}], got $v")
          v.toInt
        case Literal(v: Short, _) => v.toInt
        case Literal(v: Byte, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"shingle_hashes expects an integer literal n, got $other")
      }
      require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")
      graft.functions.ShingleHashes(es(0), n)
    }
    val _ = parser // reserved for future parse-based shims
  }

  /** Arrow type-name → Spark type (the subset DataFusion docs use). */
  private def arrowTypeToSpark(name: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val n = name.trim
    n match {
      case "Int8" => ByteType
      case "Int16" => ShortType
      case "Int32" => IntegerType
      case "Int64" => LongType
      case "UInt8" => ShortType      // widened: Spark has no unsigned
      case "UInt16" => IntegerType
      case "UInt32" => LongType
      case "UInt64" => DecimalType(20, 0)
      case "Float32" => FloatType
      case "Float64" => DoubleType
      case "Utf8" | "LargeUtf8" | "Utf8View" => StringType
      case "Binary" | "LargeBinary" => BinaryType
      case "Boolean" => BooleanType
      case "Date32" | "Date64" => DateType
      // Timestamp(unit, None) is wall-clock; Timestamp(unit, Some(tz))
      // is an instant — map to the matching Spark semantics
      case t if t.startsWith("Timestamp") && t.contains("Some") => TimestampType
      case t if t.startsWith("Timestamp") => TimestampNTZType
      case t if t.startsWith("Decimal128") =>
        // Decimal128(p, s)
        val ps = t.stripPrefix("Decimal128(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(ps(0), ps(1))
      case other => throw new IllegalArgumentException(s"arrow_cast: unsupported type $other")
    }
  }
}
