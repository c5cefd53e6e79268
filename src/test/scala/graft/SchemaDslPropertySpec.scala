package graft

import graft.ingest.SchemaDsl
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.4: property test for the schema DSL codec — random
  * schemas over all representable types round-trip exactly. Driven
  * with scalacheck generators at fixed seeds (deterministic; the
  * scalatest-scalacheck bridge module isn't in the offline cache).
  */
class SchemaDslPropertySpec extends AnyFunSuite {

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType, BinaryType, DateType,
    TimestampType, TimestampNTZType,
    DecimalType(10, 2), DecimalType(38, 18), DecimalType(20, 0))

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      6 -> scalarGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(ArrayType(_, containsNull = true))),
      1 -> Gen.lzy(for {
        k <- scalarGen; v <- typeGen(depth - 1)
      } yield MapType(k, v, valueContainsNull = true)),
      1 -> Gen.lzy(structGen(depth - 1)))

  private val fieldName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.listOfN(n, fieldName).retryUntil(ns => ns.distinct.size == ns.size)
    fields <- Gen.sequence[List[StructField], StructField](names.map { nm =>
      for {
        dt <- typeGen(depth)
        nullable <- Gen.oneOf(true, false)
      } yield StructField(nm, dt, nullable)
    })
  } yield StructType(fields)

  // nested struct members are forced nullable by the reference DSL
  // (schema.rs:118) — normalize before comparing round-trips
  private def normalize(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f =>
        f.copy(dataType = normalize(f.dataType), nullable = true)))
    case ArrayType(et, n) => ArrayType(normalize(et), n)
    case MapType(k, v, n) => MapType(normalize(k), normalize(v), n)
    case other => other
  }

  test("100 random schemas round-trip through the DSL json") {
    val params = Gen.Parameters.default
    (1 to 100).foreach { i =>
      val schema0 = structGen(2).pureApply(params, Seed(i.toLong), retries = 1000)
      val schema = StructType(schema0.fields.map(f =>
        f.copy(dataType = normalize(f.dataType))))
      val json = SchemaDsl.toJson(schema)
      val back = SchemaDsl.fromJson(json)
      assert(back == schema, s"seed=$i json=$json")
    }
  }
}
