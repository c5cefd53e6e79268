package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ingest.Readers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.4 second property: JSON-document decode equivalence —
  * random nested documents ingested through the jsonDocument reader
  * come back value-identical when re-serialized (Spark's decode +
  * our JSON-array encoder vs the Jackson source of truth).
  */
class JsonDecodePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val mapper = new ObjectMapper()

  // scalar value generators (strings avoid characters Spark field
  // names can't carry; values themselves are arbitrary)
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf(true, false),
    Gen.const(null))

  private val fieldName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      5 -> scalarGen,
      1 -> Gen.lzy(Gen.listOfN(3, valueGen(depth - 1)).map(_.asJava)),
      1 -> Gen.lzy(objGen(depth - 1)))

  private def objGen(depth: Int): Gen[java.util.Map[String, Any]] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.listOfN(n, fieldName).retryUntil(ns => ns.distinct.size == ns.size)
    vals <- Gen.sequence[List[Any], Any](names.map(_ => valueGen(depth)))
  } yield {
    val m = new java.util.LinkedHashMap[String, Any]()
    names.zip(vals).foreach { case (k, v) => m.put(k, v) }
    m
  }

  private implicit class ListOps(l: List[Any]) {
    def asJava: java.util.List[Any] = {
      val out = new java.util.ArrayList[Any]()
      l.foreach(out.add)
      out
    }
  }

  test("random json-array documents round-trip through ingest + encode") {
    val params = Gen.Parameters.default
    (1 to 25).foreach { i =>
      // a homogeneous array (all rows share one object shape) — the
      // shape the reference's decoder targets (top-level JSON array)
      val shape = objGen(2).pureApply(params, Seed(i.toLong), retries = 1000)
      val rows = (0 until 4).map(_ => mapper.writeValueAsString(shape))
      val doc = rows.mkString("[", ",", "]")
      val df = Readers.jsonDocument(spark, doc)
      assert(df.count() == 4, s"seed=$i doc=$doc")
      // every leaf of the source object must survive decode: compare
      // a canonical re-serialization of one decoded row to the source
      val decoded = graft.serve.ResponseEncoders.encodeToBytes(
        df.limit(1), graft.serve.ResponseEncoders.JsonFormat)
      val back = mapper.readTree(decoded).get(0)
      val src = mapper.readTree(rows.head)
      src.properties().forEach { e =>
        val got = back.get(e.getKey)
        assert(got != null, s"seed=$i missing field ${e.getKey} in $back")
        // numbers may widen (int -> long) — compare canonical text
        if (!e.getValue.isNull)
          assert(got.toString == e.getValue.toString ||
            got.asText() == e.getValue.asText(),
            s"seed=$i field ${e.getKey}: ${e.getValue} vs $got")
      }
    }
  }
}
