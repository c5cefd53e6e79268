package graft

import graft.ingest.{DeltaReader, IngestOptions, Readers}
import org.scalatest.funsuite.AnyFunSuite

/** Golden ingest tests against the reference's own shipped fixtures
  * (`/root/reference/bin/data/`, read-only; FIXTURES.md §A) — the
  * same files its documentation curl flows use.
  */
class GoldenFixturesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val data = "/root/reference/bin/data"

  test("superstore.csv: header inference, quoted identifiers with spaces") {
    val df = Readers.csv(spark, s"$data/superstore.csv")
    df.createOrReplaceTempView("superstore")
    assert(df.columns.contains("Customer Name"))
    // quoted-identifier SQL over inferred schema
    val r = spark.sql(
      """SELECT `Region`, sum(`Sales`) AS sales FROM superstore
         GROUP BY `Region` ORDER BY sales DESC""").collect()
    assert(r.nonEmpty)
    // at least the top region has a real sum (some cells are null)
    assert(r.head.getAs[Any]("sales") != null)
    // row count matches the raw line count minus header
    val lines = spark.read.textFile(s"$data/superstore.csv").count()
    assert(df.count() == lines - 1)
  }

  test("superstore.parquet matches superstore.csv row count") {
    val pq = Readers.parquet(spark, s"$data/superstore.parquet")
    val csv = Readers.csv(spark, s"$data/superstore.csv")
    assert(pq.count() == csv.count())
  }

  test("james-bond.json: top-level JSON array document decodes") {
    val df = Readers.jsonDocumentFile(spark, s"$data/james-bond.json")
    assert(df.count() > 20)
    assert(df.columns.contains("Movie") && df.columns.contains("Year"))
    val r = df.selectExpr("min(Year)", "max(Year)").collect().head
    assert(r.getLong(0) >= 1960 && r.getLong(1) <= 2025)
  }

  test("james-bond.json through a JSONPath slice") {
    val df = Readers.jsonDocumentFile(spark, s"$data/james-bond.json",
      IngestOptions(jsonPath = Some("$[*]")))
    assert(df.count() > 20)
  }

  test("popular-names.avro reads via spark-avro") {
    val df = Readers.avro(spark, s"$data/popular-names.avro")
    assert(df.count() > 0)
    assert(df.columns.nonEmpty)
  }

  test("delta-table: log replay reads latest version") {
    val df = DeltaReader.read(spark, s"$data/delta-table")
    assert(df.columns.toSeq == Seq("data"))
    assert(df.count() > 0)
  }

  test("delta-table: time travel to version 0 differs from version 1") {
    val v0 = DeltaReader.read(spark, s"$data/delta-table", Some(0L))
      .collect().map(_.getLong(0)).sorted.toSeq
    val v1 = DeltaReader.read(spark, s"$data/delta-table", Some(1L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v0.nonEmpty && v1.nonEmpty)
    assert(v0 != v1, s"versions should differ: v0=$v0 v1=$v1")
    // version beyond the log rejected
    intercept[IllegalArgumentException](
      DeltaReader.read(spark, s"$data/delta-table", Some(99L)))
  }
}
