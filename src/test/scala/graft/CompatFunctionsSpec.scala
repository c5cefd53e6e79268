package graft

import graft.sqlcompat.CompatFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Every FunctionRegistry shim drives through spark.sql. */
class CompatFunctionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    CompatFunctions.registerAll(s)
    s
  }

  private def one(sql: String): Any = spark.sql(sql).collect().head.get(0)

  test("approx_distinct ~ count distinct") {
    spark.range(1000).createOrReplaceTempView("r1k")
    val v = one("SELECT approx_distinct(id) FROM r1k").asInstanceOf[Long]
    assert(v > 900 && v < 1100)
  }

  test("approx_percentile_cont") {
    val v = one("SELECT approx_percentile_cont(id, 0.5) FROM r1k")
    assert(v.toString.toDouble > 400 && v.toString.toDouble < 600)
  }

  test("sha256 hex matches sha2") {
    assert(one("SELECT sha256('abc')") == one("SELECT sha2('abc', 256)"))
  }

  test("iszero") {
    assert(one("SELECT iszero(0)") == true)
    assert(one("SELECT iszero(3)") == false)
  }

  test("to_unixtime") {
    assert(one("SELECT to_unixtime(TIMESTAMP '1970-01-01 00:01:00')") == 60L)
  }

  test("strpos keeps DataFusion argument order (string, substring)") {
    assert(one("SELECT strpos('graft', 'af')") == 3)
    assert(one("SELECT strpos('graft', 'zz')") == 0)
  }

  test("generate_series two and three args") {
    assert(one("SELECT generate_series(1, 5)") ==
      scala.collection.immutable.ArraySeq(1, 2, 3, 4, 5))
    assert(one("SELECT generate_series(0, 10, 5)") ==
      scala.collection.immutable.ArraySeq(0, 5, 10))
  }

  test("date_bin two-arg bins from the epoch") {
    assert(one("SELECT CAST(date_bin(3600, TIMESTAMP '2024-05-06 07:40:40') AS STRING)")
      == "2024-05-06 07:00:00")
  }

  test("date_bin three-arg honors the origin") {
    // origin 00:30, stride 1h => bins land on half hours
    assert(one("SELECT CAST(date_bin(3600, TIMESTAMP '2024-05-06 07:40:40', TIMESTAMP '2024-05-06 00:30:00') AS STRING)")
      == "2024-05-06 07:30:00")
  }

  test("date_bin floors correctly below the origin") {
    assert(one("SELECT CAST(date_bin(3600, TIMESTAMP '1969-12-31 23:10:00') AS STRING)")
      == "1969-12-31 23:00:00")
  }

  test("registration never overwrites a builtin") {
    // `sequence` is builtin; registerAll must leave it intact
    assert(one("SELECT sequence(1, 3)") ==
      scala.collection.immutable.ArraySeq(1, 2, 3))
  }

  test("to_hex renders lowercase like DataFusion") {
    assert(one("SELECT to_hex(255)") == "ff")
    assert(one("SELECT to_hex(171)") == "ab")
  }

  test("arrow_cast maps Arrow type names onto Spark casts") {
    assert(one("SELECT arrow_cast(7, 'Float64')") == 7.0)
    assert(one("SELECT arrow_cast('42', 'Int64')") == 42L)
    assert(one("SELECT arrow_cast(1, 'Boolean')") == true)
    assert(one("SELECT typeof(arrow_cast(TIMESTAMP '2024-01-01 00:00:00', 'Timestamp(Microsecond, None)'))")
      == "timestamp_ntz")
    assert(one("""SELECT typeof(arrow_cast(TIMESTAMP '2024-01-01 00:00:00', 'Timestamp(Microsecond, Some("UTC"))'))""")
      == "timestamp")
  }

  test("array_has family and element/length shims") {
    assert(one("SELECT array_has(array(1,2,3), 2)") == true)
    assert(one("SELECT array_has(array(1,2,3), 9)") == false)
    assert(one("SELECT array_has_any(array(1,2), array(2,5))") == true)
    assert(one("SELECT array_has_all(array(1,2,3), array(1,3))") == true)
    assert(one("SELECT array_has_all(array(1,2,3), array(1,9))") == false)
    assert(one("SELECT array_length(array(1,2,3))") == 3)
    assert(one("SELECT array_element(array(10,20,30), 2)") == 20)
  }

  test("vector kernels are SQL-callable and match the Column API") {
    val sim = one(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))")
    assert(sim == 1.0)
    assert(one("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))") == 11.0)
    assert(one("SELECT l2_norm(array(3.0D, 4.0D))") == 5.0)
    // same expression class the pipeline compiles to — spot-check SQL
    // vs Column on a real embedding row
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    emb.createOrReplaceTempView("emb_fn_check")
    val viaSql = spark.sql(
      """SELECT cosine_similarity(a.embedding, b.embedding) FROM
         emb_fn_check a JOIN emb_fn_check b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect().head.getDouble(0)
    val viaCol = {
      import org.apache.spark.sql.functions._
      val a = emb.where(col("vec_id") === 0).select(col("embedding").as("ea"))
      val b = emb.where(col("vec_id") === 1).select(col("embedding").as("eb"))
      a.crossJoin(b)
        .select(graft.functions.VectorExpressions.cosine(col("ea"), col("eb")))
        .collect().head.getDouble(0)
    }
    assert(viaSql == viaCol, "SQL and Column routes must agree bit-for-bit")
  }

  test("shingle_hashes is SQL-callable with a literal n") {
    val arr = spark.sql("SELECT shingle_hashes('a b c d', 2)")
      .collect().head.getSeq[Long](0)
    assert(arr.length == 3, s"3 distinct bigrams expected: $arr")
    val err = intercept[Exception](
      spark.sql("SELECT shingle_hashes('a b', len('xy'))").collect())
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
