package graft

import graft.ops.Sinks
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def df = {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s")
  }

  test("csv sink writes a single file with header") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/csv"
    Sinks.writeCsv(df, dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).filter(_.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must produce a single part file")
    val content = Files.readString(Paths.get(files.head))
    assert(content.startsWith("id,s\n"))
  }

  test("json array sink writes one top-level array; overwrite guard") {
    val path = Files.createTempDirectory("graft-sink").toString + "/out.json"
    Sinks.writeJsonArrayFile(df.orderBy("id"), path)
    val content = Files.readString(Paths.get(path))
    assert(content == """[{"id":1,"s":"a"},{"id":2,"s":"b"}]""")
    intercept[IllegalArgumentException](Sinks.writeJsonArrayFile(df, path))
    Sinks.writeJsonArrayFile(df, path, overwrite = true) // succeeds
  }

  test("parquet sink round-trips") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/pq"
    Sinks.writeParquet(df, dir)
    assert(spark.read.parquet(dir).count() == 2)
  }
}
