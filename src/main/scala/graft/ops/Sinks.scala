package graft.ops

import org.apache.spark.sql.DataFrame

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}

/** File sinks (SURVEY §2.A16-A17).
  *
  * The reference writes query results as single files:
  * csv/ndjson/parquet via the engine's writers
  * (`lib/src/data_source/object_store/writer.rs:12-69`, parquet
  * snappy-compressed single file) and a JSON-*array* file writer
  * (`lib/src/context/session.rs:493-530`,
  * `local_fs/json_file.rs:12-29`).
  *
  * Under Spark, `coalesce(1)` reproduces the single-file contract;
  * at scale callers should drop the coalesce and let the writer
  * emit one file per partition instead (documented divergence knob).
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String,
      header: Boolean = true, delimiter: Char = ',', singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite")
      .option("header", header)
      .option("delimiter", delimiter.toString)
      .csv(path)

  /** ndJSON (the reference's `write_json`, writer.rs:38-42). */
  def writeNdJson(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").json(path)

  def writeParquet(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .parquet(path)

  /** JSON-array single file (`session.rs:493-530`): unlike ndJSON,
    * the output is one top-level JSON array. Driver-streamed through
    * the response encoder, so memory stays bounded.
    */
  def writeJsonArrayFile(df: DataFrame, path: String, overwrite: Boolean = false): Unit = {
    val p = Paths.get(path)
    if (!overwrite && Files.exists(p))
      throw new IllegalArgumentException(s"file exists: $path (overwrite=false)")
    Option(p.getParent).foreach(Files.createDirectories(_))
    val out = new FileOutputStream(path)
    try graft.serve.ResponseEncoders.writeJsonArray(df, out)
    finally out.close()
  }
}
