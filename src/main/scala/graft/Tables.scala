package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Helpers to load the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * All tables are plain parquet. `events.ts` is written as parquet
  * TIMESTAMP(NANOS) which Spark's vectorized reader rejects by default
  * ([PARQUET_TYPE_ILLEGAL]); we read it via the
  * `spark.sql.legacy.parquet.nanosAsLong` conf and convert to a µs
  * timestamp with integer division (truncation — the same semantics as
  * DuckDB's TIMESTAMP_NS → TIMESTAMP cast, so oracle comparisons line
  * up exactly).
  */
object Tables {

  /** Only the pipeline corpora (documents/embeddings) fan out when
    * the file arrives under-split (single row group = one partition):
    * their per-row work (regex, shingle/sketch kernels, N² vector
    * loops) dwarfs a small repartition. Relational tables do NOT —
    * partial aggregation collapses them before the first exchange, so
    * a pre-shuffle of raw rows costs more than the single-core scan
    * it parallelizes, and dimension tables are broadcast sides.
    */
  private val factTables = Set("documents", "embeddings")

  /** Load a raw table. Caller owns any post-processing. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = name match {
      case "events" => events(spark, sfDir)
      case _        => spark.read.parquet(s"$sfDir/$name.parquet")
    }
    if (factTables(name)) graft.ops.ScaleOps.fanOut(df) else df
  }

  /** events with `ts` as a proper TimestampType (µs, truncated from ns).
    * Keeps the raw nanosecond count as `ts_ns` for precision-sensitive
    * consumers.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
