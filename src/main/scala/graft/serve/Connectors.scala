package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector registry — the Spark-native answer to the reference's
  * Python *datasource* plugins (`lib/src/data_source/
  * connector_plugin.rs:19-106`): a datasource whose `location` uses
  * a non-built-in URI scheme (the reference ships `excel://` and
  * `smb://` examples) dispatches to the connector registered for
  * that scheme instead of a file reader.
  *
  * Where the reference calls a Python `main(format, authority, path,
  * schema, **kwargs)` returning pyarrow data, an embedder here
  * registers a Scala function returning a DataFrame — so a custom
  * source stays a lazy plan (pushdown-capable if the connector
  * builds on a real Spark source) rather than a driver-side
  * materialized batch. The registry is the extension point; built-in
  * schemes (file/http/https/s3a/…) never consult it.
  */
object Connectors {

  /** (session, parsed location, dataSource options+pluginOptions,
    * declared schema JSON if any) → frame.
    */
  type Connector =
    (SparkSession, java.net.URI, Map[String, JsonNode], Option[String]) => DataFrame

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Connector]()

  /** Schemes the normal ingest paths own; a connector may not shadow
    * them (same rule as the reference's SupportedScheme list,
    * `data_source/location/uri.rs`).
    */
  private val builtinSchemes = Set(
    "file", "http", "https", "hdfs", "viewfs", "dbfs",
    "s3", "s3a", "s3n", "gs", "oss",
    "abfs", "abfss", "wasb", "wasbs")

  def register(scheme: String, c: Connector): Unit = {
    val s = scheme.toLowerCase
    require(!builtinSchemes.contains(s), s"scheme $s is built in")
    registry.put(s, c): Unit
  }

  /** The connector for a location's scheme, when one is registered.
    * Absolute paths / built-in schemes / unparseable URIs → None
    * (normal ingest handles or rejects them).
    */
  def forLocation(location: String): Option[(String, Connector)] =
    try {
      Option(java.net.URI.create(location).getScheme)
        .map(_.toLowerCase)
        .filterNot(builtinSchemes.contains)
        .flatMap(s => Option(registry.get(s)).map(s -> _))
    } catch { case _: IllegalArgumentException => None }
}
