package graft.sqlcompat

/** `CREATE EXTERNAL TABLE` — DataFusion DDL (parsed by
  * `datafusion/sql/src/parser.rs` `CreateExternalTable`) that the
  * reference exposes verbatim through its plain-`context.sql` door
  * (`lib/src/context/session.rs:664`): a client can register a table
  * over files by SQL alone. The session layer maps it to a LAZY Spark
  * scan bound as a session temp view + data-source record — pushdown
  * and column pruning reach the files exactly as for route-registered
  * sources, and nothing is read at DDL time.
  *
  * Subset recognized (the reference's documented surface):
  * `CREATE EXTERNAL TABLE [IF NOT EXISTS] name STORED AS fmt
  * [OPTIONS ('k' 'v', …)] LOCATION 'path'` with fmt one of
  * PARQUET | CSV | JSON | NDJSON | AVRO | ARROW. DataFusion's
  * `STORED AS JSON` means newline-delimited JSON — both spellings map
  * to the ndJSON reader. Column-definition lists, PARTITIONED BY and
  * WITH ORDER fall through to Spark's original parse error.
  *
  * Options honored: `format.has_header` (CSV; default true, matching
  * DataFusion's `datafusion.catalog.has_header` default) and
  * `format.delimiter` (CSV, single char).
  */
object ExternalTable {

  private val Create =
    ("""(?is)^\s*CREATE\s+EXTERNAL\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+STORED\s+AS\s+([A-Za-z]+)\s*""" +
      """(?:OPTIONS\s*\((.*?)\)\s*)?LOCATION\s+'([^']+)'\s*;?\s*$""").r

  private val OptionPair = """'([^']*)'\s+'([^']*)'""".r

  final case class Parsed(
      ifNotExists: Boolean,
      table: String,
      format: String,
      options: Map[String, String],
      location: String)

  def appliesTo(sql: String): Boolean = parse(sql).isDefined

  def parse(sql: String): Option[Parsed] =
    Create.findFirstMatchIn(sql).map { m =>
      val opts = Option(m.group(4)).map { text =>
        OptionPair.findAllMatchIn(text)
          .map(p => p.group(1).toLowerCase -> p.group(2)).toMap
      }.getOrElse(Map.empty)
      Parsed(m.group(1) != null, m.group(2), m.group(3).toUpperCase,
        opts, m.group(5))
    }
}
