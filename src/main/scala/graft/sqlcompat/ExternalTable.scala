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
  * `CREATE EXTERNAL TABLE [IF NOT EXISTS] name` followed by
  * `STORED AS fmt`, `LOCATION 'path'` and optional
  * `OPTIONS ('k' 'v', …)` clauses IN ANY ORDER — DataFusion 45's
  * parser accepts the clauses order-independently and its docs write
  * the canonical form OPTIONS-last (`… LOCATION path OPTIONS (…)`),
  * so pinning one order would reject the reference's own examples.
  * fmt is one of PARQUET | CSV | JSON | NDJSON | AVRO | ARROW.
  * DataFusion's `STORED AS JSON` means newline-delimited JSON — both
  * spellings map to the ndJSON reader. Column-definition lists,
  * PARTITIONED BY and WITH ORDER fall through to Spark's original
  * parse error.
  *
  * Options honored: `format.has_header` (CSV; default true, matching
  * DataFusion's `datafusion.catalog.has_header` default) and
  * `format.delimiter` (CSV, single char).
  */
object ExternalTable {

  private val Header =
    ("""(?is)^\s*CREATE\s+EXTERNAL\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+(.*?)\s*;?\s*$""").r

  // Tail clauses, each anchored at the current scan position; matched
  // repeatedly so STORED AS / OPTIONS / LOCATION compose in any order.
  private val StoredClause = """(?is)^STORED\s+AS\s+([A-Za-z]+)\s*(.*)$""".r
  private val LocationClause = """(?is)^LOCATION\s+'([^']+)'\s*(.*)$""".r

  private val OptionsHead = """(?is)^OPTIONS\s*\(""".r

  /** One single-quoted SQL string starting at or after `i0`
    * (whitespace skipped), with `''` as the escaped quote — returns
    * (unescaped value, index past the closing quote).
    */
  private def scanQuoted(s: String, i0: Int): Option[(String, Int)] = {
    var i = i0
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i >= s.length || s(i) != '\'') return None
    i += 1
    val sb = new StringBuilder
    while (i < s.length) {
      if (s(i) == '\'') {
        if (i + 1 < s.length && s(i + 1) == '\'') { sb += '\''; i += 2 }
        else return Some((sb.toString, i + 1))
      } else { sb += s(i); i += 1 }
    }
    None
  }

  /** Scan an `OPTIONS ('k' 'v', …)` clause off the head of `tail` by
    * walking the quoted pairs to the MATCHING close paren — a
    * non-greedy `\((.*?)\)` truncated the capture at the first `)`
    * inside a quoted value (e.g. `format.delimiter ')'`), leaving an
    * unparseable tail (ADVICE r10). Returns (pairs, rest) or None for
    * a malformed clause (→ Spark's original parse error, like
    * DataFusion's own failure mode).
    */
  private def scanOptions(tail: String): Option[(Map[String, String], String)] =
    OptionsHead.findFirstMatchIn(tail).flatMap { h =>
      var i = h.end
      val pairs = Map.newBuilder[String, String]
      var done = false
      var ok = true
      var first = true
      while (!done && ok) {
        var j = i
        while (j < tail.length && tail(j).isWhitespace) j += 1
        if (j < tail.length && tail(j) == ')') { i = j + 1; done = true }
        else {
          if (!first && j < tail.length && tail(j) == ',') j += 1
          (for {
            (k, j2) <- scanQuoted(tail, j)
            (v, j3) <- scanQuoted(tail, j2)
          } yield (k, v, j3)) match {
            case Some((k, v, j3)) =>
              pairs += (k.toLowerCase -> v); i = j3; first = false
            case None => ok = false
          }
        }
      }
      if (ok && done) Some((pairs.result(), tail.substring(i).stripLeading()))
      else None
    }

  /** Extractor form of [[scanOptions]] so the clause loop's guard and
    * body share one scan.
    */
  private object OptionsClause {
    def unapply(tail: String): Option[(Map[String, String], String)] =
      scanOptions(tail)
  }

  final case class Parsed(
      ifNotExists: Boolean,
      table: String,
      format: String,
      options: Map[String, String],
      location: String)

  def appliesTo(sql: String): Boolean = parse(sql).isDefined

  def parse(sql: String): Option[Parsed] =
    Header.findFirstMatchIn(sql).flatMap { m =>
      var tail = m.group(3)
      var format: Option[String] = None
      var location: Option[String] = None
      var options: Option[Map[String, String]] = None
      var stuck = false
      while (tail.nonEmpty && !stuck) {
        tail match {
          case StoredClause(fmt, rest) if format.isEmpty =>
            format = Some(fmt.toUpperCase); tail = rest
          case LocationClause(path, rest) if location.isEmpty =>
            location = Some(path); tail = rest
          case OptionsClause(parsed, rest) if options.isEmpty =>
            options = Some(parsed)
            tail = rest
          // unknown or duplicated clause: not our DDL — fall through
          // to Spark's original parse error
          case _ => stuck = true
        }
      }
      for (fmt <- format; loc <- location; if !stuck)
        yield Parsed(m.group(1) != null, m.group(2), fmt,
          options.getOrElse(Map.empty), loc)
    }
}
