package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex-replace structured
  * identifiers with typed placeholder tokens — the standard
  * pre-tokenization redaction pass.
  *
  * Patterns stay in the RE2-compatible subset (no backrefs or
  * lookaround) so the same rules run identically on engines with
  * either regex flavor. Pure per-row `regexp_replace` chain: codegen,
  * no shuffle, scan-speed at any corpus size.
  */
object TextRedaction {

  /** (pattern, replacement) applied in order — most specific first:
    * the loose phone pattern would otherwise consume the leading
    * digits of card/SSN shapes.
    */
  val defaultRules: Seq[(String, String)] = Seq(
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("""\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("""\b(?:\d[ -]?){13,16}\b""", "<CARD>"),
    ("""\b(?:\d{1,3}\.){3}\d{1,3}\b""", "<IP>"),
    ("""\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}""", "<PHONE>"),
  )

  def scrubColumn(text: Column,
      rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Scrubbed frame plus a per-document count of redactions (how
    * many placeholder tokens the rules inserted).
    */
  def scrub(docs: DataFrame, textCol: String,
      rules: Seq[(String, String)] = defaultRules,
      outCol: String = "scrubbed"): DataFrame = {
    val out = scrubColumn(col(textCol), rules)
    val placeholders = rules.map(_._2).distinct
    // count placeholders ADDED by this pass: occurrences in the
    // scrubbed text minus occurrences already in the source (a doc
    // that literally contains "<EMAIL>", or a re-scrub of an already
    // scrubbed corpus, must not inflate the redaction rate)
    def occurrences(c: Column, p: String): Column =
      (length(c) - length(replace(c, lit(p), lit("")))) / p.length
    val nRedacted = placeholders.map { p =>
      occurrences(col(outCol), p) - occurrences(col(textCol), p)
    }.reduce(_ + _)
    docs.withColumn(outCol, out)
      .withColumn("n_redactions", nRedacted.cast("long"))
  }
}
