package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Direct Spark-vs-DuckDB fuzz for the round-10 portability-sensitive
  * operators, on ADVERSARIAL text the word-shaped generated corpora
  * never produce: mixed whitespace including U+000B (the exact byte
  * where Java's `\s` and RE2's diverge — the reason readability
  * spells its whitespace class out), sentence punctuation runs,
  * combining marks in random composition states, and multi-byte
  * codepoints. Both engines read the SAME parquet and must agree
  * bit-for-bit — doubles included (fixed-order IEEE arithmetic).
  */
// Seeded cross-engine fuzz — the generative re-verification class
// (r9 item #8); full gate unchanged.
@org.scalatest.tags.Slow
class Round10CrossEngineFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def adversarialDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val atoms: IndexedSeq[String] = IndexedSeq(
      " ", "\t", "\n", "\u000B", "\f", "\r", "  ", ".", "!", "?", "...",
      "??!",
      "e\u0301", "A\u030A", "o\u0302\u0301", // decomposed
      "\u00E9", "\u00C5", "\u00E7",           // composed
      "\u1E9B", "\uAC00", "\u317E",           // exclusion, Hangul, jamo
      "w\u00F6rd", "plain", "the", "aa", "b", "Zz",
      "mid.dle", "end!", "(par)", "123")
    (0 until n).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => atoms(rnd.nextInt(atoms.size))).mkString)
    }
  }

  test("readability and nfcReport agree with DuckDB on adversarial text") {
    import spark.implicits._
    val docs = adversarialDocs(0xadf05eedL, 120)
    val dir = java.nio.file.Files.createTempDirectory("graft_xeng").toString
    val duck = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/adv.parquet")
      duck.createStatement().execute(
        s"CREATE VIEW adv AS SELECT * FROM read_parquet('$dir/adv.parquet/*.parquet')")

      // ---- readability: identical regex classes, fixed-order IEEE grade
      val sparkRead = TextAnalysis.readability(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          java.lang.Double.doubleToRawLongBits(r.getDouble(4))))).toMap
      val rs = duck.createStatement().executeQuery("""
        WITH c AS (SELECT doc_id,
            length(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS n_words,
            length(regexp_extract_all(text, '[.!?]+')) AS n_sents,
            length(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
          FROM adv)
        SELECT doc_id, CAST(n_words AS BIGINT), CAST(n_sents AS BIGINT),
          CAST(n_syll AS BIGINT),
          0.39 * (CAST(n_words AS DOUBLE) / CAST(GREATEST(n_sents, 1) AS DOUBLE)) +
          11.8 * (CAST(n_syll AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)) -
          15.59
        FROM c""")
      var checked = 0
      while (rs.next()) {
        val id = rs.getLong(1)
        val duckRow = (rs.getLong(2), rs.getLong(3), rs.getLong(4),
          java.lang.Double.doubleToRawLongBits(rs.getDouble(5)))
        assert(sparkRead(id) == duckRow,
          s"readability drift doc $id: spark=${sparkRead(id)} duck=$duckRow " +
            s"text='${docs(id.toInt)._2.take(60)}'")
        checked += 1
      }
      assert(checked == docs.size)

      // ---- NFC: two independent UAX#15 implementations, md5-pinned
      val sparkNfc = TextAnalysis.nfcReport(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getString(4)))).toMap
      val rs2 = duck.createStatement().executeQuery("""
        SELECT doc_id, CAST(length(text) AS BIGINT),
          CAST(length(nfc_normalize(text)) AS BIGINT),
          text <> nfc_normalize(text), md5(nfc_normalize(text))
        FROM adv""")
      var checked2 = 0
      while (rs2.next()) {
        val id = rs2.getLong(1)
        val duckRow = (rs2.getLong(2), rs2.getLong(3),
          rs2.getBoolean(4), rs2.getString(5))
        assert(sparkNfc(id) == duckRow,
          s"nfc drift doc $id: spark=${sparkNfc(id)} duck=$duckRow " +
            s"text='${docs(id.toInt)._2.take(60)}'")
        checked2 += 1
      }
      assert(checked2 == docs.size)
      // the generator plants decomposed sequences — some rows must change
      assert(sparkNfc.values.exists(_._3), "fuzz corpus must exercise NFC")
    } finally {
      duck.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
