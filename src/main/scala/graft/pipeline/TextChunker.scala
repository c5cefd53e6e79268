package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split each document
  * into fixed-size token windows with a configurable stride
  * (stride < window ⇒ overlapping chunks, the usual shape for context
  * windows fed to an LLM tokenizer downstream).
  *
  * Pure per-row expression work (split → slice → join) inside the
  * scan stage: no shuffle, no UDFs — a 100 TB corpus chunks at scan
  * speed and each output chunk carries (doc id, chunk id) provenance.
  * Chunk boundaries are token-exact and deterministic: chunk i covers
  * tokens [i·stride, i·stride + window); the last chunk may be
  * shorter; every document produces ⌊(n−1)/stride⌋ + 1 chunks (n ≥ 1
  * — `split` never returns an empty array).
  */
object TextChunker {

  def chunk(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0,
      "window and stride must be positive")
    val toks: Column = split(col(textCol), " ")
    val lastChunk = ((size(toks) - lit(1)) / lit(strideTokens)).cast("int")
    val chunks = transform(
      sequence(lit(0), lastChunk),
      i => slice(toks, i * strideTokens + 1, lit(windowTokens)))
    graft.ops.ScaleOps.fanOut(docs)
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk_toks")))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(col("chunk_toks"), " ").as("chunk_text"),
        size(col("chunk_toks")).cast("long").as("n_tokens"))
  }
}
