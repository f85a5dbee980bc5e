package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** LLM-data-pipeline extension operators (BASELINE.json north star):
  * deduplication, similarity search, text analysis, multimodal plumbing —
  * over the `documents` and `embeddings` testdata tables.
  *
  * Initial slice: exact dedup + token counting (both oracle-checkable).
  * The near-dup / ANN / language-ID family lands in graft.ext.
  */
object ExtensionQueries {

  /** Exact dedup: canonical row per distinct text = min(doc_id). A single
    * hash-aggregate shuffle on the text key; at 100 TB, dedup on a 64-bit
    * xxhash of the text instead of the full string halves shuffle bytes
    * (see graft.ext.Dedup for that variant). */
  val dedupExact = Q(
    "q_x_dedup_exact",
    "Exact dedup over documents.text (keep min doc_id)",
    (s, dir) => Sources.table(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text")),
    Some("SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"))

  /** Token counting: whitespace tokenization, codegen'd built-ins only. */
  val textTokens = Q(
    "q_x_text_tokens",
    "Token count per document (whitespace split)",
    (s, dir) => Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
        col("n_chars")),
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
           | FROM documents""".stripMargin.replace("\n", "")))

  val all: Seq[Q] = Seq(dedupExact, textTokens)
}
