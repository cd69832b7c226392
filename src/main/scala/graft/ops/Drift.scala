package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-batch corpus drift profiling: vocabulary novelty and length
  * drift per batch — the monitoring pass a continuously-crawled training
  * corpus runs per ingest so a scrape gone wrong (a new boilerplate
  * flood, a language shift, a truncation bug upstream) is visible BEFORE
  * the batch reaches dedup/curation. The reference's analog is the
  * per-run stat sheet it writes after every corpus pass
  * (`/root/reference/src/v3_stable/step_7_dump_stat_sheet.py:9-16` — one
  * profile row per document per run); this is the same idea lifted to
  * batch granularity over an append-only corpus.
  *
  * Novelty is exact, not sketched: token `w` is NOVEL in the first batch
  * that contains it (min-batch election over the distinct (batch, token)
  * set). A healthy crawl's novelty rate decays batch over batch; a flat
  * or rising rate means the source mix changed.
  *
  * Scale shape (100 TB): the corpus-scale pass is the per-batch DISTINCT
  * over (batch, token) — word-count shape, scalar 2-column shuffle with
  * map-side partial dedup, never carrying document text. Everything
  * after is vocabulary-scale: the min-batch election and the batch
  * re-join both key on the token string. Ratios are integral microunits
  * (`div`, exact on both engines) per the repo convention.
  */
object Drift {

  /** One row per batch (batch = doc_id mod nBatches — deterministic stand-in
    * for an ingest-time partition column):
    * (batch, n_docs, n_tokens, avg_tokens_micro, vocab_size, novel_terms,
    *  novelty_micro). */
  def vocabDrift(docs: DataFrame, nBatches: Int = 4): DataFrame = {
    require(nBatches >= 1, s"need at least one batch, got $nBatches")
    val batch = pmod(col("doc_id"), lit(nBatches.toLong)).cast("long")
    // distinct (batch, token): the one corpus-scale shuffle
    val bt = docs
      .select(batch.as("batch"), explode(Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    // vocab-scale: first batch to see each token
    val first = bt.groupBy("w").agg(min("batch").as("first_batch"))
    val vocab = bt.join(first, "w")
      .groupBy("batch").agg(
        count(lit(1)).as("vocab_size"),
        sum(when(col("first_batch") === col("batch"), 1L).otherwise(0L))
          .as("novel_terms"))
    val lens = docs
      .select(batch.as("batch"),
        size(filter(Dedup.tokens(col("text")), t => t =!= ""))
          .cast("long").as("n"))
      .groupBy("batch").agg(
        count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
    lens.join(vocab, Seq("batch"))
      .select(col("batch"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 div n_docs").as("avg_tokens_micro"),
        col("vocab_size"), col("novel_terms"),
        expr("novel_terms * 1000000 div vocab_size").as("novelty_micro"))
  }

  /** [[vocabDrift]] replayed in DuckDB SQL over table `documents`. */
  def vocabDriftSql(nBatches: Int = 4): String =
    s"""WITH bt AS (
       |  SELECT DISTINCT ((doc_id % $nBatches) + $nBatches) % $nBatches AS batch, tok AS w
       |  FROM (
       |    SELECT doc_id,
       |      unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
       |    FROM documents) t
       |  WHERE tok <> ''),
       |first AS (SELECT w, min(batch) AS first_batch FROM bt GROUP BY 1),
       |vocab AS (
       |  SELECT batch, count(*) AS vocab_size,
       |    sum(CASE WHEN first_batch = batch THEN 1 ELSE 0 END) AS novel_terms
       |  FROM bt JOIN first USING (w) GROUP BY 1),
       |lens AS (
       |  SELECT ((doc_id % $nBatches) + $nBatches) % $nBatches AS batch,
       |    count(*) AS n_docs,
       |    sum(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> x <> ''))) AS n_tokens
       |  FROM documents GROUP BY 1)
       |SELECT CAST(batch AS BIGINT) AS batch,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens * 1000000 // n_docs AS BIGINT) AS avg_tokens_micro,
       |  CAST(vocab_size AS BIGINT) AS vocab_size,
       |  CAST(novel_terms AS BIGINT) AS novel_terms,
       |  CAST(novel_terms * 1000000 // vocab_size AS BIGINT) AS novelty_micro
       |FROM lens JOIN vocab USING (batch)""".stripMargin
}
