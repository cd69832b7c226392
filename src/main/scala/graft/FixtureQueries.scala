package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.layout.{FixtureCorpus, SpanDoc}
import graft.pipeline.ExtractionPipeline

/** Driver-facing queries over the deterministic fixture corpus (the
  * extraction pipeline's own inputs — the driver's TPC-H-ish tables carry no
  * span documents, so the corpus is synthesized in-code; see FIXTURES.md).
  *
  * Oracles: x04 re-derives the publish month from the raw page-1 texts with
  * a pure-SQL regex chain (real independent logic); the others are
  * hand-reviewed golden VALUES pinned from the verified pipeline output
  * (golden tests — the fixture corpus is frozen, so any behavior drift
  * breaks the compare).
  */
object FixtureQueries {

  // the pipeline is pure and the corpus fixed; memoize per session
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, ExtractionPipeline.Result]()

  def result(spark: SparkSession): ExtractionPipeline.Result =
    cache.computeIfAbsent(spark, s => {
      import s.implicits._
      ExtractionPipeline.run(s, s.createDataset(FixtureCorpus.fixtureDocs))
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_fixture_stats" -> ((s, _) =>
      result(s).stats.toDF().select(
        col("doc_id"), col("page_size"), col("criterion_tables_count"),
        col("merged_tables_count"), col("merged_rows_count"),
        col("merged_table_start_page"), col("merged_table_end_page"),
        col("publish_month"))),
    "x02_fixture_corpus" -> ((s, _) =>
      result(s).corpus.select(
        col("doc_ord"), col("row_idx"), col("Criterion"), col("FileName"),
        col("Rating"), col("SummaryAssessment"))),
    "x03_fixture_pivot" -> ((s, _) => result(s).pivot),
    "x04_fixture_month" -> ((s, _) =>
      result(s).stats.toDF().select(col("doc_id"), col("publish_month"))),
    "x05_fixture_spans" -> ((s, _) =>
      result(s).outSpans.toDF().select(
        col("doc_id"), col("ord"), col("kind"), col("text"), col("media_ref"))),
    "x06_fixture_candidates" -> ((s, _) => {
      import s.implicits._
      result(s).candidates
        .map(c => (c.doc_id, c.page, c.raw_data.length, c.headers.mkString("|")))
        .toDF("doc_id", "page", "n_rows", "headers")
    }))

  /** VALUES literal of (doc_id, page-1 text) straight from the INPUT corpus
    * — independent of the pipeline, so x04 is a genuine logic oracle. */
  private def page1Values: String = {
    def q(s: String): String =
      if (s == null) "NULL" else "'" + s.replace("'", "''") + "'"
    FixtureCorpus.fixtureDocs.map { d =>
      s"(${q(d.doc_id)}, ${q(SpanDoc.firstPageText(d.spans))})"
    }.mkString(",\n  ")
  }

  def oracleSql: Map[String, String] = Map(
    "x04_fixture_month" ->
      s"""WITH page1(doc_id, text) AS (VALUES
         |  $page1Values)
         |SELECT doc_id, ${SparkEntry.monthSql("text")} AS publish_month FROM page1""".stripMargin
  ) ++ FixtureGoldens.oracleSql
}
