package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.CriterionTaxonomy
import graft.layout._

/** End-to-end Spark orchestration of the extraction pipeline.
  *
  * Lifecycle (mirrors the reference's v3 steps, SURVEY.md §3.1), Spark-shaped:
  *
  *   docs ──mapPartitions(Extract.extractDoc)──► ExtractResult       (narrow)
  *        ├─► stats  (Dataset[PaperStat])                            (narrow)
  *        └─► candidates ──groupByKey(doc_id)──mapGroups(Merge)──►   (1 shuffle,
  *            MergedDoc — only the small candidate tables shuffle,    tiny rows)
  *            never the raw documents
  *   merged ──flatMap(CorpusSheet.sheetRows)──► sheet rows           (narrow)
  *          ──map-column expansion over the distinct column names──► corpus DF
  *   corpus ──fuzzy L1 + ffill window + row_number──► pivot DF
  *   merged+media ──► ordered output span sequences (the equality contract)
  *
  * The only mandatory shuffle is the per-doc groupBy of candidates; the
  * corpus/pivot stages run at "sheet scale" (rows = extracted table rows,
  * orders of magnitude smaller than the corpus). The ffill/No. window is
  * intentionally global-ordered — the reference's semantics (pandas implicit
  * row order, step_5_pivot_table.py:78-85) REQUIRE one total order; at true
  * 10^12 scale this column would be computed per-doc with per-doc offsets
  * (two-pass zipWithIndex-style), which we keep out of v1 because the sheet
  * is small by construction.
  */
object ExtractionPipeline {

  final case class MediaSpan(doc_id: String, page: Int, media_ref: String,
      alt: String, offset: Int)

  final case class OutSpan(doc_id: String, ord: Int, kind: String, text: String,
      media_ref: String)

  final case class Result(
      stats: Dataset[PaperStat],
      candidates: Dataset[CandidateTable],
      merged: Dataset[MergedDoc],
      corpus: DataFrame,
      pivot: DataFrame,
      outSpans: Dataset[OutSpan])

  def run(spark: SparkSession, docs: Dataset[DocRow]): Result = {
    import spark.implicits._

    // ---- extract (steps 1+2+6 fused; one parse per document)
    val extracted = docs.mapPartitions(_.map(Extract.extractDoc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = extracted.flatMap(_.candidates)

    // ---- merge (step_3): the one shuffle, on doc_id, candidate rows only
    val merged: Dataset[MergedDoc] = candidates
      .groupByKey(_.doc_id)
      .mapGroups((docId, it) => Merge.mergeDoc(docId, it))

    // ---- stats join-back (per-paper write-back in step_3:40-47)
    val mergedInfo = merged.map(m => (m.doc_id, m.merged_tables_count,
      m.merged_rows_count, m.merged_table_start_page, m.merged_table_end_page))
      .toDF("m_doc_id", "m_tables", "m_rows", "m_start", "m_end")
    val stats = extracted.map(_.stat).toDF()
      .join(broadcast(mergedInfo), $"doc_id" === $"m_doc_id", "left")
      .select(
        $"doc_id", $"doc_ord", $"file_size", $"page_size",
        $"criterion_tables_count",
        $"m_tables".as("merged_tables_count"),
        $"m_rows".as("merged_rows_count"),
        $"m_start".as("merged_table_start_page"),
        $"m_end".as("merged_table_end_page"),
        $"publish_month", $"publish_month_verified")
      .as[PaperStat]

    // ---- corpus sheet (step_4)
    val sheetRows = merged.flatMap(CorpusSheet.sheetRows)
    val corpus = corpusFrame(spark, sheetRows)

    // ---- pivot (step_5)
    val pivot = pivotFrame(spark, corpus)

    // ---- output span sequences (the per-doc equality contract)
    val media = docs.flatMap { d =>
      SpanDoc.pages(d.spans).flatMap(p => p.spans.collect {
        case s if s.kind == "media" => MediaSpan(d.doc_id, p.number, s.media_ref, s.text, s.offset)
      })
    }
    val outSpans = merged
      .joinWith(media, merged("doc_id") === media("doc_id"), "left")
      .groupByKey(_._1.doc_id)
      .flatMapGroups { (_, it) =>
        val rows = it.toVector
        val m = rows.head._1
        val mediaSpans = rows.flatMap(r => Option(r._2))
        outputSpans(m, mediaSpans)
      }

    Result(stats, candidates, merged, corpus, pivot, outSpans)
  }

  /** Ordered output spans for one document: the merged table cells row-major
    * as text spans (header row included), then the media spans of the
    * merged page range in original document order. */
  def outputSpans(m: MergedDoc, media: Seq[MediaSpan]): Seq[OutSpan] = {
    var ord = 0
    val out = Vector.newBuilder[OutSpan]
    m.data.foreach(_.foreach { cell =>
      out += OutSpan(m.doc_id, ord, "text", cell, null); ord += 1
    })
    media.filter(s => s.page >= m.merged_table_start_page &&
        s.page <= m.merged_table_end_page)
      .sortBy(_.offset)
      .foreach { s =>
        out += OutSpan(m.doc_id, ord, "media", s.alt, s.media_ref); ord += 1
      }
    out.result()
  }

  /** Cross-document half of step_4: union of all present column names,
    * sorted alphabetically (step_4_dump_tables.py:80), missing -> null.
    * Only the distinct column NAMES are collected to the driver (a bounded
    * vocabulary); the rows stay distributed. */
  def corpusFrame(spark: SparkSession,
      rows: Dataset[CorpusSheet.SheetRow]): DataFrame = {
    import spark.implicits._
    val persisted = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val colNames = persisted.flatMap(_.cells.keysIterator.toSeq).distinct()
      .collect().sorted
    val cols = Seq($"doc_ord", $"row_idx") ++
      colNames.map(n => element_at($"cells", n).as(n))
    persisted.select(cols: _*)
  }

  /** step_5: fuzzy L1, L2 derivation, global forward-fill, 1-based No. */
  def pivotFrame(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val matchL1 = udf((s: String) => Option(CriterionTaxonomy.matchL1(s)))
    val w = Window.orderBy("doc_ord", "row_idx")
    val ffillW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    corpus
      .withColumn("L1_raw", matchL1(col("Criterion")))
      // L2 = '' when Criterion equals the matched L1, else Criterion
      // (NaN == x is False in pandas, so null Criterion keeps null L2)
      .withColumn("L2", when(col("Criterion") === col("L1_raw"), lit(""))
        .otherwise(col("Criterion")))
      .withColumn("L1", last("L1_raw", ignoreNulls = true).over(ffillW))
      .withColumn("No.", row_number().over(w))
      .select(col("`No.`"), col("FileName"), col("L1"), col("L2"),
        col("SummaryAssessment"), col("Rating"))
  }
}
