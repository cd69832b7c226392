package graft.pipeline

import graft.core.TableMerger
import graft.layout.{CandidateTable, PaperStat}

/** Per-document merged criterion table — the reference's step_3 output
  * written onto the Paper row (step_3_merge_tables.py:12-31). */
final case class MergedDoc(
    doc_id: String,
    doc_ord: Long,
    data: Array[Array[String]],
    merged_tables_count: Int,
    merged_rows_count: Int,
    merged_table_start_page: Int,
    merged_table_end_page: Int)

object Merge {

  /** Merge one document's candidate tables (requires nonEmpty — the Spark
    * stage filters criterion_tables_count > 0 first, mirroring
    * step_3_merge_tables.py:36-38). Candidates are re-sorted by (page, y)
    * because Spark group iterators carry no order guarantee; the reference
    * relied on insertion order = page scan order. */
  def mergeDoc(docId: String, candidates: Iterator[CandidateTable]): MergedDoc = {
    val sorted = candidates.toVector.sortBy(c => (c.page, c.bbox(1)))
    val merged = TableMerger.merge(
      sorted.map(c => (c.page, c.raw_data.map(_.toVector).toVector)))
    MergedDoc(
      doc_id = docId,
      doc_ord = sorted.head.doc_ord,
      data = merged.data.map(_.toArray).toArray,
      merged_tables_count = merged.mergedTablesCount,
      merged_rows_count = merged.mergedRowsCount,
      merged_table_start_page = merged.startPage,
      merged_table_end_page = merged.endPage)
  }

  /** Fold the merge results back onto the paper stats (what the reference's
    * per-paper commit does in step_3:40-47). */
  def updateStat(stat: PaperStat, merged: Option[MergedDoc]): PaperStat =
    merged match {
      case Some(m) => stat.copy(
        merged_tables_count = Some(m.merged_tables_count),
        merged_rows_count = Some(m.merged_rows_count),
        merged_table_start_page = Some(m.merged_table_start_page),
        merged_table_end_page = Some(m.merged_table_end_page))
      case None => stat
    }
}
