package graft.pipeline

import graft.core.ColumnNormalizer

/** Corpus-sheet row derivation — the per-document half of the reference's
  * step_4 (step_4_dump_tables.py:33-96): normalize column names, keep
  * [Criterion, SummaryAssessment, Rating] ∩ existing (in that order), first
  * occurrence wins on duplicates, add FileName. The cross-document half
  * (union of all columns, sorted alphabetically, missing -> null) happens in
  * the Spark stage via a map-column expansion.
  */
object CorpusSheet {

  val KeptColumns: Vector[String] = Vector("Criterion", "SummaryAssessment", "Rating")

  /** One output row: present column -> value (value may be null when the
    * merged concat introduced a missing cell). */
  final case class SheetRow(
      doc_id: String,
      doc_ord: Long,
      row_idx: Int,
      cells: Map[String, String])

  def sheetRows(m: MergedDoc): Seq[SheetRow] = {
    val data = m.data
    if (data.isEmpty) return Nil // `if not table: continue` (step_4:46-47)
    val normalized = data.head.map(ColumnNormalizer.normalize).toVector
    // kept columns in KeptColumns order; first original occurrence per name
    val selected: Vector[(String, Int)] = KeptColumns.flatMap { k =>
      val i = normalized.indexOf(k)
      if (i >= 0) Some(k -> i) else None
    }
    // note: a degenerate [[],[]] merged table flows through the generic path
    // as one empty row carrying only FileName (pandas DataFrame([[]]) has
    // shape (1,0)); a header-only table contributes zero rows
    val body = data.tail
    if (body.isEmpty) return Nil
    body.iterator.zipWithIndex.map { case (row, idx) =>
      val cells = selected.map { case (name, i) =>
        name -> (if (i < row.length) row(i) else null)
      }.toMap + ("FileName" -> m.doc_id)
      SheetRow(m.doc_id, m.doc_ord, idx, cells)
    }.toSeq
  }
}
