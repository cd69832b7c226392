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
    * merged concat introduced a missing cell). row_idx == -1 marks the
    * per-document HEADER SENTINEL: it carries the document's kept column
    * names (keys only) and no data — the reference tracks `all_columns`
    * from every processed table even when it has ZERO body rows
    * (step_4:66, `all_columns.update(paper_df.columns)`), so the corpus
    * column vocabulary must see empty tables too. corpusFrame folds the
    * sentinels into the vocabulary and drops them from the output. */
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
    val sentinel = SheetRow(m.doc_id, m.doc_ord, -1,
      selected.map { case (name, _) => name -> (null: String) }.toMap +
        ("FileName" -> (null: String)))
    // note: a degenerate [[],[]] merged table flows through the generic path
    // as one empty row carrying only FileName (pandas DataFrame([[]]) has
    // shape (1,0)); a header-only table contributes zero data rows but its
    // columns still enter the vocabulary via the sentinel
    val body = data.tail
    sentinel +: body.iterator.zipWithIndex.map { case (row, idx) =>
      val cells = selected.map { case (name, i) =>
        name -> (if (i < row.length) row(i) else null)
      }.toMap + ("FileName" -> m.doc_id)
      SheetRow(m.doc_id, m.doc_ord, idx, cells)
    }.toSeq
  }
}
