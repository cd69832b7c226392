package graft.core

/** Per-document merge of candidate table fragments — port of the reference's
  * `merge_tables` (reference: src/v3_stable/step_3_merge_tables.py:12-31):
  *
  *   1. take the ordered page list of the doc's candidate tables,
  *   2. select the longest consecutive page run ([[LongestRun]], M1),
  *   3. [[TablePreprocessor]] each selected fragment (M3),
  *   4. vertically concatenate in page order (M2) aligning on column NAMES —
  *      pandas `pd.concat(axis=0)`: union of columns, first frame's column
  *      order first, unseen columns appended in encounter order, missing
  *      cells -> null,
  *   5. record merged_tables_count / merged_rows_count (INCLUDES the header
  *      row: len(df2data(df))) / start/end page.
  */
object TableMerger {

  /** A table body with its header row still at index 0. */
  type Table = Vector[Vector[String]]

  final case class Merged(
      data: Table,
      mergedTablesCount: Int,
      mergedRowsCount: Int,
      startPage: Int,
      endPage: Int)

  /** (columns, rows) pair — the pandas DataFrame analog. */
  private final case class Frame(columns: Vector[String], rows: Vector[Vector[String]])

  private def data2frame(data: Table): Frame = Frame(data.head, data.tail)

  private def concat(a: Frame, b: Frame): Frame = {
    if (a.columns == b.columns) Frame(a.columns, a.rows ++ b.rows)
    else {
      // union by name, keep-first order (pandas concat sort=False)
      val union = (a.columns ++ b.columns).distinct
      def align(f: Frame): Vector[Vector[String]] = {
        val idx = union.map(c => f.columns.indexOf(c))
        f.rows.map(r => idx.map(i => if (i >= 0 && i < r.length) r(i) else null))
      }
      Frame(union, align(a) ++ align(b))
    }
  }

  /** @param tables (page, rawData) per candidate table, in extraction order
    *               (ascending page). Requires nonEmpty (step_3:14 assert). */
  def merge(tables: Seq[(Int, Table)]): Merged = {
    require(tables.nonEmpty, "merge requires at least one candidate table")
    val allPages = tables.map(_._1)
    val runIdx = LongestRun.findLongestSubsequence(allPages)
    val startPage = allPages(runIdx.head)
    val endPage = allPages(runIdx.last)
    val frames = runIdx.map(i => data2frame(TablePreprocessor.preprocessArray(tables(i)._2)))
    val merged = frames.reduceLeft(concat)
    val data = merged.columns +: merged.rows
    Merged(data, frames.length, data.length, startPage, endPage)
  }
}
