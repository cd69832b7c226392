package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.MonthFinder
import graft.layout._

/** Skew handling for oversized documents (the north-rule requirement; the
  * reference's closest analog is the v2 80-page chunk split,
  * src/v2_llm/run_claude.py:59-82).
  *
  * A multi-hundred-page document must not monopolize one task or hold its
  * full span sequence in task memory during layout analysis. The salted
  * path:
  *
  *   1. splits each oversized document into page-range CHUNKS at page
  *      boundaries (narrow flatMap — chunk = rows of bounded size, so
  *      per-task layout state is bounded regardless of document size);
  *   2. extracts candidates and partial page stats per chunk independently
  *      (pages never interact during detection — table detection is
  *      per-page, so chunking at page boundaries is semantics-preserving);
  *   3. reduces the partial stats per doc_id (one shuffle of tiny rows) and
  *      lets the normal Merge stage group the candidates, which are small
  *      regardless of document size.
  *
  * Equivalence with the unsalted path is asserted in SaltedExtractSpec on
  * the fixture corpus (including the 200-page F14).
  */
object SaltedExtract {

  final case class Chunk(doc_id: String, chunk_idx: Int, isFirst: Boolean,
      spans: Seq[Span])

  /** Split a document into page-aligned chunks of at most `maxPages` pages,
    * slicing the ORIGINAL span sequence (markers and offsets intact). */
  def chunkDoc(doc: DocRow, maxPages: Int): Seq[Chunk] = {
    val sorted = doc.spans.sortBy(_.offset).toVector
    // page-start positions: every "page" marker, plus position 0 when the
    // document opens with implicit page 1
    val starts = {
      val marks = sorted.indices.filter(i => sorted(i).kind == "page")
      if (marks.headOption.contains(0)) marks else 0 +: marks
    }
    if (starts.length <= maxPages) Seq(Chunk(doc.doc_id, 0, isFirst = true, sorted))
    else {
      val groups = starts.grouped(maxPages).toVector
      groups.zipWithIndex.map { case (group, idx) =>
        val from = group.head
        val until =
          if (idx + 1 < groups.length) groups(idx + 1).head else sorted.length
        Chunk(doc.doc_id, idx, isFirst = idx == 0, sorted.slice(from, until))
      }
    }
  }

  final case class PartialStat(doc_id: String, doc_ord: Long, file_size: Long,
      page_size: Int, criterion_tables_count: Int, publish_month: String,
      hasFirstPage: Boolean, skipped: Boolean)

  def extractChunk(c: Chunk): (PartialStat, Seq[CandidateTable], Seq[Extract.MediaSpan]) = {
    // the span budget was already enforced on the WHOLE document before
    // chunking (extract() below) — chunks themselves parse unchecked so the
    // salted path stays bit-identical to the unsalted one
    val r = Extract.extractDoc(DocRow(c.doc_id, c.spans), spanBudget = Int.MaxValue)
    val month = if (c.isFirst) r.stat.publish_month.orNull else null
    (PartialStat(c.doc_id, r.stat.doc_ord, r.stat.file_size, r.stat.page_size,
      r.stat.criterion_tables_count, month, c.isFirst, skipped = false),
      r.candidates, r.media)
  }

  /** Over-budget document -> the same skip stat as the unsalted path. */
  def skipPartial(d: DocRow): (PartialStat, Seq[CandidateTable], Seq[Extract.MediaSpan]) = {
    val s = Extract.extractDoc(d, spanBudget = -1).stat // forces the skip path
    (PartialStat(s.doc_id, s.doc_ord, s.file_size, s.page_size, 0,
      null, hasFirstPage = true, skipped = true), Nil, Nil)
  }

  def reduceStats(a: PartialStat, b: PartialStat): PartialStat =
    PartialStat(a.doc_id, a.doc_ord,
      a.file_size + b.file_size,
      a.page_size + b.page_size,
      a.criterion_tables_count + b.criterion_tables_count,
      if (a.hasFirstPage) a.publish_month else b.publish_month,
      a.hasFirstPage || b.hasFirstPage,
      a.skipped || b.skipped)

  /** Salted extraction: per-chunk parse, per-doc stat reduce. Returns the
    * same (stats, doc parts) shape as the unsalted Extract stage, plus the
    * persisted handles (for the caller to release). */
  def extract(spark: SparkSession, docs: Dataset[DocRow], maxPages: Int = 64,
      persistIntermediate: Boolean = true,
      spanBudget: Int = Extract.SpanBudget)
      : (Dataset[PaperStat], Dataset[ExtractionPipeline.DocPart], Seq[Dataset[_]]) = {
    import spark.implicits._
    val budget = spanBudget
    var parts = docs
      .flatMap { d =>
        if (d.spans.length > budget) Iterator.single(skipPartial(d))
        else chunkDoc(d, maxPages).iterator.map(extractChunk)
      }
    val handles: Seq[Dataset[_]] =
      if (persistIntermediate) {
        parts = parts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Seq(parts)
      } else Nil
    val docParts = parts.flatMap { case (stat, cands, media) =>
      cands.iterator.map(c => ExtractionPipeline.DocPart(stat.doc_id, Some(c), None)) ++
        media.iterator.map(m => ExtractionPipeline.DocPart(stat.doc_id, None, Some(m)))
    }
    val stats = parts.map(_._1)
      .groupByKey(_.doc_id)
      .reduceGroups(reduceStats _)
      .map { case (_, p) =>
        PaperStat(p.doc_id, p.doc_ord, p.file_size, p.page_size,
          p.criterion_tables_count, None, None, None, None,
          Option(p.publish_month), publish_month_verified = !p.skipped,
          status = Extract.statusOf(p.skipped, p.criterion_tables_count))
      }
    (stats, docParts, handles)
  }
}
