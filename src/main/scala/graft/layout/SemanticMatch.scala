package graft.layout

/** v1's semantic block search (P10/P11), re-expressed without the
  * sentence-transformer: the reference embeds every text block with MiniLM
  * and keeps the best cosine match against a target phrase with threshold
  * 0.5 (reference: src/v1_plain/parse_text.py:47-103, config.py:24,32-33).
  * No model ships in this environment, so the similarity is a token-set
  * cosine — the same shape (score in [0,1], best-match-per-page reduce,
  * threshold gate), embedding-free and deterministic.
  */
object SemanticMatch {

  val DefaultTarget = "Summary of project findings and ratings"
  val DefaultThreshold = 0.5

  /** Token-set cosine: |A ∩ B| / sqrt(|A| * |B|) over lowercased tokens. */
  def tokenSetCosine(a: String, b: String): Double = {
    val ta = a.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
    val tb = b.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
    if (ta.isEmpty || tb.isEmpty) 0.0
    else (ta & tb).size / math.sqrt(ta.size.toDouble * tb.size)
  }

  final case class BlockMatch(page: Int, text: String, confidence: Double)

  /** Best block of one page vs the target (parse_text.py:47-103). */
  def bestOnPage(page: Page, target: String): Option[BlockMatch] = {
    val blocks = page.spans.filter(s => s.kind == "text" && s.text.trim.nonEmpty)
    if (blocks.isEmpty) None
    else {
      val best = blocks.maxBy(s => tokenSetCosine(s.text, target))
      Some(BlockMatch(page.number, best.text.trim, tokenSetCosine(best.text, target)))
    }
  }

  /** Max-by-confidence across pages with threshold gate (P11,
    * parse_text.py:32-42,96-97): first page reaching the threshold with the
    * best confidence wins. */
  def findSummaryText(pages: Seq[Page], target: String = DefaultTarget,
      threshold: Double = DefaultThreshold): Option[BlockMatch] = {
    val candidates = pages.flatMap(p => bestOnPage(p, target))
    if (candidates.isEmpty) None
    else {
      val best = candidates.maxBy(_.confidence)
      if (best.confidence >= threshold) Some(best) else None
    }
  }

  /** v1's find_next_table (parse_table.py:267-300): run the cross-page
    * state machine and return the FIRST table by min page. */
  def findNextTable(pages: Seq[Page], startPage: Int = 0)
      : Option[CrossPage.SpanningTable] = {
    val fromStart = pages.filter(_.number > startPage)
    val tables = CrossPage.extractSpanningTables(fromStart)
    if (tables.isEmpty) None
    else Some(tables.minBy(_.pageNumbers.min))
  }
}
