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

  /** Embedding-backed variant of the P10/P11 flow — the seam for a REAL
    * model. The reference embeds blocks with MiniLM and cosine-matches the
    * target phrase (src/v1_plain/parse_text.py:47-103, model_loader.py);
    * no model ships in this sandbox, so the caller supplies the vectors:
    * `embeddings` is a (block_text, vector array<float/double>) frame
    * produced by ANY offline embedding job, `targetVec` is the embedded
    * target phrase. Blocks join their vectors by text (embedding frames
    * are block-vocabulary-sized — broadcastable; a corpus-scale frame
    * shuffles once on the text key) and the best cosine >= threshold wins
    * per document, exactly the token-set flow's reduce. Output:
    * (doc_id, page, confidence_bp, text) — x09's shape.
    */
  def findSummaryTextEmbedded(
      docs: org.apache.spark.sql.Dataset[DocRow],
      embeddings: org.apache.spark.sql.DataFrame,
      targetVec: Seq[Double],
      threshold: Double = DefaultThreshold): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val blocks = docs.flatMap { d =>
      SpanDoc.pages(d.spans).flatMap { p =>
        p.spans.filter(s => s.kind == "text" && s.text.trim.nonEmpty)
          .map(s => (d.doc_id, p.number, s.text.trim))
      }
    }.toDF("doc_id", "page", "text")
    val emb = embeddings.toDF("text", "vector")
      .select(col("text"), col("vector").cast("array<double>").as("vector"))
    val target = typedLit(targetVec)
    val scored = blocks.join(emb, Seq("text"))
      .select(col("doc_id"), col("page"), col("text"),
        graft.ops.Similarity.cosine(col("vector"), target).as("score"))
    // per-doc argmax as ONE partial-aggregable max over a (score, -page,
    // text) struct — no window, no second shuffle
    scored.groupBy("doc_id")
      .agg(max(struct(col("score"), negate(col("page")).as("npage"),
        col("text"))).as("best"))
      .filter(col("best.score") >= threshold)
      .select(col("doc_id"), negate(col("best.npage")).cast("int").as("page"),
        floor(col("best.score") * 10000).as("confidence_bp"),
        col("best.text").as("text"))
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
