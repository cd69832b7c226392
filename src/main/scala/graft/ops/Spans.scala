package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators over the INTERLEAVED span sequence itself — the long-format
  * (doc_id, ord, kind, text, media_ref) table the extraction pipeline
  * emits (`layout/Model.scala:7`, reference span grammar at
  * `/root/reference/src/v1_plain/parse_text.py:63-118`). These are the
  * transformations a multimodal corpus build applies BETWEEN extraction
  * and packing, where the span structure (kind, media_ref, order) is the
  * invariant that must survive every rewrite: a scrub that drops or
  * reorders a media span silently corrupts image-text alignment for
  * every downstream sample that packs that document.
  *
  * Everything here is per-document: map-side expressions or
  * partition-by-doc window functions — at 10^12 documents these run next
  * to the scan with zero corpus-scale shuffles (the window shuffle keys
  * on doc_id, the extraction output's native partitioning, and carries
  * only the span rows of each doc).
  */
object Spans {

  /** Structure-preserving PII scrub: rewrite ONLY kind='text' spans with
    * the shared [[Curation.PiiPatterns]] chain; page/rule/media spans pass
    * through byte-identical with n_redactions = 0 (a media span's `text`
    * is metadata, a page marker's is the page number — scrubbing either
    * would corrupt the grammar, and a regex chain run over binary-ish
    * payload refs is wasted CPU at corpus scale). Output = input columns
    * + n_redactions; (kind, media_ref, ord) are untouched by construction.
    */
  def scrubTextSpans(spans: DataFrame): DataFrame = {
    val (scrubbed, nRedactions) = Curation.piiScrubCols(col("text"))
    spans.select(
      col("doc_id"), col("ord"), col("kind"),
      when(col("kind") === "text", scrubbed).otherwise(col("text"))
        .as("text"),
      col("media_ref"),
      when(col("kind") === "text", nRedactions).otherwise(lit(0L))
        .as("n_redactions"))
  }

  /** Caption alignment audit: for every media span, the nearest PRECEDING
    * non-empty text span — but only if it sits on the same page and within
    * `maxGap` span positions (a caption separated from its figure by a
    * page break or by `maxGap` intervening spans is no caption; the
    * reference takes the same "preceding text on the page" view for table
    * captions, `table_finder.py:160-188`). Page number = running count of
    * kind='page' markers. Output per media span:
    * (doc_id, ord, media_ref, page, caption_ord, caption_tokens,
    * has_caption) with caption_ord/caption_tokens null when uncaptioned.
    *
    * Scale shape: one window pass partitioned by doc_id — the shuffle key
    * is the extraction output's native partitioning and each partition
    * holds whole documents, so memory is bounded by the largest single
    * document (the salted-extract path already bounds that upstream). */
  def captionAlignment(spans: DataFrame, maxGap: Int = 3): DataFrame = {
    require(maxGap >= 1, s"need maxGap >= 1, got $maxGap")
    val byOrd = Window.partitionBy("doc_id").orderBy("ord")
    val prev = byOrd.rowsBetween(Window.unboundedPreceding, -1)
    val isCap = col("kind") === "text" && trim(col("text")) =!= ""
    val paged = spans.withColumn("page",
      sum(when(col("kind") === "page", 1L).otherwise(0L)).over(byOrd))
    val candidates = paged
      .withColumn("cap_ord",
        last(when(isCap, col("ord")), ignoreNulls = true).over(prev))
      .withColumn("cap_page",
        last(when(isCap, col("page")), ignoreNulls = true).over(prev))
      .withColumn("cap_text",
        last(when(isCap, col("text")), ignoreNulls = true).over(prev))
    candidates
      .filter(col("kind") === "media")
      .withColumn("has_caption",
        col("cap_ord").isNotNull &&
          col("ord") - col("cap_ord") <= maxGap &&
          col("cap_page") === col("page"))
      .select(
        col("doc_id"), col("ord"), col("media_ref"), col("page"),
        when(col("has_caption"), col("cap_ord")).as("caption_ord"),
        when(col("has_caption"),
          size(split(trim(lower(col("cap_text"))), "\\s+")).cast("long"))
          .as("caption_tokens"),
        col("has_caption"))
  }

  /** [[captionAlignment]] replayed in DuckDB SQL; `spansSql` is a query
    * producing the span relation (doc_id, ord, kind, text, media_ref). */
  def captionAlignmentSql(spansSql: String, maxGap: Int = 3): String =
    s"""WITH spans AS ($spansSql),
       |paged AS (
       |  SELECT doc_id, ord, kind, text, media_ref,
       |    sum(CASE WHEN kind = 'page' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY ord) AS page
       |  FROM spans),
       |cand AS (
       |  SELECT *,
       |    last_value(CASE WHEN kind = 'text' AND trim(text) <> ''
       |                    THEN ord END IGNORE NULLS)
       |      OVER (PARTITION BY doc_id ORDER BY ord
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS cap_ord,
       |    last_value(CASE WHEN kind = 'text' AND trim(text) <> ''
       |                    THEN page END IGNORE NULLS)
       |      OVER (PARTITION BY doc_id ORDER BY ord
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS cap_page,
       |    last_value(CASE WHEN kind = 'text' AND trim(text) <> ''
       |                    THEN text END IGNORE NULLS)
       |      OVER (PARTITION BY doc_id ORDER BY ord
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS cap_text
       |  FROM paged)
       |SELECT doc_id, ord, media_ref, CAST(page AS BIGINT) AS page,
       |  CASE WHEN has_caption THEN cap_ord END AS caption_ord,
       |  CASE WHEN has_caption THEN CAST(len(regexp_split_to_array(
       |    trim(lower(cap_text)), '\\s+')) AS BIGINT) END AS caption_tokens,
       |  has_caption
       |FROM (
       |  SELECT *, cap_ord IS NOT NULL AND ord - cap_ord <= $maxGap
       |    AND cap_page = page AS has_caption
       |  FROM cand)
       |WHERE kind = 'media'""".stripMargin

  /** Paragraph coalescing over the interleaved sequence: each MAXIMAL RUN
    * of consecutive kind='text' spans merges into one span (texts joined
    * by `sep` in span order, nulls as empty), while every non-text span
    * (media, page, rule) stays a singleton — so the media positions that
    * anchor image-text alignment are hard boundaries and the grammar
    * survives re-segmentation. Spans are re-numbered densely per doc;
    * `n_merged` reports each output span's input-run length. Extraction
    * emits fine-grained spans (cell/line level); packing and embedding
    * want paragraph-level units — this is the bridge, and the inverse
    * knob of the chunker (q48).
    *
    * Run identity is the running count of PRECEDING-or-self non-text
    * spans (a window per doc): text spans between two boundaries share
    * it; the boundary itself differs from its following run by `is_text`.
    * Per-doc windows only — the one shuffle keys on doc_id, the
    * extraction output's native partitioning (x65's shape). */
  def coalesceTextRuns(spans: DataFrame, sep: String = " "): DataFrame = {
    val byOrd = Window.partitionBy("doc_id").orderBy("ord")
    val agg = spans
      .withColumn("grp",
        sum(when(col("kind") =!= "text", 1L).otherwise(0L)).over(byOrd))
      .withColumn("is_text", col("kind") === "text")
      .groupBy(col("doc_id"), col("grp"), col("is_text"))
      .agg(
        min(col("ord")).as("min_ord"),
        min(col("kind")).as("kind"), // homogeneous run or singleton
        array_join(transform(
          array_sort(collect_list(struct(col("ord"),
            coalesce(col("text"), lit("")).as("text")))),
          s => s.getField("text")), sep).as("text"),
        min(col("media_ref")).as("media_ref"),
        count(lit(1)).as("n_merged"))
    agg
      .withColumn("ord", (row_number().over(
        Window.partitionBy("doc_id").orderBy("min_ord")) - 1))
      .select(col("doc_id"), col("ord"), col("kind"), col("text"),
        col("media_ref"), col("n_merged"))
  }

  /** Span-sequence regression diff — the north-rule invariant
    * (span-sequence equality on (kind, text, media_ref, order)) as an
    * OPERATOR, so an extraction-code change can be CI-gated corpus-wide:
    * run old and new extractors, diff, and a single non-equal doc names
    * the first divergent span and which field moved. Per document:
    * `equal`, `first_diff_ord`, `diff_kind` ∈ {missing (candidate lacks
    * the ord), extra (candidate added one), kind, media_ref, text —
    * checked in that priority at the first divergent ord}, plus both
    * span counts. A doc present on one side only degenerates naturally
    * (every ord missing/extra; first diff at its smallest ord).
    *
    * Scale shape: document TEXT never reaches the join — both sides
    * project (doc_id, ord, kind, md5(text), media_ref) first, so the one
    * co-partitioned shuffle per side carries fixed-width scalars; the
    * per-doc verdict is a partial-aggregable min-of-struct. Null text and
    * empty text stay distinct (null-safe compares on the md5, which is
    * null iff the text is). */
  def spanDiff(base: DataFrame, cand: DataFrame): DataFrame = {
    def prep(df: DataFrame, side: String) = df.select(
      col("doc_id"), col("ord"),
      col("kind").as(s"kind_$side"),
      md5(col("text")).as(s"th_$side"),
      col("media_ref").as(s"mr_$side"),
      lit(1L).as(s"present_$side"))
    val j = prep(base, "a")
      .join(prep(cand, "b"), Seq("doc_id", "ord"), "full_outer")
    val dk = when(col("present_b").isNull, "missing")
      .when(col("present_a").isNull, "extra")
      .when(!(col("kind_a") <=> col("kind_b")), "kind")
      .when(!(col("mr_a") <=> col("mr_b")), "media_ref")
      .when(!(col("th_a") <=> col("th_b")), "text")
    j.withColumn("dk", dk)
      .groupBy(col("doc_id"))
      .agg(
        min(when(col("dk").isNotNull,
          struct(col("ord"), col("dk")))).as("first"),
        sum(coalesce(col("present_a"), lit(0L))).as("n_spans_base"),
        sum(coalesce(col("present_b"), lit(0L))).as("n_spans_new"))
      .select(col("doc_id"),
        col("first").isNull.as("equal"),
        col("first.ord").as("first_diff_ord"),
        col("first.dk").as("diff_kind"),
        col("n_spans_base"), col("n_spans_new"))
  }
}
