package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, built
  * entirely from codegen'd column expressions (no UDFs) so they stay inside
  * WholeStageCodegen and push through Catalyst untouched.
  *
  * All operators run over the documents table (doc_id, text, lang, source,
  * n_chars).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length in 1/1000s (integer — exact cross-engine compare;
    * Spark's `/` is always double division, so floor+cast keeps it exact). */
  def meanTokenLenMilli(text: Column): Column = {
    val ts = tokens(text)
    val totalLen = aggregate(ts, lit(0L), (acc, t) => acc + length(t))
    floor((totalLen * 1000L) / size(ts)).cast("long")
  }

  /** Stopword list shared with the DuckDB oracle. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword count (ratio = count/tokens, kept integral for exactness). */
  def stopwordCount(text: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t)))
  }

  /** Punctuation character count over a fixed ASCII class (engine-safe). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Composite quality score in basis points:
    * 10000 * (0.5*min(tokens,200)/200 + 0.3*(1-stop_ratio) + 0.2*punct_penalty)
    * computed in integer arithmetic end-to-end. */
  def qualityScoreBp(text: Column): Column = {
    val n = tokenCount(text)
    val stop = stopwordCount(text)
    val punct = punctCount(text)
    val lenTerm = floor(least(n, lit(200)) * 5000L / 200L).cast("long") // 0..5000
    val stopTerm = floor((lit(3000L) * (n - stop)) / greatest(n, lit(1))).cast("long") // 0..3000
    val punctTerm = when(punct * 20 <= length(text), lit(2000L)).otherwise(lit(0L))
    lenTerm + stopTerm + punctTerm
  }

  /** Language-ID marker vocabularies (n-gram-heuristic stand-in; shared
    * verbatim with the oracle SQL). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "fast", "table"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val ms = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(ms, t)))
  }

  /** Predicted language: argmax marker count, FIRST entry in LangMarkers
    * order wins ties; "und" when no marker hits. */
  def langIdFirstWins(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => (l, langScore(text, ms)) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.reverse.foldLeft(lit("und"): Column) { case (els, (l, s)) =>
      when(s === best && s > 0, lit(l)).otherwise(els)
    }
  }

  /** 64-bit rolling-hash fingerprint (custom codegen expression). */
  def fingerprint64(text: Column): Column =
    graft.functions.RollingHash64.fingerprint64(text)

  /** Full per-document text profile. */
  def profile(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      meanTokenLenMilli(col("text")).as("mean_token_len_milli"),
      stopwordCount(col("text")).as("n_stopwords"),
      punctCount(col("text")).as("n_punct"),
      qualityScoreBp(col("text")).as("quality_bp"),
      langIdFirstWins(col("text")).as("lang_pred"))
}
