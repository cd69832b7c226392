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

  /** Whitespace tokens of the lowercased, trimmed text. NOTE: when several
    * derived expressions consume the tokens, project this into its own
    * attribute first (two-step select) — otherwise Catalyst inlines the
    * regex split into every consumer and the scan re-tokenizes the text
    * once per use (see [[profile]] and Dedup.shinglesOf). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pretokenizer alternation (contractions, space-prefixed
    * letter runs, digit runs, symbol runs, whitespace) — the "BPE-ish"
    * token boundary rule. Java regex and DuckDB's RE2 share leftmost-first
    * alternation semantics and Unicode \p classes here, so the count is
    * oracle-checkable verbatim. */
  val BpeIshPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token count: pretokenizer matches that contain a non-space
    * character (pure-whitespace runs are boundaries, not tokens). */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(BpeIshPattern), lit(0)),
      t => t.rlike("\\S")))

  /** The same count in DuckDB SQL, generated from [[BpeIshPattern]]. */
  def bpeTokenCountSql(textExpr: String): String = {
    val pat = BpeIshPattern.replace("'", "''")
    s"len(list_filter(regexp_extract_all($textExpr, '$pat'), " +
      s"t -> regexp_matches(t, '\\S')))"
  }

  /** Mean token length in 1/1000s from a materialized tokens column
    * (integer — exact cross-engine compare; Spark's `/` is always double
    * division, so floor+cast keeps it exact). */
  def meanTokenLenMilliOf(toks: Column): Column = {
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    floor((totalLen * 1000L) / size(toks)).cast("long")
  }

  def meanTokenLenMilli(text: Column): Column = meanTokenLenMilliOf(tokens(text))

  /** Stopword list shared with the DuckDB oracle. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword count (ratio = count/tokens, kept integral for exactness). */
  def stopwordCountOf(toks: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t)))
  }

  def stopwordCount(text: Column): Column = stopwordCountOf(tokens(text))

  /** Punctuation character count over a fixed ASCII class (engine-safe). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Composite quality score in basis points:
    * 10000 * (0.5*min(tokens,200)/200 + 0.3*(1-stop_ratio) + 0.2*punct_penalty)
    * computed in integer arithmetic end-to-end, from PRE-COMPUTED counts. */
  def qualityScoreBpOf(text: Column, n: Column, stop: Column): Column = {
    val punct = punctCount(text)
    val lenTerm = floor(least(n, lit(200)) * 5000L / 200L).cast("long") // 0..5000
    val stopTerm = floor((lit(3000L) * (n - stop)) / greatest(n, lit(1))).cast("long") // 0..3000
    val punctTerm = when(punct * 20 <= length(text), lit(2000L)).otherwise(lit(0L))
    lenTerm + stopTerm + punctTerm
  }

  def qualityScoreBp(text: Column): Column =
    qualityScoreBpOf(text, tokenCount(text), stopwordCount(text))

  /** Language-ID marker vocabularies (n-gram-heuristic stand-in; shared
    * verbatim with the oracle SQL). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "fast", "table"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langScoreOf(toks: Column, markers: Seq[String]): Column = {
    val ms = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(ms, t)))
  }

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOf(tokens(text), markers)

  /** Predicted language from PRE-COMPUTED per-language marker counts:
    * argmax, FIRST entry in LangMarkers order wins ties; "und" when no
    * marker hits. (Taking materialized score columns keeps each count
    * evaluated once — inline, every score would be duplicated into the
    * running `greatest` AND each `when`.) */
  def langIdFirstWinsOf(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.reverse.foldLeft(lit("und"): Column) { case (els, (l, s)) =>
      when(s === best && s > 0, lit(l)).otherwise(els)
    }
  }

  def langIdFirstWins(text: Column): Column =
    langIdFirstWinsOf(LangMarkers.map { case (l, ms) => (l, langScore(text, ms)) })

  /** 64-bit rolling-hash fingerprint (custom codegen expression). */
  def fingerprint64(text: Column): Column =
    graft.functions.RollingHash64.fingerprint64(text)

  /** Full per-document text profile. Three-step projection: tokenize once,
    * materialize the shared counts, then derive — the one-select version
    * re-ran the regex split for every consumer (dozens per row). */
  def profile(docs: DataFrame): DataFrame = {
    val toked = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("toks"))
    val countedCols = Seq(
      col("doc_id"), col("text"), col("toks"),
      size(col("toks")).as("n_tokens"),
      stopwordCountOf(col("toks")).as("n_stopwords")) ++
      LangMarkers.map { case (l, ms) =>
        langScoreOf(col("toks"), ms).as(s"score_$l")
      }
    val counted = toked.select(countedCols: _*)
    counted.select(
      col("doc_id"),
      col("n_tokens"),
      bpeTokenCount(col("text")).as("n_tokens_bpe"),
      meanTokenLenMilliOf(col("toks")).as("mean_token_len_milli"),
      col("n_stopwords"),
      punctCount(col("text")).as("n_punct"),
      qualityScoreBpOf(col("text"), col("n_tokens"), col("n_stopwords")).as("quality_bp"),
      langIdFirstWinsOf(LangMarkers.map { case (l, _) =>
        (l, col(s"score_$l"))
      }).as("lang_pred"))
  }

  /** Vocabulary coverage: the minimal frequency-ranked vocabulary prefix
    * whose tokens cover `coverageBp`/10000 of all token INSTANCES in the
    * corpus — the tokenizer-design question ("how large a vocab for 95%
    * coverage?") answered as one distributed pass.
    *
    * The cumulative sum over the (count desc, token asc) ranking is a
    * global prefix sum — which `sum() OVER (ORDER BY ...)` computes on a
    * SinglePartition exchange, the same 100 TB cliff [[Packing]] exists to
    * avoid. So this reuses exactly that two-pass primitive: tokens shuffle
    * once to count (vocab-sized output), then the counts frame range-
    * partitions on a fixed-width sortable key encoding the ranking and
    * prefix-sums per partition against broadcast partition bases. Total
    * token count is a scalar aggregate of the vocab-sized counts frame.
    *
    * Output: (token, cnt, cum_before, cum_before_bp) for every token whose
    * EXCLUSIVE cumulative share is below the threshold — i.e. the prefix
    * including the token that crosses it. All-integer outputs (counts and
    * basis points via integer division) for bit-exact cross-engine
    * comparison. */
  /** CCNet-shaped LM fluency scoring (Wenzek et al. 2020 filter corpora by
    * language-model perplexity; the KenLM there is a web-trained n-gram
    * model): a bigram LM is estimated from a reference corpus — here the
    * corpus itself — and every document is scored by its average bigram
    * conditional probability p(w2|w1) = c(w1 w2) / c(w1 ·), in integral
    * microunits so the cross-engine compare is exact (true -log-prob
    * perplexity is a float fold over the same joined counts — omitted
    * from the CONTRACT because libm log is not bit-stable across engines,
    * not because the plan can't produce it). Low avg_cond_micro = the
    * doc's word transitions are rare in the reference corpus = the
    * CCNet "tail" bucket.
    *
    * 100 TB shape: documents pre-aggregate to DISTINCT (doc, bigram,
    * count) rows before anything joins, so the LM join carries one row
    * per distinct bigram per doc, not one per token. The LM itself is
    * two aggregations over the same pre-aggregated rows (bigram counts;
    * prefix counts from the bigram table — c(w1 ·) sums to exactly the
    * conditioning mass, no separate unigram scan). All shuffles carry
    * (hash-sized key, long); with a bounded vocabulary the LM table is
    * broadcast-sized and AQE picks the map-side join. */
  def lmFluency(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val docBi = base
      .select(col("doc_id"),
        explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ", element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("k"))
    val biCnt = docBi.groupBy("bg").agg(sum("k").as("c12"))
    val pre = biCnt
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"))
    val lm = biCnt
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(pre, "w1")
      .select(col("bg"), col("c12"), col("c1"))
    val scored = docBi.join(lm, "bg")
      .withColumn("contrib", col("k") * expr("(c12 * 1000000) div c1"))
      .groupBy("doc_id")
      .agg(sum("k").as("nb"), sum("contrib").as("sm"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("sm"), lit(0L)).as("sum_cond_micro"),
        coalesce(expr("sm div nb"), lit(0L)).as("avg_cond_micro"))
  }

  /** Real FLOAT log-perplexity companion to [[lmFluency]] (q66b): per doc
    * the average bigram conditional log-probability
    * `avg_lp = Σ k·ln(c12/c1) / nb` (nats, always <= 0).
    *
    * [[lmFluency]] keeps true log-perplexity out of its contract because
    * libm `ln` isn't bit-stable across engines — this surface ships it
    * anyway under the q36/q44/q54 tolerance-flag discipline, made
    * hash-exact by QUANTIZATION WITH A GUARD BAND: the value is emitted
    * floor-quantized to 1e-4 nats (`avg_logprob_q`), and only when the
    * pre-quantization value sits at least 1e-3 quanta away from the floor
    * boundary (`quant_safe`); boundary-straddling docs emit NULL on both
    * engines. Cross-engine ln/summation drift is ~1e-12 quanta — six
    * orders inside the guard — so two independent libms agree on every
    * emitted value by construction, and the oracle CHECKS the float
    * computation rather than trusting a flag blindly. Residual risk,
    * acknowledged: the guard band itself is evaluated on each engine's
    * drifting float, so a doc whose fractional quantum lands WITHIN libm
    * drift (~1e-12) of the 0.001/0.999 thresholds could make the engines
    * disagree on quant_safe — data-dependent and ~9 orders of magnitude
    * less likely than a bare float compare, but not zero.
    *
    * Scale shape is lmFluency's: same bigram/prefix aggregation, shuffles
    * carry (bigram key, longs) + one double; the LM join broadcasts for
    * bounded vocabularies. */
  def lmLogProb(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val docBi = base
      .select(col("doc_id"),
        explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ", element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("k"))
    val biCnt = docBi.groupBy("bg").agg(sum("k").as("c12"))
    val pre = biCnt
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"))
    val lm = biCnt
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(pre, "w1")
      .select(col("bg"), col("c12"), col("c1"))
    // division BEFORE ln (not ln(c12)-ln(c1)): the quotient is one IEEE
    // op (bit-identical everywhere); only the single ln call varies ±1ulp
    val scored = docBi.join(lm, "bg")
      .withColumn("lp",
        col("k") * log(col("c12").cast("double") / col("c1")))
      .groupBy("doc_id")
      .agg(sum("k").as("nb"), sum("lp").as("s"))
    val d = (col("s") / col("nb")) * lit(10000.0)
    val safe = col("nb").isNotNull &&
      (d - floor(d)) >= 0.001 && (d - floor(d)) <= 0.999
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        when(safe, floor(d).cast("long")).as("avg_logprob_q"),
        coalesce(safe, lit(false)).as("quant_safe"))
  }

  def vocabCoverage(docs: DataFrame, coverageBp: Long = 9500L,
      textCol: String = "text"): DataFrame = {
    require(coverageBp >= 0L && coverageBp <= 10000L, s"bad bp $coverageBp")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // one row; vocab-sized input — not a corpus-scale collect
    val total = counts.agg(sum(col("cnt"))).collect()(0).getLong(0)
    // fixed-width sortable rank key: (cnt desc, token asc) as ONE string:
    // zero-padded (Long.MaxValue - cnt) sorts descending counts ascending
    // lexicographically, with the token tiebreak (and the token itself,
    // since the packing pass keeps only key + weight) behind the fixed-
    // width count field
    val ranked = counts.select(
      concat(lpad((lit(Long.MaxValue) - col("cnt")).cast("string"), 19, "0"),
        col("token")).as("__rk"),
      col("cnt"))
    Packing.packSequencesBy(ranked, "__rk", "cnt", budget = Long.MaxValue)
      .select(expr("substring(__rk, 20)").as("token"),
        col("n_tokens").as("cnt"),
        col("stream_offset").as("cum_before"),
        expr("stream_offset * 10000 div " + total).as("cum_before_bp"))
      .where(col("cum_before") * lit(10000L) < lit(coverageBp * total))
  }
}
