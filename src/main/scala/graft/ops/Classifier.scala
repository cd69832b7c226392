package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus selection — the two classifier-shaped filters every
  * modern pretraining pipeline runs after the rule-based gates
  * (GPT-3/LLaMA-style "quality classifier", DSIR-style importance
  * weighting), built as pure relational plans: TRAIN is a word-count-shaped
  * aggregation producing a small model TABLE, APPLY is a broadcast join +
  * map-side fold. No gradient loop, no UDF, no driver-side math — the
  * model frame is exactly the artifact a production pipeline persists and
  * re-applies to each ingest batch.
  *
  * The reference has no classifier (its quality filter is the criterion
  * predicate chain, SURVEY §2.2 P3); these are engine-only additions per
  * the north rule's training-pipeline mandate, next to q12's rule-based
  * quality score and q63's budget mixing.
  *
  * Everything is integral-microunit arithmetic (the q66 convention): true
  * naive Bayes / DSIR score in log space is the same joined fold with a
  * `log`, omitted from the CONTRACT only because libm is not bit-stable
  * across engines — the plan shape is identical, the ordering it induces
  * near-identical, and the cross-engine compare exact.
  *
  * Headroom note (both operators): the micro-unit numerators multiply a
  * per-class/per-bucket count by 10^6, so counts are exact up to ~9.2e12
  * per class (long range / 1e6). Beyond that — a >10 T-token class — drop
  * the scale to basis points (1e4, headroom ~9.2e14) or pre-scale counts;
  * the plan is unchanged.
  */
object Classifier {

  /** Seed-label threshold: docs at or above this rule-based quality score
    * (TextAnalysis.qualityScoreBp, basis points) are the "high-quality"
    * training class. Weak supervision by rule — the standard bootstrap
    * when no labeled reference corpus ships with the data. */
  val DefaultSeedThreshBp: Long = 7000L

  /** Docs + a boolean `hi` seed label + materialized `toks` (tokenized
    * ONCE — the repo-wide two-step-projection rule; inlined, the quality
    * score would re-run the regex split per consumer). */
  def seedLabeled(docs: DataFrame, threshBp: Long = DefaultSeedThreshBp): DataFrame = {
    val toked = docs.select(col("doc_id"), col("text"),
      TextAnalysis.tokens(col("text")).as("toks"))
    toked.select(col("doc_id"), col("toks"),
      (TextAnalysis.qualityScoreBpOf(col("text"), size(col("toks")),
        TextAnalysis.stopwordCountOf(col("toks"))) >= threshBp).as("hi"))
  }

  /** Distinct (doc_id, hi, token, k) rows — the pre-aggregation BOTH the
    * train and apply sides consume (one corpus-scale shuffle on scalar
    * keys; after this, document text never appears in a plan). */
  private def docTokens(seeded: DataFrame): DataFrame =
    seeded.select(col("doc_id"), col("hi"), explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "hi", "w").agg(count(lit(1)).as("k"))

  /** TRAIN: per-token Laplace-smoothed likelihood ratio
    * p(w|hi) / p(w|lo) in integral microunits, from label-conditional
    * token counts. Output (w, c1, c0, lr_micro) — vocabulary-sized, the
    * persistable model table.
    *
    * The two conditionals are materialized SEPARATELY in micro units
    * before the ratio (p1_micro, p0_micro ≤ 1e6) so every intermediate
    * stays within long range at any corpus size the headroom note admits;
    * a rare-in-lo token can floor p0_micro to 0, clamped to 1 (the ratio
    * saturates at 1e12 — deterministic, replayed by the oracle). */
  def trainTokenLr(seeded: DataFrame): DataFrame = {
    val counts = docTokens(seeded).groupBy("w").agg(
      sum(when(col("hi"), col("k")).otherwise(0L)).as("c1"),
      sum(when(!col("hi"), col("k")).otherwise(0L)).as("c0"))
    // 1-row totals: an aggregate of the vocab-sized counts frame, joined
    // back broadcast — never a driver-side collect
    val totals = counts.agg(
      sum("c1").as("n1"), sum("c0").as("n0"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("w"), col("c1"), col("c0"),
        expr("((c1 + 1) * 1000000) div (n1 + v)").as("p1_micro"),
        expr("((c0 + 1) * 1000000) div (n0 + v)").as("p0_micro"))
      .select(col("w"), col("c1"), col("c0"),
        expr("(p1_micro * 1000000) div greatest(p0_micro, 1)").as("lr_micro"))
  }

  /** APPLY: per-doc mean token likelihood ratio (microunits) + the
    * decision at ratio 1.0 (= 1e6 micro). The model is vocab-bounded, so
    * AQE broadcasts it; the doc side is the docTokens pre-aggregation —
    * one scalar-key shuffle, then map-side join + fold. Docs with no
    * scorable token (empty text) survive with n_scored_tokens = 0 and
    * pred_hi = 0. */
  def scoreTokenLr(seeded: DataFrame, model: DataFrame): DataFrame = {
    val scored = docTokens(seeded)
      .join(model.select(col("w"), col("lr_micro")), "w")
      .groupBy("doc_id", "hi")
      .agg(sum(col("k") * col("lr_micro")).as("sum_lr"), sum("k").as("nk"))
    seeded.select(col("doc_id"), col("hi")).join(scored, Seq("doc_id", "hi"), "left")
      .select(col("doc_id"),
        col("hi").cast("int").as("seed_hi"),
        coalesce(col("nk"), lit(0L)).as("n_scored_tokens"),
        coalesce(expr("sum_lr div nk"), lit(0L)).as("avg_lr_micro"),
        coalesce((expr("sum_lr div nk") >= lit(1000000L)).cast("int"), lit(0))
          .as("pred_hi"))
  }

  /** The q74 composition: seed-label by the rule-based quality score,
    * train the token-LR model on the corpus, score every doc with it.
    * (In production the train corpus is a curated reference — Wikipedia
    * in the GPT-3 recipe — and the model table is persisted; the seam is
    * exactly [[trainTokenLr]]'s output.) */
  def nbQuality(docs: DataFrame, threshBp: Long = DefaultSeedThreshBp): DataFrame = {
    val seeded = seedLabeled(docs, threshBp)
    scoreTokenLr(seeded, trainTokenLr(seeded))
  }

  // ------------------------------------------------------------------
  // DSIR-shaped hashed importance weighting
  // ------------------------------------------------------------------

  /** Feature-hash bucket count. A power of two, for two load-bearing
    * reasons: (1) the model table is FIXED at this many rows regardless of
    * vocabulary — the hashing trick's scale contract (an open 100 TB web
    * vocabulary and a 31-word toy corpus produce the same 32 KB model);
    * (2) 2^64 ≡ 0 (mod 4096), so the oracle can bucket the UNSIGNED
    * HUGEINT hash while the engine buckets the signed long — pmod agrees
    * by construction only when nBuckets divides 2^64. */
  val DefaultBuckets: Int = 4096

  /** Hashed-bigram bucket rows: distinct (doc_id, tgt, b, k) — the DSIR
    * feature extraction (Xie et al. 2023 use hashed n-grams for exactly
    * this reason: the importance model must not grow with the raw corpus).
    * Bigram strings exist only INSIDE the projection; the shuffle key is
    * the bucket long. */
  private def docBuckets(docs: DataFrame, isTarget: Column, nBuckets: Int): DataFrame = {
    val base = docs.select(col("doc_id"), isTarget.as("tgt"),
      TextAnalysis.tokens(col("text")).as("tk"))
    base.select(col("doc_id"), col("tgt"),
      explode(when(size(col("tk")) >= 2,
        transform(sequence(lit(0), size(col("tk")) - 2),
          i => concat_ws(" ", element_at(col("tk"), i + 1),
            element_at(col("tk"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("bg"))
      .select(col("doc_id"), col("tgt"),
        pmod(TextAnalysis.fingerprint64(col("bg")), lit(nBuckets.toLong)).as("b"))
      .groupBy("doc_id", "tgt", "b").agg(count(lit(1)).as("k"))
  }

  /** DSIR-shaped data selection: weight every RAW doc by how target-like
    * its hashed-bigram distribution is — per-bucket importance
    * w(b) = p_target(b) / p_raw(b), Laplace-smoothed, integral microunits
    * (the [[trainTokenLr]] two-step ratio, same headroom) — and keep the
    * topN non-target docs by mean importance (ties by doc_id; docs with
    * <2 tokens have no features and are never selected).
    *
    * 100 TB shape: ONE corpus-scale shuffle (the (doc, bucket) pre-agg,
    * scalar keys), one nBuckets-row aggregate for the two distributions,
    * a broadcast join to score, and a TakeOrdered for the topN — no
    * global-window SinglePartition stage, no exchange ever carries text.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column,
      nBuckets: Int = DefaultBuckets, topN: Int = 50): DataFrame = {
    require(nBuckets > 0 && java.lang.Long.bitCount(nBuckets.toLong) == 1,
      s"nBuckets must be a positive power of two (oracle mod-2^64 contract), got $nBuckets")
    val db = docBuckets(docs, isTarget, nBuckets)
    val dist = db.groupBy("b").agg(
      sum(when(col("tgt"), col("k")).otherwise(0L)).as("tb"),
      sum(col("k")).as("rb"))
    val totals = dist.agg(sum("tb").as("tt"), sum("rb").as("rt"))
    val weights = dist.crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"((tb + 1) * 1000000) div (tt + $nBuckets)").as("pt_micro"),
        expr(s"((rb + 1) * 1000000) div (rt + $nBuckets)").as("pr_micro"))
      .select(col("b"),
        expr("(pt_micro * 1000000) div greatest(pr_micro, 1)").as("w_micro"))
    db.filter(!col("tgt"))
      .join(weights, "b")
      .groupBy("doc_id")
      .agg(sum(col("k") * col("w_micro")).as("sw"), sum("k").as("nf"))
      .select(col("doc_id"), col("nf").as("n_features"),
        expr("sw div nf").as("avg_w_micro"))
      .orderBy(col("avg_w_micro").desc, col("doc_id").asc)
      .limit(topN)
  }
}
