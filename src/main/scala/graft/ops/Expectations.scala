package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the Deequ /
  * Great-Expectations shape a production corpus runs before (and after)
  * every pipeline stage: a set of NAMED checks (completeness, uniqueness,
  * cross-column consistency, set membership, format conformity, volume and
  * distribution bounds) evaluated against the table, emitting one
  * (check, metric, passed) row per expectation.
  *
  * The scale contract is that the whole suite is ONE aggregation over ONE
  * scan, however many checks it carries: every check contributes its metric
  * and its verdict as aggregate expressions to a single `agg(...)`, so the
  * map side computes all partial aggregates in a single codegen'd pass and
  * the only exchange is the final scalar gather. Adding a 20th check to a
  * 100 TB table costs a few more accumulators per task, not another scan.
  * (The one exception a caller can introduce is `count(DISTINCT c)` —
  * Catalyst plans it as two-phase hash aggregation keyed on the column,
  * still one scan but one extra key exchange; [[approxUniqueness]] is the
  * sketch-based alternative that keeps even that a scalar gather.)
  *
  * Checks are data, not code: an [[Expectation]] is (name, metric column,
  * pass column), both ordinary aggregate `Column`s, so a suite can be
  * assembled from config the way reference `src/v3_stable/main.py:9-16`
  * assembles its step list. Identical aggregate subtrees across metric and
  * verdict deduplicate in the physical Aggregate (Catalyst semantic
  * equality), so `pass = metric <= 0` does not double-count.
  */
object Expectations {

  /** One named check. `metric` must be a complete aggregate expression over
    * the table (a violation count, a row count, an integral ratio);
    * `pass` is the boolean verdict, itself written as an aggregate
    * expression (typically over the same subtree as `metric`). */
  final case class Expectation(name: String, metric: Column, pass: Column)

  /** Count of rows violating `bad` — the building block for
    * completeness / conformity / consistency checks. */
  def violations(bad: Column): Column = count(when(bad, lit(1)))

  /** An expectation that passes iff NO row violates `bad`. */
  def expectNone(name: String, bad: Column): Expectation =
    Expectation(name, violations(bad), violations(bad) === 0L)

  /** Exact uniqueness: metric = duplicate-row surplus for `key`
    * (0 iff every key is distinct). Plans with an Expand (one scan, wider
    * shuffle); use [[approxUniqueness]] where that matters. */
  def uniqueness(name: String, key: Column): Expectation =
    Expectation(name, count(key) - countDistinct(key),
      count(key) - countDistinct(key) === 0L)

  /** Sketch-based uniqueness for tables where the Expand shuffle of an
    * exact distinct is itself a cost: HLL estimate within `slackBp`
    * basis points of the row count. One ordinary aggregate, no Expand. */
  def approxUniqueness(name: String, key: Column, slackBp: Long = 500L)
      : Expectation = {
    val est = approx_count_distinct(key)
    val n = count(key)
    Expectation(name, est,
      est * 10000L >= n * (10000L - slackBp))
  }

  /** Run the suite: ONE `agg` carrying every metric and verdict, then the
    * single result row unpivoted to (check, metric, passed) rows. */
  def run(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "expectation suite must contain a check")
    require(checks.map(_.name).distinct.length == checks.length,
      "expectation names must be unique")
    val aggCols = checks.flatMap(c => Seq(
      c.metric.cast("long").as(s"m_${c.name}"),
      c.pass.as(s"p_${c.name}")))
    df.agg(aggCols.head, aggCols.drop(1): _*)
      .select(explode(array(checks.map(c => struct(
        lit(c.name).as("check"),
        col(s"m_${c.name}").as("metric"),
        col(s"p_${c.name}").as("passed"))): _*)).as("e"))
      .select(col("e.check").as("check"), col("e.metric").as("metric"),
        col("e.passed").as("passed"))
  }

  /** The corpus ingest gate for the documents table: the checks a scrape
    * batch must clear before it reaches dedup/curation. Violation metrics
    * are exact counts; volume/distribution bounds use integral arithmetic
    * (integer-division mean) so the row is bit-stable cross-engine. */
  def documentsSuite(docs: DataFrame): DataFrame = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    run(docs, Seq(
      expectNone("complete_text",
        col("text").isNull || trim(col("text")) === ""),
      uniqueness("unique_doc_id", col("doc_id")),
      // cross-column consistency: the declared length must be the length
      expectNone("consistent_n_chars", col("n_chars") =!= length(col("text"))),
      expectNone("lang_in_set", !col("lang").isin(langs: _*)),
      expectNone("source_format", !col("source").rlike("^[a-z][a-z0-9]*$")),
      expectNone("chars_in_bounds",
        col("n_chars") < 1L || col("n_chars") > 100000L),
      Expectation("min_volume", count(lit(1)), count(lit(1)) >= 100L),
      Expectation("mean_chars_bounds",
        expr("sum(n_chars) div count(1)"),
        expr("sum(n_chars) div count(1)").between(50L, 2000L))))
  }
}
