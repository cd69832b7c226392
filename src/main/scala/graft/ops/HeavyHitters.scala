package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact corpus heavy hitters via a two-pass sketch-then-recount:
  * a mergeable Misra-Gries summary (Agarwal et al., "Mergeable Summaries")
  * finds a bounded CANDIDATE set in one pass with k counters of state per
  * task — the superset guarantee (any item with true count > n/(k+1)
  * survives every shrink and merge) means no true heavy hitter can be
  * missed — then a second pass recounts only the candidates exactly.
  *
  * Why two passes: the sketch alone has approximate counts (each shrink
  * subtracts the evicted weight), and a plain groupBy-count of every token
  * shuffles the whole corpus vocabulary. Sketch-prune + exact-recount is
  * bounded on both sides: pass 1's shuffle carries at most k counters per
  * map task, pass 2's scan filters to ≤ k candidate tokens map-side before
  * any shuffle. The output is EXACT and deterministic (the sketch's
  * order-dependent intermediate state only affects which non-hitters tag
  * along as candidates), which is what makes the plain GROUP BY/HAVING SQL
  * an oracle for it. */
object HeavyHitters {

  /** Misra-Gries with weighted merge: subtract the (k+1)-th largest count
    * from everything and drop non-positive counters. The shrink is LAZY —
    * buffers grow to 2k before compacting back under k — so the per-item
    * cost is O(1) map update plus an O(k log k) compaction amortized over
    * ≥ k inserts, instead of a full sort per insert. Laziness only delays
    * decrements, so the superset guarantee (count > n/(k+1) survives) is
    * unchanged; it costs a bounded constant factor of state. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k > 0)
    private def compact(m: Map[String, Long]): Map[String, Long] = {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
    private def shrink(m: Map[String, Long], force: Boolean): Map[String, Long] =
      if (m.size <= k || (!force && m.size <= 2 * k)) m else compact(m)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      shrink(b.updated(t, b.getOrElse(t, 0L) + 1L), force = false)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      // map-side partial buffers ship at ≤ 2k entries; compact hard on
      // merge so the final state is back under k
      shrink(b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) },
        force = true)
    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** [[MisraGries]] plus a running total in the same buffer — lets the
    * discovery pass also yield the corpus token count without a separate
    * scan. */
  private final class MgWithTotal(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {
    private val mg = new MisraGries(k)
    override def zero: (Map[String, Long], Long) = (mg.zero, 0L)
    override def reduce(b: (Map[String, Long], Long), t: String): (Map[String, Long], Long) =
      (mg.reduce(b._1, t), b._2 + 1L)
    override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) =
      (mg.merge(a._1, b._1), a._2 + b._2)
    override def finish(b: (Map[String, Long], Long)): (Seq[String], Long) =
      (mg.finish(b._1), b._2)
    override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Long)]()
    override def outputEncoder: Encoder[(Seq[String], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[String], Long)]()
  }

  /** Tokens of `docs(textCol)` whose exact corpus count satisfies
    * cnt * thresholdDen > totalTokens (frequency > 1/thresholdDen).
    * `sketchK` must satisfy sketchK + 1 >= thresholdDen for the no-miss
    * guarantee; the default 8x slack also keeps the candidate set small.
    * Output: (term, cnt). */
  def frequentTokens(docs: DataFrame, textCol: String,
      thresholdDen: Long = 400L, sketchK: Int = 3200): DataFrame = {
    require(sketchK + 1 >= thresholdDen,
      s"sketch too small for threshold: need k+1 >= $thresholdDen")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
    // pass 1: bounded-state candidate discovery (k counters per task);
    // the total token count rides in the SAME aggregation buffer, so the
    // corpus is scanned twice overall, not three times
    val (candidates, total) = toks.select(explode(col("toks")).as("t"))
      .as[String]
      .select(new MgWithTotal(sketchK).toColumn.name("r"))
      .head()
    // pass 2: exact recount of candidates only — the isin filter prunes
    // map-side, so the shuffle carries <= |candidates| groups
    toks.select(explode(filter(col("toks"),
        t => t.isInCollection(candidates))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * thresholdDen > lit(total))
  }
}
