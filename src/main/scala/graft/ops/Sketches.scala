package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan) over corpus token counts:
  * the point-frequency member of the mergeable-sketch family — HLL covers
  * cardinality (q36/q54), Misra-Gries covers top-k (q45), CMS answers
  * "how often does THIS token occur?" for any token, from depth×width
  * counters regardless of corpus or vocabulary size.
  *
  * Scale shape: the corpus-scale shuffle is the token-count aggregation
  * (map-side partial, vocabulary-sized scalar rows — the q74 word-count
  * shape); the sketch expansion (×depth) runs over that VOCAB-sized frame,
  * never the corpus, and folds to at most depth×width rows. Sketches are
  * persistable tables and merge by plain bucket-wise SUM — merging
  * per-shard sketches is EXACT (counter addition commutes with the hash
  * placement), so incremental corpus profiling never rescans old shards.
  *
  * Determinism: bucket = pmod(fingerprint64(token ⊕ salt ⊕ row), width)
  * with width a power of two, so DuckDB's unsigned HUGEINT fold mod width
  * equals Spark's signed pmod (low bits — the q75 invariant). Estimates
  * are min-over-rows of exact integer sums: bit-reproducible anywhere,
  * and ≥ the true count by construction (one-sided error).
  */
object Sketches {

  /** Per-row/bucket CMS cells for one token-count frame.
    * Input: (token, cnt). Output: (row, bucket, cnt) — ≤ depth×width rows. */
  def cmsFromCounts(counts: DataFrame, depth: Int, width: Int,
      salt: String): DataFrame = {
    require(depth > 0 && width > 0 && (width & (width - 1)) == 0,
      s"width must be a positive power of two (got $width): the unsigned-" +
        "vs-signed mod equivalence the cross-engine oracle relies on")
    counts
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"),
        pmod(TextAnalysis.fingerprint64(
          concat(col("token"), lit(salt), col("row").cast("string"))),
          lit(width.toLong)).as("bucket"),
        col("cnt"))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Corpus tokens → counts → CMS. The only corpus-scale stage is the
    * token count (scalar rows, map-side combine). */
  def cmsBuild(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      salt: String = ":cms"): DataFrame =
    cmsFromCounts(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt")),
      depth, width, salt)

  /** Bucket-wise sum of any number of sketches built with the same
    * (depth, width, salt) — the EXACT merge (counter addition commutes
    * with placement, unlike HLL's lossy register max). */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Mergeable log₂ histogram: value → bucket floor(log₂ v) computed as
    * EXACT integer bit length (`length(bin(v)) - 1` — no floating log, so
    * every engine buckets identically), counted per (group, bucket). The
    * sketch is ≤ 64 rows per group at ANY corpus size, persists as a
    * table, and merges by bucket-wise sum (exact, like [[cmsMerge]]) —
    * the incremental shape for corpus-wide length/size profiling where
    * exact percentiles (q44) would need a full re-sort per refresh.
    * Non-positive values are excluded (no integer log). */
  def logHistogram(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol) > 0)
      .select(col(groupCol),
        (length(bin(col(valueCol))) - 1).cast("int").as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Bucket-wise sum of log-histograms over the same grouping. */
  def histMerge(hists: Seq[DataFrame]): DataFrame = {
    val Seq(g, b) = hists.head.columns.take(2).toSeq
    hists.reduce(_ unionByName _)
      .groupBy(col(g), col(b)).agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile buckets from a log-histogram: for each percentile p, the
    * smallest bucket whose cumulative count covers p% of the group (the
    * integer comparison cum·100 ≥ p·n — no ceil, no floats). Output per
    * (group, p): the bucket and its [lo, hi) power-of-two bounds — the
    * true p-th value provably lies in that range. The windows here run
    * over the SKETCH (≤ 64 rows per group), never the corpus. */
  def histQuantiles(hist: DataFrame, groupCol: String,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val byG = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byG.orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(byG))
    cum
      .select(col(groupCol), col("bucket"), col("cum"), col("n"),
        explode(lit(ps.toArray)).as("p"))
      .filter(col("cum") * 100 >= col("p") * col("n"))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n"))
      .select(col(groupCol), col("p"), col("bucket"),
        expr("shiftleft(1L, bucket)").as("lo"),
        expr("shiftleft(1L, bucket + 1)").as("hi"),
        col("n"))
  }

  /** Point estimates for probe tokens: min over depth rows of the probed
    * cells. The sketch (≤ depth×width rows) broadcasts; absent cells read
    * as 0 (a token never hashed there). Output: (token, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, depth: Int,
      width: Int, salt: String): DataFrame =
    probes
      .select(col("token"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket",
        pmod(TextAnalysis.fingerprint64(
          concat(col("token"), lit(salt), col("row").cast("string"))),
          lit(width.toLong)))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
