package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) file clustering — multi-dimensional data skipping for
  * the lakehouse layout (Iceberg/Delta `ZORDER BY`). A table sorted by one
  * column gives tight per-file min/max stats on THAT column only: a
  * predicate on the second dimension hits every file. Clustering by the
  * interleaved z-value keeps per-file ranges tight on BOTH dimensions, so
  * one layout serves predicates on either (or both) — the difference
  * between a pruned scan and a table scan for the non-leading dimension.
  *
  * Everything here is DETERMINISTIC by construction (no
  * `repartitionByRange` sampling): dimensions quantize to 16 bits with
  * integer arithmetic, the z-value is a native codegen'd expression
  * ([[graft.functions.InterleaveBits16]]), and bucket assignment is a
  * rank over (z, id) computed with [[Packing]]'s two-pass distributed
  * prefix sum — no SinglePartition window, and the same layout falls out
  * on every run, partitioning, and engine (the x58 oracle replays it in
  * SQL).
  *
  * 100 TB shape: one shuffle to rank (the prefix-sum pass) + the write's
  * own partitioning by bucket; stats are one small agg per bucket. A
  * predicate then prunes buckets (files) from the stats alone — the
  * manifest-level skip, same contract as Checkpointing.readRange but in
  * two dimensions.
  */
object ZOrder {

  /** Integer 16-bit quantization of `c` over the CLOSED range [lo, hi]:
    * ((c - lo) * 65535) div (hi - lo), exact in long arithmetic (never a
    * double division — floor(a/b) of longs can round across the boundary
    * in IEEE space when b is large). Degenerate range maps to 0. */
  def quantize16(c: Column, lo: Long, hi: Long): Column = {
    require(hi >= lo, s"bad quantization range [$lo, $hi]")
    if (hi == lo) lit(0L)
    else {
      val cExpr = org.apache.spark.sql.graftbridge.ColumnBridge
      // (c - lo) * 65535 div (hi - lo) with div = integral division
      val scaled = (c.cast("long") - lit(lo)) * lit(65535L)
      cExpr.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        cExpr.expression(scaled), cExpr.expression(lit(hi - lo))))
    }
  }

  /** Deterministic z-order bucket layout: quantize both dims over their
    * observed bounds, interleave, rank by (z, tie id), assign bucket =
    * rank * nBuckets div count. Output adds qa, qb, zval, zbucket.
    *
    * `idCol` must be unique (the rank tiebreak that makes the layout
    * total). Bounds are one tiny agg (collected — 4 longs, not data). */
  def zbucketed(df: DataFrame, aCol: String, bCol: String, idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val b = df.agg(min(col(aCol)).cast("long"), max(col(aCol)).cast("long"),
      min(col(bCol)).cast("long"), max(col(bCol)).cast("long")).collect()(0)
    val (aLo, aHi, bLo, bHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val q = df
      .withColumn("qa", quantize16(col(aCol), aLo, aHi))
      .withColumn("qb", quantize16(col(bCol), bLo, bHi))
      .withColumn("zval",
        graft.functions.InterleaveBits16.zvalue(col("qa"), col("qb")))
    rankBuckets(q, sortCol = "zval", idCol = idCol, nBuckets = nBuckets,
      bucketCol = "zbucket")
  }

  /** The linear-layout control: same deterministic rank-bucket machinery
    * ordered by ONE quantized dimension (the classic sort-by-leading-column
    * layout z-order is compared against). Requires qa/qb present. */
  def linearBucketed(q: DataFrame, leadCol: String, idCol: String,
      nBuckets: Int): DataFrame =
    rankBuckets(q, sortCol = leadCol, idCol = idCol, nBuckets = nBuckets,
      bucketCol = "linbucket")

  /** rank over (sortCol, idCol) -> bucket = rank * n div count, via the
    * distributed two-pass prefix sum (fixed-width sortable string key:
    * zero-padded sort value then zero-padded id). */
  private def rankBuckets(df: DataFrame, sortCol: String, idCol: String,
      nBuckets: Int, bucketCol: String): DataFrame = {
    val keyed = df.withColumn("__zk",
      concat(lpad(col(sortCol).cast("string"), 19, "0"),
        lpad(col(idCol).cast("string"), 19, "0")))
      .withColumn("__one", lit(1L))
    val total = df.count()
    val ranked = Packing.packSequencesBy(
      keyed.select(col("__zk"), col("__one")), "__zk", "__one",
      budget = Long.MaxValue)
      .select(col("__zk"),
        expr(s"stream_offset * $nBuckets div $total").as(bucketCol))
    keyed.join(ranked, "__zk").drop("__zk", "__one")
  }

  /** Per-bucket min/max stats on both quantized dims — the manifest entry
    * a reader prunes with. */
  def bucketStats(bucketed: DataFrame, bucketCol: String): DataFrame =
    bucketed.groupBy(col(bucketCol).as("bucket"))
      .agg(min("qa").as("qa_min"), max("qa").as("qa_max"),
        min("qb").as("qb_min"), max("qb").as("qb_max"))

  /** Aggregate counting the buckets a box predicate [qaLo..qaHi] x
    * [qbLo..qbHi] must read under [[bucketStats]] rows (pass the full
    * 0..65535 range on a dim for a single-dimension probe). */
  def bucketsHit(qaLo: Long, qaHi: Long,
      qbLo: Long, qbHi: Long): Column =
    sum(when(col("qa_max") >= qaLo && col("qa_min") <= qaHi &&
      col("qb_max") >= qbLo && col("qb_min") <= qbHi, 1L).otherwise(0L))
}
