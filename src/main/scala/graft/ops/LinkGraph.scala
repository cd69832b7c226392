package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph curation signals: the domain-authority propagation a
  * crawl-curation pipeline runs over its (src, dst) link table before
  * sampling — seed-quality expansion, spam-neighborhood discounting,
  * crawl-frontier prioritization all reduce to a few damped power
  * iterations over the domain graph.
  *
  * Everything is INTEGER arithmetic on purpose: float power iteration is
  * order-dependent (parallel sums), so two runs at different parallelism
  * disagree in the low bits and no external engine can replay the result
  * bit-exactly. Scaled-integer ranks commute, making the operator
  * deterministic at any partitioning and oracle-replayable (q95 unrolls
  * the same iterations in DuckDB SQL).
  */
object LinkGraph {

  /** Fixed-iteration damped PageRank over a simple directed graph:
    *
    *   rank_0(v)   = scale
    *   rank_t+1(v) = scale*(dampDen-dampNum)/dampDen
    *               + Σ_{(u,v)∈E} (rank_t(u) * dampNum) DIV (dampDen * outDeg(u))
    *
    * with every division integer (floor). Edges are deduplicated and
    * self-loops dropped (simple-graph contract); dangling-node mass
    * (out-degree 0) is dropped — the standard simplification, documented
    * rather than redistributed, so total mass shrinks monotonically and
    * ranks stay bounded by nodes*scale (no overflow for any corpus that
    * fits a Long id space: n·scale·dampNum ≤ 2^63 for n ≤ 10^11 at the
    * default scale).
    *
    * Scale shape (10^12-edge graph): the edge table shuffles ONCE (the
    * out-degree join keys on src; the persisted result is reused every
    * iteration), then each iteration moves only fixed-width scalars —
    * ranks join the standing (src, dst, out_deg) frame on src, per-edge
    * contributions partially aggregate map-side into one (dst, mass)
    * shuffle, and the node relabel is a left join on id. Lineage is
    * truncated per iteration (localCheckpoint, the [[Components]]
    * discipline) so the plan does not double per round. Returns
    * (domain_id, rank).
    *
    * `seeds` switches to TOPIC-SENSITIVE rank (seed-quality expansion —
    * the crawl-curation use: propagate trust outward from a vetted seed
    * list): the teleport mass lands ONLY on seed nodes (rank_0 = scale on
    * seeds / 0 elsewhere; the per-iteration base term likewise), so
    * authority flows strictly out of the seed set along links. The seed
    * frame's first column is cast to long ids; seeds broadcast (a seed
    * list is small by construction) and seeds with no edges are outside
    * the node set and carry no rank — documented, not an error. */
  def domainRank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // one edge shuffle total: src-keyed join materialized once, every
    // iteration's rank join reuses it
    val withDeg = e.join(deg, "src").persist()
    val bare = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nodes = (seeds match {
      case Some(sd) =>
        val s = sd.select(col(sd.columns.head).cast("long").as("id"))
          .distinct().withColumn("is_seed", lit(true))
        bare.join(broadcast(s), Seq("id"), "left")
          .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => bare.withColumn("is_seed", lit(true))
    }).persist()
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.select(col("id"),
      when(col("is_seed"), scale).otherwise(0L).as("rank"))
    (1 to iters).foreach { _ =>
      val mass = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          expr(s"(rank * ${dampNum}L) DIV (${dampDen}L * out_deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(mass.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed"), base).otherwise(0L) +
            coalesce(col("in_mass"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    withDeg.unpersist(); nodes.unpersist()
    ranks.select(col("id").as("domain_id"), col("rank").cast("long").as("rank"))
  }
}
