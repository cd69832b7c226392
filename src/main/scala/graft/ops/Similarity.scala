package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), expression-only (codegen'd, no UDFs).
  *
  * - [[cosine]] computes the dot/norms as ORDERED left folds
  *   (zip_with + aggregate) in double precision, so the result is
  *   bit-reproducible across engines that fold in index order;
  * - [[bruteKnn]] is the exactness baseline: broadcast the (small) query
  *   set against the corpus, window-rank per query — at cluster scale the
  *   corpus side stays partitioned and only queries broadcast;
  * - [[hyperplaneLshKnn]] is the scale path: k-bit random-hyperplane
  *   signatures, candidates meet in same-signature buckets (one shuffle on
  *   an 8-byte key), exact re-rank inside the bucket.
  */
object Similarity {

  /** Ordered-fold cosine similarity of two array<double> columns.
    * Computed by the codegen'd [[graft.functions.VecOps]] kernels — the
    * identical IEEE op sequence as the `aggregate`/`zip_with` folds they
    * replaced (interpreted HOFs were the hot-loop cost; bit-equality with
    * the fold spelling is pinned in OpsSpec), so every DuckDB oracle
    * list_reduce replay still matches hash-exactly. */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.VecOps.dot(a, b)
    val na = graft.functions.VecOps.selfDot(a)
    val nb = graft.functions.VecOps.selfDot(b)
    dot / (sqrt(na) * sqrt(nb))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector (excluding self).
    * Output: (query_id, neighbor_id, rank, sim_micro) with similarity in
    * integer microunits for exact cross-engine comparison. */
  def bruteKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("emb_n"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("emb_q"))
    val scored = corpus.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  /** Deterministic random hyperplanes (dim x nBits) as literal arrays. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of a vector under the hyperplanes, as a long —
    * ONE native loop over the plane matrix (graft.functions.VecSignBits):
    * the per-plane spelling inlines nBits dot kernels into one generated
    * method, the same JIT-size trap as the argmin forest (adaptiveBits
    * can request 24 bits x 4 tables = 96 kernels). Identical bits: same
    * ascending dot folds, strict > 0. */
  def signature(vec: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.VecOps.signBits(vec, planes.toArray)

  /** (vec_id, table_id, sig) bucket rows — ids and 8-byte signatures ONLY,
    * so the bucket self-join never shuffles or compares embedding arrays. */
  private def bucketRows(embeddings: DataFrame, nBits: Int, nTables: Int,
      dim: Int, seed: Long): DataFrame = {
    // materialize the double-cast embedding once; inline, the cast would be
    // re-evaluated per signature bit (nBits * nTables copies per row)
    val sigCols = (0 until nTables).map { t =>
      signature(col("emb_d"), hyperplanes(dim, nBits, seed + t)).as(s"sig$t")
    }
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb_d"))
      .select((col("vec_id") +: sigCols): _*)
      .select(col("vec_id"),
        posexplode(array((0 until nTables).map(t => col(s"sig$t")): _*))
          .as(Seq("table_id", "sig")))
  }

  /** Distinct candidate id pairs meeting in any same-signature bucket.
    * The distinct runs over two long columns; embeddings are re-joined by
    * the callers only for the surviving candidates. */
  private def candidatePairs(embeddings: DataFrame, nBits: Int, nTables: Int,
      dim: Int, seed: Long, ordered: Boolean): DataFrame = {
    val buckets = bucketRows(embeddings, nBits, nTables, dim, seed)
    val a = buckets.select(col("table_id"), col("sig"), col("vec_id").as("id_a"))
    val b = buckets.select(col("table_id"), col("sig"), col("vec_id").as("id_b"))
    val joined = a.join(b, Seq("table_id", "sig"))
    val filtered =
      if (ordered) joined.where(col("id_a") < col("id_b"))
      else joined.where(col("id_a") =!= col("id_b"))
    filtered.select("id_a", "id_b").distinct()
  }

  /** LSH-bucketed ANN: exact cosine re-rank within same-signature buckets
    * across `nTables` independent hyperplane tables. Recall < 1 by design;
    * the tests measure it against [[bruteKnn]]. The bucket join and the
    * candidate-pair distinct carry only (id, id) — the embedding vectors are
    * re-joined afterwards for the surviving candidates only. */
  def hyperplaneLshKnn(embeddings: DataFrame, k: Int = 5, nBits: Int = 8,
      nTables: Int = 4, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val cand = candidatePairs(embeddings, nBits, nTables, dim, seed, ordered = false)
      .withColumnRenamed("id_a", "query_id").withColumnRenamed("id_b", "neighbor_id")
    val embQ = embeddings.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("emb_q"))
    val embN = embeddings.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("emb_n"))
    val scored = cand.join(embQ, Seq("query_id")).join(embN, Seq("neighbor_id"))
      .withColumn("sim", cosine(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  /** Signature width that keeps expected bucket size ~`targetBucket` as the
    * corpus grows: buckets must MULTIPLY with corpus size or same-bucket
    * pairs go quadratic (the fixed-cardinality-key trap). */
  def adaptiveBits(n: Long, targetBucket: Int = 8, maxBits: Int = 24): Int =
    math.min(maxBits, math.max(4,
      math.ceil(math.log(math.max(n, 1).toDouble / targetBucket) / math.log(2)).toInt))

  /** IVF cell count ∝ √corpus — the balance point of the two costs the
    * nLists knob trades: centroid assignment n·k against within-cell
    * pair work Σcell² ≈ n²/k. k = √(n/2) makes BOTH n^1.5 (a fixed k
    * leaves pair work quadratic — measured toxic at 20k vectors,
    * SCALING.md; k ∝ n flips the quadratic term onto assignment
    * instead). Same contract as [[adaptiveBits]] for the hyperplane
    * family. At 500 corpus vectors this yields 16 — the previously
    * registered fixed knob — so driver-scale outputs are unchanged. */
  def adaptiveLists(n: Long, minLists: Int = 4): Int =
    math.max(minLists,
      math.ceil(math.sqrt(math.max(n, 1).toDouble / 2.0)).toInt)

  /** [[adaptiveLists]] replayed in DuckDB SQL over CTE `emb` — keeps the
    * q57 oracle exact at any scale factor (the q19 `nbits` pattern). */
  def adaptiveListsSql(minLists: Int = 4): String =
    s"(SELECT greatest($minLists, CAST(ceil(sqrt(count(*) / 2.0)) AS INT)) FROM emb)"

  /** Embedding-cosine near-duplicate pairs above a threshold (brute,
    * oracle-friendly; the LSH variant above is the scale path).
    *
    * The norms are computed ONCE PER ROW before the pair join (sqrt(na) as
    * a column on each side) instead of per pair — with n^2/2 pairs that
    * removes two of the three array folds from the hot loop. The cosine
    * value is bit-identical: dot/(sqrt(na)*sqrt(nb)) with the same ordered
    * folds, just factored. */
  def cosineNearDupPairs(embeddings: DataFrame, minSimMicro: Long): DataFrame = {
    val a = normedSide(embeddings, "id_a", "emb_a", "norm_a")
    val b = normedSide(embeddings, "id_b", "emb_b", "norm_b")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim_micro", pairSimMicro)
      .where(col("sim_micro") >= minSimMicro)
      .select("id_a", "id_b", "sim_micro")
  }

  private def normedSide(embeddings: DataFrame, idName: String,
      embName: String, normName: String): DataFrame =
    embeddings.select(col("vec_id").as(idName), asDouble(col("embedding")).as(embName))
      .withColumn(normName,
        sqrt(graft.functions.VecOps.selfDot(col(embName))))

  private def pairSimMicro: Column = {
    val dot = graft.functions.VecOps.dot(col("emb_a"), col("emb_b"))
    floor(dot / (col("norm_a") * col("norm_b")) * 1e6).cast("long")
  }

  /** The scale path for embedding near-dup: candidate pairs meet in
    * hyperplane-signature buckets (the bucket join and distinct carry two
    * longs per row), then the EXACT cosine threshold is applied to the
    * candidates only. Recall < 1 by construction (measured vs the brute
    * variant in OpsSpec); the bucketing is deterministic, so a DuckDB
    * oracle replicating the same hyperplanes verifies it exactly.
    * Pass nBits = [[adaptiveBits]](corpus size) so bucket count scales
    * with the data. */
  def cosineNearDupPairsLsh(embeddings: DataFrame, minSimMicro: Long,
      nBits: Int, nTables: Int = 4, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val cand = candidatePairs(embeddings, nBits, nTables, dim, seed, ordered = true)
    cand
      .join(normedSide(embeddings, "id_a", "emb_a", "norm_a"), Seq("id_a"))
      .join(normedSide(embeddings, "id_b", "emb_b", "norm_b"), Seq("id_b"))
      .withColumn("sim_micro", pairSimMicro)
      .where(col("sim_micro") >= minSimMicro)
      .select("id_a", "id_b", "sim_micro")
  }

  /** Benchmark decontamination in EMBEDDING space: flag every corpus
    * vector whose cosine similarity to ANY benchmark vector reaches the
    * threshold — the fuzzy-semantic counterpart to the exact-phrase scan
    * (q43) and the n-gram decontamination (q70), catching paraphrased or
    * re-worded eval leakage that token-level matching misses.
    *
    * The asymmetry IS the scale story: an eval suite is 10^3–10^5 vectors
    * while the corpus is 10^12 docs, so the benchmark side (with its norms
    * precomputed once) is BROADCAST and the corpus is scanned ONCE —
    * corpus×bench scored rows flow into a partial (map-side) max
    * aggregate, so the one shuffle carries n scalar rows, no vectors. Dot
    * products use the codegen'd [[graft.functions.VecOps]] kernels. For a
    * benchmark too large to broadcast, the LSH/IVF machinery (q19/q23) is
    * the fallback — bucket both sides and score candidates only.
    *
    * Output per corpus vector: nearest benchmark id (smallest id on
    * floored-sim ties), max similarity in micro units, contaminated flag.
    * Deterministic end to end, so a DuckDB oracle replays it exactly. */
  def embeddingDecontaminate(embeddings: DataFrame, benchPred: Column,
      minSimMicro: Long): DataFrame = {
    val bench =
      normedSide(embeddings.filter(benchPred), "bench_id", "emb_b", "norm_b")
    val corpus =
      normedSide(embeddings.filter(!benchPred), "vec_id", "emb_a", "norm_a")
    corpus.crossJoin(org.apache.spark.sql.functions.broadcast(bench))
      .withColumn("sim_micro", pairSimMicro)
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim_micro"),
        (-col("bench_id")).as("neg_id"))).as("best"))
      .select(col("vec_id"),
        (-col("best.neg_id")).as("nearest_bench_id"),
        col("best.sim_micro").as("max_sim_micro"),
        (col("best.sim_micro") >= minSimMicro).as("contaminated"))
  }

  /** DuckDB SQL expression computing the SAME signature as [[signature]]
    * for an emb expression: identical plane constants (shortest-round-trip
    * double literals), identical ordered left folds, identical `> 0` sign
    * test — so the oracle can replicate the bucketing bit-for-bit. */
  def signatureSql(embExpr: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = p.mkString("CAST([", ",", "] AS DOUBLE[])")
      s"(CASE WHEN list_reduce(list_transform(list_zip($embExpr, $plane), " +
        s"p -> p[1]*p[2]), (x,y) -> x+y) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // =====================================================================
  // IVF (inverted-file) ANN — the coarse-quantizer scale path
  // =====================================================================

  /** Deterministic IVF coarse quantizer (k-means, Lloyd iterations).
    *
    * Determinism is the design constraint — the same input must give the
    * same cells on any partitioning and in any engine:
    *  - init: the `nLists` lowest-vec_id vectors, micro-quantized
    *    (floor(x*1e6) as long);
    *  - update: per-dimension MEAN computed as a LONG sum of the
    *    micro-quantized values divided by the member count — long addition
    *    is associative/commutative, so the result is independent of
    *    partition order (a double sum would not be);
    *  - assignment: squared-L2 ordered fold against the centroid literals,
    *    ties to the lowest cell id.
    *
    * Centroids round-trip through the driver once per iteration
    * (nLists x dim longs — the standard k-means driver state, bounded and
    * broadcast back as literals). Cells that lose all members keep their
    * previous centroid. Returns centroids in micro-units. */
  def ivfCentroidsMicro(embeddings: DataFrame, nLists: Int,
      iters: Int = 2): Array[Array[Long]] = {
    val emb = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb_d"))
    var centroids: Array[Array[Long]] =
      emb.orderBy("vec_id").limit(nLists).select("emb_d").collect()
        .map(_.getSeq[Double](0).toArray.map(d => math.floor(d * 1e6).toLong))
    var it = 0
    while (it < iters) {
      val sums = withCellId(emb, "emb_d", centroids)
        .select(col("list_id"), posexplode(col("emb_d")).as(Seq("pos", "v")))
        .groupBy("list_id", "pos")
        .agg(sum(floor(col("v") * 1e6).cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getAs[Int]("list_id"))(r.getAs[Int]("pos")) =
          math.floor(r.getAs[Long]("s").toDouble / r.getAs[Long]("n")).toLong
      }
      centroids = next
      it += 1
    }
    centroids
  }

  // ONE array Literal, not a dim-element CreateArray of scalar literals:
  // with nLists x dim scalar-literal nodes the assignment expression tree
  // blows past codegen method-size limits and falls back to interpretation
  private def centroidLit(cm: Array[Long]): Column =
    lit(cm.map(q => q.toDouble / 1e6))

  /** Squared-L2 distance-and-cell structs against every centroid. */
  private def ivfDistStructs(vec: Column, centroidsMicro: Array[Array[Long]]): Seq[Column] =
    centroidsMicro.toIndexedSeq.zipWithIndex.map { case (cm, j) =>
      val d = graft.functions.VecOps.l2sq(vec, centroidLit(cm))
      struct(d.as("d"), lit(j).as("j"))
    }

  /** Nearest cell id (argmin by (distance, cell id)) — ONE native
    * expression ([[graft.functions.VecArgMinL2]]) carrying the centroid
    * matrix as a reference object. The struct-forest spelling
    * (array_min over nLists struct(d, j) columns) compiles at any width
    * but its generated method exceeds HotSpot's JIT size budget past ~64
    * cells and runs as interpreted bytecode — measured 10x slower at 160
    * cells. Same argmin: bit-equal distance folds, ties to the lowest j. */
  def ivfAssign(vec: Column, centroidsMicro: Array[Array[Long]]): Column =
    graft.functions.VecOps.argMinL2(vec,
      centroidsMicro.map(_.map(_.toDouble / 1e6)))

  /** `df` + a `list_id` column: the nearest-cell assignment. */
  def withCellId(df: DataFrame, embCol: String,
      centroidsMicro: Array[Array[Long]]): DataFrame =
    df.withColumn("list_id", ivfAssign(col(embCol), centroidsMicro))

  /** IVF-partitioned ANN: corpus vectors live in their nearest coarse
    * cell; each query probes its `nProbe` nearest cells and re-ranks
    * exactly (cosine) inside them.
    *
    * The 100 TB shape this models: the corpus shuffles ONCE on `list_id`
    * (or is written bucketed by it, making repeated query batches
    * shuffle-free), queries are small and broadcast, and per-query work
    * drops from |corpus| to ~|corpus| * nProbe / nLists. Every neighbor
    * lives in exactly one cell, so probing never produces duplicate
    * candidate pairs (no distinct needed — contrast the multi-table LSH
    * path). Recall < 1 by design; measured vs [[bruteKnn]] in OpsSpec. */
  def ivfKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val centroids = ivfCentroidsMicro(embeddings, nLists, iters)
    val corpus = withCellId(embeddings
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("emb_n")),
      "emb_n", centroids)
    val probed = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("emb_q"))
      .withColumn("cells",
        slice(array_sort(array(ivfDistStructs(col("emb_q"), centroids): _*)), 1, nProbe))
      .select(col("query_id"), col("emb_q"), explode(col("cells.j")).as("list_id"))
    val scored = corpus.join(broadcast(probed), Seq("list_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  private def cmToDouble(cm: String) =
    s"list_transform($cm, q -> CAST(q AS DOUBLE)/1000000.0)"
  private def l2Sql(a: String, b: String) =
    s"list_reduce(list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)"

  /** The shared IVF centroid-chain CTEs (init, `iters` Lloyd rounds with
    * the micro-quantized long-sum update, final assignment) — everything
    * from `emb` through `assigned(vec_id, emb, list_id)`, without the WITH
    * keyword, so both the kNN (q23) and semantic-dedup (q57) oracles
    * replay the identical centroid evolution. */
  private def ivfChainCtes(nLists: Int, iters: Int, dim: Int): String =
    ivfChainCtes(nLists.toString, iters, dim)

  /** `nListsSql` is either an integer literal or a scalar subquery over
    * CTE `emb` (see [[adaptiveListsSql]]) — the init CTE filters on
    * row_number instead of LIMIT so both forms replay identically. */
  private def ivfChainCtes(nListsSql: String, iters: Int, dim: Int): String = {
    val quant = "list_transform(emb, x -> CAST(floor(x*1000000.0) AS BIGINT))"
    val init =
      s"""c0 AS (
         |  SELECT j, cm FROM (
         |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, $quant AS cm
         |    FROM emb)
         |  WHERE j < $nListsSql)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val prev = s"c${r - 1}"
      s"""a$r AS (
         |  SELECT vec_id, emb, list_id FROM (
         |    SELECT e.vec_id, e.emb, c.j AS list_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2Sql("e.emb", cmToDouble("c.cm"))}, c.j) AS rn
         |    FROM emb e CROSS JOIN $prev c) WHERE rn = 1),
         |s$r AS (
         |  SELECT list_id, pos,
         |    CAST(floor(CAST(sum(CAST(floor(emb[pos]*1000000.0) AS BIGINT)) AS DOUBLE)
         |         / count(*)) AS BIGINT) AS cq
         |  FROM a$r CROSS JOIN (SELECT unnest(range(1, $dim + 1)) AS pos) p
         |  GROUP BY 1, 2),
         |c$r AS (
         |  SELECT c.j, COALESCE(u.cm, c.cm) AS cm
         |  FROM $prev c LEFT JOIN
         |    (SELECT list_id AS j, list(cq ORDER BY pos) AS cm FROM s$r GROUP BY 1) u
         |    ON c.j = u.j)""".stripMargin
    }.mkString(",\n")
    val cf = s"c$iters"
    s"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |$init,
       |$rounds,
       |assigned AS (
       |  SELECT vec_id, emb, list_id FROM (
       |    SELECT e.vec_id, e.emb, c.j AS list_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${l2Sql("e.emb", cmToDouble("c.cm"))}, c.j) AS rn
       |    FROM emb e CROSS JOIN $cf c) WHERE rn = 1)""".stripMargin
  }

  /** The complete IVF chain as DuckDB SQL — init, `iters` Lloyd rounds
    * with the same micro-quantized long-sum update, assignment, probe, and
    * exact re-rank — over the same parquet table, so the driver verifies
    * the whole operator (centroid evolution included) independently.
    * Every arithmetic step mirrors the Spark expressions: ordered
    * list_reduce folds, floor(x*1e6) quantization, (d, j) tie-breaks. */
  def ivfKnnSql(queryPred: String, k: Int, nLists: Int, nProbe: Int,
      iters: Int, dim: Int): String = {
    val cf = s"c$iters"
    s"""WITH ${ivfChainCtes(nLists, iters, dim)},
       |probed AS (
       |  SELECT vec_id AS query_id, emb AS emb_q, list_id FROM (
       |    SELECT e.vec_id, e.emb, c.j AS list_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${l2Sql("e.emb", cmToDouble("c.cm"))}, c.j) AS rn
       |    FROM emb e CROSS JOIN $cf c WHERE $queryPred) WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    list_reduce(list_transform(list_zip(p.emb_q, a.emb), p2 -> p2[1]*p2[2]), (x,y) -> x+y)
       |      / (sqrt(list_reduce(list_transform(p.emb_q, x -> x*x), (x,y) -> x+y))
       |         * sqrt(list_reduce(list_transform(a.emb, x -> x*x), (x,y) -> x+y))) AS sim
       |  FROM probed p JOIN assigned a ON p.list_id = a.list_id
       |  WHERE p.query_id <> a.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
       |    CAST(floor(sim*1e6) AS BIGINT) AS sim_micro
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, sim_micro FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * coarse k-means cells (the deterministic IVF quantizer), exact cosine
    * over WITHIN-CELL pairs only, connected components over the
    * above-threshold pairs, keeper = component min. One row per vector:
    * (vec_id, keeper_id, kept) — the manifest a curation pass writes.
    *
    * 100 TB shape: this is SemDeDup's whole point — the pair set is
    * sum(cell²) instead of n²/2, and cell count is a knob that scales with
    * the corpus (nLists ∝ n keeps expected cell size constant). Vectors
    * shuffle ONCE on list_id; the components run star contraction
    * (O(log² n) rounds; `checkpointDir` makes the rounds durable). */
  def semanticDedup(embeddings: DataFrame, nLists: Int = 16, iters: Int = 2,
      minSimMicro: Long = 400000L,
      checkpointDir: Option[String] = None,
      onRound: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    val centroids = ivfCentroidsMicro(embeddings, nLists, iters)
    // assignment runs ONCE and the assigned corpus is materialized: three
    // consumers follow (both pair-join sides + the final manifest), and
    // the chunked-argmin barriers would otherwise defeat the column
    // pruning / exchange reuse that used to dedupe them. At cluster scale
    // this materialization is "write the corpus bucketed by list_id" —
    // the same once-per-corpus layout step as q23's IVF story.
    val cells = withCellId(embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        asDouble(col("embedding")).as("emb")), "emb", centroids)
      .withColumn("nrm",
        sqrt(graft.functions.VecOps.selfDot(col("emb"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cells.select(col("list_id"), col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("nrm").as("norm_a"))
    val b = cells.select(col("list_id"), col("vec_id").as("id_b"),
      col("emb").as("emb_b"), col("nrm").as("norm_b"))
    val pairs = a.join(b, Seq("list_id"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim_micro", pairSimMicro)
      .where(col("sim_micro") >= minSimMicro)
      .select(col("id_a"), col("id_b"))
      // materialize the (tiny: two longs per row) pair set ONCE — the
      // contraction's entry re-evaluates its input several times (verts,
      // first truncation, checksum), and each re-evaluation would re-run
      // the assignment + cell join, the expensive part of the plan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comp = Components.connectedComponentsStar(pairs, "id_a", "id_b",
      checkpointDir = checkpointDir, onRound = onRound)
    comp.count() // force the contraction (eager anyway) before unpersist
    pairs.unpersist()
    // materialize the (3 longs/vector) manifest so the corpus cache can be
    // released before returning — the operator is already eager (the
    // contraction loop ran), so this adds no new execution point
    val manifest = cells.select(col("vec_id"))
      .join(comp.select(col("id").as("vec_id"), col("component")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("keeper_id"))
      .withColumn("kept",
        when(col("keeper_id") === col("vec_id"), 1L).otherwise(0L))
      .localCheckpoint()
    cells.unpersist()
    manifest
  }

  /** [[semanticDedup]] as DuckDB SQL: the same centroid chain as the q23
    * oracle (via [[ivfChainCtes]]), the same factored cosine
    * (dot / (norm_a * norm_b), norms computed once per side), and a
    * recursive-CTE closure for the components. */
  def semanticDedupSql(nLists: Int, iters: Int, dim: Int,
      minSimMicro: Long): String =
    semanticDedupSql(nLists.toString, iters, dim, minSimMicro)

  /** Adaptive-knob variant: `nListsSql` replays [[adaptiveLists]] in SQL
    * (pass [[adaptiveListsSql]]()) so the oracle stays exact as the
    * corpus — and with it the registered cell count — grows. */
  def semanticDedupSql(nListsSql: String, iters: Int, dim: Int,
      minSimMicro: Long): String = {
    def nrm(e: String) =
      s"sqrt(list_reduce(list_transform($e, x -> x*x), (x,y) -> x+y))"
    val dot =
      "list_reduce(list_transform(list_zip(a.emb, b.emb), p2 -> p2[1]*p2[2]), (x,y) -> x+y)"
    s"""WITH RECURSIVE ${ivfChainCtes(nListsSql, iters, dim)},
       |normed AS (SELECT vec_id, emb, list_id, ${nrm("emb")} AS nrm FROM assigned),
       |pairs AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst
       |  FROM normed a JOIN normed b
       |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |  WHERE CAST(floor($dot / (a.nrm * b.nrm) * 1e6) AS BIGINT) >= $minSimMicro),
       |edges AS (
       |  SELECT src, dst FROM pairs
       |  UNION
       |  SELECT dst AS src, src AS dst FROM pairs),
       |verts AS (SELECT DISTINCT src AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS lbl FROM verts
       |  UNION
       |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id, min(lbl) AS keeper FROM reach GROUP BY id)
       |SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       |  CAST(COALESCE(c.keeper, e.vec_id) AS BIGINT) AS keeper_id,
       |  CAST(CASE WHEN COALESCE(c.keeper, e.vec_id) = e.vec_id
       |       THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM emb e LEFT JOIN comp c ON c.id = e.vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Greedy k-center (farthest-point) diversity selection
  // ------------------------------------------------------------------

  /** Greedy k-center / farthest-point selection (Gonzalez 1985's
    * 2-approximation — the coreset/diversity-sampling pass of a curation
    * pipeline: where dedup removes what is too CLOSE, this picks the k
    * docs that best SPREAD over embedding space, e.g. to seed balanced
    * annotation batches or evaluate coverage). Seed = lowest vec_id;
    * round r picks the vector farthest (max-min squared L2) from the
    * r-1 already chosen, ties to the lowest vec_id.
    *
    * Exactness: vectors quantize to integral micro units (the q46
    * floor(x*1e6) rule) so every distance is an exact integer in double
    * space (≤ dim·(2e6)² ≈ 2^45 « 2^53) — min/max/least are then
    * order-free and the DuckDB replay is hash-identical, no float drift.
    *
    * 100 TB shape: k passes over the corpus, each one map-side distance
    * update against ONE broadcast-literal center + a TakeOrdered(1) — no
    * pair join, no global sort; the running min-distance frame persists
    * across rounds (the eager-loop lesson, SCALING.md #3) and driver
    * state is k rows. Greedy k-center is inherently k scans; past a few
    * dozen centers run it over a uniform sample (the standard composition
    * — sampling preserves the 2-approx up to the sample bound). */
  def kCenterSelect(embeddings: DataFrame, k: Int, dim: Int = 8): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = embeddings.sparkSession
    val base = embeddings
      .select(col("vec_id"),
        transform(slice(asDouble(col("embedding")), 1, dim),
          x => floor(x * 1e6).cast("double")).as("e"))
      .persist()
    val seed = base.orderBy("vec_id").limit(1).collect()
    require(seed.nonEmpty, "kCenterSelect over an empty embeddings table")
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getAs[Seq[Double]]("e").toArray
    var picked = Vector[(Long, Long)]((seed(0).getAs[Long]("vec_id"), 0L))
    var cur = base.withColumn("dmin",
      graft.functions.VecOps.l2sq(col("e"),
        typedLit(vecOf(seed(0)).toSeq))).persist()
    (2 to k).foreach { _ =>
      val next = cur.orderBy(col("dmin").desc, col("vec_id").asc)
        .limit(1).collect()(0)
      picked :+= ((next.getAs[Long]("vec_id"),
        next.getAs[Double]("dmin").toLong))
      val updated = cur.withColumn("dmin",
        least(col("dmin"), graft.functions.VecOps.l2sq(col("e"),
          typedLit(vecOf(next).toSeq)))).persist()
      updated.count() // materialize before dropping the parent
      cur.unpersist()
      cur = updated
    }
    cur.unpersist()
    base.unpersist()
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, d), i) => (i + 1L, id, d) }
      .toDF("round", "vec_id", "dist_micro2")
  }

  /** [[kCenterSelect]] as DuckDB SQL: k unrolled CTE rounds (the
    * Bpe.learnMergesSql pattern — generated from the same constants so
    * engine and oracle cannot drift), identical quantization, distance
    * arithmetic, and (dmin desc, vec_id) tie-break. */
  def kCenterSql(k: Int, dim: Int = 8): String = {
    require(k >= 1)
    def l2(a: String, b: String): String =
      s"list_reduce(list_transform(list_zip($a, $b), " +
        s"p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)"
    val sb = new StringBuilder
    sb.append(
      s"""WITH emb AS (
         |  SELECT vec_id,
         |    list_transform((embedding::DOUBLE[])[1:$dim],
         |      x -> floor(x * 1000000)) AS e
         |  FROM embeddings),
         |c1 AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 1),
         |d1 AS (
         |  SELECT emb.vec_id, emb.e, ${l2("emb.e", "c1.e")} AS dmin
         |  FROM emb, c1)""".stripMargin)
    for (r <- 2 to k) {
      sb.append(
        s""",
           |c$r AS (SELECT vec_id, e, dmin FROM d${r - 1}
           |  ORDER BY dmin DESC, vec_id ASC LIMIT 1),
           |d$r AS (
           |  SELECT d.vec_id, d.e, least(d.dmin, ${l2("d.e", "c.e")}) AS dmin
           |  FROM d${r - 1} d, c$r c)""".stripMargin)
    }
    sb.append(
      "\nSELECT CAST(1 AS BIGINT) AS round, vec_id, " +
        "CAST(0 AS BIGINT) AS dist_micro2 FROM c1")
    for (r <- 2 to k) {
      sb.append(
        s"\nUNION ALL\nSELECT CAST($r AS BIGINT), vec_id, " +
          s"CAST(dmin AS BIGINT) FROM c$r")
    }
    sb.toString
  }
}
