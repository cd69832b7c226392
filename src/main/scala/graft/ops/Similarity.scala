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

  /** Ordered-fold cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0d), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0d), (acc, x) => acc + x * x)
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

  /** Sign-bit signature of a vector under the hyperplanes, as a long. */
  def signature(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeCol, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine re-rank within same-signature buckets
    * across `nTables` independent hyperplane tables. Recall < 1 by design;
    * the tests measure it against [[bruteKnn]]. */
  def hyperplaneLshKnn(embeddings: DataFrame, k: Int = 5, nBits: Int = 8,
      nTables: Int = 4, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val sigCols = (0 until nTables).map { t =>
      signature(asDouble(col("embedding")), hyperplanes(dim, nBits, seed + t))
        .as(s"sig$t")
    }
    val signed = embeddings.select(
      (col("vec_id") +: asDouble(col("embedding")).as("emb") +: sigCols): _*)
    val exploded = signed.select(col("vec_id"), col("emb"),
      posexplode(array((0 until nTables).map(t => col(s"sig$t")): _*))
        .as(Seq("table_id", "sig")))
    val a = exploded.select(col("table_id"), col("sig"),
      col("vec_id").as("query_id"), col("emb").as("emb_q"))
    val b = exploded.select(col("table_id"), col("sig"),
      col("vec_id").as("neighbor_id"), col("emb").as("emb_n"))
    val cand = a.join(b, Seq("table_id", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "emb_q", "emb_n")
      .distinct()
      .withColumn("sim", cosine(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (brute,
    * oracle-friendly; the LSH variant above is the scale path).
    *
    * The norms are computed ONCE PER ROW before the pair join (sqrt(na) as
    * a column on each side) instead of per pair — with n^2/2 pairs that
    * removes two of the three array folds from the hot loop. The cosine
    * value is bit-identical: dot/(sqrt(na)*sqrt(nb)) with the same ordered
    * folds, just factored. */
  def cosineNearDupPairs(embeddings: DataFrame, minSimMicro: Long): DataFrame = {
    def side(idName: String, embName: String, normName: String) =
      embeddings.select(col("vec_id").as(idName), asDouble(col("embedding")).as(embName))
        .withColumn(normName,
          sqrt(aggregate(col(embName), lit(0.0d), (acc, x) => acc + x * x)))
    val a = side("id_a", "emb_a", "norm_a")
    val b = side("id_b", "emb_b", "norm_b")
    val dot = aggregate(zip_with(col("emb_a"), col("emb_b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim_micro",
        floor(dot / (col("norm_a") * col("norm_b")) * 1e6).cast("long"))
      .where(col("sim_micro") >= minSimMicro)
      .select("id_a", "id_b", "sim_micro")
  }
}
