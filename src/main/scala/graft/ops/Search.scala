package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus keyword search: BM25-family ranking over the documents table.
  * No reference counterpart (the reference's "search" is the criterion
  * header predicate); engine-only addition — a training-data pipeline uses
  * this shape for corpus exploration and contamination checks (find docs
  * matching benchmark phrases).
  *
  * Scale design: the postings list is built ONLY for the query terms —
  * tokens are filtered map-side inside the array (before the explode), so
  * the shuffle carries (doc_id, term, tf) for matching docs, not the
  * corpus. Doc-frequency and corpus stats are broadcast (a handful of
  * rows). Top-k uses orderBy+limit, which Spark executes as
  * TakeOrderedAndProject — per-partition heaps merged on the driver, no
  * global sort, no single-partition window.
  *
  * Bit-exactness: the classic idf is ln((N-df+.5)/(df+.5)+1), but ln() is
  * not IEEE-754-exact and differs across math libraries, which would make
  * the DuckDB oracle flaky at the last ulp. The idf here is the same
  * fraction WITHOUT the log — monotone in the standard idf, so ranking
  * semantics are preserved — and avgdl enters as exact integer corpus
  * totals (sum_dl, n_docs), so every arithmetic step is IEEE +,-,*,/ on
  * identically-derived doubles and the oracle compares exactly.
  */
object Search {

  /** Shared BM25 scorer: `tf` = (doc_id, dl, term, tf) rows for the query
    * terms only; `corpus` = one (n_docs, sum_dl) row. Both the full-scan
    * path ([[bm25TopK]]) and the index path ([[bm25FromIndex]]) feed this
    * IDENTICAL expression tree, so their float sequences — and therefore
    * the DuckDB oracle hashes — agree bit-for-bit. */
  private def bm25Score(tf: DataFrame, corpus: DataFrame,
      terms: Seq[String], k: Int, k1: Double, b: Double): DataFrame = {
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("sc",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") * col("n_docs") / col("sum_dl"))))
    // fixed-order summation over the (small, sorted) term list so the
    // float total is identical in any engine: s = ((s_t1 + s_t2) + ...)
    val perTerm = terms.map(t =>
      sum(when(col("term") === t, col("sc")).otherwise(lit(0.0))).as(s"s_$t"))
    val agg = scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
    val total = terms.map(t => col(s"s_$t")).reduce(_ + _)
    val top = agg.select(col("doc_id"), total.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank over the k collected rows only — tiny, not a corpus window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"),
        floor(col("score") * lit(1e6)).cast("long").as("score_micro"))
  }

  /** Top-k docs for `queryTerms` by summed per-term BM25 score.
    * Output: (doc_id, rank, score_micro) with rank 1-based by
    * (score desc, doc_id asc). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    val wl = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    val corpus = wl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val tf = wl
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => t.isInCollection(terms))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    bm25Score(tf, corpus, terms, k, k1, b)
  }

  /** Build the persistent keyword index for [[bm25FromIndex]]: postings
    * (term, doc_id, tf, dl — dl denormalized onto the posting so the query
    * path needs no per-doc join) and docStats (doc_id, dl — kept separately
    * because docs whose text matches NO query term, including empty docs,
    * still count in n_docs/sum_dl).
    *
    * Both frames are ADDITIVE in documents: indexing a new batch appends
    * its postings/stats rows and touches nothing existing — the property
    * that makes the index a committed APPEND-only table at 100 TB
    * (partition/bucket postings by term for query-time file skipping),
    * with ingest cost ∝ delta instead of a corpus rescan. */
  def buildIndex(docs: DataFrame): (DataFrame, DataFrame) = {
    val wl = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    val postings = wl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    (postings, wl.select(col("doc_id"), col("dl")))
  }

  /** BM25 top-k answered FROM the index — no corpus scan: the postings
    * filter touches only the query terms' rows (file-skippable when the
    * postings table is partitioned by term), corpus stats reduce docStats,
    * and the scorer is the [[bm25TopK]] expression tree verbatim — so an
    * incrementally-grown index provably returns the same ranking, floats
    * and all, as a from-scratch scan of the merged corpus. */
  def bm25FromIndex(postings: DataFrame, docStats: DataFrame,
      queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    val corpus = docStats.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val tf = postings
      .filter(col("term").isInCollection(terms))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    bm25Score(tf, corpus, terms, k, k1, b)
  }

  /** Hybrid retrieval: a BM25 keyword leg and an embedding-cosine leg
    * fused with reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher,
    * SIGIR 2009): score(d) = Σ_legs 1/(rrfK + rank_leg(d)), missing legs
    * contribute 0. The standard zero-training fusion a RAG-curation
    * pipeline uses to combine lexical and semantic recall.
    *
    * Scale design: each leg is already top-k-bounded — the BM25 leg is
    * [[bm25TopK]] (query-term postings only + TakeOrderedAndProject), the
    * vector leg is a single broadcast query vector against the corpus
    * (one map-side cosine pass + TakeOrderedAndProject; the multi-query /
    * repeated-query path is IVF, q23). The fusion join therefore sees two
    * ≤kLeg-row frames — nothing corpus-sized crosses the fusion step.
    *
    * Bit-exactness: ranks are integers; each leg's contribution is the
    * IEEE-exact division 1.0/(rrfK+rank) (numerator/denominator both
    * exactly representable), summed in fixed leg order (text + vec), so
    * the DuckDB oracle compares scores exactly.
    *
    * Output: (doc_id, rank, rank_text, rank_vec, score_nano), rank 1-based
    * by (score desc, doc_id asc); rank_text/rank_vec NULL when the doc was
    * absent from that leg's top-kLeg. */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int = 20, kLeg: Int = 50,
      rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val text = bm25TopK(docs, queryTerms, kLeg, k1, b)
      .select(col("doc_id"), col("rank").as("rank_text"))
    // NOT bruteKnn: its per-query Window would put the WHOLE corpus in one
    // partition for a single query. One broadcast query vector + global
    // orderBy/limit = TakeOrderedAndProject (per-partition heaps).
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("emb_q"))
    val scored = embeddings
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("emb_n"))
      .join(broadcast(q), col("query_id") =!= col("doc_id"))
      .select(col("doc_id"),
        Similarity.cosine(col("emb_q"), col("emb_n")).as("sim"))
    val vecTop = scored.orderBy(col("sim").desc, col("doc_id")).limit(kLeg)
    val wv = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("doc_id"))
    val vec = vecTop.withColumn("rank_vec", row_number().over(wv))
      .select(col("doc_id"), col("rank_vec"))
    val leg = (r: String) =>
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(r).cast("double")), lit(0.0))
    val fused = text.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_text"), col("rank_vec"),
        (leg("rank_text") + leg("rank_vec")).as("score"))
    val top = fused.orderBy(col("score").desc, col("doc_id")).limit(k)
    // rank over the k collected rows only, as in bm25TopK
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"), col("rank_text"), col("rank_vec"),
        floor(col("score") * lit(1e9)).cast("long").as("score_nano"))
  }

  /** DuckDB replay of [[hybridRrf]] — nests [[bm25Sql]] as the text-leg
    * subquery and the q17 cosine spelling (identical fold order to
    * VecDot/selfDot) as the vector leg; same fixed leg-order summation. */
  def hybridRrfSql(toksExpr: String, queryTerms: Seq[String],
      queryVecId: Long, k: Int, kLeg: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val dot = "list_reduce(list_transform(list_zip(q.emb, n.emb), p -> p[1]*p[2]), (x,y) -> x+y)"
    val nq = "list_reduce(list_transform(q.emb, x -> x*x), (x,y) -> x+y)"
    val nn = "list_reduce(list_transform(n.emb, x -> x*x), (x,y) -> x+y)"
    def leg(r: String) =
      s"COALESCE(CAST(1 AS DOUBLE)/(CAST($rrfK AS DOUBLE) + CAST($r AS DOUBLE)), CAST(0 AS DOUBLE))"
    s"""WITH bm AS (
       |  SELECT doc_id, rank AS rank_text FROM (
       |    ${bm25Sql(toksExpr, queryTerms, kLeg, k1, b).replace("\n", "\n    ")})),
       |emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |scored AS (
       |  SELECT n.vec_id AS doc_id, $dot / (sqrt($nq) * sqrt($nn)) AS sim
       |  FROM emb q JOIN emb n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id = $queryVecId),
       |vec AS (
       |  SELECT doc_id, rank_vec FROM (
       |    SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INT) AS rank_vec
       |    FROM scored) WHERE rank_vec <= $kLeg),
       |fused AS (
       |  SELECT doc_id, rank_text, rank_vec,
       |    ${leg("rank_text")} + ${leg("rank_vec")} AS score
       |  FROM bm FULL OUTER JOIN vec USING (doc_id)),
       |top AS (SELECT * FROM fused ORDER BY score DESC, doc_id LIMIT $k)
       |SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       |  rank_text, rank_vec, CAST(floor(score * 1e9) AS BIGINT) AS score_nano
       |FROM top""".stripMargin
  }

  /** The DuckDB replay of [[bm25TopK]] — identical expression tree, term
    * order, and summation order. Float literals are printed from the SAME
    * Scala doubles the engine uses (Double.toString round-trips exactly),
    * so e.g. k1+1 lands on the identical double even when it is not the
    * nearest double to the decimal "2.2". */
  def bm25Sql(toksExpr: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    val termList = terms.map(t => s"'$t'").mkString("[", ",", "]")
    val (k1p1, k1s, oneMinusB, bs) =
      (s"${k1 + 1.0}", s"$k1", s"${1.0 - b}", s"$b")
    val perTerm = terms.map(t =>
      s"sum(CASE WHEN term = '$t' THEN sc ELSE 0.0 END)").toList
    val total = perTerm.map(e => s"($e)").reduce((a, b) => s"($a + $b)")
    s"""WITH wl AS (
       |  SELECT doc_id, $toksExpr AS toks,
       |    CAST(len($toksExpr) AS DOUBLE) AS dl
       |  FROM documents),
       |corpus AS (SELECT count(*) AS n_docs, sum(CAST(dl AS BIGINT)) AS sum_dl FROM wl),
       |tf AS (
       |  SELECT doc_id, dl,
       |    unnest(list_filter(toks, t -> list_contains($termList, t))) AS term
       |  FROM wl),
       |tfc AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
       |        FROM tf GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
       |s AS (
       |  SELECT doc_id, term,
       |    ((n_docs - df + 0.5) / (df + 0.5)) * (tf * $k1p1) /
       |      (tf + $k1s * ($oneMinusB + (($bs * dl) * n_docs) / sum_dl)) AS sc
       |  FROM tfc JOIN dfreq USING (term) CROSS JOIN corpus),
       |agg AS (SELECT doc_id, $total AS score FROM s GROUP BY doc_id),
       |top AS (SELECT doc_id, score FROM agg
       |        ORDER BY score DESC, doc_id LIMIT $k)
       |SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       |  CAST(floor(score * 1e6) AS BIGINT) AS score_micro
       |FROM top""".stripMargin
  }
}
