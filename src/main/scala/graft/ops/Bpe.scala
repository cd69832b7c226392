package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016; the GPT-2
  * tokenizer-training algorithm) as a distributed Spark job — the
  * operation that turns a raw corpus into a tokenizer's merge table.
  *
  * Word-level BPE: the corpus collapses to (word, count) — ONE
  * corpus-scale aggregation, everything after is vocabulary-scale — each
  * word starts as its character sequence, and each round merges the
  * globally most frequent adjacent symbol pair (ties broken by pair text
  * ascending, making the whole run deterministic).
  *
  * Representation: every word is kept as a MARKER-ENCODED symbol string —
  * each symbol wrapped as <S>sym<E> (U+0001/U+0002 markers) — so that applying a merge is a
  * literal string replace of "<S>L<E><S>R<E>" with "<S>LR<E>". Both the JVM's and SQL's replace() scan
  * left-to-right over non-overlapping occurrences, which IS greedy BPE
  * application, so engine and oracle agree by construction (the markers
  * make cross-symbol false matches impossible; corpus tokens are
  * whitespace-split and control-char-free, so they never contain the
  * markers). No per-round UDF: pair extraction is regexp_extract_all +
  * array ops, the merge is replace() — all codegen'd.
  *
  * Per round: one vocabulary-scale shuffle (pair counts) + a 1-row
  * TakeOrdered to the driver (the argmax — BPE is inherently sequential
  * in its merge choices; the driver sees one winner row per round, like
  * the per-iteration centroids of q23's Lloyd loop). At web scale the
  * vocab table is millions of rows against a corpus of trillions of
  * tokens: the expensive pass is the initial word count, the loop is
  * cheap and its shuffles are bounded by the vocabulary, not the corpus.
  */
object Bpe {

  final val S = "\u0001" // symbol start marker
  final val E = "\u0002" // symbol end marker

  /** Learn `nMerges` merges. Returns one row per merge:
    * (rank, left_sym, right_sym, merged, cnt). */
  def learnMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    // corpus -> (word, count): the single corpus-scale pass
    // tokens carrying the marker bytes would corrupt the encoding — a
    // cleaned corpus never has them (unicodeClean strips C0 controls),
    // but an uncleaned one must not silently mis-merge
    val words = docs
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(S) && !col("w").contains(E))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // initial encoding: every character wrapped in markers
    var vocab = words.select(
      regexp_replace(col("w"), "(.)", S + "$1" + E).as("enc"),
      col("cnt"))
    vocab.persist()
    vocab.count()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    while (r <= nMerges) {
      val syms = regexp_extract_all(col("enc"), lit(S + "([^" + E + "]*)" + E), lit(1))
      val pairs = vocab
        .select(col("cnt"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("s")) - 2),
          i => struct(element_at(col("s"), i + 1).as("l"),
            element_at(col("s"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
      val top = pairs
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus exhausted after ${r - 1} merges — fewer pairs than nMerges=$nMerges")
      val (l, rr, c) =
        (top(0).getAs[String]("l"), top(0).getAs[String]("r"), top(0).getAs[Long]("c"))
      merges += ((r, l, rr, l + rr, c))
      val next = vocab.select(
        replace(col("enc"), lit(S + l + E + S + rr + E), lit(S + l + rr + E))
          .as("enc"),
        col("cnt"))
      next.persist()
      next.count()
      vocab.unpersist()
      vocab = next
      r += 1
    }
    vocab.unpersist()
    import spark.implicits._
    merges.result().toDF("rank", "left_sym", "right_sym", "merged", "cnt")
      .select(col("rank").cast("long"), col("left_sym"), col("right_sym"),
        col("merged"), col("cnt"))
  }

  /** Apply learned merges to the corpus — the tokenize step a trained BPE
    * vocabulary exists for. Re-learns `nMerges` merges, then encodes every
    * token and applies the merges in rank order as chained literal
    * replaces (all codegen'd; the 8-deep replace chain is one projection).
    * Output per doc: (doc_id, n_tokens, n_chars_tok, n_bpe_tokens,
    * chars_per_bpe_micro) — the compression the learned vocab achieves.
    *
    * The merge table is collected to the driver and inlined as literals
    * (nMerges rows — broadcast-sized by definition); the corpus pass is
    * map-side only. */
  def bpeTokenProfile(docs: DataFrame, nMerges: Int): DataFrame = {
    val ms = learnMerges(docs, nMerges)
      .select("rank", "left_sym", "right_sym")
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    def encode(tok: org.apache.spark.sql.Column) = {
      val enc0 = regexp_replace(tok, "(.)", S + "$1" + E)
      ms.foldLeft(enc0) { case (acc, (l, r)) =>
        replace(acc, lit(S + l + E + S + r + E), lit(S + l + r + E))
      }
    }
    def symCount(tok: org.apache.spark.sql.Column) = {
      val enc = encode(tok)
      (length(enc) - length(replace(enc, lit(S), lit("")))).cast("long")
    }
    // same marker guard as learning: marker-bearing tokens are excluded
    // from every count, so engine and oracle stay aligned on dirty input
    val tk = filter(Dedup.tokens(col("text")),
      t => t =!= "" && !t.contains(S) && !t.contains(E))
    docs.select(col("doc_id"),
      size(tk).cast("long").as("n_tokens"),
      aggregate(tk, lit(0L), (a, t) => a + length(t).cast("long"))
        .as("n_chars_tok"),
      aggregate(tk, lit(0L), (a, t) => a + symCount(t)).as("n_bpe_tokens"))
      .withColumn("chars_per_bpe_micro",
        when(col("n_bpe_tokens") > 0,
          expr("n_chars_tok * 1000000 div n_bpe_tokens")).otherwise(lit(0L)))
  }

  /** The identical chain as DuckDB SQL: `nMerges` chained CTE rounds, each
    * extracting pairs from the encoded vocab, electing the same
    * (cnt desc, l asc, r asc) winner, and applying it with replace().
    * Generated from the same constants so engine and oracle cannot drift. */
  def learnMergesSql(nMerges: Int): String =
    mergeChainSql(nMerges) +
      (1 to nMerges).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS rank, l AS left_sym, r AS right_sym,
           |  l || r AS merged, CAST(c AS BIGINT) AS cnt FROM m$r""".stripMargin)
        .mkString("\n", "\nUNION ALL\n", "")

  /** The q69 oracle: the same merge chain, then every corpus token is
    * encoded and run through the nMerges-deep replace chain (referencing
    * the m1..mN winner CTEs) and per-doc symbol counts aggregate. */
  def bpeProfileSql(nMerges: Int): String = {
    require(nMerges > 0)
    val applied = (1 to nMerges).foldLeft("e") { case (acc, r) =>
      s"replace($acc, '$S' || m$r.l || '$E$S' || m$r.r || '$E', " +
        s"'$S' || m$r.l || m$r.r || '$E')"
    }
    val mrefs = (1 to nMerges).map("m" + _).mkString(", ")
    mergeChainSql(nMerges) +
      s""",
         |tok2 AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |enc0 AS (
         |  SELECT doc_id, tok, regexp_replace(tok, '(.)', '$S\\1$E', 'g') AS e
         |  FROM tok2 WHERE tok <> ''
         |    AND NOT contains(tok, '$S') AND NOT contains(tok, '$E')),
         |encn AS (
         |  SELECT doc_id, tok, $applied AS e
         |  FROM enc0, $mrefs),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(tok)) AS BIGINT) AS n_chars_tok,
         |    CAST(sum(len(e) - len(replace(e, '$S', ''))) AS BIGINT) AS n_bpe_tokens
         |  FROM encn GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_chars_tok, 0) AS n_chars_tok,
         |  coalesce(n_bpe_tokens, 0) AS n_bpe_tokens,
         |  CASE WHEN coalesce(n_bpe_tokens, 0) > 0
         |       THEN (n_chars_tok * 1000000) // n_bpe_tokens
         |       ELSE 0 END AS chars_per_bpe_micro
         |FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Shared WITH chain: word counts, initial encoding, and per-round
    * (pair counts, winner, applied vocab) CTEs p1/m1/v1 .. pN/mN/vN. */
  private def mergeChainSql(nMerges: Int): String = {
    require(nMerges > 0)
    val sb = new StringBuilder
    sb.append(
      s"""WITH w AS (
         |  SELECT tok AS w, count(*) AS cnt FROM (
         |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
         |    FROM documents) t
         |  WHERE tok <> '' AND NOT contains(tok, '$S')
         |    AND NOT contains(tok, '$E') GROUP BY 1),
         |v0 AS (
         |  SELECT regexp_replace(w, '(.)', '$S\\1$E', 'g') AS enc, cnt FROM w)""".stripMargin)
    for (r <- 1 to nMerges) {
      sb.append(
        s""",
           |p$r AS (
           |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt) AS c
           |  FROM (SELECT regexp_extract_all(enc, '$S([^$E]*)$E', 1) AS s, cnt
           |        FROM v${r - 1}) t,
           |       UNNEST(range(1, len(s))) AS u(i)
           |  WHERE len(s) >= 2 GROUP BY 1, 2),
           |m$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l ASC, r ASC LIMIT 1),
           |v$r AS (
           |  SELECT replace(enc, '$S' || m$r.l || '$E$S' || m$r.r || '$E',
           |                 '$S' || m$r.l || m$r.r || '$E') AS enc, cnt
           |  FROM v${r - 1}, m$r)""".stripMargin)
    }
    sb.append("\n")
    sb.toString
  }
}
