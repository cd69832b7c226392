package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the fast table scan and the slow merge join", "en", "s", 44L),
    (1L, "word word word word word word word word word word", "x", "s", 49L),
    (2L, "Punct, heavy; text! with? many. marks:", "x", "s", 38L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token count / stopwords / punct") {
    val p = TextAnalysis.profile(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    def n(id: Long, c: String): Long = p(id).getAs[Number](c).longValue
    assert(n(0L, "n_tokens") == 9)
    assert(n(0L, "n_stopwords") == 3) // the, and, the
    assert(n(2L, "n_punct") == 6)
    assert(n(1L, "n_stopwords") == 0)
  }

  test("BPE-ish token count: pretokenizer boundaries, contractions split") {
    def bpe(s: String): Long = Seq((0L, s)).toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .as[Int].collect().head.toLong
    assert(bpe("the fast table scan and the slow merge join") == 9)
    // letters/digits/symbols split into separate runs; punctuation counted
    assert(bpe("Punct, heavy; text! with? many. marks:") == 12)
    assert(bpe("it's 42 degrees") == 4) // it | 's | 42 | degrees
    assert(bpe("") == 0)
    assert(bpe("   ") == 0) // pure whitespace: boundaries, not tokens
  }

  test("lang id picks the language with most marker hits; und when none") {
    val p = TextAnalysis.profile(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(p(0L) == "en")
    assert(p(1L) == "und")
  }

  test("quality score components are integral and bounded") {
    TextAnalysis.profile(docs).collect().foreach { r =>
      val q = r.getAs[Number]("quality_bp").longValue
      assert(q >= 0 && q <= 10000)
    }
  }

  test("vocabCoverage: exclusive cumulative ranking, threshold edge exact") {
    // counts a=5 b=3 c=1 d=1, total 10; ranking (cnt desc, token asc)
    val corpus = Seq((0L, "a a a b c"), (1L, "a a b b d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(corpus, coverageBp = 9000L)
      .orderBy("cum_before")
      .as[(String, Long, Long, Long)].collect().toSeq
    // d has cum_before 9 -> 9*10000 == 9000*10: NOT below the bar — the
    // threshold is exclusive, so the prefix stops at c
    assert(got == Seq(("a", 5L, 0L, 0L), ("b", 3L, 5L, 5000L),
      ("c", 1L, 8L, 8000L)))
    val all = TextAnalysis.vocabCoverage(corpus, coverageBp = 10000L)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(all.map(_._1) == Seq("a", "b", "c", "d"))
  }
}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups by normalized text") {
    val docs = docsDF(
      (1L, "Hello World"), (2L, "  hello world  "), (3L, "other text"))
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 2)
    val dup = g.find(_.getAs[Long]("n_docs") == 2).get
    assert(dup.getAs[Long]("keeper_doc_id") == 1L)
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("minhash-LSH finds near-identical docs and skips unrelated ones") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val docs = docsDF((1L, base), (2L, nearDup), (3L, unrelated))
    val pairs = Dedup.minhashLshPairs(docs, minJaccardBp = 5000L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash jaccard estimate is verified exactly (no false positives kept)") {
    // two docs sharing only the first token: any accidental bucket collision
    // must be killed by the exact-jaccard verify
    val docs = docsDF(
      (1L, "alpha " + (1 to 30).map("a" + _).mkString(" ")),
      (2L, "alpha " + (1 to 30).map("b" + _).mkString(" ")))
    val pairs = Dedup.minhashLshPairs(docs, minJaccardBp = 5000L).collect()
    assert(pairs.isEmpty)
  }

  test("ngram jaccard pairs on blocked candidates, exact bp values") {
    val a = "common prefix tokens one two three four five six"
    val b = "common prefix tokens one two three four five seven"
    val docs = docsDF((1L, a), (2L, b), (3L, "common " + ("x " * 8).trim))
    val pairs = Dedup.ngramJaccardPairs(docs, minJaccardBp = 3000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp")))
    assert(pairs.length == 1)
    val (da, db, bp) = pairs.head
    assert((da, db) == (1L, 2L))
    // shingle sets: 7 each, 6 shared -> 6/8 = 0.75 -> 7500 bp
    assert(bp == 7500L)
  }

  test("simhash: identical texts distance 0; near texts small; far texts large") {
    assert(Dedup.hamming64(Dedup.simhash64("a b c d e"), Dedup.simhash64("a b c d e")) == 0)
    val near = Dedup.hamming64(
      Dedup.simhash64((1 to 50).map("w" + _).mkString(" ")),
      Dedup.simhash64((1 to 50).map(i => if (i == 25) "x" else "w" + i).mkString(" ")))
    val far = Dedup.hamming64(
      Dedup.simhash64((1 to 50).map("w" + _).mkString(" ")),
      Dedup.simhash64((1 to 50).map("q" + _).mkString(" ")))
    assert(near < far)
    assert(near <= 16)
  }

  test("simhashPairs flags near-duplicates via banded blocking") {
    val base = (1 to 60).map("tok" + _).mkString(" ")
    val nearDup = (1 to 60).map(i => if (i % 29 == 0) "x" + i else "tok" + i).mkString(" ")
    val unrelated = (1 to 60).map("zzz" + _).mkString(" ")
    val docs = docsDF((1L, base), (2L, nearDup), (3L, unrelated))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("banded-SimHash completeness boundary: <= nBands-1 guaranteed, " +
      "spread bits candidate-excluded, more bands restore recall") {
    val sigs = Seq(
      (0L, 0L),
      // hamming 4, ONE differing bit in EACH 16-bit band — the
      // adversarial pair the contract documents as excluded at 4 bands
      (1L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)),
      (2L, 0xFL), // hamming 4 concentrated in band 0: 3 clean bands
      (3L, 7L))   // hamming 3: pigeonhole guarantees a clean band
      .toDF("doc_id", "sig")
    def run(nBands: Int) =
      Dedup.bandedSimhashPairs(sigs, maxHamming = 18, nBands = nBands)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val p4 = run(4)
    assert(!p4.contains((0L, 1L))) // documented exclusion
    assert(p4.contains((0L, 2L)))
    assert(p4.contains((0L, 3L)))
    // nBands >= h+1: the same spread pair becomes guaranteed (8 bands of
    // 8 bits — its 4 bits land in bands 0/2/4/6, leaving 1/3/5/7 clean)
    assert(run(8).contains((0L, 1L)))
  }

  test("simhashPairsExact: derived band count == brute force at every hamming") {
    // band derivation: smallest divisor of 64 covering h+1
    assert(Seq(0, 1, 3, 6, 7, 15, 16, 31, 63).map(Dedup.exactBands)
      == Seq(1, 2, 4, 8, 8, 16, 32, 32, 64))
    // adversarial signatures incl. the 4-band-spread pair; exhaustive
    // truth is the all-pairs scan — the derived-band join must match it
    val sigRows = Seq((0L, 0L),
      (1L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)),
      (2L, 0xFL), (3L, 7L), (4L, -1L), (5L, 0x3F0L))
    for (h <- Seq(3, 4, 6, 10)) {
      val got = Dedup.bandedSimhashPairs(sigRows.toDF("doc_id", "sig"),
          maxHamming = h, nBands = Dedup.exactBands(h))
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- sigRows; (b, sb) <- sigRows if a < b
        if Dedup.hamming64(sa, sb) <= h
      } yield (a, b)).toSet
      assert(got == want, s"h=$h")
    }
  }

  test("incrementalSignaturePairs == full signatureNearDupPairs restricted " +
      "to delta-touching pairs, recomputed and prebuilt-index paths alike") {
    // random 64-bit signatures with planted near-dups (xor a few bits off
    // a base) so delta×corpus, delta×delta, and corpus×corpus pairs all
    // exist; the incremental result must carry exactly the first two
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(30)(rnd.nextLong())
    val sigRows = base.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++
      base.take(12).zipWithIndex.map { case (s, i) =>
        (30L + i, s ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64)))
      }
    val all = sigRows.toDF("doc_id", "sig")
    val corpus = all.filter(col("doc_id") < 30L)
    val delta = all.filter(col("doc_id") >= 30L)
    for (h <- Seq(3, 8)) {
      val want = Dedup.signatureNearDupPairs(all, maxHamming = h)
        .filter(col("doc_a") >= 30L || col("doc_b") >= 30L)
        .as[(Long, Long, Int)].collect().toSet
      val got = Dedup.incrementalSignaturePairs(corpus, delta, maxHamming = h)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"h=$h")
      // production path: the persisted band-index table read back
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sigidx").toString
      Dedup.signatureBandIndex(corpus, maxHamming = h).write
        .mode("overwrite").parquet(dir)
      val viaIndex = Dedup.incrementalSignaturePairs(corpus, delta,
          maxHamming = h,
          prebuiltIndex = Some(spark.read.parquet(dir)))
        .as[(Long, Long, Int)].collect().toSet
      assert(viaIndex == want, s"h=$h via index")
    }
  }

  test("simhashPairs is expression-only end to end (no UDF, no typed-map boundary)") {
    // a parquet-backed input: over a LocalRelation the optimizer evaluates
    // the (deterministic) signature expression at PLANNING time and it
    // vanishes from the plan
    val dir = java.nio.file.Files.createTempDirectory("graft-simhash").toString
    docsDF((1L, "a b c"), (2L, "a b d")).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val df = Dedup.simhashPairs(docs, maxHamming = 12)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEval") && !plan.contains("ScalaUDF"),
      s"UDF node found in:\n$plan")
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapElements"),
      s"typed encoder boundary found in:\n$plan")
    assert(plan.contains("bit_count") && plan.contains("graft_simhash64"))
    // the expression computes the same signatures as the pure kernel
    import spark.implicits._
    val sig = docs.select(graft.functions.SimHash64.simhash64Col(col("text")))
      .as[Long].collect()
    assert(sig.toSeq == Seq(Dedup.simhash64("a b c"), Dedup.simhash64("a b d")))
  }

  test("dup substrings: cross-doc k-gram spans marked, merged coverage exact") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),             // shares an 8-run with 2
      (2L, "x a b c d e f g h y z"),           // same run at pos 1
      (3L, "p q r s t u v w p q r s t u v w"), // self-repeat ONLY: excluded
      (4L, "m n o p q r s t u"),               // identical to 5: full cover
      (5L, "m n o p q r s t u"),
      (6L, "lone short doc")                   // < k tokens: excluded
    ).toDF("doc_id", "text")
    val out = Dedup.dupSubstrings(docs, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_windows"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("dup_frac_bp")))).toMap
    assert(!out.contains(3L)) // within-doc repetition is q38's job, not dup
    assert(!out.contains(6L))
    assert(out(1L) == ((1L, 8L, 10L, 8000L)))
    assert(out(2L) == ((1L, 8L, 11L, 7272L))) // floor(80000/11)
    // overlapping windows MERGE: 2 windows over 9 tokens cover 9, not 16
    assert(out(4L) == ((2L, 9L, 9L, 10000L)))
    assert(out(5L) == ((2L, 9L, 9L, 10000L)))
  }

  test("dedup scrub removes exactly the covered tokens from every doc") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),             // run [0,8) dropped
      (2L, "x a b c d e f g h y z"),           // run [1,9) dropped
      (3L, "p q r s t u v w p q r s t u v w"), // self-repeat only: untouched
      (4L, "m n o p q r s t u"),               // identical to 5: fully dropped
      (5L, "m n o p q r s t u"),
      (6L, "lone short doc")                   // < k tokens: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDupSubstrings(docs, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L)) // one row per input doc
    assert(out(1L) == (("i j", 2L, 8L)))
    assert(out(2L) == (("x y z", 3L, 8L)))
    assert(out(3L) == (("p q r s t u v w p q r s t u v w", 16L, 0L)))
    assert(out(4L) == (("", 0L, 9L)))
    assert(out(5L) == (("", 0L, 9L)))
    assert(out(6L) == (("lone short doc", 3L, 0L)))
  }

  test("lmFluency: bigram conditional probabilities exact in microunits") {
    // corpus bigram counts: "a b"->3, "b a"->1, "b c"->1
    // prefix mass: a->3, b->2  =>  p(b|a)=1.0, p(a|b)=p(c|b)=0.5
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.lmFluency(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_cond_micro"),
          r.getAs[Long]("avg_cond_micro")))).toMap
    assert(out(1L) == ((3L, 2500000L, 833333L)))
    assert(out(2L) == ((2L, 1500000L, 750000L)))
    assert(out(3L) == ((0L, 0L, 0L))) // bigram-less docs still emit a row
  }

  test("lmLogProb: float avg log-probability matches hand math, guard-" +
      "quantized; bigram-less docs emit (0, NULL, unsafe)") {
    // corpus identical to the lmFluency test: p(b|a)=1, p(a|b)=p(c|b)=0.5
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.lmLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"),
          Option(r.getAs[java.lang.Long]("avg_logprob_q")).map(_.toLong),
          r.getAs[Boolean]("quant_safe")))).toMap
    // doc 1: 2·ln(1) + 1·ln(1/2) over 3 bigrams; doc 2: ln(1)+ln(1/2) over 2
    val d1 = (math.log(0.5) / 3) * 10000
    val d2 = (math.log(0.5) / 2) * 10000
    assert(out(1L) == ((3L, Some(math.floor(d1).toLong), true)))
    assert(out(2L) == ((2L, Some(math.floor(d2).toLong), true)))
    assert(out(3L) == ((0L, None, false)))
  }

  test("crossContamination: eval k-gram collisions against train, " +
      "zero-hit and short docs still emit rows") {
    val train = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "a b c d e f g h x y"), // pos-0 window collides: 8 tokens
      (101L, "p q r s t u v w z z"), // no collision
      (102L, "tiny doc")             // shorter than k: no windows at all
    ).toDF("doc_id", "text")
    val out = Dedup.crossContamination(train, eval, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("total_tokens"), r.getAs[Long]("n_hit_windows"),
          r.getAs[Long]("contam_tokens"), r.getAs[Long]("contam_bp")))).toMap
    assert(out.keySet == Set(100L, 101L, 102L))
    assert(out(100L) == ((10L, 1L, 8L, 8000L)))
    assert(out(101L) == ((10L, 0L, 0L, 0L)))
    assert(out(102L) == ((2L, 0L, 0L, 0L)))
  }

  test("sentence dedup keeps exactly the first occurrence of each dup unit") {
    val docs = Seq(
      (1L, "a b c d e f"),       // both units first occurrences: untouched
      (2L, "a b c x y z"),       // [a b c] already owned by doc 1: dropped
      (3L, "d e f"),             // whole doc owned by doc 1 pos 1: emptied
      (4L, "p q r p q r"),       // WITHIN-doc dup: keep-first applies too
      (5L, "a b c d")            // dup full unit + unique partial tail [d]
    ).toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(docs, unitTokens = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_units"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("n_kept_tokens")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // one row per input doc
    assert(out(1L) == (("a b c d e f", 2L, 0L, 6L)))
    assert(out(2L) == (("x y z", 2L, 1L, 3L)))
    assert(out(3L) == (("", 1L, 1L, 0L)))
    assert(out(4L) == (("p q r", 2L, 1L, 3L)))
    assert(out(5L) == (("d", 2L, 1L, 1L)))
  }

  test("incremental sentence dedup: corpus owns its units; within-delta " +
      "election; equals full dedup restricted to delta under id order") {
    val corpus = Seq((1L, "a b c d e f"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "a b c q r s"),  // [a b c] owned by corpus: dropped
      (11L, "q r s t u v"),  // [q r s] first seen in delta at doc 10: dropped
      (12L, "fresh new unit here only once")) // untouched
      .toDF("doc_id", "text")
    val out = Dedup.incrementalSentenceDedup(corpus, delta, unitTokens = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped")))).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // delta rows only
    assert(out(10L) == (("q r s", 1L)))
    assert(out(11L) == (("t u v", 1L)))
    assert(out(12L) == (("fresh new unit here only once", 0L)))
    // equivalence to the batch operator when corpus ids order first
    val full = Dedup.sentenceDedup(corpus.union(delta), unitTokens = 3)
      .filter(col("doc_id") >= 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped")))).toMap
    assert(full == out)
  }

  test("empty-document contract: a fully-scrubbed doc emits clean_text = '' " +
      "(empty string, NEVER null) on every scrub-family path") {
    // Pins the contract documented on Dedup.rebuildFromDrops against the
    // r4 regression class (q61/q64/q71/x62): DuckDB's array_to_string over
    // an empty list returns NULL where Spark's array_join returns '' — the
    // engine side must stay '' so the oracles' coalesce(.., '') is the only
    // place the duality is reconciled. getString throws on NULL, so each
    // assertion pins both value AND non-nullness.
    def cleanOf(df: org.apache.spark.sql.DataFrame, id: Long): String =
      df.filter(col("doc_id") === id).select("clean_text")
        .collect().head.getString(0)
    // scrub path (q61 shape): doc 21 identical to doc 20 → all tokens drop
    val scrubDocs = Seq(
      (20L, "m n o p q r s t u"), (21L, "m n o p q r s t u"))
      .toDF("doc_id", "text")
    assert(cleanOf(Dedup.scrubDupSubstrings(scrubDocs, k = 8), 21L) == "")
    // sentence path (q64 shape): doc 31's single unit owned by doc 30
    val sentDocs = Seq((30L, "a b c"), (31L, "a b c")).toDF("doc_id", "text")
    assert(cleanOf(Dedup.sentenceDedup(sentDocs, unitTokens = 3), 31L) == "")
    // incremental path (q71 shape): delta doc fully owned by the corpus
    val corpus = Seq((40L, "a b c d e f")).toDF("doc_id", "text")
    val delta = Seq((41L, "a b c"), (42L, "d e f keep this tail"))
      .toDF("doc_id", "text")
    val incr = Dedup.incrementalSentenceDedup(corpus, delta, unitTokens = 3)
    assert(cleanOf(incr, 41L) == "")
    assert(cleanOf(incr, 42L) == "keep this tail")
    // streaming shadow (x62) pinned in StreamSentenceDedupSpec (doc 3)
  }

  test("sentence dedup winner is the globally smallest (doc_id, pos) pair") {
    // the dup unit sits at pos 1 in doc 1 but pos 0 in doc 2: doc-id order
    // dominates position order, so doc 1 keeps it
    val docs = Seq((1L, "u v w a b c"), (2L, "a b c x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(docs, unitTokens = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) == "u v w a b c")
    assert(out(2L) == "x y z")
  }

  test("approx distinct (HLL) tracks exact distinct within tolerance") {
    // the reference has no approx-distinct; the engine gets HLL++ free —
    // pin that the plan uses the approximate aggregate and lands within
    // its default 5% relative error on a 2k-key column
    val docs = (0 until 10000).map(i => (i.toLong, s"key${i % 2000}"))
      .toDF("doc_id", "text")
    val df = docs.agg(
      approx_count_distinct(col("text")).as("approx"),
      countDistinct(col("text")).as("exact"))
    assert(df.queryExecution.executedPlan.toString.contains("approx_count_distinct"))
    val r = df.collect().head
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(exact == 2000L)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx=$approx")
  }

  test("ngram jaccard blocking key scales: min-shingle cardinality grows with corpus") {
    // 40 template docs, each perturbed once -> 40 distinct min shingles,
    // so block sizes stay ~2 regardless of corpus size
    val docs = (0 until 40).flatMap { t =>
      val base = (1 to 12).map(i => s"t${t}w$i").mkString(" ")
      val near = (1 to 12).map(i => if (i == 6) "CHANGED" else s"t${t}w$i").mkString(" ")
      Seq((t * 2L, base), (t * 2L + 1L, near))
    }.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, minJaccardBp = 3000L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every template pair found; no cross-template pair survives
    assert(pairs == (0 until 40).map(t => (t * 2L, t * 2L + 1L)).toSet)
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(99)
    (0 until 100).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("cosine of identical vectors is 1, of orthogonal is 0") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
  }

  test("lshRecallAudit: precision pinned at 1.0, planted dups recalled") {
    val base = (0L until 30L).map(i =>
      (i, s"doc $i unique words alpha$i beta$i gamma$i delta$i epsilon$i"))
    // two planted exact duplicates: ground truth has >= 2 pairs
    val docs = (base :+ (100L, base(3)._2) :+ (101L, base(7)._2))
      .toDF("doc_id", "text")
    val r = graft.ops.Dedup.lshRecallAudit(docs, sliceMaxDocId = 200L)
      .collect()(0)
    assert(r.getAs[Long]("n_exact") >= 2)
    // the verify step makes the LSH side a subset of truth
    assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_lsh"))
    assert(r.getAs[Long]("precision_bp") == 10000L)
    // identical docs collide in every band: they are always recalled
    assert(r.getAs[Long]("n_lsh") >= 2)
  }

  test("kCenterSelect walks the exact greedy farthest-point order with " +
      "lowest-id ties") {
    // square corner geometry: seed 0=(0,0); 1=(10,0) and 2=(0,10) tie at
    // d²=100 -> lower id wins; 3=(5,5) last at min-dist 50
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 0f)),
      (2L, Array(0f, 10f)), (3L, Array(5f, 5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(pts, k = 4, dim = 2)
      .orderBy("round").as[(Long, Long, Long)].collect().toSeq
    val m = 1000000L // micro quantization: d² scales by 1e12
    assert(got == Seq(
      (1L, 0L, 0L), (2L, 1L, 100L * m * m),
      (3L, 2L, 100L * m * m), (4L, 3L, 50L * m * m)), got.toString)
  }

  test("kCenterSelect is partitioning-invariant and k=1 returns the seed") {
    val a = Similarity.kCenterSelect(emb, k = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.kCenterSelect(emb.repartition(7), k = 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    val one = Similarity.kCenterSelect(emb, k = 1).collect()
    assert(one.length == 1 && one(0).getAs[Long]("vec_id") == 0L)
  }

  test("brute KNN returns k ranked neighbors per query, self excluded") {
    val knn = Similarity.bruteKnn(emb, emb.filter(col("vec_id") < 5), k = 3).collect()
    assert(knn.length == 15)
    val byQ = knn.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      // ranks ordered by non-increasing similarity
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("sim_micro"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN achieves nontrivial recall@5 against brute force") {
    val brute = Similarity.bruteKnn(emb, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.hyperplaneLshKnn(emb, k = 5, nBits = 4, nTables = 8, dim = 16)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (candidates examined: bucketed only)")
    assert(recall > 0.3) // random 16-dim data, 4-bit buckets: well above chance
  }

  test("embedding decontam: argmax tie-breaks to the smaller bench id; " +
      "threshold is inclusive at the floored micro value") {
    import spark.implicits._
    // bench 0 and 25 are IDENTICAL directions; corpus 1 is parallel to
    // them (cosine exactly 1.0), corpus 2 orthogonal (cosine 0)
    val rows = Seq(
      (0L, Array(1.0f, 0f, 0f)), (25L, Array(1.0f, 0f, 0f)),
      (1L, Array(2.0f, 0f, 0f)), (2L, Array(0f, 3.0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDecontaminate(rows,
      col("vec_id") % 25 === 0, minSimMicro = 1000000L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("nearest_bench_id"), r.getAs[Long]("max_sim_micro"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet == Set(1L, 2L)) // bench rows never in the output
    assert(got(1L) == ((0L, 1000000L, true))) // tie -> bench 0; >= inclusive
    assert(got(2L)._2 == 0L && !got(2L)._3)
  }

  test("near-dup pairs: sim threshold respected and symmetric-free (a<b)") {
    val pairs = Similarity.cosineNearDupPairs(emb, minSimMicro = 500000L).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("sim_micro") >= 500000L)
    }
  }

  test("LSH near-dup pairs are an exact-sim subset of brute pairs (recall measured)") {
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("sim_micro")).toMap
    val brute = toMap(Similarity.cosineNearDupPairs(emb, minSimMicro = 300000L).collect())
    val lsh = toMap(Similarity.cosineNearDupPairsLsh(emb, minSimMicro = 300000L,
      nBits = Similarity.adaptiveBits(100), nTables = 8, dim = 16).collect())
    assert(brute.nonEmpty)
    // every LSH pair is a true pair with the IDENTICAL exact similarity
    lsh.foreach { case (ids, sim) => assert(brute.get(ids).contains(sim), ids) }
    val recall = lsh.size.toDouble / brute.size
    info(f"LSH near-dup recall = $recall%.2f (${lsh.size}/${brute.size})")
    assert(recall > 0.05) // low-threshold pairs on random vectors: candidates only
  }

  test("VecOps kernels are bit-identical to the HOF folds they replaced " +
      "and stay inside codegen") {
    val rnd = new scala.util.Random(123)
    val pairs = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian()),
      Array.fill(64)(rnd.nextGaussian())))
    val df = pairs.toDF("a", "b")
    val cmp = df.select(
      graft.functions.VecOps.dot(col("a"), col("b")).as("dot_k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("dot_f"),
      graft.functions.VecOps.l2sq(col("a"), col("b")).as("l2_k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x).as("l2_f"),
      graft.functions.VecOps.selfDot(col("a")).as("n_k"),
      aggregate(col("a"), lit(0.0d), (acc, x) => acc + x * x).as("n_f"))
    cmp.collect().foreach { r =>
      // EXACT double equality — same IEEE op sequence, not a tolerance
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(5))
    }
    // the kernel expression generates code (no interpreted-HOF fallback
    // markers); over a parquet-backed scan (a LocalRelation constant-folds
    // the whole projection away) a cosine-only plan is one codegen span
    val dir = java.nio.file.Files.createTempDirectory("graft-vecops").toString
    df.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(Similarity.cosine(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // *(n) = WholeStageCodegen span
    assert(plan.contains("graft_vec_dot"), plan)
    assert(!plan.contains("aggregate(") && !plan.contains("zip_with("), plan)
  }

  test("VecArgMinL2 equals the struct-forest argmin, ties to lowest cell") {
    val rnd = new scala.util.Random(11)
    val cents: Array[Array[Long]] = Array.fill(40)(
      Array.fill(8)((rnd.nextGaussian() * 1e6).toLong))
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextGaussian())) ++
      // exact-centroid rows: distance 0 to one cell; the cents(5) row is a
      // GUARANTEED tie against the duplicated centroid below (d=0 to both)
      (cents.take(3) :+ cents(5)).map(_.map(_.toDouble / 1e6))
    val dup = cents(5).clone()
    val centsWithTie = cents :+ dup // j=5 and j=40 identical: tie -> 5
    val df = vecs.map(Tuple1(_)).toDF("emb")
    val forest = array_min(array(centsWithTie.toIndexedSeq.zipWithIndex.map {
      case (cm, j) => struct(
        graft.functions.VecOps.l2sq(col("emb"),
          lit(cm.map(_.toDouble / 1e6))).as("d"), lit(j).as("j"))
    }: _*)).getField("j")
    val both = df.select(
      Similarity.ivfAssign(col("emb"), centsWithTie).as("native"),
      forest.as("forest")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(both.map(_.getInt(0)).contains(5)) // the tie row picked j=5
  }

  test("semantic dedup: co-cell near-identicals collapse to the min keeper") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    // ids 0..7 are random vectors so THEY seed the k-means cells; the
    // near-identical group (20/21/25) then lands in one cell together
    val rows = (0L until 8L).map(i =>
      i -> Array.fill(16)(rnd.nextGaussian().toFloat)) ++ Seq(
      20L -> base,
      21L -> base.map(_ * 1.01f),           // same direction: cosine ~1
      25L -> base.clone(),                  // identical copy
      26L -> base.map(x => -x))             // antipode: cosine -1, never dup
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, nLists = 4, iters = 1,
      minSimMicro = 950000L).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("keeper_id"), r.getAs[Long]("kept")))).toMap
    assert(out.size == rows.size) // one verdict row per vector, no dups
    assert(out(20L) == ((20L, 1L)))
    assert(out(21L) == ((20L, 0L))) // collapsed into the min id of the group
    assert(out(25L) == ((20L, 0L)))
    assert(out(26L) == ((26L, 1L))) // antipodal: high |cos| but negative
    // every vector not in the group keeps itself
    (0L until 8L).foreach(i => assert(out(i) == ((i, 1L)), s"vec $i"))
  }

  test("IVF centroids are partitioning-independent (long-sum determinism)") {
    val c1 = Similarity.ivfCentroidsMicro(emb.repartition(7), nLists = 8, iters = 2)
    val c2 = Similarity.ivfCentroidsMicro(emb.repartition(3), nLists = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("IVF ANN: exact sims on probed candidates, nontrivial recall@5") {
    val brute = Similarity.bruteKnn(emb, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bruteSims = Similarity.bruteKnn(emb, emb, k = 100).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("sim_micro")).toMap
    val ivf = Similarity.ivfKnn(emb, emb, k = 5, nLists = 8, nProbe = 3).collect()
    // every IVF result carries the IDENTICAL exact cosine (re-rank is exact)
    ivf.foreach { r =>
      val ids = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(bruteSims.get(ids).contains(r.getAs[Long]("sim_micro")), ids)
    }
    val found = ivf.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & found).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (nLists=8, nProbe=3)")
    assert(recall > 0.3) // random 16-dim data, 3/8 cells probed
  }

  test("adaptiveBits keeps bucket count proportional to corpus size") {
    assert(Similarity.adaptiveBits(500) == 6)   // the sf0.01 embeddings table
    assert(Similarity.adaptiveBits(2000) == 8)  // sf0.1
    assert(Similarity.adaptiveBits(2000000) == 18)
    assert(Similarity.adaptiveBits(10) == 4)    // floor
    assert(Similarity.adaptiveBits(1L << 40) == 24) // cap
  }

  test("adaptiveLists balances assignment n·k against pair work n²/k (k ∝ √n)") {
    assert(Similarity.adaptiveLists(500) == 16)   // sf0.001/0.01 embeddings —
    // equals the previously registered fixed knob, so driver-scale q57
    // output is unchanged by the adaptive default
    assert(Similarity.adaptiveLists(2000) == 32)  // sf0.1
    assert(Similarity.adaptiveLists(200000) == 317) // 500k-doc validation corpus
    assert(Similarity.adaptiveLists(10) == 4)     // floor
    // √ scaling: 100× the corpus ⇒ 10× the cells, so BOTH assignment
    // (n·k) and within-cell pair work (n²/k) grow as n^1.5 — neither
    // term is ever the quadratic one
    assert(Similarity.adaptiveLists(1000000) == 708)      // ceil(√500k)
    assert(Similarity.adaptiveLists(100000000L) == 7072)  // ceil(√50M) ≈ 10×
  }

  test("hyperplane prefix property: nBits-signature == 20-bit signature % 2^nBits") {
    // q19's scale-robust oracle depends on BOTH identities: (a) the first
    // n planes of a wider family are the same planes (sequential seeded
    // generation), (b) truncating the signature is a modulus
    for (n <- Seq(4, 6, 8)) {
      assert(Similarity.hyperplanes(64, 20, 7L).take(n).map(_.toSeq)
        == Similarity.hyperplanes(64, n, 7L).map(_.toSeq), s"prefix broke at $n")
    }
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = Seq.tabulate(50)(i => (i.toLong,
      Array.fill(64)(rnd.nextGaussian())))
    val df = vecs.toDF("vec_id", "emb").selectExpr("vec_id",
      "cast(emb as array<double>) as emb_d")
    for (n <- Seq(6, 8)) {
      val narrow = df.select(Similarity.signature(
        org.apache.spark.sql.functions.col("emb_d"),
        Similarity.hyperplanes(64, n, 7L)).as("s")).as[Long].collect()
      val truncated = df.select(Similarity.signature(
        org.apache.spark.sql.functions.col("emb_d"),
        Similarity.hyperplanes(64, 20, 7L)).as("s")).as[Long].collect()
        .map(_ % (1L << n))
      assert(narrow.toSeq == truncated.toSeq, s"truncation broke at $n")
    }
  }

  test("VecSignBits equals the per-plane sign-bit spelling bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val planes = Similarity.hyperplanes(dim = 16, nBits = 24, seed = 3L)
    val df = Seq.fill(200)(Array.fill(16)(rnd.nextGaussian()))
      .map(Tuple1(_)).toDF("emb")
    // the spelling the kernel replaced: sum_j(if dot_j > 0 then 1L << j)
    val perPlane = planes.zipWithIndex.map { case (p, j) =>
      when(graft.functions.VecOps.dot(col("emb"), lit(p)) > lit(0.0d),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = df.select(
      Similarity.signature(col("emb"), planes).as("k"),
      perPlane.as("f")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(both.map(_.getLong(0)).distinct.length > 100) // non-degenerate
  }

  test("VecSignBits rejects more than 64 planes (1L<<j wraps mod 64)") {
    val planes = Similarity.hyperplanes(dim = 4, nBits = 65, seed = 1L)
    intercept[IllegalArgumentException] {
      graft.functions.VecOps.signBits(col("emb"), planes.toArray)
    }
  }

  test("graft_vec_dot / graft_vec_l2sq return NULL on unequal-length arrays") {
    import spark.implicits._
    graft.functions.VecOps.register(spark)
    // interpreted path (LocalRelation literals constant-fold)
    val lit0 = spark.sql(
      "SELECT graft_vec_dot(array(1.0d,2.0d), array(1.0d)) a, " +
        "graft_vec_l2sq(array(1.0d,2.0d), array(1.0d)) b, " +
        "graft_vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) c").head()
    assert(lit0.isNullAt(0) && lit0.isNullAt(1))
    assert(lit0.getDouble(2) == 11.0)
    // codegen path over a real scan
    val df = Seq((Array(1.0d, 2.0d), Array(1.0d)),
      (Array(1.0d, 2.0d), Array(3.0d, 4.0d))).toDF("a", "b")
    val rows = df.select(
      graft.functions.VecOps.dot(col("a"), col("b")).as("d"),
      graft.functions.VecOps.l2sq(col("a"), col("b")).as("l"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) == 11.0)
    assert(rows(1).getDouble(1) == 8.0)
  }

  test("kernel expressions with equal matrices compare equal (CSE-able)") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val attr = AttributeReference("emb", ArrayType(DoubleType))()
    // fresh matrix each call: the old Array[Array[Double]] parameter made
    // these compare by reference, silently defeating CSE/exchange reuse
    def m() = Array(Array(1.0, 2.0), Array(3.0, 4.0))
      .map(_.toIndexedSeq).toIndexedSeq
    assert(graft.functions.VecArgMinL2(attr, m())
      == graft.functions.VecArgMinL2(attr, m()))
    assert(graft.functions.VecSignBits(attr, m().take(1))
      == graft.functions.VecSignBits(attr, m().take(1)))
    assert(graft.functions.VecArgMinL2(attr, m())
      .semanticEquals(graft.functions.VecArgMinL2(attr, m())))
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("synthetic corpus round-trips through the batched decode") {
    val media = Multimodal.synthCorpus(spark, 100)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 100)
    assert(meta.forall(m => m.width >= 8 && m.width < 32))
    assert(meta.count(_.kind == "video") == 33 || meta.count(_.kind == "video") == 34)
    assert(meta.forall(_.payload_bytes >= 32))
  }

  test("imageAHash: perceptual hash survives pixel noise, separates images") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.fixtureImages(spark)
      .union(Multimodal.perturbedFixtureImages(spark))
    val sigs = Multimodal.imageAHash(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash")).toMap
    // every perturbed variant hashes within hamming 6 of its base
    (0 until 4).foreach { id =>
      val d = java.lang.Long.bitCount(sigs(100L + id) ^ sigs(200L + id))
      assert(d <= 6, s"variant $id drifted to hamming $d")
    }
    // the banded pair join recovers exactly those base-variant pairs
    val pairs = Dedup.signatureNearDupPairs(
        Multimodal.imageAHash(media)
          .select(col("media_id").as("doc_id"), col("ahash").as("sig")),
        maxHamming = 6)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    (0 until 4).foreach { id =>
      assert(pairs.contains((100L + id, 200L + id)))
    }
  }

  test("featurize emits fixed-width deterministic vectors") {
    val media = Multimodal.synthCorpus(spark, 50)
    val f1 = Multimodal.featurize(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.featurize(media).collect().sortBy(_.media_id)
    assert(f1.length == 50)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling only emits for video, stride respected") {
    val media = Multimodal.synthCorpus(spark, 60)
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    val kinds = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m.kind).toMap
    assert(byId.keySet.forall(id => kinds(id) == "video"))
  }

  test("real PNG decode recovers the exact fixture pixels") {
    val stats = Multimodal.imageStats(Multimodal.fixtureImages(spark, 4))
      .collect().map(s => s.media_id -> s).toMap
    (0 until 4).foreach { id =>
      val (w, h) = (16 + id, 12 + id)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.fixturePixel(id, x, y)
        er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
      }
      val s = stats(100L + id)
      assert((s.width, s.height) == ((w, h)))
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)), s"image $id")
    }
  }

  test("JPEG payloads take the real codec path (dims exact, pixels lossy-close)") {
    import spark.implicits._
    // encode one fixture image as JPEG with the JDK writer
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, Multimodal.fixturePixel(0, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val media = spark.createDataset(
      Seq(Multimodal.MediaRow(500L, 0L, "image", bos.toByteArray)))
    val meta = Multimodal.decodeMeta(media).collect().head
    assert((meta.width, meta.height, meta.kind, meta.frames) == ((16, 12, "image", 1)))
    // JPEG is lossy: per-channel MEAN must land near the source mean
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until 12; x <- 0 until 16) {
      val p = Multimodal.fixturePixel(0, x, y)
      er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
    }
    val s = Multimodal.imageStats(media).collect().head
    val n = 16 * 12
    assert(math.abs(s.sum_r - er).toDouble / n < 16.0)
    assert(math.abs(s.sum_g - eg).toDouble / n < 16.0)
    assert(math.abs(s.sum_b - eb).toDouble / n < 16.0)
  }

  test("nearest-neighbor resize round-trips exact resampled pixels") {
    val out = Multimodal.imageStats(Multimodal.resizeImages(
      Multimodal.fixtureImages(spark, 2), targetW = 8, targetH = 6))
      .collect().map(s => s.media_id -> s).toMap
    (0 until 2).foreach { id =>
      val (w, h) = (16 + id, 12 + id)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until 6; x <- 0 until 8) {
        val p = Multimodal.fixturePixel(id, x * w / 8, y * h / 6)
        er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
      }
      val s = out(100L + id)
      assert((s.width, s.height) == ((8, 6)))
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)), s"image $id")
    }
  }

  test("refIntegrity counts orphans, dead assets, and touched docs exactly") {
    import spark.implicits._
    // docs 0,1: doc 0 refs assets 1 (real), 9 (missing, twice); doc 1 refs
    // 2 (real); asset 3 exists but is never referenced
    val spans = Seq((0L, 0, 1L), (0L, 1, 9L), (0L, 2, 9L), (1L, 0, 2L))
      .toDF("doc_id", "ord", "media_id")
    val assets = Seq(1L, 2L, 3L).toDF("media_id")
    val got = Multimodal.refIntegrity(spans, assets)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "total_spans" -> 4L, "distinct_refs" -> 3L, "orphan_spans" -> 2L,
      "orphan_refs" -> 1L, "docs_with_orphans" -> 1L,
      "assets_total" -> 3L, "assets_unreferenced" -> 1L))
  }

  test("refIntegrity on a fully-consistent corpus reports zeros") {
    import spark.implicits._
    val spans = Seq((0L, 0, 1L), (1L, 0, 2L)).toDF("doc_id", "ord", "media_id")
    val assets = Seq(1L, 2L).toDF("media_id")
    val got = Multimodal.refIntegrity(spans, assets)
      .as[(String, Long)].collect().toMap
    assert(got("orphan_spans") == 0L && got("orphan_refs") == 0L &&
      got("docs_with_orphans") == 0L && got("assets_unreferenced") == 0L)
  }

  test("audioStats: JDK WAV codec decode recovers the sample formula exactly") {
    val stats = Multimodal.audioStats(Multimodal.fixtureAudio(spark, 4))
      .collect().map(s => s.media_id -> s).toMap
    (0 until 4).foreach { id =>
      val (ns, _) = Multimodal.fixtureAudioParams(id)
      val samples = Array.tabulate(ns)(Multimodal.fixtureSample(id, _))
      val s = stats(500L + id)
      assert(s.sample_rate == 8000 && s.channels == 1, s"clip $id format")
      assert(s.n_samples == ns, s"clip $id frame count")
      assert(s.duration_ms == ns.toLong * 1000L / 8000L)
      assert(s.sum_samp == samples.map(_.toLong).sum, s"clip $id sum")
      assert(s.sum_abs == samples.map(v => math.abs(v).toLong).sum)
      assert(s.peak == samples.map(math.abs).max)
    }
  }

  test("audioFingerprint: survives loudness bumps, separates clips") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.fixtureAudio(spark)
      .union(Multimodal.perturbedFixtureAudio(spark))
    val sigs = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("afp")).toMap
    // every perturbed variant fingerprints within hamming 8 of its base
    // (nonzero for 4/4 at the fixture delta — the perturbation is visible)
    (0 until 4).foreach { id =>
      val d = java.lang.Long.bitCount(sigs(500L + id) ^ sigs(600L + id))
      assert(d <= 8, s"variant $id drifted to hamming $d")
    }
    // distinct clips stay far apart (measured minimum 25 across fixtures)
    for (a <- 0 until 8; b <- 0 until 8 if a < b) {
      val d = java.lang.Long.bitCount(sigs(500L + a) ^ sigs(500L + b))
      assert(d > 8, s"clips $a/$b collided at hamming $d")
    }
    // the banded pair join recovers exactly the four planted pairs
    val pairs = Dedup.signatureNearDupPairs(
        Multimodal.audioFingerprint(media)
          .select(col("media_id").as("doc_id"), col("afp").as("sig")),
        maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == (0 until 4).map(id => (500L + id, 600L + id)).toSet)
  }

  test("decimateAudio: out(k) = in(2k) at half the rate, duration preserved") {
    val stats = Multimodal.audioStats(
        Multimodal.decimateAudio(Multimodal.fixtureAudio(spark, 3), factor = 2))
      .collect().map(s => s.media_id -> s).toMap
    (0 until 3).foreach { id =>
      val (ns, _) = Multimodal.fixtureAudioParams(id)
      val kept = Array.tabulate(ns / 2)(k => Multimodal.fixtureSample(id, 2 * k))
      val s = stats(500L + id)
      assert(s.sample_rate == 4000 && s.n_samples == ns / 2)
      assert(s.duration_ms == ns.toLong / 8L) // invariant under decimation
      assert(s.sum_samp == kept.map(_.toLong).sum, s"clip $id")
      assert(s.peak == kept.map(math.abs).max)
    }
  }

  test("audioFingerprint: constant clip (all frame energies equal) is all-zero") {
    import spark.implicits._
    val silent = Multimodal.wavBytes(Array.fill(640)(100), 8000)
    val media = spark.createDataset(
      Seq(Multimodal.MediaRow(1L, 0L, "audio", silent)))
    val sig = Multimodal.audioFingerprint(media).collect().head.getAs[Long]("afp")
    assert(sig == 0L) // strict > on equal energies sets no bits
  }
}

class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("RollingHash64 matches the reference Scala implementation and codegens") {
    val df = Seq("", "a", "abc", "the quick brown fox").toDF("text")
    val got = df.select(graft.functions.RollingHash64.fingerprint64(col("text")))
      .as[Long].collect()
    val expected = Seq("", "a", "abc", "the quick brown fox")
      .map(s => graft.functions.RollingHash64.hash(s.getBytes("UTF-8")))
    assert(got.toSeq == expected)
  }

  test("registered SQL function graft_fingerprint64 works") {
    graft.functions.RollingHash64.register(spark)
    val r = spark.sql("SELECT graft_fingerprint64('abc') AS h").as[Long].collect()
    assert(r.head == graft.functions.RollingHash64.hash("abc".getBytes("UTF-8")))
  }

  test("expression stays inside WholeStageCodegen (no UDF boundary)") {
    val df = spark.range(10).select(
      graft.functions.RollingHash64.fingerprint64(col("id").cast("string")).as("h"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_fingerprint64"))
  }

  test("NfcNormalize composes combining sequences; NFC not NFKC; codegens") {
    val decomposed = "Café Å"      // e + U+0301, A + U+030A
    val composed = "Café Å"          // é, Å precomposed
    val ligature = "ﬁsh"                  // fi ligature: NFC keeps it
    val df = Seq(decomposed, composed, ligature, "plain ascii").toDF("t")
    val got = df.select(graft.functions.NfcNormalize.nfcCol(col("t")))
      .as[String].collect().toSeq
    assert(got(0) == composed)                 // composition happened
    assert(got(1) == composed)                 // already-NFC passes through
    assert(got(2) == ligature)                 // compatibility chars untouched
    assert(got(3) == "plain ascii")
    // plan check over a non-constant source (a constant frame folds into
    // the LocalTableScan before the projection exists)
    val plan = spark.range(3)
      .select(graft.functions.NfcNormalize.nfcCol(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"))
    graft.functions.NfcNormalize.register(spark)
    assert(spark.sql("SELECT graft_nfc('Café') AS t").as[String]
      .collect().head == "Café")
  }

  test("unicodeClean: NFC + control strip + whitespace collapse, counters exact") {
    val df = Seq((1L, "Café du  monde\t x "), (2L, "already clean"))
      .toDF("doc_id", "t")
    val out = Curation.unicodeClean(df, "t").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_chars_before"),
          r.getAs[Long]("n_chars_after"), r.getAs[Int]("changed")))).toMap
    // before: C,a,f,e,U+0301,sp,BEL,d,u,sp,sp,m..e(5),TAB,sp,x,sp = 20
    assert(out(1L) == (("Café du monde x", 20L, 15L, 1)))
    assert(out(2L) == (("already clean", 13L, 13L, 0)))
  }
}

class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.domainRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getAs[Long]("domain_id") -> r.getAs[Long]("rank"))
      .toMap

  test("a regular cycle sits at the fixed point: rank stays at scale") {
    // 3-cycle, out-degree 1 everywhere: base + floor(85% of scale) = scale
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 3)
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("star graph: hand-computed two-iteration ranks, dangling mass drops") {
    // A -> B, A -> C; B and C are dangling (their mass vanishes)
    // iter1: A = 150000; B = C = 150000 + (1000000*85) DIV 200 = 575000
    // iter2: A = 150000; B = C = 150000 + (150000*85) DIV 200 = 213750
    val got = ranks(Seq((1L, 2L), (1L, 3L)), iters = 2)
    assert(got == Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
  }

  test("self-loops and duplicate edges are dropped (simple-graph contract)") {
    val got = ranks(Seq((1L, 2L), (1L, 2L), (1L, 1L), (2L, 1L)), iters = 3)
    // reduces to the 2-cycle: fixed point at scale
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("integer ranks are identical at any partitioning") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * i + 1) % 200), (i, (i * 7 + 3) % 200)))
    val one = LinkGraph.domainRank(
      edges.toDF("src", "dst").repartition(1), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val many = LinkGraph.domainRank(
      edges.toDF("src", "dst").repartition(17), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(one.sameElements(many))
    assert(one.map(_._2).distinct.length > 5) // irregular graph, spread ranks
  }

  test("iteration bound is enforced") {
    intercept[IllegalArgumentException] {
      LinkGraph.domainRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 0)
    }
  }

  test("seeded rank: teleport mass lands only on seeds, hand-computed star") {
    // seed {1}; 1 -> 2, 1 -> 3
    // iter1: seed = 150000; 2 = 3 = (1000000*85) DIV 200 = 425000
    // iter2: seed = 150000; 2 = 3 = (150000*85) DIV 200 = 63750
    val got = LinkGraph.domainRank(
        Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"), iters = 2,
        seeds = Some(Seq(1L).toDF("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 150000L, 2L -> 63750L, 3L -> 63750L))
  }

  test("seeded rank: components unreachable from every seed rank exactly 0") {
    val got = LinkGraph.domainRank(
        Seq((1L, 2L), (4L, 5L)).toDF("src", "dst"), iters = 3,
        seeds = Some(Seq(1L).toDF("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) == 0L && got(5L) == 0L)
    assert(got(1L) == 150000L && got(2L) > 0L)
  }

  test("random graphs match an in-memory reference implementation") {
    val rnd = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until 3 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val simple = edges.filter(e => e._1 != e._2).distinct
      val deg = simple.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct
      var rank = nodes.map(_ -> 1000000L).toMap
      (1 to 3).foreach { _ =>
        val mass = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        simple.foreach { case (a, b) =>
          mass(b) += (rank(a) * 85L) / (100L * deg(a))
        }
        rank = nodes.map(v => v -> (150000L + mass(v))).toMap
      }
      val got = ranks(edges, iters = 3)
      assert(got == rank, s"trial $trial (n=$n) diverged from reference")
    }
  }

  test("seeds = all nodes reproduces the unseeded rank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val unseeded = ranks(edges, iters = 3)
    val seeded = LinkGraph.domainRank(edges.toDF("src", "dst"), iters = 3,
        seeds = Some(Seq(1L, 2L, 3L).toDF("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unseeded == seeded)
  }
}
