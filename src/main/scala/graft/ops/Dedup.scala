package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed for the 100 TB shape:
  *
  *  - exact dedup is one hash-shuffle on a 16-byte key (never on the text);
  *  - MinHash/LSH never compares all pairs: signatures are computed per-row
  *    with codegen'd array expressions, banded bucket ids are exploded, and
  *    only same-bucket pairs meet in a shuffle — the classic
  *    shingle -> minhash -> band -> bucket-join plan;
  *  - candidate pairs are then VERIFIED with exact Jaccard before reporting;
  *  - SimHash is a per-row 64-bit signature (typed map — a tight bit loop
  *    beats a 64-branch expression tree), blocked by 16-bit bands.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** One row per distinct normalized text: fingerprint, group size, keeper
    * (min doc_id). Groups with n_docs > 1 are the duplicate clusters. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy("fp")
      .agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("keeper_doc_id"))

  /** Exact-dedup keeper view: one surviving row per distinct text. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keepers = exactGroups(docs).select(col("keeper_doc_id").as("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  // ------------------------------------------------------------ shingles

  /** Token n-gram shingles (distinct), as an array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ts = split(lower(trim(text)), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(ts) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j + 1)): _*))
    array_distinct(grams)
  }

  /** Exact Jaccard similarity of two shingle-array columns, in 1/10000s
    * (integer — exact cross-engine compare). */
  def jaccardBp(a: Column, b: Column): Column = {
    // |A ∪ B| = |A| + |B| - |A ∩ B| for distinct arrays: one hash-intersect
    // instead of intersect + union (the arrays here are always distinct)
    val inter = size(array_intersect(a, b))
    floor((inter * 10000L) / (size(a) + size(b) - inter)).cast("long")
  }

  // ------------------------------------------------------------ minhash

  final val MinhashPrime = 2038074743L // < 2^31, fits long multiply safely

  /** Deterministic (a, b) parameters for the hash family. */
  def hashParams(nHashes: Int, seed: Long = 42L): IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(nHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Deterministic 64-bit string hash (same on every JVM; no dependence on
    * engine-specific hash builtins). */
  def stringHash64(s: String): Long = {
    var h = 0xcbf29ce4L
    var i = 0
    while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
    h
  }

  /** Per-document banded MinHash bucket ids as a tight typed pass.
    *
    * A 32-way expression tree recomputes the shingle hashes per hash
    * function and compiles to a ~10 MiB codegen blob (measured); the typed
    * map does ONE pass over the shingles and keeps the task binary small —
    * the per-partition loop is the right tool here, exactly like the
    * reference's per-doc parser core.
    */
  def minhashBuckets(text: String, n: Int, params: IndexedSeq[(Long, Long)],
      bands: Int, rowsPerBand: Int): Array[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val nShingles = math.max(toks.length - n + 1, 1)
    val sig = Array.fill(params.length)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n && i + j < toks.length) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h = math.floorMod(stringHash64(sb.toString), MinhashPrime)
      var k = 0
      while (k < params.length) {
        val (a, b) = params(k)
        val v = math.floorMod(h * a + b, MinhashPrime)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    Array.tabulate(bands) { band =>
      var h = 0xcbf29ce4L + band
      var r = 0
      while (r < rowsPerBand) { h = h * 1000003L + sig(band * rowsPerBand + r); r += 1 }
      h
    }
  }

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * Plan shape: per-row signature+buckets (narrow typed pass) -> explode
    * bands (narrow) -> self-join on (band, bucket) — the only shuffle, and
    * its payload is (doc_id, 8-byte bucket), never text or shingles ->
    * distinct candidate pairs -> re-join the two shingle arrays only for the
    * (few) candidates -> exact-Jaccard verify -> threshold.
    */
  def minhashLshPairs(
      docs: DataFrame,
      nHashes: Int = 32,
      bands: Int = 8,
      minJaccardBp: Long = 7000L,
      seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = nHashes / bands
    val params = hashParams(nHashes, seed)
    val bucketed = docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, minhashBuckets(text, 3, params, bands, rowsPerBand))
      })
      .toDF("doc_id", "buckets")
      .select(col("doc_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val shA = docs.select(col("doc_id").as("doc_a"), shingles(col("text")).as("sh_a"))
    val shB = docs.select(col("doc_id").as("doc_b"), shingles(col("text")).as("sh_b"))
    candidates
      .join(shA, Seq("doc_a"))
      .join(shB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccardBp(col("sh_a"), col("sh_b")).as("jaccard_bp"))
      .where(col("jaccard_bp") >= minJaccardBp)
  }

  /** Exact n-gram Jaccard over candidate pairs from a cheap blocking key
    * (same token count bucket AND same first token). Fully SQL-expressible
    * — this variant carries a DuckDB oracle. */
  def ngramJaccardPairs(docs: DataFrame, minJaccardBp: Long = 3000L): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      shingles(col("text")).as("sh"),
      floor(size(split(lower(trim(col("text"))), "\\s+")) / 10).cast("long").as("len_bucket"),
      element_at(split(lower(trim(col("text"))), "\\s+"), 1).as("first_tok"))
    val a = keyed.select(col("len_bucket"), col("first_tok"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = keyed.select(col("len_bucket"), col("first_tok"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("len_bucket", "first_tok"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccardBp(col("sh_a"), col("sh_b")).as("jaccard_bp"))
      .where(col("jaccard_bp") >= minJaccardBp)
  }

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash of the token stream (pure function; used via typed map). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = text.trim.toLowerCase.split("\\s+")
    var i = 0
    while (i < toks.length) {
      // xxhash-free deterministic 64-bit token hash (same on every JVM)
      var h = RollingSeed
      val t = toks(i)
      var j = 0
      while (j < t.length) { h = h * 1000003L + t.charAt(j); j += 1 }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
  private final val RollingSeed = 0xcbf29ce4L

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-dup pairs: 4 x 16-bit band blocking, verified by full
    * Hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (id, simhash64(text)) }
      .toDF("doc_id", "sig")
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bits")))
    val a = banded.select(col("band"), col("bits"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bits"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val hammingUdf = udf((x: Long, y: Long) => hamming64(x, y))
    a.join(b, Seq("band", "bits"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), hammingUdf(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
