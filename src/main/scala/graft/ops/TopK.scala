package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Bounded top-k per group as a typed [[Aggregator]].
  *
  * The window formulation (row_number over partitionBy/orderBy + filter)
  * shuffles EVERY row of a group to one reducer and sorts it all, paying
  * O(n log n) per group for an answer of size k. The Aggregator keeps a
  * k-bounded buffer; Spark runs it as a two-phase ObjectHashAggregate, so
  * each map task ships at most k entries per group into the shuffle —
  * at 100 TB the shuffle carries O(groups * k), not O(rows), and a skewed
  * group costs its reducer O(k) memory instead of the whole group.
  *
  * Ordering is (value desc, id asc) — the id tiebreak makes the result
  * deterministic, which is what lets the driver hash-compare it against
  * the window formulation's oracle (q06/q32 share one SQL).
  */
object TopK {

  /** One ranked entry: group-local rank is assigned in [[topKByValue]]. */
  final case class Ranked(group: Long, id: Long, rn: Int)

  /** Aggregator over (value, id) pairs keeping the k largest by
    * (value desc, id asc). Buffer is a sorted Vector capped at k — merge
    * and insert are O(k), the buffer encodes as a compact array. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0)
    private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"
    private def cap(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith(lt).take(k)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
      cap(buf :+ e)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      cap(a ++ b)
    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = cap(buf)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** The shared shape behind both key types: cast/group/aggregate/rank.
    * A single implementation so the ranking contract (value desc, id asc,
    * k-cap) cannot silently diverge between the long- and string-keyed
    * entry points. */
  private def topKByKey[K: Encoder](df: DataFrame, groupCol: String,
      keyCast: String, valueCol: String, idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val rowEnc: Encoder[(K, Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(implicitly[Encoder[K]],
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    implicit val outEnc: Encoder[(K, Long, Int)] =
      org.apache.spark.sql.Encoders.tuple(implicitly[Encoder[K]],
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt)
    val agg = new TopKAgg(k).toColumn
    df.select(col(groupCol).cast(keyCast), col(valueCol).cast("double"),
        col(idCol).cast("long"))
      .as[(K, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (g, entries) =>
        entries.iterator.zipWithIndex.map { case ((_, id), i) => (g, id, i + 1) }
      }
      .toDF(groupCol, idCol, "rn")
  }

  /** Top-k rows per group of `df(groupCol)` by (`valueCol` desc, `idCol`
    * asc), with a 1-based group-local rank. Output columns:
    * (groupCol, idCol, "rn"). */
  def topKByValue(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    topKByKey[Long](df, groupCol, "long", valueCol, idCol, k)
  }

  /** [[topKByValue]] with a STRING group key (e.g. a source/domain column
    * for per-domain corpus caps) — same k-bounded aggregator and shuffle
    * shape, only the group key type changes. */
  def topKByValueStr(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    topKByKey[String](df, groupCol, "string", valueCol, idCol, k)
  }

  /** Aggregator keeping the k SMALLEST by (value asc, id asc) with EXACT
    * Long ordering — the Double-valued [[TopKAgg]] cannot order 64-bit
    * hashes (doubles collapse longs past 2^53). Bottom-k of a uniform hash
    * is simultaneously an exact-k uniform sample and the KMV distinct
    * sketch, which is why the value stays a full-width Long here. */
  final class BottomKLongAgg(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k > 0)
    private def cap(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      s.sorted.take(k) // tuple ordering = (value asc, id asc)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(buf: Seq[(Long, Long)], e: (Long, Long)): Seq[(Long, Long)] =
      cap(buf :+ e)
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      cap(a ++ b)
    override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = cap(buf)
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
  }

  /** Bottom-k rows per STRING group by (`valueCol` asc, `idCol` asc) with
    * exact Long ordering and a 1-based group-local rank — the k-bounded
    * shuffle shape of [[topKByValueStr]] (each map task contributes at
    * most k entries per group; no Window, no global sort). Output:
    * (groupCol, idCol, "rn"). */
  def bottomKByLongStr(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new BottomKLongAgg(k).toColumn
    df.select(col(groupCol).cast("string"), col(valueCol).cast("long"),
        col(idCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (g, entries) =>
        entries.iterator.zipWithIndex.map { case ((_, id), i) => (g, id, i + 1) }
      }
      .toDF(groupCol, idCol, "rn")
  }
}
