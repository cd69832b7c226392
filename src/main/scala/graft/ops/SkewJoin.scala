package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * A hash-shuffle join sends every row of a key to ONE reducer; a hot key
  * (a few % of 100 TB) wedges that task while the rest of the cluster
  * idles. AQE's skew split handles the sort-merge case after the fact;
  * explicit salting is the a-priori fix — and the only one available when
  * the skewed side feeds further keyed work (the salt survives into
  * downstream groupBys), or when AQE is off/too coarse.
  *
  *  - big side: each row gets a DETERMINISTIC salt in [0, saltFactor) —
  *    a hash of the whole row, not a random() (re-execution of a failed
  *    task must re-derive the same salt or retries double-count rows);
  *  - small side: each row replicates saltFactor times (explode over the
  *    full salt range — replication cost is |small| * saltFactor, the
  *    price of spreading the hot key over saltFactor tasks);
  *  - join on (key, salt): the hot key's rows now land on saltFactor
  *    reducers instead of one.
  *
  * Result rows are exactly the plain join's: each big row meets each
  * matching small row exactly once (at the big row's own salt).
  */
object SkewJoin {

  /** Inner equi-join of a skewed `big` side with a `small` side on `key`.
    *
    * @param saltFactor number of ways to spread each hot key (2..shuffle
    *        partitions is sensible; beyond that adds replication for no
    *        extra parallelism) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
