package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup}

/** The curation funnel as a continuous ingest query: the stateless gate
  * chain (language, quality, repetition — Curation.gateKeep) runs
  * map-side inside each micro-batch, and only SURVIVORS flow into the
  * stateful exact-dedup aggregation. This is the production ingest
  * topology for corpus building: per-batch gating costs no state, and the
  * dedup state holds one (fp, count, min) row per distinct surviving
  * fingerprint — documents rejected by a gate never touch the state
  * store.
  *
  * On a finite replay the final complete-mode table must equal the batch
  * formulation (gates then groupBy fp) exactly, so the driver check (x32)
  * shares the batch SQL fragments of q47's oracle.
  */
object StreamCuration {

  /** Gate + dedup-group a finite two-batch replay; returns the final
    * complete-mode (fp, n_docs, keeper_doc_id) table of gate survivors. */
  def replayCuratedDupGroups(spark: SparkSession,
      docs: Dataset[DocDedup.Doc]): DataFrame = {
    import spark.implicits._
    Events.replayTwoBatches(spark, docs.collect().toSeq, "graft_x32_",
      "complete") { in =>
        Dedup.exactGroups(Curation.gateKeep(in.toDF())
          .filter(col("curation_keep")).drop("curation_keep"))
      }
      .select("fp", "n_docs", "keeper_doc_id")
  }
}
