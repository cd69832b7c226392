package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** `SparkSessionExtensions.buildOptimizerRules` is private[sql]; this shim
  * exposes it so tests can assert what an injector actually registered
  * without constructing a whole second SparkSession. */
object ExtensionsBridge {
  def optimizerRules(ext: SparkSessionExtensions,
      session: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
