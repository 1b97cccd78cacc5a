package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these helpers
  * `private[sql]`; an extension library providing native expressions
  * needs exactly these two conversions, so this shim lives in the sql
  * package scope (the conventional pattern for Spark-native addons).
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True iff no DataFrame-level cache is registered — lets specs
    * assert operators release their internal persist()s instead of
    * leaking them for the session lifetime.
    */
  def noDataFrameCaches(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** The materialized RDD behind a checkpointed frame (LogicalRDD
    * leaf), if the plan is one. localCheckpoint blocks are NOT in the
    * cacheManager (Dataset.unpersist can't see them — they normally
    * live until driver GC); handing the RDD out lets the engine
    * unpersist them deterministically at harness teardown.
    */
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Unload every loaded state-store provider (and close it). A
    * STOPPED streaming query's providers otherwise keep their loaded
    * version maps in heap for the JVM lifetime — 4.3 GB for one
    * session-window query at the 100× corpus — because provider
    * unload normally happens only on executor death or maintenance
    * eviction. An ACTIVE query transparently reloads its state from
    * the checkpoint on its next batch, so this is safe at any
    * between-queries boundary.
    */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
