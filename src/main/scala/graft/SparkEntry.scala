package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every registered operator, assembled from the module registries. */
  def registry: Seq[GraftQuery] =
    graft.olap.Olap.all ++ graft.olap.Olap2.all ++
      graft.olap.TemporalJoins.all ++ graft.metrics.Metrics.all ++
      graft.text.Text.all ++ graft.dedup.Dedup.all ++
      graft.sim.Sim.all ++ graft.multimodal.Multimodal.all ++
      graft.jolokia.Jolokia.all ++ graft.streaming.Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.olap.OlapDefaults.entry(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
