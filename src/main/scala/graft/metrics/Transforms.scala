package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gfunctions._

/** The metric-stream transforms shared verbatim between the batch
  * operators (m1/m2) and the structured-streaming pipelines (st_*) —
  * batch/stream parity is by construction, not by parallel
  * implementations.
  */
object Transforms {

  /** JMX payload normalization + metadata injection
    * (JMXScraper.internal_get_structured_json_from_response): parse the
    * JSON payload, project typed fields, inject host / server-type /
    * createdDateTime. Works on static and streaming frames alike.
    */
  def flattenProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("ts"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
      concat(lit("user-"), col("user_id")).as("injected_host"),
      col("event_type").as("injected_server_type"),
      unix_millis(col("ts")).as("created_date_time"))

  /** Tumbling 1-hour rollup per series — map-side partial agg, one
    * shuffle on (window, event_type).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total"),
        davg(col("value")).as("mean_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"), col("mean_value"))
}
