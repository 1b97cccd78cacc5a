package graft.olap

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.gfunctions._
import graft.sources.Tables

/** Temporal joins (SURVEY.md §2.B): as-of and range/interval joins —
  * the two operators a metrics/attribution pipeline needs that vanilla
  * SQL joins don't give you cheaply.
  *
  * Scale shape: neither is implemented as an inequality join (which
  * Spark would execute as a broadcast-nested-loop or cartesian). The
  * as-of join is a union + one window pass (single shuffle on the
  * series key, linear work); the range join is bucketized so each probe
  * meets a bounded number of candidate buckets (equi-join on
  * (key, bucket), then exact range filter) — O(n·k), never O(n²).
  */
object TemporalJoins {

  private val E =
    "WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  /** q_asof_join: for every purchase, the most recent view at-or-before
    * it by the same user (last-touch attribution). Implemented as
    * union-tag + `last(..., ignoreNulls)` over a single
    * (user, ts)-ordered window: one shuffle, linear scan, no join at
    * all — the classic distributed as-of plan.
    *
    * Tie rule: a view at exactly the purchase ts counts (right side
    * sorts before left at equal ts).
    */
  val asofJoin = GraftQuery(
    "q_asof_join",
    Some(s"""
      $E,
      u AS (
        SELECT user_id, ts, event_id, 1 AS is_l FROM e WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS is_l FROM e WHERE event_type = 'view'),
      m AS (
        SELECT user_id, ts, event_id, is_l,
               LAST_VALUE(CASE WHEN is_l = 0 THEN event_id END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, is_l, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event_id,
               LAST_VALUE(CASE WHEN is_l = 0 THEN ts END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, is_l, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
        FROM u)
      SELECT user_id, event_id, ts,
             COALESCE(view_event_id, -1) AS view_event_id,
             COALESCE(view_ts, TIMESTAMP '1970-01-01') AS view_ts
      FROM m WHERE is_l = 1
      ORDER BY user_id, event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("ts").as("view_ts"))
      Temporal.asofJoin(purchases, views, Seq("user_id"), "ts", "view_ts",
          Seq("view_event_id", "view_ts"))
        .select(col("user_id"), col("event_id"), col("ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("view_ts"), to_timestamp(lit("1970-01-01"))).as("view_ts"))
        .orderBy("user_id", "event_id")
    },
  )

  private val HourUs = 3600L * 1000 * 1000

  /** q_range_join: per purchase, count + value of the same user's
    * clicks in the preceding hour (cus ∈ (pus − 1h, pus]). The probe
    * explodes into its own and the previous hour bucket — those two
    * equi-buckets provably cover the interval — so the join is a plain
    * shuffle hash join on (user_id, bucket) with an exact range filter
    * after, never an inequality join.
    */
  val rangeJoin = GraftQuery(
    "q_range_join",
    Some(s"""
      $E,
      p AS (SELECT user_id, event_id, ts, epoch_us(ts) AS pus FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_us(ts) AS cus, value FROM e WHERE event_type = 'click'),
      j AS (SELECT p.user_id, p.event_id,
                   COUNT(*) AS n_clicks,
                   CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
            FROM p JOIN c ON p.user_id = c.user_id
                 AND c.cus > p.pus - 3600000000 AND c.cus <= p.pus
            GROUP BY p.user_id, p.event_id)
      SELECT p.user_id, p.event_id, p.ts,
             COALESCE(j.n_clicks, 0) AS n_clicks,
             COALESCE(j.click_value, 0.0) AS click_value
      FROM p LEFT JOIN j USING (user_id, event_id)
      ORDER BY user_id, event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("value"))
      val agg = Temporal.rangeJoin(purchases, clicks, Seq("user_id"),
          "ts", "click_ts", -HourUs, 0L)
        .groupBy("user_id", "event_id")
        .agg(count(lit(1)).as("n_clicks"), dsum(col("value")).as("click_value"))
      purchases
        .join(agg, Seq("user_id", "event_id"), "left")
        .select(col("user_id"), col("event_id"), col("ts"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("click_value"), lit(0.0)).as("click_value"))
        .orderBy("user_id", "event_id")
    },
  )

  /** q_asof_nearest: for every purchase, the temporally CLOSEST view by
    * the same user — before or after; equidistant ties prefer the
    * earlier view. The time-series alignment mode backward-only as-of
    * can't express (sensor fusion, price snapping). Same single-shuffle
    * zero-join plan: both direction candidates come from one sorted
    * window pass.
    */
  val asofNearest = GraftQuery(
    "q_asof_nearest",
    Some(s"""
      $E,
      u AS (
        SELECT user_id, ts, event_id, 1 AS is_l FROM e WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS is_l FROM e WHERE event_type = 'view'),
      m AS (
        SELECT user_id, ts, event_id, is_l,
               LAST_VALUE(CASE WHEN is_l = 0 THEN event_id END IGNORE NULLS) OVER wb AS bid,
               LAST_VALUE(CASE WHEN is_l = 0 THEN ts END IGNORE NULLS) OVER wb AS bts,
               FIRST_VALUE(CASE WHEN is_l = 0 THEN event_id END IGNORE NULLS) OVER wf AS fid,
               FIRST_VALUE(CASE WHEN is_l = 0 THEN ts END IGNORE NULLS) OVER wf AS fts
        FROM u
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_l, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts, is_l, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, event_id, ts,
             COALESCE(CASE WHEN bts IS NULL THEN fid WHEN fts IS NULL THEN bid
                 WHEN epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts)
                 THEN bid ELSE fid END, -1) AS view_event_id,
             COALESCE(CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
                 WHEN epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts)
                 THEN bts ELSE fts END, TIMESTAMP '1970-01-01') AS view_ts
      FROM m WHERE is_l = 1
      ORDER BY user_id, event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("ts").as("view_ts"))
      Temporal.asofJoinNearest(purchases, views, Seq("user_id"), "ts", "view_ts",
          Seq("view_event_id", "view_ts"))
        .select(col("user_id"), col("event_id"), col("ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("view_ts"), to_timestamp(lit("1970-01-01"))).as("view_ts"))
        .orderBy("user_id", "event_id")
    },
  )

  def all: Seq[GraftQuery] = Seq(asofJoin, rangeJoin, asofNearest)
}
