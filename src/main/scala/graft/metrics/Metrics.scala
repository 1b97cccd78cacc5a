package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftQuery
import graft.gfunctions._
import graft.sources.Tables

/** JMX/metrics engine (SURVEY.md §2.A) — the reference's own surface
  * re-expressed over the `events` metric stream (series key =
  * (user_id, event_type), sample = (ts, value), payload = props).
  *
  * Reference behaviors covered: JSON payload normalization + metadata
  * injection (JMXScraper.py:95-118), windowed shipping & rollups
  * (dashboards), counter→rate, latest-per-series, poll gating
  * (JMXScraper.py:186-199), server dedup (JMXScraper.py:26-46), ES
  * bulk format + date-rotated index (ElasticSearchAppender.py:86-117),
  * Connect task-status explode (ConnectRESTMetrics.py).
  *
  * All series ops shuffle exactly once on the series key; rollups are
  * map-side partial; the stats join in m6 broadcasts.
  */
object Metrics {

  /** Oracle-side CTE: events with ts truncated to micros (Spark reads
    * the ns column truncated — see Tables.events).
    */
  private val E =
    "WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** m1: JSON payload parse + typed projection + metadata injection —
    * JMXScraper.internal_get_structured_json_from_response semantics:
    * extract payload fields, inject host/server-type/createdDateTime.
    */
  val flattenProps = GraftQuery(
    "m1_flatten_props",
    Some(s"""
      $E
      SELECT event_id,
             CAST(json_extract(props, '$$.k') AS BIGINT) AS prop_k,
             'user-' || CAST(user_id AS VARCHAR) AS injected_host,
             event_type AS injected_server_type,
             epoch_ms(ts) AS created_date_time
      FROM e
      ORDER BY event_id"""),
    (s, d) =>
      Transforms.flattenProps(Tables.events(s, d))
        .drop("ts", "value")
        .orderBy("event_id"),
  )

  /** m2: tumbling-window rollup per series (dashboard aggregation). */
  val windowRollup = GraftQuery(
    "m2_window_rollup",
    Some(s"""
      $E
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_value
      FROM e
      GROUP BY 1, 2
      ORDER BY win_start, event_type"""),
    (s, d) =>
      Transforms.hourlyRollup(Tables.events(s, d))
        .orderBy("win_start", "event_type"),
  )

  /** m3: counter→rate per series (delta value / delta seconds). */
  val rate = GraftQuery(
    "m3_rate",
    Some(s"""
      $E
      SELECT event_id, user_id, event_type, ts, value,
             (value - LAG(value) OVER w)
               / ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0) AS rate
      FROM e
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
      ORDER BY user_id, event_type, ts, event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"),
          // safeDiv: duplicate ts in a series ⇒ NULL rate (DuckDB
          // semantics), not an ANSI divide-by-zero crash.
          safeDiv(col("value") - lag(col("value"), 1).over(w),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)) / lit(1000000.0))
            .as("rate"))
        .orderBy("user_id", "event_type", "ts", "event_id")
    },
  )

  /** m4: latest sample per series (gauge panels). */
  val latestPerSeries = GraftQuery(
    "m4_latest_per_series",
    Some(s"""
      $E
      SELECT user_id, event_type, ts AS last_ts, value AS last_value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
              ORDER BY ts DESC, event_id DESC) AS rn FROM e) t
      WHERE rn = 1
      ORDER BY user_id, event_type"""),
    (s, d) =>
      // TopK.perKey(k=1): WindowGroupLimit partial pushdown keeps one
      // candidate per series per partition BELOW the shuffle, so the
      // exchange carries series·partitions rows, not the whole stream.
      graft.olap.TopK.perKey(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc), 1)
        .select(col("user_id"), col("event_type"),
          col("ts").as("last_ts"), col("value").as("last_value"))
        .orderBy("user_id", "event_type"),
  )

  /** m5: gap-based sessionization (30-min inactivity boundary). */
  val sessionize = GraftQuery(
    "m5_sessionize",
    Some(s"""
      $E
      SELECT user_id, session_id,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM (
        SELECT user_id, ts, value,
               -- CAST: DuckDB integer SUM yields HUGEINT (→ float64 in
               -- the harness), Spark yields long — hash-exactness needs
               -- the same integer type on both sides.
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                   OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 THEN 1 ELSE 0 END AS is_new
          FROM e) x) y
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    (s, d) => {
      val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTs))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(cum))
        .groupBy("user_id", "session_id")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy("user_id", "session_id")
    },
  )

  /** m6: per-series z-score anomaly flags. Mean/variance from exact
    * decimal sums (order-independent), stats broadcast back.
    */
  val anomalyZscore = GraftQuery(
    "m6_anomaly_zscore",
    Some(s"""
      $E, stats AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               COUNT(*) AS n
        FROM e GROUP BY event_type)
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
      FROM e JOIN stats USING (event_type)
      WHERE abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 2.5
      ORDER BY event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy("event_type").agg(
        dsum(col("value")).as("s1"),
        sum(dec2(col("value")) * dec2(col("value"))).cast("double").as("s2"),
        count(lit(1)).as("n"))
      // safeDiv ×2: a single-sample series (n=1) and a constant series
      // (stddev 0) both yield NULL z (filtered), matching DuckDB —
      // under ANSI either would otherwise be a divide-by-zero error.
      val z = safeDiv(col("value") - col("s1") / col("n"),
        sqrt(safeDiv(col("s2") - col("s1") * col("s1") / col("n"), col("n") - 1)))
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"), z.as("z"))
        .filter(abs(col("z")) > 2.5)
        .orderBy("event_id")
    },
  )

  /** m7: Elasticsearch bulk NDJSON lines + date-rotated index name
    * (ElasticSearchAppender.py:86-117: `{"index":...}` action line per
    * doc, index `name-YYYY-MM-DD`).
    */
  val esBulkFormat = GraftQuery(
    "m7_es_bulk_format",
    Some(s"""
      $E
      SELECT event_id,
             'kafka-jmx-logs-' || strftime(ts, '%Y-%m-%d') AS es_index,
             '{"index":{"_index":"kafka-jmx-logs-' || strftime(ts, '%Y-%m-%d') || '","_type":"doc"}}' AS action_line,
             '{"event_id":' || CAST(event_id AS VARCHAR) ||
               ',"event_type":"' || event_type ||
               '","value":' || CAST(value AS VARCHAR) ||
               ',"createdDateTime":' || CAST(epoch_ms(ts) AS VARCHAR) || '}' AS doc_line
      FROM e
      ORDER BY event_id"""),
    (s, d) => {
      val idx = concat(lit("kafka-jmx-logs-"), date_format(col("ts"), "yyyy-MM-dd"))
      Tables.events(s, d)
        .select(
          col("event_id"),
          idx.as("es_index"),
          concat(lit("{\"index\":{\"_index\":\""), idx, lit("\",\"_type\":\"doc\"}}")).as("action_line"),
          concat(
            lit("{\"event_id\":"), col("event_id").cast("string"),
            lit(",\"event_type\":\""), col("event_type"),
            lit("\",\"value\":"), col("value").cast("string"),
            lit(",\"createdDateTime\":"), unix_millis(col("ts")).cast("string"),
            lit("}")).as("doc_line"))
        .orderBy("event_id")
    },
  )

  /** m8: server-URL build + parse + dedup (unique server list,
    * JMXScraper.get_unique_server_list).
    */
  val serverDedup = GraftQuery(
    "m8_server_dedup",
    Some(s"""
      $E
      SELECT DISTINCT
             event_type AS server_type,
             'host-' || CAST(user_id % 16 AS VARCHAR) AS host,
             7770 + user_id % 8 AS port,
             'http://host-' || CAST(user_id % 16 AS VARCHAR) || ':' ||
               CAST(7770 + user_id % 8 AS VARCHAR) AS url
      FROM e
      ORDER BY server_type, host, port"""),
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_type").as("server_type"),
          concat(lit("host-"), (col("user_id") % 16).cast("string")).as("host"),
          (lit(7770) + col("user_id") % 8).as("port"))
        .withColumn("url", concat(lit("http://"), col("host"), lit(":"), col("port").cast("string")))
        .distinct()
        .orderBy("server_type", "host", "port"),
  )

  /** m9: Connect REST status payload → per-task rows. The payload is
    * synthesized from the row, parsed with from_json, tasks exploded —
    * the oracle recomputes the expected rows directly.
    */
  val connectStatus = GraftQuery(
    "m9_connect_status",
    Some(s"""
      $E
      SELECT event_id,
             'conn-' || CAST(user_id % 4 AS VARCHAR) AS connector_name,
             upper(event_type) AS connector_state,
             t.task_id,
             CASE WHEN t.task_id = 0 THEN 'RUNNING' ELSE upper(event_type) END AS task_state,
             'worker-' || CAST(user_id % 8 AS VARCHAR) || ':8083' AS worker_id
      FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS task_id) t
      ORDER BY event_id, task_id"""),
    (s, d) => {
      val worker = concat(lit("worker-"), (col("user_id") % 8).cast("string"), lit(":8083"))
      val payload = concat(
        lit("{\"name\":\"conn-"), (col("user_id") % 4).cast("string"),
        lit("\",\"connector\":{\"state\":\""), upper(col("event_type")),
        lit("\"},\"tasks\":[{\"id\":0,\"state\":\"RUNNING\",\"worker_id\":\""), worker,
        lit("\"},{\"id\":1,\"state\":\""), upper(col("event_type")),
        lit("\",\"worker_id\":\""), worker, lit("\"}]}"))
      val schema = "STRUCT<name: STRING, connector: STRUCT<state: STRING>, " +
        "tasks: ARRAY<STRUCT<id: INT, state: STRING, worker_id: STRING>>>"
      // per-row JSON build + parse is the heavy map stage here — the
      // single-row-group events scan would run it one task wide
      graft.Par.spread(Tables.events(s, d))
        .select(col("event_id"), from_json(payload, org.apache.spark.sql.types.DataType.fromDDL(schema)).as("p"))
        .select(col("event_id"), col("p.name").as("connector_name"),
          col("p.connector.state").as("connector_state"), explode(col("p.tasks")).as("t"))
        .select(col("event_id"), col("connector_name"), col("connector_state"),
          col("t.id").as("task_id"), col("t.state").as("task_state"),
          col("t.worker_id").as("worker_id"))
        .orderBy("event_id", "task_id")
    },
  )

  /** m10: top-k series by aggregate (dashboard top-N panel). */
  val topSeries = GraftQuery(
    "m10_top_series",
    Some(s"""
      $E
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM e
      GROUP BY user_id, event_type
      ORDER BY total DESC, user_id, event_type
      LIMIT 25"""),
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("total").desc, col("user_id"), col("event_type"))
        .limit(25),
  )

  /** m11: poll-interval gating — keep first sample per series per
    * 1-minute window (JMXScraper freshness gate as set semantics).
    */
  val pollGating = GraftQuery(
    "m11_poll_gating",
    Some(s"""
      $E
      SELECT event_type, COUNT(*) AS n_kept,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS kept_value
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id, event_type, date_trunc('minute', ts)
              ORDER BY ts, event_id) AS rn FROM e) t
      WHERE rn = 1
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, d) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), date_trunc("minute", col("ts")))
        .orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), dsum(col("value")).as("kept_value"))
        .orderBy("event_type")
    },
  )

  /** m13: per-series value histogram (fixed-width buckets) — the
    * dashboard distribution panel. One shuffle on (series, bucket),
    * map-side partial counts.
    */
  val valueHistogram = GraftQuery(
    "m13_value_histogram",
    Some(s"""
      $E
      SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket,
             COUNT(*) AS n,
             CAST(MIN(value) AS DOUBLE) AS lo,
             CAST(MAX(value) AS DOUBLE) AS hi
      FROM e
      GROUP BY event_type, bucket
      ORDER BY event_type, bucket"""),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
        .orderBy("event_type", "bucket"),
  )

  /** m14: exact EWMA (α=0.3) per series — the dashboard smoothing op.
    * One shuffle: values collect per series in event order, one fold.
    * The fold order is the recurrence itself, so DuckDB's list_reduce
    * replays it bit-exact (first element seeds, like pandas ewm
    * adjust=false).
    */
  val ewma = GraftQuery(
    "m14_ewma",
    Some(s"""
      $E,
      g AS (SELECT user_id, event_type,
              list(value ORDER BY ts, event_id) AS vs
            FROM e GROUP BY user_id, event_type)
      SELECT user_id, event_type,
             ROUND(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma,
             len(vs) AS n
      FROM g
      ORDER BY user_id, event_type"""),
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
          r => r.getField("value")).as("vs"))
        .select(col("user_id"), col("event_type"),
          round(aggregate(slice(col("vs"), lit(2), size(col("vs"))),
            element_at(col("vs"), 1),
            (acc, x) => lit(0.3) * x + lit(0.7) * acc), 4).as("ewma"),
          size(col("vs")).as("n"))
        .orderBy("user_id", "event_type"),
  )

  /** m15: alert-state transitions — the dashboard alert rule as an
    * operator: a series ENTERs alert when its value crosses above the
    * threshold and CLEARs when it crosses back below. One window pass
    * (lag per series), emits only the edges, not the steady states.
    */
  val alertTransitions = GraftQuery(
    "m15_alert_transitions",
    Some(s"""
      $E,
      f AS (SELECT user_id, event_type, ts, event_id, value,
              value > 250 AS alerting,
              LAG(value > 250) OVER (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS was_alerting
            FROM e)
      SELECT user_id, event_type, ts, value,
             CASE WHEN alerting THEN 'ENTER' ELSE 'CLEAR' END AS transition
      FROM f
      WHERE was_alerting IS NOT NULL AND alerting <> was_alerting
      ORDER BY user_id, event_type, ts, event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("alerting", col("value") > 250)
        .withColumn("was_alerting", lag(col("alerting"), 1).over(w))
        .filter(col("was_alerting").isNotNull && col("alerting") =!= col("was_alerting"))
        .select(col("user_id"), col("event_type"), col("ts"), col("value"),
          when(col("alerting"), "ENTER").otherwise("CLEAR").as("transition"))
        .orderBy("user_id", "event_type", "ts", "event_id")
    },
  )

  /** m16: robust outliers via median absolute deviation — the
    * median-based twin of m6 (immune to the outliers it hunts). Two
    * aggregation passes; per-series stats broadcast back; stats
    * rounded to 4 before the compare so the cross-engine filter edge
    * is deterministic.
    */
  val madOutliers = GraftQuery(
    "m16_mad_outliers",
    Some(s"""
      $E,
      med AS (SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
              FROM e GROUP BY event_type),
      mad AS (SELECT e.event_type,
                     ROUND(quantile_cont(abs(e.value - med.med), 0.5), 4) AS mad
              FROM e JOIN med USING (event_type) GROUP BY e.event_type, med.med)
      SELECT e.event_id, e.event_type, e.value,
             ROUND(abs(e.value - med.med) / mad.mad, 4) AS mad_score
      FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
      WHERE ROUND(abs(e.value - med.med) / mad.mad, 4) > 3.5
      ORDER BY event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val med = e.groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 4).as("med"))
      val mad = e.join(broadcast(med), Seq("event_type"))
        .groupBy("event_type", "med")
        .agg(round(percentile(abs(col("value") - col("med")), lit(0.5)), 4).as("mad"))
        .select("event_type", "mad")
      // safeDiv: mad=0 (≥half the series identical) ⇒ NULL score
      // (filtered), matching DuckDB — not an ANSI divide-by-zero.
      val score = round(safeDiv(abs(col("value") - col("med")), col("mad")), 4)
      e.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"), score.as("mad_score"))
        .filter(col("mad_score") > 3.5)
        .orderBy("event_id")
    },
  )

  /** m17: per-series downtime — total time in inter-sample gaps above
    * the poll tolerance (the availability metric behind a dead-man
    * alert). One lag pass, one agg; integer microsecond sums so the
    * compare is exact.
    */
  val downtime = GraftQuery(
    "m17_downtime",
    Some(s"""
      $E,
      g AS (SELECT user_id, event_type,
              epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap_us
            FROM e)
      SELECT user_id, event_type,
             COUNT(CASE WHEN gap_us > 1800000000 THEN 1 END) AS n_gaps,
             COALESCE(SUM(CASE WHEN gap_us > 1800000000 THEN gap_us END), 0) / 1000000 AS downtime_sec
      FROM g
      GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .groupBy("user_id", "event_type")
        .agg(
          count(when(col("gap_us") > 1800000000L, 1)).as("n_gaps"),
          (coalesce(sum(when(col("gap_us") > 1800000000L, col("gap_us"))), lit(0L)) / 1000000L)
            .as("downtime_sec"))
        .orderBy("user_id", "event_type")
    },
  )

  /** m18: hopping-window rollup (1h windows every 15min) — the
    * overlapping-window dashboard aggregate. Spark's `window(ts, size,
    * slide)` replicates each event into size/slide windows map-side,
    * then aggregates with one shuffle (map-side partials); the oracle
    * replays the same 4-window fan-out with an explicit offset unnest.
    * Both grids are epoch-aligned.
    */
  val hoppingRollup = GraftQuery(
    "m18_hopping_rollup",
    Some(s"""
      $E, h AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - to_minutes(CAST(k * 15 AS BIGINT)) AS win_start,
               event_type, value
        FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
      SELECT win_start, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM h
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type"""),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("win_start", "event_type"),
  )

  /** m19: counter-reset-aware rate — the Prometheus `increase()`
    * semantic: a counter dropping below its previous sample means the
    * process restarted, so the increase is the new value itself, not a
    * negative delta. Same one-shuffle lag shape as m3; duplicate
    * timestamps yield NULL rate (safeDiv).
    */
  val counterResetRate = GraftQuery(
    "m19_counter_reset_rate",
    Some(s"""
      $E, r AS (
        SELECT event_id, user_id, event_type, value,
               value - LAG(value) OVER w AS delta,
               (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS dt
        FROM e
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      SELECT event_id, user_id, event_type,
             CASE WHEN delta < 0 THEN value ELSE delta END AS increase,
             (CASE WHEN delta < 0 THEN value ELSE delta END) / nullif(dt, 0) AS reset_rate
      FROM r
      WHERE delta IS NOT NULL
      ORDER BY event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val delta = col("value") - lag(col("value"), 1).over(w)
      val dt = (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)) / lit(1000000.0)
      val increase = when(delta < 0, col("value")).otherwise(delta)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          delta.as("delta"), increase.as("increase"), safeDiv(increase, dt).as("reset_rate"))
        .filter(col("delta").isNotNull)
        .drop("delta")
        .orderBy("event_id")
    },
  )

  /** m20: exported-metric catalog — the discovery surface: which
    * (server type, metric key) series exist, their sample counts and
    * observation range. The reference derives this implicitly from
    * wildcard mbean scrapes (JMXScraper's multi-mbean normalization);
    * here it is a first-class one-shuffle aggregate over the flattened
    * stream.
    */
  val metricCatalog = GraftQuery(
    "m20_metric_catalog",
    Some(s"""
      $E
      SELECT event_type AS injected_server_type,
             CAST(json_extract(props, '$$.k') AS BIGINT) AS prop_k,
             COUNT(*) AS n_samples,
             MIN(ts) AS first_seen, MAX(ts) AS last_seen,
             COUNT(DISTINCT user_id) AS n_hosts
      FROM e
      GROUP BY 1, 2
      ORDER BY injected_server_type, prop_k"""),
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type").as("injected_server_type"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
          col("ts"), col("user_id"))
        .groupBy("injected_server_type", "prop_k")
        .agg(count(lit(1)).as("n_samples"),
          min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"),
          countDistinct(col("user_id")).as("n_hosts"))
        .orderBy("injected_server_type", "prop_k"),
  )

  /** m21: multi-window SLO burn rate — the SRE-workbook alert shape:
    * error-budget consumption speed over a short (1h) and a long (6h)
    * window, paging only when BOTH burn fast (fast-burn real incident,
    * not a blip). Two rollups joined on the containing long window;
    * ratios exact-decimal so the page edge is deterministic.
    */
  val burnRate = GraftQuery(
    "m21_burn_rate",
    Some(s"""
      $E, h1 AS (
        SELECT date_trunc('hour', ts) AS win1,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err1,
               COUNT(*) AS tot1
        FROM e GROUP BY 1),
      h6 AS (
        -- CAST: epoch() is DOUBLE and // does not floor doubles
        SELECT to_timestamp(CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 21600 * 21600) AS win6,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err6,
               COUNT(*) AS tot6
        FROM e GROUP BY 1)
      SELECT win1, err1, tot1,
             ROUND(CAST(err1 AS DOUBLE) / tot1 / 0.01, 4) AS burn_1h,
             ROUND(CAST(err6 AS DOUBLE) / tot6 / 0.01, 4) AS burn_6h,
             (CAST(err1 AS DOUBLE) / tot1 / 0.01 > 14.4
              AND CAST(err6 AS DOUBLE) / tot6 / 0.01 > 6.0) AS page
      FROM h1 JOIN h6
        ON to_timestamp(CAST(epoch(win1) AS BIGINT) // 21600 * 21600) = win6
      ORDER BY win1"""),
    (s, d) => {
      val e = Tables.events(s, d)
      val isErr = when(col("event_type") === "error", 1).otherwise(0)
      val h1 = e.groupBy(date_trunc("hour", col("ts")).as("win1"))
        .agg(sum(isErr).as("err1"), count(lit(1)).as("tot1"))
      // floor-div, not `/` (Spark's / on longs yields double)
      def floor6h(t: org.apache.spark.sql.Column) =
        timestamp_seconds(floor(unix_seconds(t) / 21600).cast("long") * 21600)
      val h6 = e.groupBy(floor6h(date_trunc("hour", col("ts"))).as("win6"))
        .agg(sum(isErr).as("err6"), count(lit(1)).as("tot6"))
      val b1 = col("err1").cast("double") / col("tot1") / 0.01
      val b6 = col("err6").cast("double") / col("tot6") / 0.01
      h1
        .join(h6,
          timestamp_seconds(floor(unix_seconds(col("win1")) / 21600).cast("long") * 21600)
            === col("win6"))
        .select(col("win1"), col("err1"), col("tot1"),
          round(b1, 4).as("burn_1h"), round(b6, 4).as("burn_6h"),
          (b1 > 14.4 && b6 > 6.0).as("page"))
        .orderBy("win1")
    },
  )

  /** m22: time-weighted average of a gauge per series — each sample
    * holds until the next one, so its weight is the µs it was current;
    * the plain mean over-counts bursts of fast polls. One lag pass
    * (lead, really) + exact integer-µs weights, decimal-exact sums.
    */
  val timeWeightedAvg = GraftQuery(
    "m22_time_weighted_avg",
    Some(s"""
      $E, x AS (
        SELECT user_id, event_type, value,
               LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS hold_us
        FROM e
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
      y AS (SELECT * FROM x WHERE hold_us IS NOT NULL AND hold_us > 0)
      SELECT user_id, event_type,
             COUNT(*) AS n_intervals,
             CAST(SUM(hold_us) AS BIGINT) AS total_us,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * hold_us) AS DOUBLE)
               / CAST(SUM(hold_us) AS DOUBLE), 4) AS twa
      FROM y
      GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val holdUs = lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"), holdUs.as("hold_us"))
        .filter(col("hold_us").isNotNull && col("hold_us") > 0)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("hold_us")).as("total_us"),
          round(sum(dec2(col("value")) * col("hold_us")).cast("double") /
            sum(col("hold_us")).cast("double"), 4).as("twa"))
        .orderBy("user_id", "event_type")
    },
  )

  /** m23: seasonal baseline deviation — the hour-of-day seasonal-naive
    * model: each series' per-hour-of-day mean is its baseline, and a
    * sample deviating from its own hour's baseline by >60% is flagged
    * (a constant threshold on raw value fires every rush hour; a
    * seasonal baseline doesn't). Two-pass: baseline aggregate
    * (exact-decimal means), broadcast back, flag. Same shape as m6 with
    * a seasonal key.
    */
  val seasonalBaseline = GraftQuery(
    "m23_seasonal_baseline",
    Some(s"""
      $E, b AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hod,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS baseline
        FROM e GROUP BY 1, 2)
      SELECT e.event_id, e.event_type, EXTRACT(hour FROM ts) AS hod, e.value,
             ROUND(b.baseline, 4) AS baseline,
             ROUND(e.value / b.baseline - 1.0, 4) AS deviation
      FROM e JOIN b ON b.event_type = e.event_type AND b.hod = EXTRACT(hour FROM ts)
      WHERE abs(e.value / b.baseline - 1.0) > 0.6
      ORDER BY event_id"""),
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          hour(col("ts")).as("hod"))
      val base = e.groupBy("event_type", "hod")
        .agg(davg(col("value")).as("baseline"))
      val dev = safeDiv(col("value"), col("baseline")) - 1.0
      e.join(broadcast(base), Seq("event_type", "hod"))
        .filter(abs(dev) > 0.6)
        .select(col("event_id"), col("event_type"), col("hod").cast("long").as("hod"),
          col("value"), round(col("baseline"), 4).as("baseline"),
          round(dev, 4).as("deviation"))
        .orderBy("event_id")
    },
  )

  /** Bootstrap requests a sink setup pass issues before the first
    * bulk (ElasticSearchAppender.py:43-65): the index TEMPLATE put
    * (dates the createdDateTime field for the rolling
    * `<index>-YYYY-MM-DD` indices m7 writes) and the Kibana
    * index-pattern put. Pure deterministic string construction over a
    * config frame — the body/url byte strings are exactly the
    * reference's concatenations.
    */
  def esBootstrap(configs: DataFrame): DataFrame = {
    val template = struct(
      lit(1L).as("step"),
      lit("PUT").as("method"),
      concat(col("es_url"), lit("/_template/"), col("index_name"), lit("_template"))
        .as("url"),
      concat(lit("{\"template\": \""), col("index_name"),
        lit("-*\",\"mappings\": {\"default\": {\"properties\": " +
          "{\"createdDateTime\": {\"type\": \"date\"}}}}}")).as("body"))
    val kibanaPattern = struct(
      lit(2L).as("step"),
      lit("PUT").as("method"),
      concat(col("kibana_url"), lit("/es_admin/.kibana/index-pattern/"),
        col("index_name"), lit("-*/_create")).as("url"),
      concat(lit("{\"title\": \""), col("index_name"),
        lit("-*\",\"notExpandable\":true, \"timeFieldName\": \"createdDateTime\"}"))
        .as("body"))
    configs
      .select(col("index_name"), explode(array(template, kibanaPattern)).as("req"))
      .select(col("index_name"), col("req.step"), col("req.method"),
        col("req.url"), col("req.body"))
  }

  /** m24: the canned bootstrap for the reference's default endpoints,
    * oracle-checked via literal replay (like m12) — the construction
    * must reproduce the reference's PUTs byte-for-byte.
    */
  val esBootstrapQuery = GraftQuery(
    "m24_es_bootstrap",
    Some("""
      SELECT * FROM (VALUES
        ('kafka-jmx-logs', CAST(1 AS BIGINT), 'PUT',
         'http://localhost:9200/_template/kafka-jmx-logs_template',
         '{"template": "kafka-jmx-logs-*","mappings": {"default": {"properties": {"createdDateTime": {"type": "date"}}}}}'),
        ('kafka-jmx-logs', CAST(2 AS BIGINT), 'PUT',
         'http://localhost:5601/es_admin/.kibana/index-pattern/kafka-jmx-logs-*/_create',
         '{"title": "kafka-jmx-logs-*","notExpandable":true, "timeFieldName": "createdDateTime"}')
      ) AS t(index_name, step, method, url, body)
      ORDER BY index_name, step"""),
    (s, _) => {
      import s.implicits._
      val cfg = Seq(("kafka-jmx-logs", "http://localhost:9200", "http://localhost:5601"))
        .toDF("index_name", "es_url", "kibana_url")
      esBootstrap(cfg).orderBy("index_name", "step")
    },
  )

  /** m25: CUSUM drift detection per series — the changepoint
    * complement to m6/m16's point outliers: a sustained small shift
    * (a slow leak, a degrading broker) never trips a z-score but
    * accumulates in the CUSUM statistic. Two-sided recurrence
    * s⁺ₜ = max(0, s⁺ₜ₋₁ + xₜ − μ − k), s⁻ₜ = max(0, s⁻ₜ₋₁ + μ − xₜ − k)
    * with slack k = 0.05μ and drift when either max excursion clears
    * h = 0.5μ. Same distributed shape as m14's EWMA: one shuffle
    * groups each series, the ordered fold runs where the series
    * lives; the oracle replays the recurrence with a struct
    * accumulator in list_reduce — bit-identical doubles (μ is
    * decimal-exact, the fold is the same left fold).
    */
  val cusumDrift = GraftQuery(
    "m25_cusum_drift",
    Some(s"""
      $E,
      g AS (SELECT user_id, event_type,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
              list(value ORDER BY ts, event_id) AS vs
            FROM e GROUP BY user_id, event_type),
      f AS (SELECT user_id, event_type, mean, len(vs) AS n,
              -- field ORDER is load-bearing: DuckDB evaluates struct
              -- fields sequentially and later fields see the UPDATED
              -- acc, so the max-trackers (mh/ml) must come BEFORE the
              -- state fields (hi/lo) they read.
              list_reduce(
                list_prepend(
                  {'mh': CAST(0 AS DOUBLE), 'ml': CAST(0 AS DOUBLE),
                   'hi': CAST(0 AS DOUBLE), 'lo': CAST(0 AS DOUBLE),
                   'v': CAST(0 AS DOUBLE)},
                  list_transform(vs, __cx ->
                    {'mh': CAST(0 AS DOUBLE), 'ml': CAST(0 AS DOUBLE),
                     'hi': CAST(0 AS DOUBLE), 'lo': CAST(0 AS DOUBLE), 'v': __cx})),
                (acc, b) ->
                  {'mh': greatest(acc.mh,
                     greatest(acc.hi + b.v - mean - 0.05 * mean, CAST(0 AS DOUBLE))),
                   'ml': greatest(acc.ml,
                     greatest(acc.lo + mean - b.v - 0.05 * mean, CAST(0 AS DOUBLE))),
                   'hi': greatest(acc.hi + b.v - mean - 0.05 * mean, CAST(0 AS DOUBLE)),
                   'lo': greatest(acc.lo + mean - b.v - 0.05 * mean, CAST(0 AS DOUBLE)),
                   'v': CAST(0 AS DOUBLE)}) AS r
            FROM g)
      SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
             CAST(floor(r.mh * 10000 + 0.5) AS DOUBLE) / 10000 AS cusum_hi_max,
             CAST(floor(r.ml * 10000 + 0.5) AS DOUBLE) / 10000 AS cusum_lo_max,
             (floor(r.mh * 10000 + 0.5) > floor(0.5 * mean * 10000 + 0.5)
               OR floor(r.ml * 10000 + 0.5) > floor(0.5 * mean * 10000 + 0.5)) AS drift
      FROM f
      ORDER BY user_id, event_type"""),
    (s, d) => {
      val zero = lit(0.0)
      val init = struct(zero.as("hi"), zero.as("lo"), zero.as("mh"), zero.as("ml"))
      val m = col("mean")
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(davg(col("value")).as("mean"),
          transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
            r => r.getField("value")).as("vs"))
        .select(col("user_id"), col("event_type"), col("mean"),
          size(col("vs")).cast("long").as("n"),
          aggregate(col("vs"), init, (acc, x) => struct(
            greatest(acc.getField("hi") + x - m - lit(0.05) * m, zero).as("hi"),
            greatest(acc.getField("lo") + m - x - lit(0.05) * m, zero).as("lo"),
            greatest(acc.getField("mh"),
              greatest(acc.getField("hi") + x - m - lit(0.05) * m, zero)).as("mh"),
            greatest(acc.getField("ml"),
              greatest(acc.getField("lo") + m - x - lit(0.05) * m, zero)).as("ml"))).as("r"))
        .select(col("user_id"), col("event_type"), col("n"),
          // floor-based round-half-up in pure double math: Spark's
          // round() goes through the double's shortest decimal repr
          // (BigDecimal.valueOf) and calls exact halves UP where
          // DuckDB rounds the true binary value DOWN — and the 0.05μ
          // slack makes x.xxxx5 values systematic here. floor(x·10⁴
          // + 0.5)/10⁴ is the same double op sequence in both engines.
          r4(col("r.mh")).as("cusum_hi_max"),
          r4(col("r.ml")).as("cusum_lo_max"),
          (floor(col("r.mh") * 10000 + 0.5) > floor(lit(0.5) * m * 10000 + 0.5) ||
            floor(col("r.ml") * 10000 + 0.5) > floor(lit(0.5) * m * 10000 + 0.5))
            .as("drift"))
        .orderBy("user_id", "event_type")
    },
  )

  /** Engine-portable round-half-up at 4 decimals via pure double
    * arithmetic (see m25's comment for why round() can't cross the
    * engine boundary on half-edges).
    */
  private def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 10000 + 0.5).cast("double") / 10000

  /** m26: Prometheus-style histogram_quantile — estimate p50/p90/p99
    * per event type from fixed-width cumulative buckets (the m13
    * histogram) by linear interpolation inside the first bucket whose
    * cumulative count reaches q·total. This is how every
    * Prometheus/Grafana latency panel computes quantiles from
    * histogram counters: the sketch is mergeable (bucket counts sum),
    * so at 100 TB the plan is one partial-agg shuffle on
    * (event_type, bucket) — ~10 rows per series — then a per-series
    * window over those few rows. Exact-replayable: the estimate is a
    * closed-form function of integer bucket counts.
    */
  val histogramQuantile = GraftQuery(
    "m26_histogram_quantile",
    Some(s"""
      $E,
      b AS (SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket,
              COUNT(*) AS n
            FROM e GROUP BY event_type, bucket),
      c AS (SELECT event_type, bucket, n,
              CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
              CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
            FROM b),
      j AS (SELECT c.*, q, q * total AS rk
            FROM c CROSS JOIN (SELECT unnest([CAST(0.5 AS DOUBLE),
                     CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q)
            WHERE cum >= q * total),
      p AS (SELECT event_type, q, MIN(bucket) AS bucket FROM j
            GROUP BY event_type, q),
      est AS (SELECT c.event_type, p.q,
                c.bucket * 50 + 50 * (p.q * c.total - (c.cum - c.n)) / c.n AS v
              FROM p JOIN c ON c.event_type = p.event_type
                           AND c.bucket = p.bucket)
      SELECT event_type,
             CAST(floor(MAX(CASE WHEN q = 0.5  THEN v END) * 10000 + 0.5) AS DOUBLE) / 10000 AS p50,
             CAST(floor(MAX(CASE WHEN q = 0.9  THEN v END) * 10000 + 0.5) AS DOUBLE) / 10000 AS p90,
             CAST(floor(MAX(CASE WHEN q = 0.99 THEN v END) * 10000 + 0.5) AS DOUBLE) / 10000 AS p99
      FROM est GROUP BY event_type
      ORDER BY event_type"""),
    (s, d) => quantileFromBuckets(bucketCounts(Tables.events(s, d))),
  )

  /** The mergeable bucket sketch (fixed width 50) — works identically
    * on a batch frame and a streaming one (counts sum), which is what
    * makes m26 streamable as st_histogram_quantile.
    */
  private[graft] def bucketCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), floor(col("value") / 50).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** The closed-form quantile estimate over a (event_type, bucket, n)
    * bucket-count frame — the query-time half of m26, shared with its
    * streaming twin (Prometheus semantics: counters accumulate
    * continuously, histogram_quantile evaluates over the ~10 scraped
    * bucket rows per series at read time).
    */
  private[graft] def quantileFromBuckets(b: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val c = b
      .withColumn("cum", sum("n").over(byType.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("n").over(byType))
    val j = c
      .withColumn("q", explode(array(lit(0.5), lit(0.9), lit(0.99))))
      .filter(col("cum") >= col("q") * col("total"))
    // min_by picks the first bucket whose cum reaches the target rank
    // — one aggregation, no join back onto the bucket frame (a
    // self-join would also trip reference dedup over a memory-sink
    // table in the streaming twin)
    val est = j.groupBy("event_type", "q")
      .agg(min_by(struct(col("bucket"), col("n"), col("cum"), col("total")),
        col("bucket")).as("b"))
      .withColumn("v",
        col("b.bucket") * 50 +
          lit(50) * (col("q") * col("b.total") - (col("b.cum") - col("b.n"))) / col("b.n"))
    est.groupBy("event_type")
      .agg(
        // r4, not round(): interpolated estimates land on half-edges
        // (see m25's comment on Spark-vs-DuckDB round divergence)
        r4(max(when(col("q") === 0.5, col("v")))).as("p50"),
        r4(max(when(col("q") === 0.9, col("v")))).as("p90"),
        r4(max(when(col("q") === 0.99, col("v")))).as("p99"))
      .orderBy("event_type")
  }

  def all: Seq[GraftQuery] = Seq(
    flattenProps, windowRollup, rate, latestPerSeries, sessionize,
    anomalyZscore, esBulkFormat, serverDedup, connectStatus, topSeries,
    pollGating, valueHistogram, ewma, alertTransitions, madOutliers, downtime,
    hoppingRollup, counterResetRate, metricCatalog, burnRate, timeWeightedAvg,
    seasonalBaseline, esBootstrapQuery, cusumDrift, histogramQuantile,
  )
}
