package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.GraftQuery
import graft.metrics.Transforms

/** Structured-streaming pipelines (SURVEY.md §2.G) — the reference's
  * poll loop (main.py: scrape → normalize → fan out to sinks) as a
  * continuous dataflow. The transforms are the *same functions* the
  * batch operators use (metrics.Transforms), so batch/stream parity is
  * structural; the harness oracle-checks each stream's materialized
  * output against the batch SQL.
  *
  * Scale: file micro-batches here stand in for a Kafka source — the
  * plan after the source is identical. State is bounded by watermarks
  * (windowed aggs) and event-time timeouts (flatMapGroupsWithState).
  */
object Streaming {

  private val runSeq = new AtomicInteger(0)

  /** Scratch checkpoint root for the harness streams. These queries
    * checkpoint into throwaway temp dirs (memory/per-batch-dir sinks,
    * deleted with the JVM) — the checkpoint exists because the API
    * requires one, not for recovery — yet every micro-batch pays
    * multiple fsyncs into it (offset WAL, commit log, one state-store
    * delta per shuffle partition). On hosts with slow durable /tmp
    * those fsyncs dominate each stream's fixed cost (guide §6: put
    * scratch I/O on the fast tier). Default: tmpfs (/dev/shm) when
    * present, else java.io.tmpdir. SPARK_GRAFT_CKPT_ROOT overrides —
    * a deploy that wants recoverable checkpoints points this at
    * durable storage, which is the production contract anyway.
    */
  private def ckptDir(): String = {
    val root = sys.env.get("SPARK_GRAFT_CKPT_ROOT").map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isWritable(shm)) Some(shm) else None
      }
    val dir = root match {
      case Some(r) => Files.createTempDirectory(r, "graft_ckpt").toString
      case None => Files.createTempDirectory("graft_ckpt").toString
    }
    // throwaway by construction — reclaim at the per-query boundary
    // (the stream is stopped by then), so tmpfs use stays bounded to
    // one query's checkpoints however long the suite is.
    graft.Caching.registerTransientDir(dir)
    dir
  }

  /** `<table>.parquet` as a micro-batched stream, for BOTH table
    * layouts: the driver's testdata is one parquet FILE per table
    * (stream the parent dir filtered to that file name — a glob filter
    * on the dir, since the file source wants a listing root), while
    * Spark-written data (e.g. the stress generator's) is a DIRECTORY
    * per table (point the source at it directly). The pathGlobFilter
    * form silently matches ZERO files against a directory layout,
    * which surfaced at sf1 as empty sinks and schema-inference errors
    * downstream.
    */
  private def streamTable(s: SparkSession, d: String, table: String): DataFrame = {
    val path = s"$d/$table.parquet"
    val sch = s.read.parquet(path).schema
    val rs = s.readStream.schema(sch)
    if (new java.io.File(path).isDirectory) rs.parquet(path)
    else rs.option("pathGlobFilter", s"$table.parquet").parquet(d)
  }

  /** On-disk bytes of one source table — the input-volume signal each
    * query THREADS into [[runToTable]] explicitly (the pre-r14 ambient
    * AtomicLong let rate/socket-sourced streams inherit a stale value
    * from whatever file-backed query ran last, and multi-table plans
    * got last-write-wins).
    */
  private def tableBytes(d: String, table: String): Long =
    pathBytes(new java.io.File(s"$d/$table.parquet"))

  /** State parallelism sizes to the DATA, not to a constant: one
    * state store materializes per shuffle partition, and store
    * open/commit overhead dominates small micro-batches (the r9
    * lesson behind the fixed 8) — but at the 100× corpus a single
    * harness micro-batch holds ~10M rows and 8 partitions serialize
    * the stateful operators on a 32-core host. Measured A/B on the
    * four heavy stateful twins (sessions/dedup/stateful_rate/hopping,
    * min-of-2 each): 8 partitions win at sf0.1 (6.4 vs 8.3 s) and
    * sf1 (12.1 vs 14.0 s, 21 MB events); 32 win at sf10 (85.6 vs
    * 126.8 s, 212 MB events — st_sessions alone 53.8 → 26.6 s). The
    * threshold sits between the measured 21 MB and 212 MB points; at
    * deploy the same rule is "size streaming shuffle partitions to
    * the per-trigger volume". Oracle-gated scales stay at 8 (sf0.01
    * events ≪ the threshold), so the verify plans are unchanged;
    * output is partition-count independent (StateRescaleSpec).
    */
  private val StreamPartsThresholdBytes = 100L * 1024 * 1024

  private def pathBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).map(pathBytes).sum
    else f.length()

  /** Events parquet as a micro-batched stream (ns ts → µs, same as the
    * batch loader).
    */
  private[graft] def streamEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.Tables.normalizeEventsTs(streamTable(s, d, "events"))
  }

  /** Test hook (EventsLoaderSpec): run the events stream to a static
    * table so the spec can diff it against the batch loader.
    */
  private[graft] def eventsForTest(s: SparkSession, d: String): DataFrame =
    runToTable(s, streamEvents(s, d), OutputMode.Append, tableBytes(d, "events"))

  /** Streaming state parallelism is a different knob from batch
    * shuffle width: every stateful operator materializes one state
    * store per shuffle partition, and store open/commit overhead
    * dominates small micro-batches. Size it down for the harness
    * streams (results are partition-count independent), restore after.
    */
  private def withStreamPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    // A/B override for the state-parallelism sizing experiments
    // (results are partition-count independent — StateRescaleSpec)
    val n2 = sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse(n)
    s.conf.set(key, n2.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Run a stream to completion into an in-memory table and return the
    * static result (the harness then parquet-dumps it like any batch
    * query). `inputBytes` is the query's own source volume (see
    * [[tableBytes]]) — generator-fed streams pass the default 0 and
    * stay at the small-batch parallelism.
    */
  private def runToTable(s: SparkSession, out: DataFrame, mode: OutputMode,
                         inputBytes: Long = 0L): DataFrame =
    withStreamPartitions(s,
      if (inputBytes >= StreamPartsThresholdBytes)
        s.sparkContext.defaultParallelism
      else 8) {
      val name = s"graft_stream_${runSeq.incrementAndGet()}"
      val ckpt = ckptDir()
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(mode).option("checkpointLocation", ckpt).start()
      // the memory sink's rows stay reachable through this temp view
      // for the JVM lifetime otherwise — register it for drop at the
      // next releaseTransient() boundary (after the consumer drains
      // the returned frame). Registered immediately after start()
      // (which creates the view), NOT after the run: a stream that
      // throws mid-run must still have its sink table freed, or Bench
      // records the error and keeps running the suite on the leaked
      // heap.
      graft.Caching.registerTransientView(s, name)
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }

  /** st_pipeline: readStream → jolokia flatten → watermark → 1h
    * windowed rollup — the m1→m2 chain as one continuous query.
    * Complete mode ⇒ the materialized table equals the batch rollup
    * exactly, so the batch oracle applies verbatim.
    */
  val pipeline = GraftQuery(
    "st_pipeline",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_value
      FROM e
      GROUP BY 1, 2
      ORDER BY win_start, event_type"""),
    (s, d) => {
      val flat = Transforms.flattenProps(
        eventsSource(s, SourceKind.File(d)).withWatermark("ts", "2 hours"))
        .withColumnRenamed("injected_server_type", "event_type")
      val rolled = Transforms.hourlyRollup(flat)
      runToTable(s, rolled, OutputMode.Complete(), tableBytes(d, "events"))
        .orderBy("win_start", "event_type")
    },
  )

  // ---- st_stateful_rate -------------------------------------------------

  /** Per-series counter→rate with explicit state: last (ts, value) per
    * (user, type); state expires one hour of event time after the last
    * sample (the reference's poll-freshness gate as a state bound).
    * Batch parity: identical to m3's lag() with the first-sample null
    * dropped — EXCEPT across a state timeout, where the post-gap
    * sample re-seeds instead of rating against an hours-stale
    * predecessor (see st_alerts' parity-boundary note; deliberate, and
    * unreachable in the single-micro-batch harness).
    */
  private def rateFn(key: (Long, String), rows: Iterator[Ev],
                     state: GroupState[SeriesState]): Iterator[RateOut] = {
    val batch = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (batch.isEmpty) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      var prev = state.getOption
      val out = batch.flatMap { e =>
        // dt == 0 (duplicate timestamp in a series): batch m3 divides
        // by zero → Spark NULL, filtered by `rate IS NOT NULL` — emit
        // nothing here so stream and batch agree (raw Scala division
        // would emit ±Infinity/NaN instead).
        val r = prev.collect {
          case p if e.ts_us != p.lastTsUs =>
            RateOut(e.user_id, e.event_type, e.event_id,
              (e.value - p.lastValue) / ((e.ts_us - p.lastTsUs) / 1e6))
        }
        prev = Some(SeriesState(e.ts_us, e.value))
        r
      }
      state.update(prev.get)
      state.setTimeoutTimestamp(batch.last.ts_us / 1000L + 3600L * 1000)
      out.iterator
    }
  }

  val statefulRate = GraftQuery(
    "st_stateful_rate",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
      r AS (
        SELECT user_id, event_type, event_id,
               (value - LAG(value) OVER w)
                 / ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0) AS rate
        FROM e
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      SELECT user_id, event_type, event_id, rate
      FROM r WHERE rate IS NOT NULL
      ORDER BY user_id, event_type, event_id"""),
    (s, d) => {
      runToTable(s, rateStream(s, streamEvents(s, d)), OutputMode.Append(),
        tableBytes(d, "events"))
        .orderBy("user_id", "event_type", "event_id")
    },
  )

  /** The stateful-rate stream over any events-shaped streaming frame
    * (user_id, event_type, event_id, ts, value) — shared by the
    * harness query and the state-rescale spec (which restarts it from
    * a checkpoint under a different shuffle-partition count).
    */
  def rateStream(s: SparkSession, src: DataFrame): DataFrame = {
    import s.implicits._
    val evs: Dataset[Ev] = src
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withWatermark("ts", "2 hours")
      .as[Ev]
    evs.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(rateFn)
      .toDF()
  }

  /** st_sinks: foreachBatch fan-out of every micro-batch to both sinks
    * (main.py's appender loop): ES bulk NDJSON partitioned by the
    * date-rotated index, and Kafka-shaped key-partitioned JSONL. The
    * query's result is read back from the ES sink's files — per-index
    * physical line counts (action + doc line per record) — so the
    * on-disk bytes themselves are what the oracle checks.
    */
  val sinkFanout = GraftQuery(
    "st_sinks",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
      SELECT 'kafka-jmx-logs-' || strftime(ts, '%Y-%m-%d') AS es_index,
             COUNT(*) * 2 AS n_lines
      FROM e
      GROUP BY 1
      ORDER BY es_index"""),
    (s, d) => {
      val esDir = Files.createTempDirectory("graft_es_sink").toString
      val kafkaDir = Files.createTempDirectory("graft_kafka_sink").toString
      val src = streamEvents(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      val ckpt = ckptDir()
      val q = Pipeline.start(src, "ts",
        Pipeline.Config(esDir = Some(esDir), kafkaDir = Some(kafkaDir)), ckpt)
      q.processAllAvailable()
      q.stop()
      // this query's wall time tracks container disk throughput (a
      // measured 5.8–18.5 s band per 60M-line flush) — report the
      // physical bytes so a bench capture self-identifies as disk-bound
      graft.BenchMetrics.recordSinkBytes("st_sinks",
        graft.BenchMetrics.dirBytes(esDir) + graft.BenchMetrics.dirBytes(kafkaDir))
      s.read.text(esDir)
        .groupBy("es_index").agg(count(lit(1)).as("n_lines"))
        .select(col("es_index").cast("string"), col("n_lines"))
        .orderBy("es_index")
    },
  )

  /** st_dedup: streaming dedup — `dropDuplicates` on the series-minute
    * key under a watermark, so state is bounded to the watermark
    * horizon (the reference's poll-gating as a stream). Output projects
    * only the key columns (which row of a dup-group survives is
    * arrival-order dependent; the key set is deterministic and is what
    * the oracle checks).
    */
  val streamDedup = GraftQuery(
    "st_dedup",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
      SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS minute
      FROM e
      ORDER BY user_id, event_type, minute"""),
    (s, d) => {
      val deduped = streamEvents(s, d)
        .withColumn("minute", date_trunc("minute", col("ts")))
        .withWatermark("minute", "2 hours")
        .dropDuplicates("user_id", "event_type", "minute")
        .select("user_id", "event_type", "minute")
      runToTable(s, deduped, OutputMode.Append(), tableBytes(d, "events"))
        .orderBy("user_id", "event_type", "minute")
    },
  )

  /** st_join: stream-stream interval join — each purchase joins the
    * same user's clicks from the preceding hour (inclusive bounds).
    * Both sides carry watermarks and the join has a time-range
    * constraint, so Spark bounds each side's state to the watermark
    * horizon — the streaming twin of the batch range join.
    */
  val streamJoin = GraftQuery(
    "st_join",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, ts AS pts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, event_id AS click_id, ts AS cts FROM e WHERE event_type = 'click')
      SELECT p.user_id, purchase_id, click_id
      FROM p JOIN c ON p.user_id = c.user_id
           AND c.cts >= p.pts - INTERVAL 1 HOUR AND c.cts <= p.pts
      ORDER BY purchase_id, click_id"""),
    (s, d) => {
      val purchases = streamEvents(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
        .withWatermark("pts", "2 hours")
      val clicks = streamEvents(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
        .withWatermark("cts", "2 hours")
      val joined = purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("cts") <= col("pts"))
        .select("user_id", "purchase_id", "click_id")
      runToTable(s, joined, OutputMode.Append(), tableBytes(d, "events"))
        .orderBy("purchase_id", "click_id")
    },
  )

  /** st_enrich: stream-static enrichment — the metric stream joins the
    * broadcast customer dimension (no state: the static side is a
    * lookup, the classic enrichment shape), then aggregates per
    * segment in complete mode.
    */
  val streamEnrich = GraftQuery(
    "st_enrich",
    Some("""
      WITH e AS (SELECT event_id, user_id, value FROM events)
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM e JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, d) => {
      val dim = graft.sources.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = streamEvents(s, d)
        .select(col("user_id"), col("value"))
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), graft.gfunctions.dsum(col("value")).as("total"))
      runToTable(s, enriched, OutputMode.Complete(), tableBytes(d, "events"))
        .orderBy("c_mktsegment")
    },
  )

  /** st_hopping: hopping-window rollup as a continuous query (1h
    * window / 15min hop) — overlapping windows mean each event updates
    * 4 window states; the watermark expires each window 2h after its
    * end. Complete mode ⇒ the materialized table equals m18's batch
    * rollup exactly, so the batch oracle applies verbatim.
    */
  val streamHopping = GraftQuery(
    "st_hopping",
    graft.metrics.Metrics.hoppingRollup.oracle,
    (s, d) => {
      val rolled = streamEvents(s, d)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), graft.gfunctions.dsum(col("value")).as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
      runToTable(s, rolled, OutputMode.Complete(), tableBytes(d, "events"))
        .orderBy("win_start", "event_type")
    },
  )

  /** Per-series alert-state machine: emit ENTER/CLEAR edges when the
    * value crosses the threshold relative to the REMEMBERED state, not
    * the previous row of a batch — the live twin of m15 (whose lag()
    * needs the whole history). State = one boolean per series, expired
    * one hour of event time after the last sample.
    */
  private def alertFn(key: (Long, String), rows: Iterator[AlertEv],
                      state: GroupState[AlertState]): Iterator[AlertOut] = {
    val batch = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (batch.isEmpty) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      var prev = state.getOption.map(_.alerting)
      val out = batch.flatMap { e =>
        val alerting = e.value > 250
        val r = prev.collect {
          case was if was != alerting =>
            AlertOut(e.user_id, e.event_type, e.ts, e.value,
              if (alerting) "ENTER" else "CLEAR", e.event_id)
        }
        prev = Some(alerting)
        r
      }
      state.update(AlertState(prev.get))
      state.setTimeoutTimestamp(batch.last.ts_us / 1000L + 3600L * 1000)
      out.iterator
    }
  }

  /** st_alerts: stateful threshold alerting — batch-parity with m15
    * (the first sample of a series seeds state and emits nothing, like
    * lag's initial NULL), so the batch oracle applies verbatim.
    *
    * Parity boundary (shared with st_stateful_rate): the 1h event-time
    * timeout is the state bound, so a series silent past it RE-SEEDS —
    * its next sample emits no edge, where batch lag() would reach back
    * across the gap. That divergence is deliberate monitoring
    * semantics (a series dark for an hour is a new incarnation; state
    * must not grow with the key space), and it is unreachable in the
    * harness (single micro-batch ⇒ no watermark passes between
    * samples) — which is why the oracle still applies verbatim here.
    */
  val streamAlerts = GraftQuery(
    "st_alerts",
    graft.metrics.Metrics.alertTransitions.oracle,
    (s, d) => {
      import s.implicits._
      val evs: Dataset[AlertEv] = streamEvents(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
        .withWatermark("ts", "2 hours")
        .as[AlertEv]
      val edges = evs
        .groupByKey(e => (e.user_id, e.event_type))
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(alertFn)
      // event_id rides along purely as the deterministic tie-break
      // (two transitions at one timestamp in a series), mirroring
      // m15's orderBy — then drops out of the oracle-facing schema.
      runToTable(s, edges.toDF(), OutputMode.Append(), tableBytes(d, "events"))
        .orderBy("user_id", "event_type", "ts", "event_id")
        .drop("event_id")
    },
  )

  /** st_sessions: native session-window sessionization as a continuous
    * query — Spark merges per-key windows whose gaps are under 30min;
    * the watermark closes sessions and bounds state. Gap-boundary
    * semantics: a gap of EXACTLY 30min starts a new session
    * (session_window's end is exclusive), which the oracle replays
    * with `>=` — note m5's manual cumulative-sum uses `>` (both are
    * valid sessionizations; the operator documents the difference).
    * Complete mode re-emits the whole materialized session table each
    * batch (session streaming supports complete/append, not update);
    * the memory-sink table therefore equals the final sessionization.
    */
  val streamSessions = GraftQuery(
    "st_sessions",
    Some("""
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events),
      x AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                 OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      y AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x)
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM y
      GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
    (s, d) => {
      runToTable(s, sessionStream(streamEvents(s, d)), OutputMode.Complete(),
        tableBytes(d, "events"))
        .orderBy("user_id", "session_start")
    },
  )

  /** The session-window stream over any events-shaped streaming frame —
    * shared by the harness query and the state-rescale spec.
    */
  def sessionStream(src: DataFrame): DataFrame =
    src
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(max(col("ts")).as("session_end"), count(lit(1)).as("n_events"),
        graft.gfunctions.dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_end"), col("n_events"), col("session_value"))

  /** st_latest: the live gauge view — latest sample per series as a
    * continuously-updated aggregate (`max_by` keyed on the (ts,
    * event_id) total order). Complete mode materializes the current
    * table; batch-parity with m4, whose oracle applies verbatim.
    * State is one row per series — the natural bound.
    */
  val streamLatest = GraftQuery(
    "st_latest",
    graft.metrics.Metrics.latestPerSeries.oracle,
    (s, d) => {
      val latest = streamEvents(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
        .groupBy("user_id", "event_type")
        .agg(
          max_by(col("ts"), struct(col("ts"), col("event_id"))).as("last_ts"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_value"))
      runToTable(s, latest, OutputMode.Complete(), tableBytes(d, "events"))
        .orderBy("user_id", "event_type")
    },
  )

  /** The pipeline's source, as a parameter: the downstream plan
    * (flatten → watermark → rollup → sinks) is IDENTICAL whichever
    * ingress feeds it — a file listing (replayable micro-batches), the
    * rate generator (trigger-cadence-driven), or a TCP socket
    * (receiver-driven, no replay — the closest local stand-in for a
    * network ingest like Kafka, whose connector jar this container
    * lacks). One parity spec per kind (StreamingParitySpec /
    * RateSourceSpec / SocketSourceSpec) proves the trigger and
    * backpressure paths behave uniformly.
    */
  sealed trait SourceKind
  object SourceKind {
    /** Parquet micro-batches of the events table under `dir`. */
    final case class File(dir: String) extends SourceKind
    /** Generator micro-batches at `rowsPerSecond`, shaped to events. */
    final case class Rate(rowsPerSecond: Int = 5000) extends SourceKind
    /** Newline-delimited generator ids over TCP, shaped to events. */
    final case class Socket(port: Int) extends SourceKind
  }

  def eventsSource(s: SparkSession, kind: SourceKind): DataFrame = kind match {
    case SourceKind.File(d) => streamEvents(s, d)
    case SourceKind.Rate(r) => rateEvents(s, r)
    case SourceKind.Socket(p) => socketEvents(s, p)
  }

  /** Synthetic events from the RATE source — timestamped generator
    * micro-batches driven by trigger cadence, no file listing: the
    * source-parameterization path that the file micro-batches (and, on
    * a cluster, a Kafka source) slot into. Each generated sequential
    * id maps deterministically to an events-shaped row, so whatever
    * prefix of the stream the triggers have processed equals
    * [[rateEventsBatch]] of the same row count — that equivalence is
    * the replay-parity assertion in RateSourceSpec.
    */
  def rateEvents(s: SparkSession, rowsPerSecond: Int = 5000): DataFrame =
    shapeGenerated(s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", "2").load()
      .select(col("value").as("gid")))

  /** The same deterministic shaping over a bounded id range — the
    * batch twin used to assert rate-replay parity.
    */
  def rateEventsBatch(s: SparkSession, n: Long): DataFrame =
    shapeGenerated(s.range(0, n).select(col("id").as("gid")))

  /** Generated events over the SOCKET source: the harness (or any
    * producer) writes newline-delimited generator ids to the port and
    * each becomes the same deterministic events-shaped row as the
    * rate/batch twins — so whatever id SET arrived equals
    * [[rateEventsBatch]] restricted to those ids (SocketSourceSpec).
    * Receiver-driven and non-replayable, like a raw network ingest.
    */
  def socketEvents(s: SparkSession, port: Int): DataFrame =
    shapeGenerated(s.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", port.toString).load()
      .select(col("value").cast("long").as("gid")))

  /** id → events-shaped row: 61s-spaced timestamps (rollups span many
    * hours), 50 users, 4 event types, a non-trivial value sequence.
    */
  private def shapeGenerated(ids: DataFrame): DataFrame =
    ids.select(
      col("gid").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("gid") * 61000000L).as("ts"),
      pmod(col("gid"), lit(50L)).as("user_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("scroll")),
        (pmod(col("gid"), lit(4L)) + 1).cast("int")).as("event_type"),
      pmod(col("gid") * 7919, lit(500L)).cast("double").as("value"))

  /** st_histogram_quantile: m26 as a continuous query — the
    * fixed-width bucket counts are the streamed state (a mergeable
    * sketch: counts sum across micro-batches, state = ~10 rows per
    * series), and the closed-form quantile interpolation runs at READ
    * time over the materialized bucket table. Exactly Prometheus
    * semantics: histogram counters accumulate continuously;
    * histogram_quantile() evaluates over the scraped buckets per
    * query. Complete mode ⇒ the bucket table equals the batch sketch,
    * so m26's oracle applies verbatim. Shares bucketCounts /
    * quantileFromBuckets with the batch operator.
    */
  val streamHistogramQuantile = GraftQuery(
    "st_histogram_quantile",
    graft.metrics.Metrics.histogramQuantile.oracle,
    (s, d) => {
      val buckets = graft.metrics.Metrics.bucketCounts(streamEvents(s, d))
      graft.metrics.Metrics.quantileFromBuckets(
        runToTable(s, buckets, OutputMode.Complete(), tableBytes(d, "events")))
    },
  )

  // ---- st_cusum ---------------------------------------------------------

  /** Per-series CUSUM drift state machine: the running (hi, lo) CUSUM
    * recurrence and its maxima live in group state — one 5-field row
    * per series, the natural bound. The reference mean μ arrives as a
    * static calibration-baseline join (standard deployed-CUSUM shape:
    * μ comes from a calibration window, the monitored stream folds
    * against it). Each micro-batch emits the series' updated snapshot;
    * in the single-batch harness that is exactly m25's batch result.
    * The fold is the same left-assoc double sequence as m25's column
    * fold, so parity is bit-exact.
    */
  private def cusumFn(key: (Long, String), rows: Iterator[CuEv],
                      state: GroupState[CuState]): Iterator[CuOut] = {
    val batch = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (batch.isEmpty) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val m = batch.head.mean
      var st = state.getOption.getOrElse(CuState(0.0, 0.0, 0.0, 0.0, 0L))
      batch.foreach { e =>
        val hi = math.max(st.hi + e.value - m - 0.05 * m, 0.0)
        val lo = math.max(st.lo + m - e.value - 0.05 * m, 0.0)
        st = CuState(hi, lo, math.max(st.mh, hi), math.max(st.ml, lo), st.n + 1)
      }
      state.update(st)
      state.setTimeoutTimestamp(batch.last.ts_us / 1000L + 3600L * 1000)
      // same floor-based round-half-up as m25's r4 (see its comment)
      def fl(x: Double) = math.floor(x * 10000 + 0.5)
      Iterator.single(CuOut(key._1, key._2, st.n,
        fl(st.mh) / 10000, fl(st.ml) / 10000,
        fl(st.mh) > fl(0.5 * m) || fl(st.ml) > fl(0.5 * m)))
    }
  }

  /** st_cusum: m25 as a live drift monitor — batch-parity with m25's
    * whole-series fold (asserted in StreamingParitySpec; the oracle
    * applies verbatim in the single-batch harness).
    */
  val streamCusum = GraftQuery(
    "st_cusum",
    graft.metrics.Metrics.cusumDrift.oracle,
    (s, d) => {
      import s.implicits._
      val means = graft.sources.Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(graft.gfunctions.davg(col("value")).as("mean"))
      val evs: Dataset[CuEv] = streamEvents(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
        .join(broadcast(means), Seq("user_id", "event_type"))
        .withWatermark("ts", "2 hours")
        .as[CuEv]
      val out = evs
        .groupByKey(e => (e.user_id, e.event_type))
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(cusumFn)
      latestSnapshotPerSeries(
        runToTable(s, out.toDF(), OutputMode.Append(), tableBytes(d, "events")))
        .orderBy("user_id", "event_type")
    },
  )

  /** Append-mode state monitors (st_cusum / st_ewma) emit one snapshot
    * per ACTIVE series per micro-batch. The parquet file source
    * delivers the whole dataset in a single batch here, but any
    * multi-batch trigger config (e.g. maxFilesPerTrigger) would stack
    * one snapshot per batch in the sink — so reads take the LATEST
    * snapshot per series (max samples seen, `n`) instead of assuming
    * single-batch delivery. Under single-batch delivery this is the
    * identity; under multi-batch it is the current state, not a
    * corrupted union of partial ones.
    */
  private def latestSnapshotPerSeries(tbl: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("n").desc)
    tbl.withColumn("_snap_rn", row_number().over(w))
      .filter(col("_snap_rn") === 1).drop("_snap_rn")
  }

  /** Per-series EWMA state machine: one (ewma, n) row per series; the
    * first sample seeds, each next folds e' = 0.3·x + 0.7·e — the same
    * left-assoc double sequence as m14's array fold, so parity is
    * bit-exact. Rounding at emit uses BigDecimal.valueOf HALF_UP,
    * which IS Spark round()'s double path (m14's output rounding).
    */
  private def ewmaFn(key: (Long, String), rows: Iterator[Ev],
                     state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    val batch = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (batch.isEmpty) {
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      var st = state.getOption
      batch.foreach { e =>
        st = Some(st match {
          case None => EwmaState(e.value, 1L)
          case Some(p) => EwmaState(0.3 * e.value + 0.7 * p.ewma, p.n + 1)
        })
      }
      state.update(st.get)
      state.setTimeoutTimestamp(batch.last.ts_us / 1000L + 3600L * 1000)
      val rounded = java.math.BigDecimal.valueOf(st.get.ewma)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      Iterator.single(EwmaOut(key._1, key._2, rounded, st.get.n))
    }
  }

  /** st_ewma: m14 as a live smoothed-gauge view — each micro-batch
    * emits the series' updated EWMA snapshot; in the single-batch
    * harness that equals m14's whole-series fold, so its oracle
    * applies verbatim (parity asserted in StreamingParitySpec).
    */
  val streamEwma = GraftQuery(
    "st_ewma",
    graft.metrics.Metrics.ewma.oracle,
    (s, d) => {
      import s.implicits._
      val evs: Dataset[Ev] = streamEvents(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
        .withWatermark("ts", "2 hours")
        .as[Ev]
      val out = evs
        .groupByKey(e => (e.user_id, e.event_type))
        .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(ewmaFn)
      // latest snapshot per series — see latestSnapshotPerSeries
      latestSnapshotPerSeries(
        runToTable(s, out.toDF(), OutputMode.Append(), tableBytes(d, "events")))
        .orderBy("user_id", "event_type")
    },
  )

  /** st_mixture: the data-mixture report as a continuous query — the
    * per-(source, lang) doc/token counts stream in complete mode (a
    * mergeable sketch, state = one row per cell) and the corpus shares
    * evaluate at read time over the materialized table (same
    * accumulate/evaluate split as st_histogram_quantile). An ingestion
    * pipeline watches its mixture drift live this way. t_mixture's
    * oracle applies verbatim; shares functions shared with the batch op.
    */
  val streamMixture = GraftQuery(
    "st_mixture",
    graft.text.Text.mixture.oracle,
    (s, d) => {
      val docs = streamTable(s, d, "documents")
      graft.text.Text.mixtureShares(
        runToTable(s, graft.text.Text.mixtureCounts(docs), OutputMode.Complete(),
          tableBytes(d, "documents")))
    },
  )

  /** st_ann: online ANN serving — probe batches arrive as a stream and
    * each micro-batch searches the STATIC IVF index (built once,
    * centroids as literals, candidates via the cid equi-join): the
    * lookup-service shape, where the index is a published artifact
    * (IvfStore) and probes are the unbounded side. Exactly-once to the
    * result sink via per-batch overwrite directories (same contract as
    * Pipeline). In the single-micro-batch harness the result is
    * exactly s_ivf_search, whose oracle applies verbatim.
    */
  val streamAnn = GraftQuery(
    "st_ann",
    graft.sim.Sim.ivfSearch.oracle,
    (s, d) => {
      // cid-partitioned serving layout, chosen by the DEPLOY RULE at
      // index-build time (IvfStore.partitionedLayoutDue): publish
      // partitioned and serve from the artifact — probed cells pushed
      // as static partition filters (Sim.searchIvfProbes prunes when
      // idx.prunable; measured 1.33x on sparse batches,
      // ANNLAYOUT_AB_VEC2M_r13) — exactly when a typical probe batch
      // cannot cover the index. This harness geometry (10 probes ×
      // nprobe 2 ≥ k = 8: every batch covers all cells) resolves to
      // the flat in-memory path, so default plans are byte-unchanged.
      // SPARK_GRAFT_ANN_PARTITIONED=1/0 overrides the rule either way.
      val partitioned = sys.env.get("SPARK_GRAFT_ANN_PARTITIONED") match {
        case Some("1") => true
        case Some("0") => false
        case _ => graft.sim.IvfStore.partitionedLayoutDue(
          expectedBatchProbes = 10L, nprobe = 2, k = 8)
      }
      val idx =
        if (partitioned)
          graft.sim.IvfStore.load(s,
            graft.sim.Sim.publishedIndexDir(s, d, k = 8, iters = 3,
              partitioned = true))
        else graft.sim.Sim.ivfIndex(s, d, k = 8, iters = 3)
      val outDir = Files.createTempDirectory("graft_ann_out").toString
      val ckpt = ckptDir()
      val probes = streamTable(s, d, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
      val q = probes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          graft.sim.Sim.searchIvfProbes(idx, b)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      s.read.option("basePath", outDir).parquet(outDir)
        .select("probe_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("probe_id", "rank")
    },
  )

  /** st_index_health: the ANN index's retrain trigger wired into
    * serving (the response half of the staleness lifecycle the
    * ADDPROBE_*_r12 artifacts measured) — a published index's frozen
    * centroids + persisted baselines (IvfStore.save's meta/: d2_base,
    * save-time cell imbalance) are loaded once, then each arriving
    * micro-batch of vectors is assigned map-side and ONE health row
    * per batch emits the trigger statistics: d2_ratio (batch mean
    * assign distance over the trained corpus' own — stationary data
    * reads ~1.0, drift read 1.19–2.07 in the r12 probes) and the
    * batch's cell imbalance, with retrain_due evaluating the
    * documented rule (ratio ≥ 1.1 or imbalance ≥ 2× the save-time
    * baseline; IvfStore.retrainDue). The marginal cost on top of the
    * batch's own assignment is a k-row aggregate — the
    * accumulate/evaluate shape st_dsir models, reduced to its
    * cheapest form. In the single-micro-batch harness the batch is
    * the arrival tail (vec_id ≥ 90% cut) of the corpus the index was
    * trained on, so the oracle replays the unrolled-Lloyd chain and
    * the same decimal-exact ratio arithmetic verbatim (stationary ⇒
    * retrain_due = 0; a drifted batch tripping the rule is spec-gated
    * in IvfStoreSpec).
    */
  val streamIndexHealth = GraftQuery(
    "st_index_health",
    Some(s"""
      ${graft.sim.Sim.ivfSql(8, 3)},
      thr AS (SELECT CAST(FLOOR(0.9 * (MAX(vec_id) + 1)) AS BIGINT) AS t FROM embeddings),
      bcells AS (SELECT cid, COUNT(*) AS cnt, SUM(CAST(d2 AS DECIMAL(28,10))) AS sd2
                 FROM a4 GROUP BY cid),
      basem AS (SELECT CAST(SUM(sd2) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS d2_base,
                       CAST(MAX(cnt) AS DOUBLE)
                         / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) AS imb_base
                FROM bcells),
      b AS (SELECT a4.* FROM a4, thr WHERE a4.vec_id >= thr.t),
      cells AS (SELECT cid, COUNT(*) AS cnt, SUM(CAST(d2 AS DECIMAL(28,10))) AS sd2
                FROM b GROUP BY cid),
      agg AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_batch,
                     CAST(SUM(sd2) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS d2_mean,
                     CAST(MAX(cnt) AS DOUBLE)
                       / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) AS imb
              FROM cells)
      SELECT n_batch,
             ROUND(d2_mean / d2_base, 4) AS d2_ratio,
             ROUND(imb, 4) AS cell_imbalance,
             CASE WHEN d2_mean / d2_base >= 1.1 OR imb >= 2.0 * imb_base
                  THEN 1 ELSE 0 END AS retrain_due
      FROM agg, basem"""),
    (s, d) => {
      val dir = graft.sim.Sim.publishedIndexDir(s, d, k = 8, iters = 3)
      val idx = graft.sim.IvfStore.load(s, dir)
      val meta = graft.sim.IvfStore.loadMeta(s, dir)
      val thr = graft.sources.Tables.embeddings(s, d)
        .agg(floor(lit(0.9) * (max("vec_id") + 1)).cast("long")).head().getLong(0)
      val outDir = Files.createTempDirectory("graft_health_out").toString
      val ckpt = ckptDir()
      val arrivals = streamTable(s, d, "embeddings")
        .filter(col("vec_id") >= thr)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = arrivals.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          // an EMPTY micro-batch (file source re-trigger with nothing
          // new) would aggregate to one all-null health row and
          // pollute the persisted output — skip it; the trigger rule
          // is about arriving data, and no data is trivially healthy
          if (!b.isEmpty)
            graft.sim.Sim.indexHealth(b, idx.centroids, meta)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      s.read.option("basePath", outDir).parquet(outDir)
        .select("n_batch", "d2_ratio", "cell_imbalance", "retrain_due")
        .orderBy("n_batch")
    },
  )

  /** st_dsir: importance-resampling as a SERVING pipeline — the DSIR
    * model (B-row log-likelihood-ratio table) is trained offline on
    * the batch corpus and published, then unbounded document batches
    * stream in and are scored map-side against the broadcast model per
    * micro-batch (the st_ann shape: static artifact × streaming
    * probes). Scored docs land in per-batch overwrite directories
    * (exactly-once); the top-K selection evaluates at read time over
    * everything scored so far — the accumulate/evaluate split, since a
    * running global top-K is not a streaming aggregate. In the
    * single-micro-batch harness the result is exactly t_dsir, whose
    * oracle applies verbatim.
    */
  val streamDsir = GraftQuery(
    "st_dsir",
    graft.text.Text.dsir.oracle,
    (s, d) => {
      import graft.text.Text
      // train once; batches must not re-derive it. releaseAfter (not a
      // raw localCheckpoint): Dataset.unpersist cannot see checkpoint
      // blocks, so only the tracked registry frees them per-query.
      val lr = graft.Caching.releaseAfter(
        Text.dsirModel(graft.sources.Tables.documents(s, d)))
      val outDir = Files.createTempDirectory("graft_dsir_out").toString
      val ckpt = ckptDir()
      val docs = streamTable(s, d, "documents")
      val q = docs.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Text.dsirScore(b, lr)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      val scored = s.read.option("basePath", outDir).parquet(outDir)
        .select("doc_id", "dsir_weight")
      Text.dsirSelect(scored)
    },
  )

  /** st_filtered_ann: predicate-filtered ANN serving — st_ann's shape
    * (static index × streaming probe batches, exactly-once per-batch
    * dirs) with each probe's label predicate pre-filtering the cell
    * candidate scan (searchIvfProbesFiltered, shared with the batch
    * op). The lookup-service form of a filtered vector query. In the
    * single-micro-batch harness the result is exactly s_filtered_ann,
    * whose oracle applies verbatim.
    */
  val streamFilteredAnn = GraftQuery(
    "st_filtered_ann",
    graft.sim.Sim.filteredAnn.oracle,
    (s, d) => {
      val idx = graft.sim.Sim.ivfIndex(s, d, k = 8, iters = 3)
      val labels = graft.Caching.releaseAfter(s.read.parquet(s"$d/embeddings.parquet")
        .selectExpr("vec_id", "label"))
      val outDir = Files.createTempDirectory("graft_fann_out").toString
      val ckpt = ckptDir()
      val probes = streamTable(s, d, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
      val q = probes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          graft.sim.Sim.searchIvfProbesFiltered(idx, labels, b)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      s.read.option("basePath", outDir).parquet(outDir)
        .select("probe_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("probe_id", "rank")
    },
  )

  /** st_dedup_ingest: online ingestion dedup — the streaming form of
    * d_bloom_prefilter, closing the dedup deployment triptych
    * (d_incremental = daily batch vs stored index; d_bloom_prefilter =
    * the same with the bloom pushdown; this = docs arriving as a
    * STREAM). The stored-corpus artifacts build once offline (distinct
    * window-hash index, persisted + its 2^20-bit bloom literal); each
    * arriving micro-batch windows its docs map-side, probes the bloom,
    * and only positives reach the exact confirm semi-join; per-doc
    * span stats land in exactly-once per-batch dirs. Batch boundaries
    * cannot split a doc's windows (windows derive from one text
    * value), so spanStats per batch ≡ spanStats over the union and
    * d_bloom_prefilter's oracle applies verbatim.
    */
  val streamDedupIngest = GraftQuery(
    "st_dedup_ingest",
    graft.dedup.Dedup.bloomPrefilter.oracle,
    (s, d) => {
      import graft.dedup.{Dedup, DedupStore}
      val docs = graft.sources.Tables.documents(s, d)
      val thr = docs.agg(floor(lit(0.9) * (max("doc_id") + 1)).cast("long")).head().getLong(0)
      // the stored-index lifecycle IS the pipeline: the corpus window
      // index + bloom build offline ONCE and land in storage
      // (DedupStore.saveWindowIndex); the streaming job then boots
      // from the artifact dir — bloom from its 16 KB table without
      // touching the hash index, hashes as a parquet scan.
      val idxDir = Files.createTempDirectory("graft_ingest_idx").toString
      DedupStore.saveWindowIndex(docs.filter(col("doc_id") < thr), idxDir)
      val widx = DedupStore.loadWindowIndex(s, idxDir)
      val corpus = widx.hashes
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bloom = widx.bloom
      val outDir = Files.createTempDirectory("graft_ingest_out").toString
      val ckpt = ckptDir()
      val arrivals = streamTable(s, d, "documents").filter(col("doc_id") >= thr)
      val q = arrivals.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Dedup.spanStats(
              Dedup.bloomProbe(Dedup.windowTable(b), bloom)
                .join(corpus, Seq("h"), "left_semi"))
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      corpus.unpersist(blocking = false)
      s.read.option("basePath", outDir).parquet(outDir)
        .select("doc_id", "n_tokens", "dup_windows", "dup_tokens", "dup_frac")
        .orderBy("doc_id")
    },
  )

  /** st_quality_probe: the trained linear quality classifier as a
    * SERVING pipeline — the probe trains offline on the batch corpus
    * (one decimal-exact moment pass; coefficients are SIX DOUBLES, the
    * broadcast-model extreme), then unbounded doc batches are
    * featurized and scored map-side per micro-batch; the top-K
    * selection evaluates at read time (accumulate/evaluate split, as
    * st_dsir). One subtlety shared with the batch op: feature f1
    * normalizes by the CORPUS max token count, so the featurizer ships
    * that scalar with the model — a served model's feature scaling is
    * always a training-time artifact. Oracle verbatim.
    */
  val streamQualityProbe = GraftQuery(
    "st_quality_probe",
    graft.text.Text.qualityProbe.oracle,
    (s, d) => {
      import graft.text.Text
      // model artifacts = 6 coefficients + the f1 normalizer scalar
      // (trained once per dir, shared with t_quality_probe)
      val (beta, maxTokens) = Text.probeModel(s, d)
      val outDir = Files.createTempDirectory("graft_probe_out").toString
      val ckpt = ckptDir()
      val docs = streamTable(s, d, "documents")
      val q = docs.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Text.scoreProbe(Text.probeFeatures(b, maxTokens = Some(maxTokens)), beta)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      val scored = s.read.option("basePath", outDir).parquet(outDir)
        .select("doc_id", "score", "is_target")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      scored.orderBy(col("score").desc, col("doc_id")).limit(Text.DsirTopK)
        .withColumn("rnk", row_number().over(w))
        .select(col("rnk"), col("doc_id"), col("score"), col("is_target"))
        .orderBy("rnk")
    },
  )

  /** st_ngram_lm: LM-perplexity filtering as a SERVING pipeline — the
    * bigram model (pair/context count tables + vocab scalar) trains
    * offline on the batch corpus and is published, then unbounded doc
    * batches stream in and are scored per micro-batch against the
    * static model (the st_dsir shape: static artifact × streaming
    * docs). Scored docs land in per-batch overwrite directories
    * (exactly-once); the head/middle/tail tertile cut evaluates at
    * read time over everything scored so far — accumulate/evaluate
    * split, since a global rank is not a streaming aggregate. In the
    * single-micro-batch harness the result is exactly t_ngram_lm,
    * whose oracle applies verbatim.
    */
  val streamNgramLm = GraftQuery(
    "st_ngram_lm",
    graft.text.Text.ngramLm.oracle,
    (s, d) => {
      import graft.text.Text
      val (pair0, ctx0, vocab0) = Text.lmModel(graft.sources.Tables.documents(s, d))
      // train once; micro-batches must not re-derive the model
      // (tracked checkpoints — freed at the next releaseTransient)
      val pair = graft.Caching.releaseAfter(pair0)
      val ctx = graft.Caching.releaseAfter(ctx0)
      val vocab = graft.Caching.releaseAfter(vocab0)
      val outDir = Files.createTempDirectory("graft_lm_out").toString
      val ckpt = ckptDir()
      val docs = streamTable(s, d, "documents")
      val q = docs.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Text.lmScore(b, pair, ctx, vocab)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
      q.processAllAvailable()
      q.stop()
      val scored = s.read.option("basePath", outDir).parquet(outDir)
        .select("doc_id", "n_bigrams", "avg_nll")
      Text.lmTertiles(scored)
    },
  )

  def all: Seq[GraftQuery] =
    Seq(pipeline, statefulRate, sinkFanout, streamDedup, streamJoin, streamEnrich,
      streamHopping, streamAlerts, streamSessions, streamLatest,
      streamHistogramQuantile, streamCusum, streamEwma, streamAnn, streamMixture,
      streamDsir, streamNgramLm, streamFilteredAnn, streamQualityProbe,
      streamDedupIngest, streamIndexHealth)
}

// Encoder-visible row types for the stateful stream (must not be
// private: Catalyst's generated projections access them reflectively).
case class Ev(user_id: Long, event_type: String, event_id: Long,
              ts: java.sql.Timestamp, ts_us: Long, value: Double)
case class SeriesState(lastTsUs: Long, lastValue: Double)
case class RateOut(user_id: Long, event_type: String, event_id: Long, rate: Double)
case class AlertEv(user_id: Long, event_type: String, event_id: Long,
                   ts: java.sql.Timestamp, ts_us: Long, value: Double)
case class AlertState(alerting: Boolean)
case class AlertOut(user_id: Long, event_type: String, ts: java.sql.Timestamp,
                    value: Double, transition: String, event_id: Long)
case class CuEv(user_id: Long, event_type: String, event_id: Long,
                ts: java.sql.Timestamp, ts_us: Long, value: Double, mean: Double)
case class CuState(hi: Double, lo: Double, mh: Double, ml: Double, n: Long)
case class EwmaState(ewma: Double, n: Long)
case class EwmaOut(user_id: Long, event_type: String, ewma: Double, n: Long)
case class CuOut(user_id: Long, event_type: String, n: Long,
                 cusum_hi_max: Double, cusum_lo_max: Double, drift: Boolean)
