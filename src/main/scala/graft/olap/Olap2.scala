package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.gfunctions._
import graft.sources.Tables

/** Second OLAP batch: pivot, cube, correlated-subquery pattern —
  * rounding out the relational surface (SURVEY.md §2.B).
  */
object Olap2 {

  private val Priorities =
    Seq("1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high", "3-MEDIUM" -> "p_medium",
      "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")

  /** q_pivot: status × priority contingency pivot. Fixed value list so
    * the plan is a single-shuffle conditional aggregation (no extra
    * distinct pass to discover pivot values — at scale that pass is a
    * full shuffle you don't want).
    */
  val pivot = GraftQuery(
    "q_pivot",
    Some(s"""
      SELECT o_orderstatus,
             ${Priorities.map { case (v, a) => s"COUNT(CASE WHEN o_orderpriority = '$v' THEN 1 END) AS $a" }.mkString(", ")}
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    (s, d) => {
      val p = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", Priorities.map(_._1))
        .count()
      Priorities.foldLeft(p) { case (df, (v, a)) => df.withColumnRenamed(v, a) }
        .na.fill(0L, Priorities.map(_._2))
        .orderBy("o_orderstatus")
    },
  )

  /** q_cube: full CUBE over (status, priority) — all four grouping
    * sets in one pass (Expand + single shuffle).
    */
  val cube2 = GraftQuery(
    "q_cube",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
  )

  /** q_correlated: each customer's orders priced above their own mean
    * (correlated `> (SELECT AVG … WHERE same customer)` pattern) — as
    * one window pass instead of a self-join, so it shuffles once on
    * o_custkey.
    */
  val correlated = GraftQuery(
    "q_correlated",
    Some("""
      WITH m AS (SELECT o_custkey,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*) AS cust_mean
                 FROM orders GROUP BY o_custkey)
      SELECT o.o_custkey, COUNT(*) AS n_above,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS above_total
      FROM orders o JOIN m ON o.o_custkey = m.o_custkey
      WHERE o.o_totalprice > m.cust_mean
      GROUP BY o.o_custkey
      ORDER BY o.o_custkey"""),
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, d)
        .withColumn("cust_mean",
          sum(dec2(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cust_mean"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_above"), dsum(col("o_totalprice")).as("above_total"))
        .orderBy("o_custkey")
    },
  )

  /** q_salted_join: the skew-salting path through the oracle gate —
    * orders ⋈ customer via gfunctions.saltedJoin (8-way salt on the
    * fact side, dim replicated 8×), aggregated per segment. The oracle
    * is the PLAIN join: passing proves salting changes the shuffle
    * layout, not the result.
    */
  val saltedJoinQ = GraftQuery(
    "q_salted_join",
    Some("""
      SELECT c_mktsegment,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, d) => {
      val c = Tables.customer(s, d)
        .withColumnRenamed("c_custkey", "o_custkey")
      graft.gfunctions.saltedJoin(Tables.orders(s, d), c, "o_custkey", 8,
          Seq("o_orderkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")
    },
  )

  /** One ANSI SQL text, two engines: this exact string runs unchanged
    * in Spark (via temp views) AND as the DuckDB oracle — the
    * engine's SQL front door, not just the DataFrame API.
    */
  private val AnsiSql = """
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             RANK() OVER (PARTITION BY c_mktsegment
               ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
                        o_orderpriority) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
      ORDER BY c_mktsegment, rnk"""

  val ansiSql = GraftQuery(
    "q_ansi_sql",
    Some(AnsiSql),
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(AnsiSql)
    },
  )

  /** q_approx_distinct: HLL++ distinct-count per group — the sketch
    * you actually run at 100 TB (fixed-size state, one pass, no exact
    * distinct shuffle). Engines' sketches differ, so the harness check
    * is rows-only; the ScalaTest asserts the estimate lands within
    * HLL++'s error envelope of the exact count.
    */
  val approxDistinct = GraftQuery(
    "q_approx_distinct",
    None,
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
  )

  /** q_profile: column profiling (null count / distinct / min / max
    * per column) in ONE scan — the data-quality pass a pipeline runs
    * before training. One wide aggregate row unpivoted to per-column
    * rows; no per-column jobs.
    */
  val profile = GraftQuery(
    "q_profile",
    Some("""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_custkey,
               COUNT(DISTINCT o_custkey) AS nd_custkey,
               CAST(MIN(o_custkey) AS VARCHAR) AS mn_custkey, CAST(MAX(o_custkey) AS VARCHAR) AS mx_custkey,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_status,
               COUNT(DISTINCT o_orderstatus) AS nd_status,
               MIN(o_orderstatus) AS mn_status, MAX(o_orderstatus) AS mx_status,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_price,
               COUNT(DISTINCT o_totalprice) AS nd_price,
               CAST(MIN(o_totalprice) AS VARCHAR) AS mn_price, CAST(MAX(o_totalprice) AS VARCHAR) AS mx_price
        FROM orders)
      SELECT * FROM (
        SELECT 'o_custkey' AS column_name, n_rows, nn_custkey AS n_null, nd_custkey AS n_distinct, mn_custkey AS min_val, mx_custkey AS max_val FROM a
        UNION ALL
        SELECT 'o_orderstatus', n_rows, nn_status, nd_status, mn_status, mx_status FROM a
        UNION ALL
        SELECT 'o_totalprice', n_rows, nn_price, nd_price, mn_price, mx_price FROM a)
      ORDER BY column_name"""),
    (s, d) => {
      // 3 exact count-distincts expand the input 4× before the agg —
      // heavy enough that a single-row-group scan serializes it
      val o = graft.Par.spread(Tables.orders(s, d))
      val a = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("nn_custkey"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        min(col("o_custkey")).cast("string").as("mn_custkey"),
        max(col("o_custkey")).cast("string").as("mx_custkey"),
        sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).as("nn_status"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        min(col("o_orderstatus")).as("mn_status"),
        max(col("o_orderstatus")).as("mx_status"),
        sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("nn_price"),
        countDistinct(col("o_totalprice")).as("nd_price"),
        min(col("o_totalprice")).cast("string").as("mn_price"),
        max(col("o_totalprice")).cast("string").as("mx_price"))
      a.selectExpr(
        """stack(3,
           'o_custkey',     n_rows, nn_custkey, nd_custkey, mn_custkey, mx_custkey,
           'o_orderstatus', n_rows, nn_status,  nd_status,  mn_status,  mx_status,
           'o_totalprice',  n_rows, nn_price,   nd_price,   mn_price,   mx_price)
           AS (column_name, n_rows, n_null, n_distinct, min_val, max_val)""")
        .orderBy("column_name")
    },
  )

  /** q_window_range: RANGE-frame trailing window — each order's
    * customer spend over the trailing 30 days (value-based frame, not
    * row-count). Order key is epoch micros so the frame bound is a
    * plain long offset in both engines.
    */
  val windowRange = GraftQuery(
    "q_window_range",
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey"""),
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2592000000000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("trailing_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
  )

  /** q_approx_percentiles: sketch-based quantiles — the 100 TB path
    * (exact percentile_cont needs a per-group sort of everything;
    * the sketch is one pass, fixed state, mergeable). Rows-only;
    * ScalaTest bounds it against the exact quantiles.
    */
  val approxPercentiles = GraftQuery(
    "q_approx_percentiles",
    None,
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          percentile_approx(col("c_acctbal"), lit(0.5), lit(1000)).as("approx_med"),
          percentile_approx(col("c_acctbal"), lit(0.9), lit(1000)).as("approx_p90"))
        .orderBy("c_mktsegment"),
  )

  /** q_stratified_sample: deterministic hash-based stratified sampling
    * — the reproducible train-subset selector: a row is in the sample
    * iff polyhash(key) mod 100 < rate, so membership is a pure function
    * of the key (stable across runs, engines, and cluster layouts; no
    * RNG state, no shuffle beyond the stats aggregate). Per-stratum
    * realized rates verify the hash spreads uniformly.
    */
  val stratifiedSample = GraftQuery(
    "q_stratified_sample",
    Some(s"""
      WITH s AS (SELECT o_orderpriority,
                   ${graft.text.Text.polySqlPublic("CAST(o_orderkey AS VARCHAR)")} % 100 AS bucket
                 FROM orders)
      SELECT o_orderpriority,
             COUNT(*) AS n_total,
             CAST(SUM(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             ROUND(CAST(SUM(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS rate
      FROM s
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, d) => {
      val bucket = pmod(polyHash(col("o_orderkey").cast("string")), lit(100))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), when(bucket < 20, 1).otherwise(0).as("in_sample"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_total"),
          sum(col("in_sample")).as("n_sampled"),
          round(sum(col("in_sample")).cast("double") / count(lit(1)), 4).as("rate"))
        .orderBy("o_orderpriority")
    },
  )

  /** q_funnel: ordered-event conversion funnel — users who viewed,
    * then clicked at-or-after their first view, then purchased
    * at-or-after that first click. Three conditional-min aggregation
    * passes chained by broadcast-friendly joins on the shrinking user
    * set (each stage's input is a strict subset of the previous) —
    * never a per-user subquery.
    */
  val funnel = GraftQuery(
    "q_funnel",
    Some("""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      v AS (SELECT user_id, MIN(ts) AS vt FROM e WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(ts) AS ct FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts >= vt GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(ts) AS pt FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts >= ct GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM v) AS n_view,
             (SELECT COUNT(*) FROM c) AS n_view_click,
             (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
             ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
               / nullif((SELECT COUNT(*) FROM v), 0), 4) AS click_conv,
             ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
               / nullif((SELECT COUNT(*) FROM c), 0), 4) AS purchase_conv"""),
    (s, d) => {
      val e = Tables.events(s, d).select(col("ts"), col("user_id"), col("event_type"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("vt"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") >= col("vt"))
        .groupBy("user_id").agg(min("ts").as("ct"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") >= col("ct"))
        .groupBy("user_id").agg(min("ts").as("pt"))
      // one declarative plan (three scalar aggregates cross-joined) —
      // no driver-side counts; zero strata give NULL conversions like
      // the oracle's nullif.
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
        .select(col("n_view"), col("n_view_click"), col("n_view_click_purchase"),
          round(safeDiv(col("n_view_click").cast("double"), col("n_view")), 4)
            .as("click_conv"),
          round(safeDiv(col("n_view_click_purchase").cast("double"), col("n_view_click")), 4)
            .as("purchase_conv"))
    },
  )

  /** q_ntile_deciles: equal-frequency binning (NTILE) of order values —
    * the distribution-profile pass. A naive `ntile().over(Window
    * .orderBy(...))` funnels the WHOLE table through one partition (a
    * global window has no partition key) — wrong at any scale. The
    * distributed shape: range-repartition on the total order, rank
    * locally per partition, then add per-partition offsets (the only
    * driver-side state — one count per partition, bounded by the
    * partition count, never the data). NTILE's remainder rule is then
    * a pure expression over the global rank.
    */
  val ntileDeciles = GraftQuery(
    "q_ntile_deciles",
    Some("""
      WITH r AS (SELECT o_totalprice,
                   NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
                 FROM orders)
      SELECT decile, COUNT(*) AS n,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM r
      GROUP BY decile
      ORDER BY decile"""),
    (s, d) => {
      // partition count follows the session's shuffle parallelism (it
      // would be thousands on a real cluster — nothing below depends
      // on the number)
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      // one range exchange = the global sort, materialized once for
      // the two passes (counts + final agg), released on return
      val sorted = Tables.orders(s, d).select("o_totalprice", "o_orderkey")
        .repartitionByRange(nParts, col("o_totalprice"), col("o_orderkey"))
        .sortWithinPartitions("o_totalprice", "o_orderkey")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rankSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("lrank",
          org.apache.spark.sql.types.LongType)))
      val ranked = sorted.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { r => i += 1; org.apache.spark.sql.Row(r.getDouble(0), pid, i) }
      }(org.apache.spark.sql.Encoders.row(rankSchema))
      // per-partition counts → rank offsets: ≤ nParts rows on the
      // driver, joined back as a broadcast (pid, _off) frame
      val counts = ranked.groupBy("pid").agg(max("lrank").as("c")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toSeq
      val (withOff, total) = graft.PartitionOffsets.joinOffsets(ranked, counts)
      // NTILE(10) remainder rule: first (total mod 10) buckets get one
      // extra row
      val m = total % 10
      val base = total / 10
      val grank = (col("_off") + col("lrank")).as("grank")
      // floor() then cast: Spark's `/` on longs is double division
      val decile = when(lit(base) === 0, col("grank")) // tiny inputs
        .when(col("grank") <= m * (base + 1),
          floor((col("grank") - 1) / (base + 1)).cast("long") + 1)
        .otherwise(lit(m) +
          floor((col("grank") - 1 - m * (base + 1)) / base).cast("long") + 1)
      val out = withOff.select(col("o_totalprice"), grank)
        .select(col("o_totalprice"), decile.cast("long").as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).cast("double").as("lo"),
          max(col("o_totalprice")).cast("double").as("hi"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("decile")
      graft.Caching.releaseAfter(out, sorted)
    },
  )

  /** q_grouping_sets: explicit GROUPING SETS (neither rollup nor cube)
    * with grouping_id disambiguating the aggregation level — one
    * shuffle computes all three levels (Spark expands sets map-side).
    */
  val groupingSets = GraftQuery(
    "q_grouping_sets",
    Some("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
             COALESCE(o_orderstatus, 'ALL') AS status,
             GROUPING(o_orderpriority, o_orderstatus) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
      ORDER BY gid, priority, status"""),
    (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderstatus")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("gid"), col("n"), col("total"))
        .orderBy("gid", "priority", "status"),
  )

  /** q_incremental_rollup: the incremental-ETL contract — per-day
    * PARTIAL aggregates (count + decimal sum, both mergeable) unioned
    * across days and re-aggregated must equal the direct rollup over
    * all data. This is how a 100 TB daily pipeline avoids full
    * recomputes: the oracle computes the direct rollup; the engine
    * computes partials per day and merges them.
    */
  val incrementalRollup = GraftQuery(
    "q_incremental_rollup",
    Some("""
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, d) => {
      val o = Tables.orders(s, d)
      // two disjoint "arrival days" (stand-ins for date partitions)
      val day1 = o.filter(col("o_orderkey") % 2 === 0)
      val day2 = o.filter(col("o_orderkey") % 2 =!= 0)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("pn"), sum(dec2(col("o_totalprice"))).as("psum"))
      partial(day1).unionByName(partial(day2))
        .groupBy("o_orderpriority")
        .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("total"))
        .orderBy("o_orderpriority")
    },
  )

  /** q_skew_diagnose: heavy-hitter key report — the check you run
    * BEFORE deciding to salt a join: per-key share of the fact table
    * and a flag for keys above a uniform-share multiple. One aggregate
    * + a broadcast scalar join.
    */
  val skewDiagnose = GraftQuery(
    "q_skew_diagnose",
    Some("""
      WITH k AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
      t AS (SELECT COUNT(*) AS total, COUNT(DISTINCT o_custkey) AS nkeys FROM orders)
      SELECT o_custkey, n,
             ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
             n > 5.0 * total / nkeys AS is_heavy
      FROM k CROSS JOIN t
      ORDER BY n DESC, o_custkey
      LIMIT 20"""),
    (s, d) => {
      val o = Tables.orders(s, d)
      val k = o.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val t = o.agg(count(lit(1)).as("total"),
        countDistinct(col("o_custkey")).as("nkeys"))
      k.crossJoin(broadcast(t))
        .select(col("o_custkey"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          (col("n") > lit(5.0) * col("total") / col("nkeys")).as("is_heavy"))
        .orderBy(col("n").desc, col("o_custkey"))
        .limit(20)
    },
  )

  /** q_bucketed_join: SHUFFLE-FREE fact⋈fact join via bucketed tables —
    * both sides written bucketed (and sorted) by the join key into the
    * session warehouse, so the join is a zero-exchange sort-merge: the
    * bucket layout IS the exchange, paid once at write time and
    * amortized over every later join. This is the co-location story for
    * repeated big joins at 100 TB (where broadcast can't apply). The
    * spec asserts the plan has no Exchange between the scans and the
    * join; the oracle checks the join result itself.
    */
  val bucketedJoin = GraftQuery(
    "q_bucketed_join",
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, d) => bucketedOrdersJoin(s, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment"),
  )

  /** The bucketed-tables join frame (shared with the plan-shape spec):
    * both sides bucketed+sorted by the key, re-written only if the
    * session hasn't materialized them yet.
    */
  def bucketedOrdersJoin(s: SparkSession, d: String): DataFrame = synchronized {
    val nb = 8
    // table identity includes the data dir: one session serving several
    // sf dirs (harness + specs) must not reuse another dir's buckets;
    // each table checks its own existence (no partial-write trap). The
    // tag is a hex MD5 of the canonical path — collision-resistant,
    // unlike String.hashCode's 32 bits, where two dirs colliding would
    // silently serve each other's buckets. `synchronized` guards the
    // exists-then-create window against concurrent specs in one JVM.
    val canonical = new java.io.File(d).getCanonicalPath
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val ordersT = s"orders_bkt_$tag"
    val customerT = s"customer_bkt_$tag"
    if (!s.catalog.tableExists(ordersT))
      Tables.orders(s, d).select("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(nb, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersT)
    if (!s.catalog.tableExists(customerT))
      Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        .write.mode("overwrite")
        .bucketBy(nb, "c_custkey").sortBy("c_custkey")
        .saveAsTable(customerT)
    // merge hint: without it AQE broadcasts the small side at test SF
    // and the co-location never shows; at 100 TB SMJ is the real plan.
    s.table(ordersT).hint("merge")
      .join(s.table(customerT), col("o_custkey") === col("c_custkey"))
  }

  /** q_set_ops: INTERSECT / EXCEPT over derived key sets — customers
    * with urgent orders vs customers with low-priority orders. Spark
    * plans both as aggregated joins (left-semi/anti after distinct), so
    * they inherit the join machinery's scale properties.
    */
  val setOps = GraftQuery(
    "q_set_ops",
    Some("""
      WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      l AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
      SELECT 'both' AS set_kind, COUNT(*) AS n FROM (SELECT * FROM u INTERSECT SELECT * FROM l)
      UNION ALL
      SELECT 'urgent_only', COUNT(*) FROM (SELECT * FROM u EXCEPT SELECT * FROM l)
      UNION ALL
      SELECT 'low_only', COUNT(*) FROM (SELECT * FROM l EXCEPT SELECT * FROM u)
      ORDER BY set_kind"""),
    (s, d) => {
      val o = Tables.orders(s, d)
      val u = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey").distinct()
      val l = o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey").distinct()
      def tagged(df: DataFrame, kind: String) =
        df.agg(count(lit(1)).as("n")).select(lit(kind).as("set_kind"), col("n"))
      tagged(u.intersect(l), "both")
        .unionByName(tagged(u.except(l), "urgent_only"))
        .unionByName(tagged(l.except(u), "low_only"))
        .orderBy("set_kind")
    },
  )

  /** q_percent_of_total: share-of-total per group — aggregate once,
    * then a window over the AGGREGATED frame (one row per group, so the
    * global window is cheap by construction — the anti-pattern is a
    * global window over raw rows, not over a group-count-sized frame).
    */
  val percentOfTotal = GraftQuery(
    "q_percent_of_total",
    Some("""
      WITH g AS (SELECT o_orderpriority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
                 FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, rev,
             ROUND(rev / SUM(rev) OVER (), 6) AS share
      FROM g
      ORDER BY o_orderpriority"""),
    (s, d) => {
      val g = Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("rev"))
      // window over the aggregated (group-cardinality) frame only
      val w = Window.partitionBy()
      g.select(col("o_orderpriority"), col("rev"),
          round(col("rev") / sum(col("rev")).over(w), 6).as("share"))
        .orderBy("o_orderpriority")
    },
  )

  /** Z-order bit width per dimension (16+16 → a 32-bit Morton code)
    * and the bucket prefix (top 8 z-bits → 256 layout buckets).
    */
  private val ZBits = 16
  private val ZBucketShift = 2 * ZBits - 8

  /** q_zorder_layout: multi-dimensional data-layout clustering — the
    * Morton (z-order) curve over (l_partkey, l_suppkey), the layout
    * decision that makes PHYSICAL file skipping work when queries
    * filter on either of two dimensions: sorting by one key makes
    * min/max pruning perfect on it and useless on the other; z-order
    * interleaves their bits so every z-contiguous bucket is a small
    * rectangle in (partkey, suppkey) space and both dims prune.
    *
    * All scale-honest pieces: the per-dim 16-bit mapping is the exact
    * integer scaling floor((x−min)·65535/span) (mins/maxes are one
    * tiny aggregate, broadcast); the 32-bit interleave is an UNROLLED
    * constant-shift bit sum (codegen-friendly — no variable-shift
    * loop); bucket = top-8 z-bits; and the output is the per-bucket
    * evidence a file-skipping engine consumes: row count + min/max of
    * BOTH dims (the footer stats). ZorderSpec quantifies the payoff:
    * mean per-bucket span is a few % of the global span on each dim
    * simultaneously — single-key layouts give ~100% on the other dim.
    * At 100 TB this is `write.partitionBy(bucket)` + parquet footer
    * pruning; the decision table itself is one shuffle.
    */
  val zorderLayout = GraftQuery(
    "q_zorder_layout",
    Some(s"""
      WITH b AS (SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
                        MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
                 FROM lineitem),
      sc AS (SELECT l_partkey, l_suppkey,
               CAST(floor(CAST((l_partkey - pmin) * 65535 AS DOUBLE)
                 / nullif(pmax - pmin, 0)) AS BIGINT) AS sx,
               CAST(floor(CAST((l_suppkey - smin) * 65535 AS DOUBLE)
                 / nullif(smax - smin, 0)) AS BIGINT) AS sy
             FROM lineitem CROSS JOIN b),
      z AS (SELECT l_partkey, l_suppkey,
              ${(0 until ZBits).map(i =>
                s"((sx >> $i) & 1) * ${1L << (2 * i + 1)} + ((sy >> $i) & 1) * ${1L << (2 * i)}")
                .mkString(" + ")} AS zval
            FROM sc)
      SELECT zval >> $ZBucketShift AS bucket,
             COUNT(*) AS n,
             MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
      FROM z
      GROUP BY 1
      ORDER BY bucket"""),
    (s, d) => zorderStats(
      Tables(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey").orderBy("bucket"),
  )

  /** The z-order bucket stats over any frame with two long dims —
    * per-bucket row count and both dims' min/max (the footer stats a
    * skipping scan consumes).
    */
  private[graft] def zorderStats(df: DataFrame, xc: String, yc: String): DataFrame = {
    val b = broadcast(df.agg(
      min(col(xc)).as("pmin"), max(col(xc)).as("pmax"),
      min(col(yc)).as("smin"), max(col(yc)).as("smax")))
    def scale(c: String, lo: String, hi: String) =
      floor(((col(c) - col(lo)) * 65535).cast("double") /
        nullif((col(hi) - col(lo)).cast("double"), lit(0.0))).cast("long")
    val z = (0 until ZBits).map { i =>
      shiftleft(shiftright(col("sx"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(col("sy"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    df.crossJoin(b)
      .select(col(xc), col(yc),
        scale(xc, "pmin", "pmax").as("sx"), scale(yc, "smin", "smax").as("sy"))
      .select(col(xc), col(yc), z.as("zval"))
      .groupBy(shiftright(col("zval"), ZBucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xc)).as("pmin"), max(col(xc)).as("pmax"),
        min(col(yc)).as("smin"), max(col(yc)).as("smax"))
  }

  def all: Seq[GraftQuery] =
    Seq(pivot, cube2, correlated, saltedJoinQ, ansiSql, approxDistinct, profile,
      windowRange, approxPercentiles, stratifiedSample, funnel, ntileDeciles,
      groupingSets, incrementalRollup, skewDiagnose, bucketedJoin, setOps,
      percentOfTotal, zorderLayout)
}
