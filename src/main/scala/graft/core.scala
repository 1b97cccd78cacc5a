package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed to the driver harness.
  *
  * @param name   stable id (SURVEY.md §2)
  * @param oracle equivalent ANSI SQL for the DuckDB oracle; None → the
  *               driver records a weaker rows-only check
  * @param run    (session, sf-dir) → result DataFrame
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
)

/** Lifecycle for operator-internal caches. Operators that persist an
  * index frame (shingle inverted index, LSH bands, SimHash signatures,
  * block tiles, IVF corpus) must not leak those caches past their own
  * invocation: the harness runs every query (twice, in Bench) in one
  * session, and each leaked MEMORY_AND_DISK frame lives until session
  * end.
  */
object Caching {

  /** Eagerly materialize `result` (localCheckpoint: computed once,
    * stored as blocks, lineage truncated) and then release the
    * internal `cached` frames that fed it. The returned frame is
    * self-contained — callers can compose/act on it without
    * recomputing the index. Local checkpoints are not
    * executor-loss-tolerant; a cluster deploy that needs that writes
    * the index artifact to storage instead (same lifecycle shape).
    */
  def releaseAfter(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }
}

object GraftSession {

  private lazy val warehouseDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warehouse")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  /** Tuned local session. Mirrors what a cluster deploy would set:
    * AQE (coalesce + skew-join) on, shuffle partitions sized to the
    * parallelism, broadcast threshold generous for dim tables.
    */
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$threads]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // InferFiltersFromGenerate pushes `size(g)>0 AND isnotnull(g)`
      // below explode(g); predicate pushdown then substitutes g's
      // whole defining expression into the filter — including INSIDE
      // lambda bodies, where interpreted eval has no subexpression
      // reuse. For explode(transform(...element_at(split(text),i)...))
      // that re-runs the split per array ELEMENT: measured 23× slower
      // on the shingle pipelines. The inference only ever saves work
      // when generators are often empty; our generators never are.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table writes (q_bucketed_join) land in the warehouse;
      // keep it out of the repo working tree. One dir per JVM (lazy):
      // getOrCreate ignores configs on an existing session anyway, so
      // per-call temp dirs would only leak.
      .config("spark.sql.warehouse.dir", warehouseDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
