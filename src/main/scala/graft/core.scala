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

object GraftSession {

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
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
