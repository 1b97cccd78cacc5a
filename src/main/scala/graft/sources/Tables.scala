package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * All scans go through here so filter pushdown / column pruning are a
  * property of every query (plain parquet scans — Catalyst pushes
  * predicates and prunes `ReadSchema` automatically).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** Normalize the events `ts` column to µs `TimestampType` across
    * parquet-reader generations. The source column is ns-precision:
    *  - pre-4.1 readers reject it unless `nanosAsLong` is set, in which
    *    case it arrives as `LongType` ns → truncate to µs;
    *  - Spark 4.1+ reads ns parquet natively as `TIMESTAMP_NTZ` (the
    *    legacy conf is a no-op) → cast to `TimestampType`, which under
    *    the UTC-pinned session is the same instant truncation DuckDB's
    *    `CAST(ts AS TIMESTAMP)` produces;
    *  - round-tripped data (e.g. the stress generator's Spark-written
    *    µs parquet) already lands as `TimestampType` → pass through.
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** `events.ts` is nanosecond-precision parquet; see
    * [[normalizeEventsTs]] for the per-reader-version handling. The
    * legacy conf is set unconditionally: it is what makes the read
    * possible at all on pre-4.1 readers, and a no-op on 4.1+.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(apply(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
