package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Environment guard for the events loader. The `events.parquet` `ts`
  * column is nanosecond-precision, and how Spark surfaces it changed
  * across runtime versions (pre-4.1: LongType under `nanosAsLong`;
  * 4.1+: native TIMESTAMP_NTZ). A runtime upgrade once silently broke
  * every events-based operator; this spec pins the loader's contract
  * so the next reader change fails ONE named test instead.
  */
class EventsLoaderSpec extends SparkSpec {

  test("Tables.events lands ts as µs TimestampType regardless of reader version") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }

  test("events ts values match the committed testdata's known epoch window") {
    // The driver generates events in 2024; a unit mix-up (ns read as µs
    // or s) lands decades away, so a coarse year-range check catches
    // any wrong-scale truncation without pinning exact row order.
    val mm = graft.sources.Tables.events(spark, sfDir)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (mm.getInt(0), mm.getInt(1))
    assert(lo >= 2000 && hi <= 2100, s"ts out of plausible range: years [$lo, $hi]")
  }

  test("batch and stream events loaders agree row-for-row on ts") {
    // streamEvents shares normalizeEventsTs with the batch loader; this
    // asserts the shared contract end-to-end through the file-stream
    // reader (which has its own schema path).
    val batch = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts")
    val streamed = graft.streaming.Streaming.eventsForTest(spark, sfDir)
      .select("event_id", "ts")
    assert(streamed.schema("ts").dataType === TimestampType)
    assert(batch.exceptAll(streamed).isEmpty && streamed.exceptAll(batch).isEmpty)
  }
}
