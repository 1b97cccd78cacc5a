package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-backed sinks mirroring the reference's two appenders
  * (ElasticSearchAppender.py, KafkaAppender.py). Zero-egress container,
  * so the wire protocol is materialized to files as a semantically
  * equivalent request body. One deliberate shape difference: the
  * reference's bulk action line is `{"index":{"_type":"doc"}}` with the
  * daily index passed as a parameter of the bulk call
  * (ElasticSearchAppender.internal_write_data_to_file); we embed
  * `_index` in each action line instead — same routing, standard
  * self-describing NDJSON.
  */
object Sinks {

  /** Elasticsearch bulk sink (ElasticSearchAppender.py:86-117): every
    * record becomes an action line `{"index":{"_index":...}}` followed
    * by the document line; the index name is date-rotated
    * `prefix-YYYY-MM-DD`. Output is partitioned by `es_index` — one
    * directory per daily index, exactly the bulk-request grouping the
    * reference builds per flush.
    *
    * Input contract: `tsCol` (timestamp) + `docCol` (pre-rendered JSON
    * document string).
    */
  def writeEsBulk(df: DataFrame, tsCol: String, docCol: String,
                  indexPrefix: String, outDir: String,
                  mode: String = "append"): Unit = {
    val idx = concat(lit(indexPrefix + "-"), date_format(col(tsCol), "yyyy-MM-dd"))
    df.select(
        idx.as("es_index"),
        concat(lit("{\"index\":{\"_index\":\""), idx, lit("\",\"_type\":\"doc\"}}\n"),
          col(docCol)).as("value"))
      .write.mode(mode).partitionBy("es_index").text(outDir)
  }

  /** Kafka-shaped JSONL sink (KafkaAppender.py): records rendered as
    * the JSON bytes a producer would send, keyed-partitioned by
    * `keyCol` so each output dir is one topic-partition's batch.
    * (Keying is an EXTENSION: the reference's producer sends value-only
    * records — see [[kafkaProducerBatches]] for its exact contract.)
    */
  def writeKafkaJsonl(df: DataFrame, keyCol: String, outDir: String,
                      numPartitions: Int = 8, mode: String = "append"): Unit = {
    df.withColumn("_kpart", pmod(hash(col(keyCol)), lit(numPartitions)))
      .withColumn("value", to_json(struct(df.columns.toIndexedSeq.map(col): _*)))
      .select("_kpart", "value")
      .write.mode(mode).partitionBy("_kpart").text(outDir)
  }

  /** The exact frame Spark's Kafka sink consumes — so at deploy the
    * only change is `.write.format("kafka").option("kafka.bootstrap
    * .servers", …)` on this frame (no Kafka jars ship in this image;
    * the connector's input contract is public and fixed: `value`
    * required, `key`/`topic`/`partition` optional columns).
    *
    * Mirrors the reference producer's delivery shape
    * (KafkaAppender.py:20-38): records are UNKEYED (`produce(topic,
    * value=item, …)`), so `key` is a null binary and there is NO
    * `partition` column — unkeyed records take the producer's own
    * round-robin partitioner, exactly like the reference. `value` is
    * the rendered JSON bytes.
    */
  def kafkaWireFrame(df: DataFrame, valueCol: String,
                     topic: String = "jmx_data_ingestion_pipeline"): DataFrame =
    df.select(
      lit(null).cast("binary").as("key"),
      col(valueCol).cast("binary").as("value"),
      lit(topic).as("topic"))

  /** Kafka wire frame for the keyed-partitioned JSONL extension: the
    * same (key, value, topic, partition) columns the connector
    * consumes, with `partition` pinned to [[writeKafkaJsonl]]'s
    * explicit hash placement (Kafka's murmur2 key-partitioner differs
    * from Spark's `hash`, so carrying the partition column — not the
    * key hash — is what keeps file output and broker placement
    * identical) and `value` the same `to_json(struct(*))` bytes the
    * JSONL sink writes per line.
    */
  def kafkaJsonlWireFrame(df: DataFrame, keyCol: String, topic: String,
                          numPartitions: Int = 8): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      pmod(hash(col(keyCol)), lit(numPartitions)).cast("int").as("partition"))

  /** Hard ceiling for one poll cycle's frame: the global msg_index
    * window funnels all rows through one task, so a corpus-sized input
    * must fail loudly rather than silently single-thread.
    */
  val MaxPollCycleRows: Long = 1000000L

  /** The reference producer's exact delivery contract
    * (KafkaAppender.py:37-53), materialized: messages are UNKEYED
    * (`produce(topic, value=item, timestamp=current_timestamp)` — no
    * key, so partitioning is the producer's round-robin, never key
    * hashing) and share ONE poll-cycle timestamp; the producer
    * flushes after the first message and then after every 500th
    * (`index % 500 == 0`), plus a final flush — so the delivery
    * batches are [0], (0,500], (500,1000], …
    *
    * One poll cycle is a bounded scrape sweep (thousands of rows, not
    * the corpus), so the sequential enumeration the reference's
    * producer loop implies is a window over this cycle's frame only —
    * callers hand in one poll batch at a time, exactly like the
    * reference hands `data_list` per cycle.
    *
    * Returns (topic, msg_index, batch_id, value, timestamp).
    */
  def kafkaProducerBatches(df: DataFrame, orderCols: Seq[String], valueCol: String,
                           topic: String = "jmx_data_ingestion_pipeline",
                           pollTsMillis: Long = 0L,
                           flushEvery: Int = 500): DataFrame = {
    require(!df.isStreaming,
      "kafkaProducerBatches takes one bounded poll-cycle frame (use inside foreachBatch for streams)")
    // guard cost is bounded by the ceiling itself: count over a
    // limit(ceiling+1) scan stops at the first excess row instead of
    // fully evaluating an over-sized input just to reject it
    val over = df.limit(MaxPollCycleRows.toInt + 1).count() > MaxPollCycleRows
    require(!over,
      s"kafkaProducerBatches input exceeds $MaxPollCycleRows rows — one poll cycle is a " +
        "bounded scrape sweep; the global msg_index window would single-thread this input")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderCols.map(col): _*)
    val idx = (row_number().over(w) - 1).cast("long")
    df.select(
        lit(topic).as("topic"),
        idx.as("msg_index"),
        col(valueCol).as("value"))
      .withColumn("batch_id",
        when(col("msg_index") === 0, 0L)
          .otherwise(floor((col("msg_index") - 1) / flushEvery) + 1))
      .withColumn("timestamp", lit(pollTsMillis))
      .select("topic", "msg_index", "batch_id", "value", "timestamp")
  }
}
