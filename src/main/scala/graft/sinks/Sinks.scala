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
    */
  def writeKafkaJsonl(df: DataFrame, keyCol: String, outDir: String,
                      numPartitions: Int = 8, mode: String = "append"): Unit = {
    df.withColumn("_kpart", pmod(hash(col(keyCol)), lit(numPartitions)))
      .withColumn("value", to_json(struct(df.columns.toIndexedSeq.map(col): _*)))
      .select("_kpart", "value")
      .write.mode(mode).partitionBy("_kpart").text(outDir)
  }
}
