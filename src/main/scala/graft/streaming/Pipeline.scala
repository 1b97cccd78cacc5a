package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.sinks.Sinks

/** The reference's main loop (main.py: poll every scraper, append each
  * record batch to every ENABLED sink) as a configurable continuous
  * pipeline: one micro-batched stream fans out per batch to whichever
  * sinks the config enables. Adding a sink is config, not code —
  * exactly the appender-registry shape of the reference.
  */
object Pipeline {

  /** Which sinks are on, and where they write (None = disabled) —
    * mirrors the reference's properties toggles
    * (kafka.enabled / elastic.enabled).
    */
  final case class Config(
      indexPrefix: String = "kafka-jmx-logs",
      esDir: Option[String] = None,
      kafkaDir: Option[String] = None,
      kafkaKeyCol: String = "user_id",
      kafkaPartitions: Int = 8,
  )

  /** Start the fan-out over a streaming frame. `tsCol` drives the
    * date-rotated ES index; the doc shipped to ES is the whole row as
    * JSON (the reference ships the flattened record verbatim).
    *
    * Exactly-once to the file sinks: each micro-batch OVERWRITES its
    * own `batch=<id>` partition directory, so a batch replayed after a
    * failure rewrites the same files instead of appending duplicates
    * (batch id is stable across retries — the checkpoint guarantees
    * it). Consumers read with `basePath` = the sink root.
    */
  def start(stream: DataFrame, tsCol: String, cfg: Config, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        cfg.esDir.foreach { dir =>
          val docs = batch.withColumn("doc",
            to_json(struct(batch.columns.toIndexedSeq.map(col): _*)))
          Sinks.writeEsBulk(docs, tsCol, "doc", cfg.indexPrefix,
            s"$dir/batch=$id", mode = "overwrite")
        }
        cfg.kafkaDir.foreach { dir =>
          Sinks.writeKafkaJsonl(batch, cfg.kafkaKeyCol, s"$dir/batch=$id",
            cfg.kafkaPartitions, mode = "overwrite")
        }
      }
      .start()
}
