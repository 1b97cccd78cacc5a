package graft

/** Stream/batch parity: the streaming pipelines materialize exactly
  * what their batch counterparts compute on the same input.
  */
class StreamingParitySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("st_pipeline == m2 batch rollup") {
    val streamed = graft.streaming.Streaming.pipeline.run(spark, sfDir)
    val batch = graft.metrics.Metrics.windowRollup.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_histogram_quantile == m26 batch histogram quantile") {
    val streamed = graft.streaming.Streaming.streamHistogramQuantile.run(spark, sfDir)
    val batch = graft.metrics.Metrics.histogramQuantile.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_cusum == m25 batch CUSUM fold") {
    val streamed = graft.streaming.Streaming.streamCusum.run(spark, sfDir)
    val batch = graft.metrics.Metrics.cusumDrift.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_ewma == m14 batch EWMA fold") {
    val streamed = graft.streaming.Streaming.streamEwma.run(spark, sfDir)
      .select("user_id", "event_type", "ewma", "n")
    val batch = graft.metrics.Metrics.ewma.run(spark, sfDir)
      .select("user_id", "event_type", "ewma", "n")
    assert(rows(streamed) === rows(batch))
  }

  test("st_mixture == t_mixture batch data-mixture report") {
    val streamed = graft.streaming.Streaming.streamMixture.run(spark, sfDir)
    val batch = graft.text.Text.mixture.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_dedup_ingest == d_bloom_prefilter batch ingestion dedup") {
    val streamed = graft.streaming.Streaming.streamDedupIngest.run(spark, sfDir)
    val batch = graft.dedup.Dedup.bloomPrefilter.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_quality_probe == t_quality_probe batch trained scorer") {
    val streamed = graft.streaming.Streaming.streamQualityProbe.run(spark, sfDir)
    val batch = graft.text.Text.qualityProbe.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_filtered_ann == s_filtered_ann batch filtered search") {
    val streamed = graft.streaming.Streaming.streamFilteredAnn.run(spark, sfDir)
    val batch = graft.sim.Sim.filteredAnn.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_ngram_lm == t_ngram_lm batch LM-perplexity cut") {
    val streamed = graft.streaming.Streaming.streamNgramLm.run(spark, sfDir)
    val batch = graft.text.Text.ngramLm.run(spark, sfDir)
    assert(rows(streamed) === rows(batch))
  }

  test("st_stateful_rate == m3 batch lag-rate (nulls dropped)") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.Streaming.statefulRate.run(spark, sfDir)
      .select("user_id", "event_type", "event_id", "rate")
    val batch = graft.metrics.Metrics.rate.run(spark, sfDir)
      .filter(col("rate").isNotNull)
      .select("user_id", "event_type", "event_id", "rate")
      .orderBy("user_id", "event_type", "event_id")
    assert(rows(streamed) === rows(batch))
  }
}
