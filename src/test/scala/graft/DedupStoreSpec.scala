package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupStore}

/** DedupStore: the stored near-dup index's ingest must be EXACTLY the
  * full-recompute d_incremental output (the df table is a sufficient
  * statistic for the adaptive cap), and must survive a parquet
  * round-trip bit-identically.
  */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def split(d: String) = {
    val docs = graft.sources.Tables.documents(spark, d)
    val thr = docs.agg(floor(lit(0.9) * (max("doc_id") + 1)).cast("long"))
      .head().getLong(0)
    (docs.filter(col("doc_id") < thr), docs.filter(col("doc_id") >= thr))
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_new"), col("doc_other"), col("cross_batch"), col("jaccard"))
    .orderBy("doc_new", "doc_other").collect().toSeq

  test("ingest against the stored history ≡ d_incremental full recompute") {
    val (hist, batch) = split(sfDir)
    val idx = DedupStore.build(hist)
    val got = sortedRows(DedupStore.ingest(idx, batch))
    val want = sortedRows(Dedup.incrementalDedup.run(spark, sfDir))
    assert(got === want)
  }

  test("save/load round-trips: a loaded index ingests identically") {
    val (hist, batch) = split(sfDir)
    val dir = Files.createTempDirectory("graft_dedup_store").toString
    DedupStore.save(DedupStore.build(hist), dir)
    val loaded = DedupStore.load(spark, dir)
    assert(loaded.nDocs === hist.count())
    val got = sortedRows(DedupStore.ingest(loaded, batch))
    val want = sortedRows(Dedup.incrementalDedup.run(spark, sfDir))
    assert(got === want)
  }

  test("append folds a batch: appended index equals an index built on the union") {
    val (hist, batch) = split(sfDir)
    val appended = DedupStore.append(DedupStore.build(hist), batch)
    val full = DedupStore.build(graft.sources.Tables.documents(spark, sfDir))
    assert(appended.nDocs === full.nDocs)
    assert(appended.entries.count() === full.entries.count())
    // df tables agree row-for-row
    val diff = appended.dfFreq.exceptAll(full.dfFreq)
      .unionByName(full.dfFreq.exceptAll(appended.dfFreq))
    assert(diff.isEmpty)
  }
}
