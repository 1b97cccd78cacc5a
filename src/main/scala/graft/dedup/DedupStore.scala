package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage lifecycle for the near-dup index artifacts — the
  * counterpart of sim.IvfStore for the dedup family, and the piece
  * that makes d_incremental's "stored historical index" contract
  * literal: a production pipeline builds the index over today's
  * corpus ONCE, saves it, and every nightly increment dedups against
  * storage without touching historical documents again.
  *
  * Artifact layout under `dir`:
  *   - `entries/` — the shingle inverted index (shingle, doc_id, n)
  *   - `df/`      — the shingle→document-frequency table
  *   - `meta/`    — (n_docs) one row
  *
  * The df table is the SUFFICIENT STATISTIC for the duplication-
  * adaptive cap: an ingest merges stored df with the batch's df
  * (vocabulary-sized outer join — no corpus pass) and recovers the
  * exact cap a full recompute over history ∪ batch would derive, so
  * `ingest` is provably ≡ d_incremental's full-recompute output
  * restricted to pairs touching the batch (DedupStoreSpec) while its
  * per-batch cost is ∝ batch size + vocabulary size, independent of
  * history length.
  */
object DedupStore {

  /** In-memory handle: corpus inverted index + df table + doc count +
    * max indexed doc id. `entries` carries each doc's full shingle-set
    * size n so jaccard needs no side lookup (same contract as
    * ngramJaccardPairs). `maxDocId` makes the history/batch id
    * disjointness that ingest's cross_batch labels and pair-dedup
    * filter depend on CHECKABLE without scanning history.
    */
  final case class DedupIndex(entries: DataFrame, dfFreq: DataFrame,
                              nDocs: Long, maxDocId: Long)

  def build(docs: DataFrame): DedupIndex = {
    val entries = Dedup.shingleSets(docs)
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
    val dfFreq = entries.groupBy("shingle").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)), max("doc_id")).head()
    DedupIndex(entries, dfFreq, stats.getLong(0),
      if (stats.isNullAt(1)) Long.MinValue else stats.getLong(1))
  }

  def save(idx: DedupIndex, dir: String): Unit = {
    val s = idx.entries.sparkSession
    import s.implicits._
    idx.entries.write.mode("overwrite").parquet(s"$dir/entries")
    idx.dfFreq.write.mode("overwrite").parquet(s"$dir/df")
    Seq((idx.nDocs, idx.maxDocId)).toDF("n_docs", "max_doc_id")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(s: SparkSession, dir: String): DedupIndex = {
    val meta = s.read.parquet(s"$dir/meta").head()
    DedupIndex(
      s.read.parquet(s"$dir/entries"),
      s.read.parquet(s"$dir/df"),
      meta.getLong(0), meta.getLong(1))
  }

  /** Dedup a new batch against the stored history WITHOUT recomputing
    * old×old: returns (doc_new, doc_other, cross_batch, jaccard) for
    * every near-dup pair touching the batch — d_incremental's exact
    * output contract, derived from the stored artifacts.
    *
    * The combined df table (stored ⊕ batch, outer-summed) restores
    * the full-recompute adaptive cap bit-exactly; the under-cap
    * filter is additionally restricted to shingles the batch touches
    * (a pair's common shingles all live in the batch doc, so nothing
    * a batch pair counts is lost). History and batch doc_id spaces
    * must be disjoint — that is the ingest boundary's contract, same
    * as the reference pipeline's monotone crawl ids.
    */
  def ingest(idx: DedupIndex, batch: DataFrame,
             threshold: Double = 0.5): DataFrame = {
    val bStats = batch.agg(count(lit(1)), min("doc_id")).head()
    val bCount = bStats.getLong(0)
    // Fail loudly on overlapping id spaces: an overlap would silently
    // mislabel cross_batch and duplicate/drop pairs (the `doc_other >
    // doc_new` in-batch filter assumes every history id < batch id).
    if (bCount > 0) {
      val bMin = bStats.getLong(1)
      require(bMin > idx.maxDocId,
        s"DedupStore.ingest: batch min doc_id $bMin overlaps stored history " +
          s"(max doc_id ${idx.maxDocId}); ingest batches must use fresh, " +
          "monotonically increasing doc ids")
    }
    // One shingle pass for the whole ingest: bEntries feeds bDf, newE,
    // and the in-batch exE branch.
    val bEntries = graft.Caching.releaseAfter(
      Dedup.shingleSets(batch)
        .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle")))
    val bDf = graft.Caching.releaseAfter(
      bEntries.groupBy("shingle").agg(count(lit(1)).as("bdf")))
    val dfFull = graft.Caching.releaseAfter(
      idx.dfFreq.join(bDf, Seq("shingle"), "full")
        .select(col("shingle"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("bdf"), lit(0L))).as("df"),
          col("bdf")))
    val cap = Dedup.adaptiveDfCapFromDf(dfFull, idx.nDocs + bCount)
    val shf = dfFull
      .filter(col("df").between(2, cap) && col("bdf").isNotNull)
      .select("shingle")
    val newE = bEntries.join(shf, Seq("shingle"))
      .select(col("shingle"), col("doc_id").as("doc_new"), col("n").as("na"))
    val exE = idx.entries.join(shf, Seq("shingle"))
      .select(col("shingle"), col("doc_id").as("doc_other"),
        col("n").as("nb"), lit(true).as("cross_batch"))
      .unionByName(bEntries.join(shf, Seq("shingle"))
        .select(col("shingle"), col("doc_id").as("doc_other"),
          col("n").as("nb"), lit(false).as("cross_batch")))
    newE.join(exE, Seq("shingle"))
      .filter(col("cross_batch") || col("doc_other") > col("doc_new"))
      .groupBy("doc_new", "na", "doc_other", "nb", "cross_batch")
      .agg(count(lit(1)).as("n_common"))
      .select(col("doc_new"), col("doc_other"), col("cross_batch"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Fold an ingested batch into the index (in-memory plan union —
    * the entries/df plans deepen per batch exactly like IvfStore.add;
    * `save` + `load` is the periodic compaction that collapses them
    * back to parquet scans).
    */
  /** Stored form of the d_bloom_prefilter / st_dedup_ingest window
    * index: the distinct window-hash set plus its pre-folded bloom
    * words. Shipping the 2^14-word bloom as an artifact means a
    * stream-ingest job boots its map-side prefilter WITHOUT scanning
    * the hash index — only confirmed positives ever touch `hashes`.
    */
  final case class WindowIndex(hashes: DataFrame, bloom: Array[Long])

  /** Build + persist the window index for `docs` under `dir`
    * (`windows/` = distinct h, `bloom/` = (word, mask) rows).
    */
  def saveWindowIndex(docs: DataFrame, dir: String): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val corpus = Dedup.windowTable(docs).select("h").distinct()
    corpus.write.mode("overwrite").parquet(s"$dir/windows")
    Dedup.bloomWords(s.read.parquet(s"$dir/windows")).zipWithIndex
      .map { case (m, w) => (w, m) }.toSeq.toDF("word", "mask")
      .write.mode("overwrite").parquet(s"$dir/bloom")
  }

  def loadWindowIndex(s: SparkSession, dir: String): WindowIndex = {
    val bloom = Array.fill[Long](Dedup.BloomWords)(0L)
    s.read.parquet(s"$dir/bloom").collect()
      .foreach(r => bloom(r.getInt(0)) = r.getLong(1))
    WindowIndex(s.read.parquet(s"$dir/windows"), bloom)
  }

  def append(idx: DedupIndex, batch: DataFrame): DedupIndex = {
    val bEntries = Dedup.shingleSets(batch)
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
    val bDf = bEntries.groupBy("shingle").agg(count(lit(1)).as("df"))
    val bStats = batch.agg(count(lit(1)), max("doc_id")).head()
    DedupIndex(
      idx.entries.unionByName(bEntries),
      idx.dfFreq.join(bDf.withColumnRenamed("df", "bdf"), Seq("shingle"), "full")
        .select(col("shingle"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("bdf"), lit(0L))).as("df")),
      idx.nDocs + bStats.getLong(0),
      if (bStats.isNullAt(1)) idx.maxDocId else math.max(idx.maxDocId, bStats.getLong(1)))
  }
}
