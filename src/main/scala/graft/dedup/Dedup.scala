package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.gfunctions._
import graft.sources.Tables
import graft.text.Text

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.D). Every near-dup operator goes through a *blocking* stage
  * (shingle inverted index with frequency cap, LSH bands, SimHash
  * blocks) so the pairwise stage is ~O(n·k), never O(n²) — the only
  * shape that survives 100 TB.
  */
object Dedup {

  /** Word 3-gram shingle SET per doc as one array row —
    * `array_distinct` de-dups inside the row, so building the sets
    * needs NO shuffle (the exploded-row variant pays a full DISTINCT
    * exchange for the same information).
    */
  def shingleSets(docs: DataFrame): DataFrame = {
    val t = col("t")
    graft.Par.spread(docs).withColumn("t", Text.toks(col("text")))
      .select(col("doc_id"), array_distinct(when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>"))).as("shs"))
  }

  /** Word 3-gram shingle set per doc (distinct), one row per shingle. */
  def shingleTable(docs: DataFrame): DataFrame =
    shingleSets(docs).select(col("doc_id"), explode(col("shs")).as("shingle"))

  // Bucket pair fan-out is the native generator pair
  // (gfunctions.orderedPairsRows / orderedIdPairsRows →
  // functions.OrderedPairsGen): the lossless size-filter math and the
  // laziness contract live on the expression's Scaladoc.

  /** Pair-mass budget per corpus document for [[adaptiveDfCap]]. Sized
    * so the driver corpora never tighten (sf0.1 carries ~253
    * pairs/doc at the full cap — 4× headroom) while a replica-heavy
    * corpus (duplication ∝ factor ⇒ pair mass ∝ factor²) does.
    */
  private[graft] val PairMassPerDoc = 1000L

  /** Duplication-adaptive document-frequency cap for the shingle
    * inverted index, driven by the same pair-mass statistic
    * d_dup_profile reports: every df-f shingle fans out f·(f−1)/2
    * pairs, so the predicted pair-shuffle volume of a cap c is
    * Σ_{2 ≤ df ≤ c} mass(df). Picks the LARGEST cap ≤ maxCap whose
    * predicted mass stays within PairMassPerDoc × nDocs.
    *
    * On low-duplication corpora the budget is slack and the cap is
    * maxCap — bit-identical output to the fixed cap (the DuckDB
    * oracles keep their literal 1000). On replica-heavy corpora
    * (the r5 100× probe: df ∝ replica factor everywhere, pair mass ∝
    * factor², d_containment exhausting local disk) the cap tightens
    * so the pair stage stays ∝ corpus size — the recall knob the
    * fixed cap already was, now self-tuning. The histogram collect is
    * bounded: ≤ maxCap−1 (df, mass) rows.
    */
  private[graft] def adaptiveDfCapFromDf(dfFreq: DataFrame, nDocs: Long,
                                         maxCap: Long = 1000L): Long = {
    val hist = dfFreq
      .filter(col("df").between(2, maxCap))
      .groupBy("df")
      .agg(sum(((col("df") * (col("df") - 1)) / 2).cast("long")).as("mass"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val budget = PairMassPerDoc * math.max(nDocs, 1L)
    var cum = 0L
    var cap = maxCap
    var busted = false
    for ((dfv, mass) <- hist if !busted) {
      if (cum + mass <= budget) cum += mass
      else { cap = dfv - 1; busted = true }
    }
    // Floor at 2: df=2 keys ARE the exact-duplicate signal — a corpus
    // of few-but-long documents can bust the per-doc budget on the
    // df=2 bucket alone (budget ignores shingles-per-doc), and a cap
    // of 1 silently returns ZERO pairs where the fixed cap had full
    // recall. df=2 pair mass is ≤ vocabulary/2, linear — always safe.
    val floored = math.max(cap, 2L)
    if (floored < maxCap) {
      // Recall loss must be observable, never silent: every key with
      // frequency > cap drops out of the pair stage.
      log.warn(s"adaptive df cap tightened to $floored (maxCap $maxCap, " +
        s"nDocs $nDocs): predicted pair mass busts the ${budget}-pair budget; " +
        s"keys with frequency > $floored are excluded from pairing")
      // Oracle-gated runs (Verify sets graft.assertFixedCap) compare
      // against DuckDB SQL that hard-codes the fixed cap; a tightened
      // cap there must fail HERE, self-identified, not as an opaque
      // hash mismatch three layers up.
      if (sys.props.get("graft.assertFixedCap").contains("true"))
        throw new IllegalStateException(
          s"adaptive df cap tightened to $floored < maxCap $maxCap during an " +
            "oracle-gated run; the DuckDB oracle assumes the fixed cap — " +
            "regenerate the oracle or run this corpus without the assertion")
    }
    floored
  }

  /** One-collect variant for blocking keys where each row is one
    * DOCUMENT (prefix buckets — unlike shingle indexes, where a doc
    * spans many keys): derives the pair-mass histogram AND the
    * participating-doc count from a single bounded aggregation over
    * the key-frequency frame, so the cap pre-pass costs one job and
    * one ≤ maxCap+1-row collect — no checkpoint, no extra corpus
    * scan for the count. The budget base is Σ df over ALL buckets —
    * including df=1 buckets (which can never pair) and the collapsed
    * over-cap bucket (excluded from pairing at any cap) — i.e. total
    * doc-key participation in the blocking, NOT just pair-capable
    * docs. That mirrors adaptiveDfCapFromDf's per-corpus-doc budget
    * (each doc contributes exactly one prefix key here), so the two
    * cap functions resolve identically on the same corpus; excluding
    * the non-pairing buckets would silently tighten the cap relative
    * to the fixed-cap oracle contract.
    */
  private[graft] def adaptiveDfCapOnePass(dfFreq: DataFrame,
                                          maxCap: Long = 1000L): Long = {
    // df values above maxCap collapse into one bucket: those keys are
    // excluded from pairing at ANY cap, so only their doc count
    // matters — the collect stays ≤ maxCap+1 rows on any corpus.
    val hist = dfFreq
      .groupBy(least(col("df"), lit(maxCap + 1)).as("dfb"))
      .agg(sum(col("df")).cast("long").as("docs"),
        sum(((col("df") * (col("df") - 1)) / 2).cast("long")).as("mass"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nDocs = hist.map(_._2).sum
    val budget = PairMassPerDoc * math.max(nDocs, 1L)
    var cum = 0L
    var cap = maxCap
    var busted = false
    for ((dfv, _, mass) <- hist if !busted && dfv >= 2 && dfv <= maxCap) {
      if (cum + mass <= budget) cum += mass
      else { cap = dfv - 1; busted = true }
    }
    val floored = math.max(cap, 2L)
    if (floored < maxCap) {
      log.warn(s"adaptive df cap tightened to $floored (maxCap $maxCap, " +
        s"participating docs $nDocs): predicted pair mass busts the " +
        s"$budget-pair budget; keys with frequency > $floored are excluded from pairing")
      if (sys.props.get("graft.assertFixedCap").contains("true"))
        throw new IllegalStateException(
          s"adaptive df cap tightened to $floored < maxCap $maxCap during an " +
            "oracle-gated run; the DuckDB oracle assumes the fixed cap — " +
            "regenerate the oracle or run this corpus without the assertion")
    }
    floored
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.dedup")

  /** [[adaptiveDfCapFromDf]] over raw index entries (one row per
    * (doc, shingle)).
    */
  private[graft] def adaptiveDfCap(entries: DataFrame, nDocs: Long,
                                   maxCap: Long = 1000L): Long =
    adaptiveDfCapFromDf(
      entries.groupBy("shingle").agg(count(lit(1)).as("df")), nDocs, maxCap)

  /** The capped-index front half every inverted-index operator shares:
    * materialize the shingle→df table ONCE (vocabulary-sized; it feeds
    * both the adaptive-cap statistic and the under-cap semi-join
    * filter, and without materialization each consumer re-tokenizes
    * the whole corpus — measured +36% on d_containment at the 100×
    * probe), derive the cap, return (cap, under-cap shingle set).
    * df=1 shingles are excluded: a single-doc shingle can never form a
    * pair (the incremental join's self-match is filtered out by its
    * doc_other predicate).
    */
  private def cappedShingles(entries: DataFrame, nDocs: => Long,
                             maxCap: Long = 1000L,
                             adaptive: Boolean = true): (Long, DataFrame) =
    cappedKeys(entries, Seq("shingle"), nDocs, maxCap, adaptive)

  /** [[cappedShingles]] generalized to any blocking key (LSH band
    * buckets, prefix buckets): materialize key frequencies once,
    * derive the budgeted cap over the bucket-size histogram, return
    * the under-cap key set for the join-first bucket build. With
    * `maxCap = Long.MaxValue` the fixed behavior is "no cap" (the
    * d_minhash_lsh oracle enumerates every bucket) and the adaptive
    * cap only engages when predicted pair mass would bust the budget —
    * the same low-duplication-identical contract as the shingle cap.
    */
  private def cappedKeys(rows: DataFrame, keyCols: Seq[String], nDocs: => Long,
                         maxCap: Long = 1000L,
                         adaptive: Boolean = true): (Long, DataFrame) = {
    val freq = graft.Caching.releaseAfter(
      rows.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("df")))
    val cap = if (adaptive) adaptiveDfCapFromDf(freq, nDocs, maxCap) else maxCap
    (cap, freq.filter(col("df").between(2, cap)).select(keyCols.map(col): _*))
  }

  private val ShSql =
    s"""sh AS (SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM d)""".stripMargin

  /** Portable polynomial hash of a string column, oracle-side; `mult`
    * selects the hash-family member (mirrors functions.PolyHash).
    */
  private def polySql(colName: String, mult: Long = 31L): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($colName) + 1),
       |    i -> CAST(ascii(substr($colName, CAST(i AS INT), 1)) AS BIGINT))),
       |  (acc, c) -> (acc * $mult + c) % 2147483647)""".stripMargin

  /** d_exact: hash-groupBy exact dedup → canonical id + group size. */
  val exact = GraftQuery(
    "d_exact",
    Some(s"""
      WITH h AS (SELECT doc_id, md5(${Text.NormSql}) AS content_hash FROM documents)
      SELECT doc_id, content_hash,
             MIN(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
             COUNT(*) OVER (PARTITION BY content_hash) AS group_size
      FROM h
      ORDER BY doc_id"""),
    (s, d) => exactGroups(Tables.documents(s, d)).orderBy("doc_id"),
  )

  /** Exact-dup groups for any (doc_id, text) frame: content hash,
    * canonical (min) id and group size per row.
    */
  def exactGroups(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("content_hash")
    docs
      .select(col("doc_id"), md5(Text.normText(col("text"))).as("content_hash"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
  }

  /** d_ngram_jaccard: near-dup pairs via shingle inverted-index join.
    * Shingles with document frequency above the cap are dropped from
    * the index (skew guard: a stopword-trigram would otherwise create
    * a quadratic hot key at scale); set sizes stay uncapped.
    */
  val ngramJaccard = GraftQuery(
    "d_ngram_jaccard",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
      FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5
      ORDER BY jaccard DESC, doc_a, doc_b"""),
    (s, d) => pairsFor(s, d)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")),
  )

  /** Memoized default-parameter near-dup pair table per data dir —
    * the pair table is the dedup pipeline's shared index artifact
    * (components, cross-modal consistency, funnel accounting and
    * split-leakage all consume it); a production pipeline computes it
    * once, stores it, and fans out. Built on first use per session,
    * freed by Caching.releaseAll at harness teardown.
    */
  private val pairsMemo =
    scala.collection.mutable.Map[String, (SparkSession, DataFrame)]()
  graft.Caching.onReleaseAll(() => pairsMemo.synchronized(pairsMemo.clear()))

  def pairsFor(s: SparkSession, d: String): DataFrame = pairsMemo.synchronized {
    pairsMemo.get(d) match {
      case Some((sess, p)) if (sess eq s) && !s.sparkContext.isStopped => p
      case _ =>
        // ngramJaccardPairs already returns a checkpointed frame;
        // retain just moves its blocks to the session-lifetime registry.
        val p = graft.Caching.retain(ngramJaccardPairs(Tables.documents(s, d)))
        pairsMemo(d) = (s, p)
        p
    }
  }

  /** Near-dup pairs by n-gram Jaccard for any (doc_id, text) frame.
    *
    * Exactly TWO shuffles end to end: (1) groupBy(shingle) builds the
    * inverted index — the document-frequency cap is a filter on bucket
    * size (skew guard: a stopword trigram would otherwise fan out
    * quadratically), (2) groupBy(pair) counts overlaps. Each doc's set
    * size rides through the index next to its id, so the jaccard needs
    * no size-lookup join; bucket pairs are generated map-side from the
    * sorted id array instead of a self-join. No caches, nothing leaks.
    */
  def ngramJaccardPairs(docs: DataFrame, maxDf: Long = 1000,
                        threshold: Double = 0.5,
                        adaptive: Boolean = true): DataFrame =
      // Materialize here (the memo wrapped the SAME plan in a second
      // checkpoint before — one copy of the pair table, not two).
      graft.Caching.releaseAfter(
        ngramJaccardPairsPlan(docs, maxDf, threshold, adaptive))

  /** The LAZY pair plan behind [[ngramJaccardPairs]] — split out so
    * the plan-shape invariants (native generator fan-out, bucket build
    * after the df-filter join) stay assertable: the public entry
    * checkpoints, and a checkpoint's plan is an opaque RDD scan.
    */
  private[graft] def ngramJaccardPairsPlan(docs: DataFrame, maxDf: Long = 1000,
                        threshold: Double = 0.5,
                        adaptive: Boolean = true): DataFrame = {
      // entries is recomputed by the cap pass and the bucket build —
      // measured cheaper than persisting the exploded strings (see
      // d_containment).
      val entries = shingleSets(docs)
        .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
      // df-filter BEFORE the bucket build (semi-join on the under-cap
      // shingle set, then collect): the filter-after-grouping form
      // materializes one array per shingle regardless of df — a
      // stopword shingle at corpus scale is a single multi-million
      // element collect_list in one task. Join-first bounds every
      // bucket array by the cap, and the join's shingle partitioning
      // is reused by the groupBy (no extra exchange).
      val (_, shf) = cappedShingles(entries, docs.count(), maxDf, adaptive)
      val buckets = entries.join(shf, Seq("shingle"))
        .groupBy("shingle")
        .agg(array_sort(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      buckets
        .select(orderedPairsRows(col("ids"), threshold - 1e-4))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("n_common"))
        .select(col("doc_a"), col("doc_b"),
          round(col("n_common").cast("double") /
            (col("na") + col("nb") - col("n_common")), 4).as("jaccard"))
        .filter(col("jaccard") >= threshold)
  }

  /** MinHash parameters: 16 permutations h_i(x) = (a_i·x + b_i) mod p,
    * banded 4×4. Fixed constants so the oracle can replay them.
    * private[graft]: the dev profiler times the same pipeline and must
    * never drift from these.
    */
  private[graft] val P = 2147483647L
  private[graft] val HashA = Seq(1610612741L, 805306457L, 402653189L, 201326611L,
    100663319L, 50331653L, 25165843L, 12582917L, 6291469L, 3145739L,
    1572869L, 786433L, 393241L, 196613L, 98317L, 49157L)
  private[graft] val HashB = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L, 37L, 41L,
    43L, 47L, 53L, 59L, 61L, 67L)

  private val ParamsSql = HashA.zip(HashB).zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }
    .mkString("params(i, a, b) AS (VALUES ", ", ", ")")

  /** d_minhash_lsh: MinHash signature → band buckets → candidate pairs
    * → exact-Jaccard verification restricted to candidates. The
    * pairwise stage only ever sees same-band collisions.
    */
  val minhashLsh = GraftQuery(
    "d_minhash_lsh",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      $ParamsSql,
      fp AS (SELECT doc_id, ${polySql("shingle")} AS f FROM sh),
      sig AS (SELECT doc_id, i, MIN((a * f + b) % $P) AS mh
              FROM fp CROSS JOIN params GROUP BY doc_id, i),
      bands AS (SELECT doc_id, i // 4 AS band,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bsig
                FROM sig GROUP BY doc_id, i // 4),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      ic AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
             FROM cand c
             JOIN sh a ON a.doc_id = c.doc_a
             JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
             GROUP BY 1, 2)
      SELECT ic.doc_a, ic.doc_b,
             ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
      FROM ic JOIN sizes sa ON sa.doc_id = ic.doc_a JOIN sizes sb ON sb.doc_id = ic.doc_b
      WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5
      ORDER BY jaccard DESC, doc_a, doc_b"""),
    (s, d) => minhashLshPairs(Tables.documents(s, d))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")),
  )

  /** Near-dup pairs via MinHash+LSH banding for any (doc_id, text)
    * frame; candidates verified with exact Jaccard.
    *
    * The 16-permutation signature is computed entirely MAP-SIDE from
    * the per-doc shingle-set array (16 `array_min` folds over one
    * hashed array — no row explode, no signature shuffle). The only
    * index shuffle is the band-bucket groupBy; bucket pairs are
    * generated map-side from the sorted id array (no self-join), and
    * exact verification intersects the two set arrays directly
    * (`array_intersect`) instead of re-joining exploded shingle rows.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
      // set arrays + hashed arrays feed the band path and both verify
      // probes; hs is materialized INSIDE the cache — were it a lazy
      // column, CollapseProject would inline its transform into all 16
      // signature columns and hash every shingle 16 times. The
      // no-shingle exclusion filters on token count BEFORE the arrays
      // exist (equivalent: shingles exist ⟺ ≥3 tokens) — a filter on
      // size(shs) would be pushed down with the whole array expression
      // substituted into it, re-running the tokenizer per element.
      val ds = shingleSets(docs.filter(size(Text.toks(col("text"))) >= 3))
        .withColumn("hs", transform(col("shs"), s => polyHash(s)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mhCols = HashA.zip(HashB).zipWithIndex.map { case ((a, b), i) =>
        array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % P)).as(s"mh$i")
      }
      val sig = ds.select(col("doc_id") +: mhCols: _*)
      // bands feeds the cap's frequency pass AND the bucket-build join;
      // persisted (4 short rows per doc), the 16 × |shingles| signature
      // permutation folds run ONCE instead of once per consumer (guide
      // §1.2) — the cached `ds` arrays alone don't help, the fold is
      // the expensive map-side work above them.
      val bands = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map(b => concat_ws(",",
          (0 until 4).map(k => col(s"mh${b * 4 + k}").cast("string")): _*)): _*))
          .as(Seq("band", "bsig")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // band buckets were previously UNCAPPED (filter ≥ 2 only): a
      // replica-heavy bucket is one corpus-sized collect_list array
      // whose map-side fan-out is quadratic in duplication. Same
      // budgeted-cap + join-first treatment as the shingle index;
      // maxCap = unbounded so low-duplication corpora keep the
      // oracle's every-bucket semantics exactly.
      val (_, hot) = cappedKeys(bands, Seq("band", "bsig"),
        docs.count(), maxCap = Long.MaxValue)
      val cand = bands.join(hot, Seq("band", "bsig"))
        .groupBy("band", "bsig")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .select(orderedIdPairsRows(col("ids")))
        .distinct()
      val out = cand
        .join(ds.select(col("doc_id").as("doc_a"), col("shs").as("sa")), Seq("doc_a"))
        .join(ds.select(col("doc_id").as("doc_b"), col("shs").as("sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (size(col("sa")) + size(col("sb")) -
              size(array_intersect(col("sa"), col("sb")))), 4).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      graft.Caching.releaseAfter(out, ds, bands)
  }

  /** The full per-doc simhash pairwise oracle — shared verbatim by
    * d_simhash and d_simhash_compact: the two operators are two PLANS
    * for the same function, and sharing the SQL makes the hash gate
    * prove plan-equivalence, not just plausibility.
    */
  private val SimhashPairsSql: String = s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      tok AS (SELECT doc_id, unnest(t) AS token FROM d),
      tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token),
      th AS (SELECT doc_id, c,
               (${polySql("token")} % 1073741824)
                 + (${polySql("token", 131L)} % 1073741824) * 1073741824 AS h
             FROM tc),
      bits AS (SELECT doc_id, j,
                 SUM(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN c ELSE -c END) AS s
               FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
               GROUP BY doc_id, j),
      sh2 AS (SELECT doc_id,
                CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY doc_a, doc_b"""

  /** d_simhash: 60-bit SimHash over token counts (the low 30 bits of
    * the 31- and 131-ary polynomial hashes concatenated); candidates
    * via 4 15-bit block buckets (pigeonhole: hamming ≤ 3 ⇒ ≥1
    * identical block, so the blocked join loses nothing vs the
    * oracle's full pairwise join).
    *
    * Width is a SCALE property, not a tuning knob. At the previous 31
    * bits, two failure modes grow with the corpus: (a) the hamming≤3
    * ball covers ~5k/2³¹ ≈ 2.3e-6 of signature space, so UNRELATED
    * pairs pass the gate at a rate that makes the output itself
    * quadratic in corpus size (~300k junk pairs at 500k docs); (b)
    * each 8-bit block has 256 buckets, so candidate volume per block
    * is n²/256 — quadratic with a constant no cluster outruns. At 60
    * bits the ball is ~3e-14 (false positives stay ~0 up to billions
    * of docs) and 15-bit blocks cut candidates another 128×.
    */
  val simhash = GraftQuery(
    "d_simhash",
    Some(SimhashPairsSql),
    (s, d) => simhashPairs(Tables.documents(s, d)).orderBy("doc_a", "doc_b"),
  )

  /** Near-dup pairs by SimHash Hamming distance for any (doc_id,
    * text) frame; blocked by the 4×15-bit pigeonhole so no full
    * pairwise join ever runs.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val (out, sim) = simhashPairsRaw(docs, maxHamming)
    graft.Caching.releaseAfter(out, sim)
  }

  /** simhashPairs WITHOUT the final materialization: returns the lazy
    * pair plan plus the persisted signature frame the caller must
    * release. Lets simhashCompactPairs overlay its expansion joins and
    * checkpoint the pair set ONCE — checkpointing both the rep-level
    * pairs and the expanded union doubles block storage and GC for an
    * output that can reach ~50M rows (the r7 sf1 signature).
    */
  private def simhashPairsRaw(docs: DataFrame, maxHamming: Int): (DataFrame, DataFrame) = {
      // 60 per-bit sums as agg columns in ONE groupBy over raw token
      // INSTANCES (not a 60× row explode, and not a (doc_id, token)
      // count prepass): Σ_instances ±1 ≡ Σ_distinct-tokens ±count —
      // exact integers either way — so the r16 shape's
      // groupBy(doc_id, token).count() stage bought nothing but a
      // second full exchange of the doc×token rows (guide §2.4: remove
      // shuffles outright). Map-side partials collapse each doc to a
      // single 60-column row before the one remaining exchange (the
      // exploded instances of a doc are contiguous in their partition,
      // so the partial-agg hash map stays doc-count-sized).
      val th = graft.Par.spread(docs)
        .withColumn("t", Text.toks(col("text")))
        .select(col("doc_id"), explode(col("t")).as("token"))
        .select(col("doc_id"),
          ((polyHash(col("token")) % 1073741824L)
            + (polyHash(col("token"), 131L) % 1073741824L) * 1073741824L).as("h"))
      val bitCols = (0 to 59).map(j =>
        sum(when(expr(s"(h >> $j) & 1") === 1, 1L).otherwise(-1L)).as(s"s$j"))
      val sim = th.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 to 59).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
            .reduce(_ + _).cast("long").as("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // self-joined below
      val blocks = sim
        .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("blk"))
        .withColumn("bval", expr("(simhash >> (blk * 15)) & 32767"))
      val cand = blocks.as("x")
        .join(blocks.as("y"),
          col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash").as("ha"), col("y.simhash").as("hb"))
        .distinct()
      val out = cand
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
      (out, sim)
  }

  /** d_simhash_compact: the exact-prepass COMPOSITION of d_simhash —
    * byte-identical output (it shares d_simhash's oracle SQL, so the
    * hash gate proves the two plans compute the same function), but
    * signatures and the blocked candidate join run only over one
    * REPRESENTATIVE per identical-text class, and member pairs are
    * expanded back afterwards. On replica-heavy corpora (the sf10
    * stress probe: pair fan-out ∝ duplication²) the candidate join
    * shrinks quadratically in the duplication factor while the output
    * expansion stays linear in the intrinsic result size. This is the
    * production composition: run the cheap exact collapse BEFORE the
    * quadratic-prone near-dup machinery (see d_dup_profile for the
    * decision diagnostic).
    *
    * The collapse key is md5 of the whitespace-collapsed text — the
    * exact invariance class of the simhash tokenizer (Text.toks does
    * NOT lowercase, so d_exact's case-insensitive normText key would
    * over-collapse case-variant docs with different signatures).
    */
  val simhashCompact = GraftQuery(
    "d_simhash_compact",
    Some(SimhashPairsSql),
    (s, d) => simhashCompactPairs(Tables.documents(s, d)).orderBy("doc_a", "doc_b"),
  )

  /** d_simhash via exact-collapse prepass for any (doc_id, text)
    * frame; ≡ simhashPairs(docs, maxHamming) (SimhashCompactSpec).
    */
  def simhashCompactPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val w = Window.partitionBy("tok_hash")
    // (doc_id, rep_id) membership: rep = min doc_id of the class of
    // docs with identical token sequences. The collapse window moves
    // TWO NARROW COLUMNS through its exchange — corpus text never
    // enters a shuffle or a persist here (the r7 version carried
    // `text` through the window and persisted it, which cost 3.6× the
    // direct d_simhash at sf1 from heap/GC pressure alone).
    val ids = docs
      .select(col("doc_id"),
        md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("tok_hash"))
      .withColumn("rep_id", min("doc_id").over(w))
      .select(col("doc_id"), col("rep_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Text rejoined for REPRESENTATIVES only — class-count-sized. The
    // probe side is (doc_id) alone, so AQE broadcasts it whenever the
    // class count is modest (always true in the replica-heavy regime
    // this composition exists for) and the docs scan is filtered
    // map-side with zero text movement; the fallback shuffle still
    // moves each rep text once, unpersisted.
    val repDocs = docs.select(col("doc_id"), col("text"))
      .join(ids.filter(col("doc_id") === col("rep_id")).select("doc_id"), Seq("doc_id"))
    // Rep-level near-dup pairs: the full simhash machinery, but over
    // unique texts only. Hamming(rep_a, rep_b) = hamming(a, b) for any
    // members a, b because signatures are functions of the token
    // sequence. Raw (uncheckpointed) plan: the expansion joins overlay
    // it and the whole pair set materializes exactly once, at the end.
    val (repPairs, sim) = simhashPairsRaw(repDocs, maxHamming)
    // Same-class pairs: identical signatures, hamming 0.
    val intra = ids.as("x")
      .join(ids.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))
    // Cross-class pairs: each rep pair expands to |A|×|B| member pairs
    // (the intrinsic output size — d_simhash emits these rows too);
    // member ids interleave across classes, so re-order with
    // least/greatest.
    val cross = repPairs
      .join(ids.as("ma"), col("ma.rep_id") === col("doc_a"))
      .join(ids.as("mb"), col("mb.rep_id") === col("doc_b"))
      .select(
        least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("hamming"))
    // Disjoint by construction: intra has rep_a = rep_b, cross rep_a ≠ rep_b.
    graft.Caching.releaseAfter(intra.unionByName(cross), sim, ids)
  }

  /** d_embed_dup: embedding-cosine near-dup pairs (cos ≥ 0.45). At
    * oracle scales: EXACT via a **block-matrix cross product** —
    * vectors hash into `nb` blocks, each of the nb·(nb+1)/2 block
    * pairs is one task computing its dense dot-product tile in a tight
    * JVM loop (the per-pair HOF-expression version was ~40× slower:
    * interpreted lambda per element vs a hot loop). Beyond
    * Sim.EmbedExactCutoff the same tiles run WITHIN multi-assigned
    * IVF cells (see [[graft.sim.Sim.embedDupPairs]]) — O(n^1.5) at
    * the adaptive cell count instead of the n² that measured 606.9 s
    * at 200k vectors; SPARK_GRAFT_EMBED_EXACT=1 is the explicit
    * full-pairs knob, and the recall-vs-exact delta of the blocked
    * path is a measured artifact, not a silent cap.
    *
    * Float determinism vs the oracle: dot products accumulate in
    * ascending dim order (= DuckDB's list_reduce left fold) and
    * rounding matches Spark's round() (BigDecimal.valueOf, HALF_UP).
    */
  val embedDup = GraftQuery(
    "d_embed_dup",
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])), (x, y) -> x + y) AS dab,
              list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * a.v[i])), (x, y) -> x + y) AS daa,
              list_reduce(list_prepend(0.0, list_transform(range(1, len(b.v) + 1), i -> b.v[i] * b.v[i])), (x, y) -> x + y) AS dbb
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, ROUND(dab / (sqrt(daa) * sqrt(dbb)), 4) AS cos_sim
      FROM p
      WHERE ROUND(dab / (sqrt(daa) * sqrt(dbb)), 4) >= 0.45
      ORDER BY cos_sim DESC, vec_a, vec_b"""),
    (s, d) =>
      graft.sim.Sim.embedDupPairs(s, d, 0.45)
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b")),
  )

  /** d_cdc_chunks: content-defined chunking — a boundary wherever the
    * rolling 8-char window hash ≡ 0 (mod 64), so chunk edges survive
    * insertions/deletions (the storage-dedup trick applied to long
    * documents: chunk fingerprints dedupe at sub-document
    * granularity). Pure per-position predicate (no sequential state) ⇒
    * exactly replayable in the oracle; per-doc work is O(len), no
    * shuffle until the final explode.
    */
  /** Shared oracle CTE: the content-defined chunk table
    * (doc_id, chunk_idx, chunk_len, chunk_fp) — used by d_cdc_chunks
    * and the cross-document chunk dedup (mm_chunk_dedup).
    */
  private[graft] val CdcChunksCte: String = s"""
      WITH d AS (SELECT doc_id, ${Text.NormSql} AS s FROM documents WHERE doc_id < 100),
      b AS (SELECT doc_id, s,
              list_prepend(CAST(0 AS BIGINT),
                list_concat(
                  list_filter(range(8, length(s)), i -> ${Text.polySqlPublic("substr(s, CAST(i - 7 AS INT), 8)")} % 64 = 0),
                  [CAST(length(s) AS BIGINT)])) AS bounds
            FROM d),
      c AS (SELECT doc_id,
              unnest(list_transform(range(1, len(bounds)),
                j -> {'idx': j, 'chunk': substr(s, CAST(bounds[CAST(j AS INT)] + 1 AS INT),
                                                CAST(bounds[CAST(j + 1 AS INT)] - bounds[CAST(j AS INT)] AS INT))})) AS ch
            FROM b),
      chunks AS (SELECT doc_id, CAST(ch.idx AS INT) AS chunk_idx,
                        length(ch.chunk) AS chunk_len,
                        ${Text.polySqlPublic("ch.chunk")} AS chunk_fp
                 FROM c)"""

  val cdcChunks = GraftQuery(
    "d_cdc_chunks",
    Some(s"""
      $CdcChunksCte
      SELECT doc_id, chunk_idx, chunk_len, chunk_fp
      FROM chunks
      ORDER BY doc_id, chunk_idx"""),
    (s, d) => {
      val str = col("s")
      val bs = when(length(str) >= 9,
        filter(sequence(lit(8), length(str) - 1),
          i => polyHash(str.substr(i - 7, lit(8))) % 64 === 0))
        .otherwise(array().cast("array<int>"))
      val bounds = concat(array(lit(0).cast("long")), bs.cast("array<long>"),
        array(length(str).cast("long")))
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), Text.normText(col("text")).as("s"))
        .withColumn("bounds", bounds)
        .select(col("doc_id"), str,
          posexplode(transform(sequence(lit(1), size(col("bounds")) - 1),
            j => str.substr((element_at(col("bounds"), j) + 1).cast("int"),
              (element_at(col("bounds"), j + 1) - element_at(col("bounds"), j)).cast("int"))))
            .as(Seq("pos", "chunk")))
        .select(col("doc_id"), (col("pos") + 1).as("chunk_idx"),
          length(col("chunk")).as("chunk_len"),
          polyHash(col("chunk")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    },
  )

  /** Connected components over an undirected edge list — the cluster
    * resolution step that turns near-dup PAIRS into dedup GROUPS
    * (component id = min doc id, the canonical survivor). Iterative
    * min-label propagation: each round every node takes the min label
    * in its neighborhood; fixpoint ⇐ no label changed. Each round is
    * one join + one aggregate (the standard large-graph CC shape);
    * rounds needed = graph diameter, and near-dup graphs are
    * shallow — the driver loop checks convergence, it never holds
    * graph data.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // Iterative algorithm ⇒ lineage truncation every round
    // (localCheckpoint: materialize + leaf plan). Without it the plan
    // tree nests one level per round and plan-string generation alone
    // goes super-linear; with it each round's plan is O(1) and no
    // DataFrame cache outlives the call (superseded generations'
    // blocks are reclaimed by the ContextCleaner once unreferenced).
    val sym = graft.Caching.releaseAfter( // read every round; tracked
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    var labels = graft.Caching.releaseAfter(
      sym.select(col("src").as("doc_id")).distinct()
        .withColumn("component", col("doc_id")))
    // Convergence: a node's label only ever DECREASES (min-label), so
    // the labeling is a fixpoint iff Σcomponent is unchanged — one
    // scalar aggregate per round instead of a next⋈previous diff join.
    // The sum is DECIMAL(38,0): a long sum of raw 64-bit ids would
    // overflow (and, under ANSI mode, throw) at large id spaces.
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast(dec38)), lit(0).cast(dec38)))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val msgs = sym.join(labels, sym("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("component"))
      val next = graft.Caching.releaseAfter(
        labels.select("doc_id", "component").unionByName(msgs)
          .groupBy("doc_id").agg(min("component").as("component")))
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    // Returning non-converged labels would silently split components
    // (chain-shaped near-dup clusters — truncation chains — have
    // diameter > round count); the oracle computes the exact closure,
    // so divergence here is data corruption, not degradation.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIters rounds " +
          "(component diameter exceeds the iteration budget; raise maxIters)")
    labels
  }

  /** d_components: ngram-Jaccard pairs → dedup clusters. The oracle
    * replays connectivity with a recursive CTE (min reachable id =
    * component id — a fixpoint, so iteration strategy doesn't matter).
    */
  val components = GraftQuery(
    "d_components",
    Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM p0 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
                WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5),
      e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT a, a FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
      cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src)
      SELECT doc_id, component,
             COUNT(*) OVER (PARTITION BY component) AS component_size
      FROM cc
      ORDER BY component, doc_id"""),
    (s, d) => {
      val edges = pairsFor(s, d).select("doc_a", "doc_b")
      val w = Window.partitionBy("component")
      connectedComponents(edges)
        .withColumn("component_size", count(lit(1)).over(w))
        .orderBy("component", "doc_id")
    },
  )

  private def ddot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), __di -> $a[__di] * $b[__di])), (__dx, __dy) -> __dx + __dy)"

  /** d_dup_consistency: cross-modal check — near-duplicate TEXT pairs
    * whose EMBEDDINGS disagree flag an upstream problem (stale
    * embedding, pipeline mismatch). The shingle index blocks the pair
    * space; the embedding join is by id.
    */
  val dupConsistency = GraftQuery(
    "d_dup_consistency",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      p AS (SELECT doc_a, doc_b
            FROM p0 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5),
      ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT doc_a, doc_b,
             ROUND(${ddot("ea.v", "eb.v")} / (sqrt(${ddot("ea.v", "ea.v")}) * sqrt(${ddot("eb.v", "eb.v")})), 4) AS cos_sim,
             ROUND(${ddot("ea.v", "eb.v")} / (sqrt(${ddot("ea.v", "ea.v")}) * sqrt(${ddot("eb.v", "eb.v")})), 4) >= 0.99 AS consistent
      FROM p JOIN ev ea ON ea.vec_id = doc_a JOIN ev eb ON eb.vec_id = doc_b
      ORDER BY doc_a, doc_b"""),
    (s, d) => {
      val pairs = pairsFor(s, d).select("doc_a", "doc_b")
      val ev = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cs = round(cosine(col("ea.v"), col("eb.v")), 4)
      pairs
        .join(ev.as("ea"), col("ea.vec_id") === col("doc_a"))
        .join(ev.as("eb"), col("eb.vec_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"), cs.as("cos_sim"),
          (cs >= 0.99).as("consistent"))
        .orderBy("doc_a", "doc_b")
    },
  )

  /** d_prefix_containment: truncation duplicates — doc A is a
    * prefix-containment dup of doc B when B's normalized text starts
    * with A's (the common crawl/export failure mode: same page, one
    * copy cut off). Blocking: every SURVIVING pair shares its first 50
    * normalized chars, so bucket on that key (with a bucket-size cap
    * as skew guard), generate candidate pairs map-side, and verify
    * `starts_with` after joining the two texts back by id — the pair
    * space is the bucket fan-out, never n². Docs shorter than the
    * 50-char key are excluded BY DESIGN (a noise floor, applied
    * identically in the oracle): a tiny fragment is a prefix of half
    * the corpus, and flagging those as dups is wrong more often than
    * right. Lower the floor only together with the blocking-key width.
    */
  val prefixContainment = GraftQuery(
    "d_prefix_containment",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.NormSql} AS s FROM documents),
      k AS (SELECT doc_id, length(s) AS len, substr(s, 1, 50) AS p50 FROM d
            WHERE length(s) >= 50),
      b AS (SELECT p50, list(doc_id ORDER BY doc_id) AS ids FROM k
            GROUP BY p50 HAVING COUNT(*) BETWEEN 2 AND 1000),
      cand AS (SELECT x.ids[i] AS doc_a, x.ids[j] AS doc_b
               FROM (SELECT ids, unnest(range(1, len(ids) + 1)) AS i FROM b) x
               CROSS JOIN LATERAL (SELECT unnest(range(1, len(x.ids) + 1)) AS j)
               WHERE i < j),
      v AS (SELECT cand.doc_a, cand.doc_b, da.s AS sa, db.s AS sb
            FROM cand JOIN d da ON da.doc_id = cand.doc_a
                      JOIN d db ON db.doc_id = cand.doc_b)
      SELECT CASE WHEN length(sa) <= length(sb) THEN doc_a ELSE doc_b END AS doc_short,
             CASE WHEN length(sa) <= length(sb) THEN doc_b ELSE doc_a END AS doc_long,
             least(length(sa), length(sb)) AS len_short,
             greatest(length(sa), length(sb)) AS len_long
      FROM v
      WHERE starts_with(CASE WHEN length(sa) <= length(sb) THEN sb ELSE sa END,
                        CASE WHEN length(sa) <= length(sb) THEN sa ELSE sb END)
      ORDER BY doc_short, doc_long"""),
    (s, d) => prefixPairs(s, d),
  )

  /** d_prefix_containment's plan, with the cap injectable so the A/B
    * adjudication tool (tools/PrefixAb) can run the fixed-cap and
    * adaptive variants interleaved in ONE JVM — the only measurement
    * that survives this host's burst noise on a sub-2 s query.
    * `capOverride = None` (the registered query) runs the adaptive
    * pre-pass; `Some(c)` skips it and feeds `c` as the literal.
    */
  private[graft] def prefixPairs(s: SparkSession, d: String,
                                 capOverride: Option[Long] = None): DataFrame = {
      val norm = Tables.documents(s, d)
        .select(col("doc_id"), Text.normText(col("text")).as("s"))
      val keyed = norm
        .filter(length(col("s")) >= 50)
        .select(col("doc_id"), substring(col("s"), 1, 50).as("p50"))
      // Budgeted cap (≤ the oracle's fixed 1000; identical on
      // low-duplication data): truncation-replica corpora share the
      // p50 prefix across every replica, so an uncapped bucket array
      // is quadratic in duplication. The cap pre-pass is ONE cheap
      // groupBy-count job with a bounded collect that yields both the
      // histogram and the participating-doc budget; the main plan then
      // stays the r5 fully-fused single job (aggregate → size filter
      // with the cap as a LITERAL → pair fan-out → text joins). The r7
      // cappedKeys version instead checkpointed a df table and joined
      // it back — two extra corpus materializations that doubled this
      // operator's sf1 time (1.46 vs 0.65 s) on pure added job cost.
      val cap = capOverride.getOrElse(adaptiveDfCapOnePass(
        keyed.groupBy("p50").agg(count(lit(1)).as("df"))))
      val cand = keyed
        .groupBy("p50").agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, cap))
        .select(orderedIdPairsRows(col("ids")))
      val shorter = when(length(col("sa")) <= length(col("sb")), col("sa")).otherwise(col("sb"))
      val longer = when(length(col("sa")) <= length(col("sb")), col("sb")).otherwise(col("sa"))
      cand
        .join(norm.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
        .join(norm.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
        .filter(longer.startsWith(shorter))
        .select(
          when(length(col("sa")) <= length(col("sb")), col("doc_a")).otherwise(col("doc_b"))
            .as("doc_short"),
          when(length(col("sa")) <= length(col("sb")), col("doc_b")).otherwise(col("doc_a"))
            .as("doc_long"),
          least(length(col("sa")), length(col("sb"))).as("len_short"),
          greatest(length(col("sa")), length(col("sb"))).as("len_long"))
        .orderBy("doc_short", "doc_long")
  }

  /** Adapt any frame to the canonical (doc_id, text) shape the
    * pipeline functions above consume.
    */
  def canonical(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text"))

  /** d_containment: asymmetric shingle containment |A∩B| / |A| — the
    * subset-dup detector symmetric Jaccard misses: a short doc fully
    * embedded in a long one scores containment ≈ 1 while Jaccard stays
    * small. Same two-shuffle inverted-index shape as ngramJaccardPairs
    * (sizes ride with the ids, pairs map-side); emitted per-direction
    * with the contained (smaller-set) doc first.
    */
  val containment = GraftQuery(
    "d_containment",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, n, sh.shingle FROM sh
              JOIN sizes USING (doc_id) JOIN shf USING (shingle)),
      p AS (SELECT a.doc_id AS doc_a, a.n AS na, b.doc_id AS doc_b, b.n AS nb,
                   COUNT(*) AS n_common
            FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
      SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_small,
             CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_big,
             ROUND(CAST(n_common AS DOUBLE) / least(na, nb), 4) AS containment,
             ROUND(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) AS jaccard
      FROM p
      WHERE ROUND(CAST(n_common AS DOUBLE) / least(na, nb), 4) >= 0.8
      ORDER BY doc_small, doc_big"""),
    (s, d) => {
      val docs = Tables.documents(s, d)
      // entries feeds the cap's frequency pass AND the bucket-build
      // join — deliberately NOT persisted: caching the exploded
      // shingle strings costs more than the second tokenize pass it
      // saves (measured at sf1: persisted 19.8 s vs recomputed 12.4 s
      // isolated min-of-2 — the cache write + heap pressure of a
      // corpus-sized string explosion beats two CPU-parallel passes).
      val entries = shingleSets(docs)
        .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
      // adaptive cap only — containment bounds nothing between na and
      // nb (a tiny doc inside a huge one is the POINT), so the size
      // filter stays off. Join-first bucket build: arrays bounded by
      // the cap (see ngramJaccardPairs).
      val (_, shf) = cappedShingles(entries, docs.count())
      val pairs = entries.join(shf, Seq("shingle"))
        .groupBy("shingle")
        .agg(array_sort(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
        .select(orderedPairsRows(col("ids")))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("n_common"))
      val cont = round(col("n_common").cast("double") / least(col("na"), col("nb")), 4)
      pairs
        .select(
          when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
          when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
          cont.as("containment"),
          round(col("n_common").cast("double") /
            (col("na") + col("nb") - col("n_common")), 4).as("jaccard"))
        .filter(col("containment") >= 0.8)
        .orderBy("doc_small", "doc_big")
    },
  )

  /** d_dedup_funnel: the whole dedup pipeline's ACCOUNTING in one row —
    * how many docs survive exact dedup, how many survive near-dup
    * clustering, and the corpus retention after both. A doc survives
    * iff it is the canonical (min-id) member of BOTH its exact-hash
    * group and its near-dup component (docs in no component survive
    * that stage trivially). This is the number a data pipeline reports
    * per snapshot; every stage reuses the library operators.
    */
  val dedupFunnel = GraftQuery(
    "d_dedup_funnel",
    Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM p0 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
                WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5),
      e2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs
             UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT a, a FROM e2
        UNION
        SELECT r.src, e2.b FROM reach r JOIN e2 ON r.dst = e2.a),
      cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
      h AS (SELECT doc_id, md5(${Text.NormSql}) AS content_hash FROM documents),
      flags AS (
        SELECT h.doc_id,
               h.doc_id = MIN(h.doc_id) OVER (PARTITION BY content_hash) AS e_can,
               COALESCE(cc.doc_id = cc.component, TRUE) AS n_can
        FROM h LEFT JOIN cc ON cc.doc_id = h.doc_id)
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN e_can THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_canonical,
             CAST(SUM(CASE WHEN n_can THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_canonical,
             CAST(SUM(CASE WHEN e_can AND n_can THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
             ROUND(CAST(SUM(CASE WHEN e_can AND n_can THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 4) AS retention
      FROM flags"""),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val ex = exactGroups(docs)
        .select(col("doc_id"), (col("doc_id") === col("canonical_id")).as("e_can"))
      val comp = connectedComponents(
        pairsFor(s, d).select("doc_a", "doc_b"))
        .select(col("doc_id"), (col("doc_id") === col("component")).as("n_can"))
      ex.join(comp, Seq("doc_id"), "left")
        .withColumn("n_can", coalesce(col("n_can"), lit(true)))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("e_can"), 1).otherwise(0)).as("n_exact_canonical"),
          sum(when(col("n_can"), 1).otherwise(0)).as("n_neardup_canonical"),
          sum(when(col("e_can") && col("n_can"), 1).otherwise(0)).as("n_survivors"),
          round(sum(when(col("e_can") && col("n_can"), 1).otherwise(0)).cast("double") /
            count(lit(1)), 4).as("retention"))
    },
  )

  /** d_split_leakage: train/eval leakage through NEAR-duplicates —
    * t_contamination catches exact n-gram reuse, but a paraphrased or
    * truncated twin of a test document sitting in train passes that
    * check and still inflates eval. Every near-dup pair whose two docs
    * hash into different splits (t_split's deterministic assignment)
    * is a leak. The split of a doc is a pure function of its id, so
    * both sides compute it MAP-SIDE on the pair frame — no join with
    * a doc-sized split table; cost is the pair pipeline itself.
    */
  val splitLeakage = GraftQuery(
    "d_split_leakage",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b,
                  ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
                FROM p0 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
                WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5),
      sp AS (SELECT doc_a, doc_b, jaccard,
               CASE WHEN ${Text.polySqlPublic("CAST(doc_a AS VARCHAR)")} % 100 < 80 THEN 'train'
                    WHEN ${Text.polySqlPublic("CAST(doc_a AS VARCHAR)")} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS spa,
               CASE WHEN ${Text.polySqlPublic("CAST(doc_b AS VARCHAR)")} % 100 < 80 THEN 'train'
                    WHEN ${Text.polySqlPublic("CAST(doc_b AS VARCHAR)")} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS spb
             FROM pairs)
      SELECT least(spa, spb) AS split_a, greatest(spa, spb) AS split_b,
             least(spa, spb) <> greatest(spa, spb) AS is_leak,
             COUNT(*) AS n_pairs,
             ROUND(MAX(jaccard), 4) AS max_jaccard
      FROM sp
      GROUP BY 1, 2
      ORDER BY split_a, split_b"""),
    (s, d) => {
      def splitOf(c: Column): Column = {
        val b = polyHash(c.cast("string")) % 100
        when(b < 80, "train").when(b < 90, "val").otherwise("test")
      }
      pairsFor(s, d)
        .select(col("jaccard"), splitOf(col("doc_a")).as("spa"), splitOf(col("doc_b")).as("spb"))
        .select(least(col("spa"), col("spb")).as("split_a"),
          greatest(col("spa"), col("spb")).as("split_b"), col("jaccard"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"), round(max(col("jaccard")), 4).as("max_jaccard"))
        .select(col("split_a"), col("split_b"),
          (col("split_a") =!= col("split_b")).as("is_leak"),
          col("n_pairs"), col("max_jaccard"))
        .orderBy("split_a", "split_b")
    },
  )

  /** d_incremental: incremental ingestion dedup — the production daily
    * shape: the newest batch (here: the top 10% of doc_ids, standing
    * in for "today's crawl") dedups against the WHOLE corpus without
    * recomputing old×old pairs. The DF-capped inverted index is the
    * stored historical artifact; the increment's shingle rows join
    * against it, so per-batch cost is ∝ increment size × shingle df —
    * independent of corpus history length. New×new pairs count once
    * (doc_other > doc_new); new×old pairs are flagged cross_batch.
    * A spec asserts the result equals the full-recompute pair table
    * restricted to pairs touching the increment — the incremental
    * correctness contract.
    */
  val incrementalDedup = GraftQuery(
    "d_incremental",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      thr AS (SELECT CAST(floor(0.9 * (MAX(doc_id) + 1)) AS BIGINT) AS v FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, n, sh.shingle FROM sh
              JOIN sizes USING (doc_id) JOIN shf USING (shingle)),
      cand AS (SELECT nw.doc_id AS doc_new, nw.n AS na,
                      ex.doc_id AS doc_other, ex.n AS nb, COUNT(*) AS n_common
               FROM shc nw CROSS JOIN thr
               JOIN shc ex ON nw.shingle = ex.shingle
                AND (ex.doc_id < thr.v OR ex.doc_id > nw.doc_id)
               WHERE nw.doc_id >= thr.v
               GROUP BY 1, 2, 3, 4)
      SELECT doc_new, doc_other,
             doc_other < (SELECT v FROM thr) AS cross_batch,
             ROUND(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) AS jaccard
      FROM cand
      WHERE ROUND(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) >= 0.5
      ORDER BY doc_new, doc_other"""),
    (s, d) => {
      val docs = Tables.documents(s, d)
      // one bounded driver row: the increment boundary
      val thr = docs.agg(floor(lit(0.9) * (max("doc_id") + 1)).cast("long")).head().getLong(0)
      // entries is recomputed by the cap pass and the index join —
      // measured cheaper than persisting the exploded strings (see
      // d_containment).
      val entries = shingleSets(docs)
        .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
      val (_, shf) = cappedShingles(entries, docs.count())
      // the capped index feeds BOTH sides of the increment×corpus join;
      // without materialization each side re-tokenizes the corpus and
      // re-derives the df filter (≈5 full entry passes). Checkpoint it
      // once — at deploy this is the stored historical index artifact
      // the operator's contract already names.
      val shc = graft.Caching.releaseAfter(entries.join(shf, Seq("shingle")))
      val newE = shc.filter(col("doc_id") >= thr)
        .select(col("shingle"), col("doc_id").as("doc_new"), col("n").as("na"))
      val exE = shc.select(col("shingle"), col("doc_id").as("doc_other"), col("n").as("nb"))
      newE.join(exE, Seq("shingle"))
        .filter(col("doc_other") < thr || col("doc_other") > col("doc_new"))
        .groupBy("doc_new", "na", "doc_other", "nb")
        .agg(count(lit(1)).as("n_common"))
        .select(col("doc_new"), col("doc_other"),
          (col("doc_other") < thr).as("cross_batch"),
          round(col("n_common").cast("double") /
            (col("na") + col("nb") - col("n_common")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_new", "doc_other")
    },
  )

  /** d_semantic_dedup: SemDeDup-style semantic deduplication (Abbas et
    * al. 2023, arXiv:2303.09540) — cluster the embedding corpus with
    * k-means, then prune near-duplicates WITHIN each cluster only:
    * a vector is dropped when an earlier (smaller-id) vector in its
    * cluster has cosine ≥ τ, and `kept_by` is the smallest such id
    * (the deterministic stand-in for the paper's "keep one random
    * representative per ε-ball"). Output is the dropped set — the rows
    * a corpus-pruning pass would delete.
    *
    * This is the scale shape that makes embedding dedup tractable at
    * 100 TB where d_embed_dup's exact all-pairs (O(n²), the oracle
    * baseline) cannot run: the pairwise stage is confined to cells, so
    * cost is Σ n_c² with n_c ≈ n/k, and k is the knob that grows with
    * the corpus (SemDeDup used 11k clusters for LAION). The cluster
    * assignment reuses the memoized IVF index (same artifact that
    * serves the ANN family); the self-join is an equi-join on cid over
    * the checkpointed assigned frame — cells are near-balanced by
    * construction, so no skew salt is needed.
    *
    * Oracle: full replay — the unrolled Lloyd chain (same seeds, same
    * decimal-exact means), the same within-cell pair predicate, the
    * same smallest-partner window. Bit-exact like the other IVF ops.
    */
  val semanticDedup = GraftQuery(
    "d_semantic_dedup",
    Some(s"""
      ${graft.sim.Sim.ivfSql(8, 3)},
      pr AS (SELECT y.vec_id AS vec_id, y.cid AS cid, x.vec_id AS partner,
               ROUND(${graft.sim.Sim.cosSql("x.v", "y.v")}, 4) AS cs
             FROM a4 x JOIN a4 y ON x.cid = y.cid AND x.vec_id < y.vec_id),
      q AS (SELECT vec_id, cid, partner, cs,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY partner) AS rn
            FROM pr WHERE cs >= 0.45)
      SELECT vec_id, cid, partner AS kept_by, cs AS cos_sim
      FROM q WHERE rn = 1
      ORDER BY vec_id"""),
    (s, d) => {
      // within-cell pairs via the SAME block-tile kernel as
      // d_embed_dup (Embed.cosinePairsGrouped, group = cid): the naive
      // cid self-join planned as a broadcast join over the corpus
      // scan's partitioning — at local test scale ONE task computed
      // every pair (50 s at sf1), and at deploy the replicated side
      // is corpus-sized, not broadcastable. The grouped tiles spread
      // Σ n_c² work over nb²/2 tasks per cell with primitive-array
      // loops; same float contract, hashes unchanged (12× at sf1).
      // cell count scales with the corpus (Sim.semDedupCells: k ≈
      // √(n/50), = the oracle's 8 at every gate scale) — a fixed k
      // left this quadratic with a 1/k constant (r9 100× sweep:
      // exponent 1.48); with k ∝ √n the within-cell pair mass is
      // ≈ n^1.5, the SemDeDup curve.
      val a = graft.sim.Sim.ivfIndexAdaptive(s, d, iters = 3).assigned
        .select(col("cid"), col("vec_id"), col("v"))
      val w = Window.partitionBy("vec_id").orderBy(col("partner"))
      graft.sim.Embed.cosinePairsGrouped(a, "vec_id", "v", "cid", 0.45)
        .select(col("id_b").as("vec_id"), col("grp").as("cid"),
          col("id_a").as("partner"), col("cos_sim").as("cs"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("partner").as("kept_by"),
          col("cs").as("cos_sim"))
        .orderBy("vec_id")
    },
  )

  /** Exact-substring span length for d_substring_spans: the toy-corpus
    * analogue of Lee et al.'s 50-BPE-token threshold (the median doc
    * here is 56 whitespace tokens, so 20 keeps the same "a span must
    * be long enough to be memorization, not idiom" intent at this
    * document length).
    */
  private[graft] val SpanLen = 20

  /** d_substring_spans: exact duplicated SUBSTRINGS, not duplicated
    * documents (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499) — the dedup class the
    * doc-level operators miss: boilerplate, licenses, and quoted
    * passages repeated inside otherwise-unique documents.
    *
    * The paper builds a corpus suffix array; the shape that survives a
    * distributed 100 TB corpus is the rolling-window equivalent: hash
    * every L-token window map-side (native PolyHash over the joined
    * window — one pass per doc, no shuffle), count window-hash
    * occurrences corpus-wide (one shuffle, map-side partial agg), keep
    * windows whose hash occurs ≥ 2 times (within-doc repetition counts,
    * as in the paper), then merge overlapping duplicated windows per
    * doc into maximal spans (one shuffle, per-doc sorted position
    * array bounded by doc length; union length = L + Σ min(gap, L)
    * over consecutive positions — no interval-walk state needed). No
    * stage enumerates document pairs, so cost is linear in corpus
    * windows however many documents share a span — the property that
    * makes this the scale path where the suffix array is not.
    *
    * Window identity is the 31-bit polynomial hash (portable to the
    * oracle); a production run would widen it to 64/128 bits — the
    * plan is hash-width-agnostic.
    *
    * Output: per doc with ≥ 1 duplicated window — total tokens covered
    * by duplicated spans and the covered fraction (what the paper's
    * pipeline would CUT from each doc).
    */
  val substringSpans = GraftQuery(
    "d_substring_spans",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      w AS (SELECT doc_id, len(t) AS n_tokens,
              unnest(list_transform(range(1, greatest(len(t) - ${SpanLen - 1}, 0) + 1),
                i -> {'pos': i,
                      'h': ${Text.polySqlPublic(s"array_to_string(t[i:i+${SpanLen - 1}], ' ')")}})) AS pw
            FROM d),
      wf AS (SELECT doc_id, n_tokens, pw.pos AS pos, pw.h AS h FROM w),
      hc AS (SELECT h FROM wf GROUP BY h HAVING COUNT(*) >= 2),
      dup AS (SELECT doc_id, n_tokens, pos FROM wf JOIN hc USING (h)),
      per AS (SELECT doc_id, n_tokens, list_sort(list(pos)) AS ps,
                COUNT(*) AS dup_windows
              FROM dup GROUP BY 1, 2),
      cov AS (SELECT doc_id, n_tokens, dup_windows,
                CAST($SpanLen + coalesce(list_sum(list_transform(range(2, len(ps) + 1),
                  j -> least(ps[j] - ps[j-1], $SpanLen))), 0) AS BIGINT) AS dup_tokens
              FROM per)
      SELECT doc_id, n_tokens, dup_windows, dup_tokens,
             ROUND(CAST(dup_tokens AS DOUBLE) / n_tokens, 4) AS dup_frac
      FROM cov
      ORDER BY doc_id"""),
    (s, d) => substringSpanStats(Tables.documents(s, d)).orderBy("doc_id"),
  )

  /** Every L-token window per doc, hashed map-side:
    * (doc_id, n_tokens, pos, h).
    */
  private[graft] def windowTable(docs: DataFrame, L: Int = SpanLen): DataFrame =
    graft.Par.spread(docs)
      .select(col("doc_id"), Text.toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(when(col("n_tokens") >= L,
          transform(sequence(lit(1), (col("n_tokens") - (L - 1)).cast("int")),
            i => struct(i.cast("long").as("pos"),
              polyHash(concat_ws(" ", slice(col("t"), i, lit(L)))).as("h"))))
          .otherwise(array().cast("array<struct<pos:bigint,h:bigint>>"))).as("w"))
      .select(col("doc_id"), col("n_tokens"), col("w.pos").as("pos"), col("w.h").as("h"))

  /** Merge a doc's duplicated windows into maximal spans: per doc,
    * window count + covered tokens (union = L + Σ min(gap, L) over the
    * sorted position array) + covered fraction.
    */
  private[graft] def spanStats(dupWindows: DataFrame, L: Int = SpanLen): DataFrame = {
    val per = dupWindows
      .groupBy("doc_id", "n_tokens")
      .agg(sort_array(collect_list(col("pos"))).as("ps"),
        count(lit(1)).as("dup_windows"))
    val gapSum = aggregate(
      transform(sequence(lit(2), size(col("ps"))),
        j => least(element_at(col("ps"), j) - element_at(col("ps"), j - 1), lit(L.toLong))),
      lit(0L), (a, x) => a + x)
    val covered = (lit(L.toLong) +
      when(size(col("ps")) >= 2, gapSum).otherwise(lit(0L))).as("dup_tokens")
    per.select(col("doc_id"), col("n_tokens"), col("dup_windows"), covered)
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 4))
  }

  /** The span pipeline over any (doc_id, text) frame — per doc with
    * ≥ 1 duplicated L-token window: window count, tokens covered by
    * the merged duplicated spans, covered fraction.
    */
  def substringSpanStats(docs: DataFrame, L: Int = SpanLen): DataFrame = {
    // The window table feeds BOTH the duplicated-hash aggregate and
    // the probe side of the semi-join; unpersisted, the corpus is
    // tokenized and window-hashed twice (guide §1.2). Materialize it
    // once — the exact pattern bloomSpanStats already uses for the
    // same frame (at sf10 the second derivation was the measured
    // difference between this op at 13.7 s and d_bloom_prefilter's
    // persisted 10.8 s on a strictly LONGER pipeline).
    val windows = windowTable(docs, L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupHashes = windows.groupBy("h")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select("h")
    graft.Caching.releaseAfter(
      spanStats(windows.join(dupHashes, Seq("h"), "left_semi"), L), windows)
  }

  /** d_canonical: the KEEP decision after near-dup clustering — per
    * dedup component, retain the highest-quality member (t_quality's
    * composite score, min-doc_id tie-break), not an arbitrary one.
    * This is the step real pipelines run between d_components and the
    * corpus rewrite: min-id canonicalization (what d_dedup_funnel
    * accounts with) keeps whichever duplicate happened to be crawled
    * first; quality-argmax keeps the best copy. Pure composition of
    * registered operators — cluster labels from the shared memoized
    * pair table, scores from t_quality_score — plus one window. Adds
    * one quality join over component members only; no new corpus scan
    * shapes, so it scales exactly as d_components does.
    */
  val canonicalPick = GraftQuery(
    "d_canonical",
    Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      $ShSql,
      shf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
      shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shf USING (shingle)),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b
                FROM p0 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
                WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) >= 0.5),
      e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT a, a FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
      cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
      q AS (SELECT doc_id,
              ROUND(0.5 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
                + 0.5 * (1.0 - CAST(len(list_filter(t,
                    x -> x IN (${Text.stopwords.map(w => s"'$w'").mkString(", ")})))
                  AS DOUBLE) / len(t)), 4) AS quality
            FROM d),
      rk AS (SELECT cc.doc_id, cc.component, q.quality,
               ROW_NUMBER() OVER (PARTITION BY component
                 ORDER BY quality DESC, cc.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY component) AS n_members
             FROM cc JOIN q USING (doc_id))
      SELECT component, doc_id AS kept_doc, quality AS kept_quality,
             n_members, n_members - 1 AS n_dropped
      FROM rk WHERE rn = 1
      ORDER BY component"""),
    (s, d) => {
      val labels = connectedComponents(pairsFor(s, d).select("doc_a", "doc_b"))
      val qual = Text.qualityScore.run(s, d).select(col("doc_id"), col("quality"))
      val w = Window.partitionBy("component").orderBy(col("quality").desc, col("doc_id"))
      val wc = Window.partitionBy("component")
      labels.join(qual, Seq("doc_id"))
        .withColumn("n_members", count(lit(1)).over(wc))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("kept_doc"),
          col("quality").as("kept_quality"), col("n_members"),
          (col("n_members") - 1).as("n_dropped"))
        .orderBy("component")
    },
  )

  /** Bloom sizing for d_bloom_prefilter: 2^20 bits / 3 hashes. At the
    * harness corpus (~14k distinct window hashes) the false-positive
    * rate is ~0.2%; m scales with the stored index's key count at
    * deploy (it is a pruning knob only — result exactness never
    * depends on it, see the operator scaladoc).
    */
  private val BloomBits = 1 << 20
  private[graft] val BloomWords = BloomBits / 64
  private val BloomSeeds = Seq(1, 2, 3)

  /** Incremental exact-substring dedup WITHOUT a bloom — the exact
    * semantics both the oracle and the bloom-pushdown path must
    * produce: new-batch (doc_id ≥ thr) windows that also occur in the
    * stored corpus (doc_id < thr), merged into per-doc spans.
    */
  private[graft] def incrementalSpanStats(docs: DataFrame, thr: Long,
                                          L: Int = SpanLen): DataFrame = {
    val wins = windowTable(docs, L)
    val corpus = wins.filter(col("doc_id") < thr).select("h").distinct()
    spanStats(wins.filter(col("doc_id") >= thr).join(corpus, Seq("h"), "left_semi"), L)
  }

  /** d_bloom_prefilter: incremental exact-substring dedup with a
    * BROADCAST BLOOM pushdown — the daily-ingestion twin of
    * d_substring_spans (as d_incremental is of d_ngram_jaccard): which
    * spans of the NEW batch already exist in the stored corpus index?
    *
    * The scale device is the bloom: the corpus window-hash set is
    * folded into a 2^20-bit filter as ~16k bit-OR'd words (one bounded
    * aggregate — the collect is ≤ BloomWords rows whatever the corpus
    * size), shipped to every task as a literal array, and each new
    * window tests 3 bit probes MAP-SIDE (variable-shift bit tests,
    * codegen'd). Only bloom-positives reach the confirm semi-join —
    * at the harness corpus that cuts the join input ~20×; at 100 TB it
    * is the difference between shuffling the whole day's windows and
    * shuffling ~(true dups + ε). Exactness never depends on the
    * filter: blooms have NO false negatives, every positive is
    * CONFIRMED by the exact semi-join, and the oracle replays the
    * bloom-free semantics (BloomPrefilterSpec proves the pipeline ≡
    * incrementalSpanStats and measures the pruning).
    */
  val bloomPrefilter = GraftQuery(
    "d_bloom_prefilter",
    Some(s"""
      WITH d AS (SELECT doc_id, ${Text.ToksSql} AS t FROM documents),
      thr AS (SELECT CAST(floor(0.9 * (MAX(doc_id) + 1)) AS BIGINT) AS v FROM documents),
      w AS (SELECT doc_id, len(t) AS n_tokens,
              unnest(list_transform(range(1, greatest(len(t) - ${SpanLen - 1}, 0) + 1),
                i -> {'pos': i,
                      'h': ${Text.polySqlPublic(s"array_to_string(t[i:i+${SpanLen - 1}], ' ')")}})) AS pw
            FROM d),
      wf AS (SELECT doc_id, n_tokens, pw.pos AS pos, pw.h AS h FROM w),
      cw AS (SELECT DISTINCT h FROM wf CROSS JOIN thr WHERE doc_id < v),
      dup AS (SELECT doc_id, n_tokens, pos FROM wf CROSS JOIN thr
              JOIN cw USING (h) WHERE doc_id >= v),
      per AS (SELECT doc_id, n_tokens, list_sort(list(pos)) AS ps,
                COUNT(*) AS dup_windows
              FROM dup GROUP BY 1, 2),
      cov AS (SELECT doc_id, n_tokens, dup_windows,
                CAST($SpanLen + coalesce(list_sum(list_transform(range(2, len(ps) + 1),
                  j -> least(ps[j] - ps[j-1], $SpanLen))), 0) AS BIGINT) AS dup_tokens
              FROM per)
      SELECT doc_id, n_tokens, dup_windows, dup_tokens,
             ROUND(CAST(dup_tokens AS DOUBLE) / n_tokens, 4) AS dup_frac
      FROM cov
      ORDER BY doc_id"""),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val thr = docs.agg(floor(lit(0.9) * (max("doc_id") + 1)).cast("long")).head().getLong(0)
      bloomSpanStats(docs, thr).orderBy("doc_id")
    },
  )

  /** The bloom-pushdown pipeline (see d_bloom_prefilter): identical
    * output to incrementalSpanStats, with only bloom-positive windows
    * reaching the confirm join.
    */
  /** Fold a distinct window-hash frame into bloom words — ≤ BloomWords
    * rows collected however large the corpus is.
    */
  private[graft] def bloomWords(corpus: DataFrame): Array[Long] = {
    val positions = BloomSeeds.map(i => pmod(xxhash64(col("h"), lit(i)), lit(BloomBits.toLong)))
    val words = corpus
      .select(explode(array(positions: _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("mask"))
      .collect()
    val bloom = Array.fill[Long](BloomWords)(0L)
    words.foreach(r => bloom(r.getInt(0)) = r.getLong(1))
    bloom
  }

  /** Map-side bloom probe over a window frame: 3 variable-shift bit
    * tests against the literal word array; keeps positives only.
    */
  private[graft] def bloomProbe(wins: DataFrame, bloom: Array[Long]): DataFrame = {
    val probed = BloomSeeds.zipWithIndex.foldLeft(
        wins.withColumn("bloom", typedLit(bloom.toSeq))) {
      case (df, (seed, k)) =>
        df.withColumn(s"_p$k", pmod(xxhash64(col("h"), lit(seed)), lit(BloomBits.toLong)))
    }
    val hit = BloomSeeds.indices.map(k => expr(
      s"(shiftright(element_at(bloom, CAST(shiftright(_p$k, 6) AS INT) + 1), " +
        s"CAST(_p$k % 64 AS INT)) & 1) = 1")).reduce(_ && _)
    probed.filter(hit)
      .select(col("doc_id"), col("n_tokens"), col("pos"), col("h"))
  }

  private[graft] def bloomSpanStats(docs: DataFrame, thr: Long,
                                    L: Int = SpanLen): DataFrame = {
    // the window table feeds three consumers (bloom fold, confirm-join
    // corpus side, increment probe) and the distinct corpus index two
    // — materialize each once instead of re-tokenizing the corpus per
    // consumer (at deploy these ARE the stored index artifacts)
    val wins = windowTable(docs, L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = wins.filter(col("doc_id") < thr).select("h").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom = bloomWords(corpus)
    val positives = bloomProbe(wins.filter(col("doc_id") >= thr), bloom)
    graft.Caching.releaseAfter(
      spanStats(positives.join(corpus, Seq("h"), "left_semi"), L), wins, corpus)
  }

  /** Floor-to-power-of-two bucket (clamped at 1024): exact integer
    * comparisons, so Spark and DuckDB bucket identically — no float
    * log2 at bucket boundaries.
    */
  private def p2Bucket(c: Column): Column =
    (10 to 1 by -1).foldLeft(null: Column) { (acc, k) =>
      val lo = 1L << k
      if (acc == null) when(c >= lo, lo) else acc.when(c >= lo, lo)
    }.otherwise(1L)

  private def p2BucketSql(e: String): String =
    "CASE " + (10 to 1 by -1).map(k => s"WHEN $e >= ${1L << k} THEN ${1L << k}")
      .mkString(" ") + " ELSE 1 END"

  /** d_dup_profile: the corpus DUPLICATION diagnostic — which dedup
    * regime is this corpus in, and which knob binds? Two histograms
    * over power-of-two buckets, each with its quadratic PAIR MASS
    * Σ s·(s−1)/2 (what a pair-enumerating pass would generate):
    *  - exact-duplicate group sizes (normalized text): mass here is
    *    removable by the d_exact prepass before any near-dup pass;
    *  - shingle document frequencies: mass here is what the inverted-
    *    index family (jaccard/containment/incremental) fans out, and
    *    what the df cap truncates — the sf10 stress probe showed this
    *    mass growing ∝ duplication² and exhausting local disk, which
    *    is exactly the decision this profile lets a pipeline make
    *    BEFORE launching the quadratic job.
    * Cost: two groupBys + two tiny histogram aggregates — the cheap
    * look-before-you-leap pass. Exact integer arithmetic throughout.
    */
  val dupProfile = GraftQuery(
    "d_dup_profile",
    Some(s"""
      WITH eg AS (SELECT ${Text.NormSql} AS nt, CAST(COUNT(*) AS BIGINT) AS s
                  FROM documents GROUP BY 1),
      sg AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS s FROM (
               SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 2, 0) + 1),
                 __si -> t[__si] || ' ' || t[__si + 1] || ' ' || t[__si + 2]))) AS shingle
               FROM (SELECT doc_id, ${Text.ToksSql} AS t FROM documents))
             GROUP BY 1),
      h AS (SELECT 'exact_group' AS kind, ${p2BucketSql("s")} AS bucket_lo,
              COUNT(*) AS n_keys, CAST(SUM(s) AS BIGINT) AS n_items,
              CAST(SUM(s * (s - 1) / 2) AS BIGINT) AS pair_mass
            FROM eg GROUP BY 2
            UNION ALL
            SELECT 'shingle_df', ${p2BucketSql("s")},
              COUNT(*), CAST(SUM(s) AS BIGINT),
              CAST(SUM(s * (s - 1) / 2) AS BIGINT)
            FROM sg GROUP BY 2)
      SELECT kind, bucket_lo, n_keys, n_items, pair_mass
      FROM h ORDER BY kind, bucket_lo"""),
    (s, d) => dupProfileOf(Tables.documents(s, d)),
  )

  /** The duplication profile over any (doc_id, text) frame — see
    * d_dup_profile.
    */
  private[graft] def dupProfileOf(docs: DataFrame): DataFrame = {
    val eg = docs.groupBy(Text.normText(col("text")).as("nt"))
      .agg(count(lit(1)).as("s"))
    val sg = shingleTable(docs).groupBy("shingle").agg(count(lit(1)).as("s"))
    def hist(src: DataFrame, kind: String): DataFrame =
      src.groupBy(p2Bucket(col("s")).as("bucket_lo"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("s")).as("n_items"),
          // s·(s−1) is even and < 2^53, so the double division is
          // exact and the per-row cast keeps the sum in longs
          sum(((col("s") * (col("s") - 1)) / 2).cast("long")).as("pair_mass"))
        .select(lit(kind).as("kind"), col("bucket_lo"), col("n_keys"),
          col("n_items"), col("pair_mass"))
    hist(eg, "exact_group").unionByName(hist(sg, "shingle_df"))
      .orderBy("kind", "bucket_lo")
  }

  def all: Seq[GraftQuery] =
    Seq(exact, ngramJaccard, minhashLsh, simhash, embedDup, cdcChunks, components,
      dupConsistency, prefixContainment, containment, dedupFunnel, splitLeakage,
      incrementalDedup, semanticDedup, substringSpans, canonicalPick, bloomPrefilter,
      dupProfile, simhashCompact)
}
