package graft

import org.apache.spark.sql.functions._

/** d_embed_dup's scale contract (Sim.embedDupPairs): exact all-pairs
  * tiles at oracle scales, IVF-cell-blocked tiles beyond
  * EmbedExactCutoff. The blocked path is allowed to MISS cross-cell
  * pairs (a measured recall artifact) but must never invent a pair or
  * change a cosine: its output is a subset of the exact pair set with
  * identical values, and pairs of identical vectors (which always
  * share a cell — same argmin) are always found.
  */
class EmbedDupScaleSpec extends SparkSpec {

  test("at oracle scale embedDupPairs IS the exact block-matrix path") {
    val exact = graft.sim.Embed
      .cosinePairs(graft.sources.Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", 0.45)
      .orderBy("id_a", "id_b").collect().toSeq
    val viaEntry = graft.sim.Sim.embedDupPairs(spark, sfDir, 0.45)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaEntry === exact)
    assert(exact.nonEmpty)
  }

  test("above the cutoff the blocked path is a value-exact subset that keeps planted dups") {
    import spark.implicits._
    val n = graft.sim.Sim.EmbedExactCutoff.toInt + 50
    val dir = java.nio.file.Files.createTempDirectory("embed_scale").toString
    // n random unit-ish vectors + 50 planted exact duplicates
    // (vec n+i ≡ vec i): identical vectors share an argmin cell, so
    // the blocked path must surface every planted pair at cos 1.0.
    spark.range(n + 50)
      .select(col("id").as("vec_id"),
        (col("id") % 7).cast("int").as("label"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(when(col("id") < n, col("id")).otherwise(col("id") - n), i),
            lit(2001L)).cast("double") - 1000.0) / 1000.0).cast("float"))
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val blocked = graft.sim.Sim.embedDupPairs(spark, dir, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = graft.sim.Embed
      .cosinePairs(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(blocked.subsetOf(exact), "blocked path invented pairs or changed values")
    val planted = (0 until 50).map(i => (i.toLong, (n + i).toLong, 1.0)).toSet
    assert(planted.subsetOf(exact))
    assert(planted.subsetOf(blocked), "blocked path lost a same-cell identical pair")
    graft.Caching.releaseTransient()
  }
}
