package graft

/** The persisted-index lifecycle: saving the IVF/PQ artifacts to
  * parquet and loading them back must search bit-identically to the
  * in-memory build — this is the executor-loss-tolerant production
  * shape (build once, serve from storage).
  */
class IvfStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq

  test("IVF: save -> load -> search is identical to in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_store").toString
    val idx = graft.sim.Sim.ivfIndex(spark, sfDir, k = 8, iters = 3)
    graft.sim.IvfStore.save(idx, dir)
    val loaded = graft.sim.IvfStore.load(spark, dir)
    assert(loaded.centroids.map { case (c, v) => (c, v.toList) } ===
      idx.centroids.map { case (c, v) => (c, v.toList) })
    assert(loaded.assigned.count() === idx.assigned.count())
    assert(rows(graft.sim.Sim.searchIvf(loaded)) === rows(graft.sim.Sim.searchIvf(idx)))
  }

  test("IVF-ADC: save -> load -> search is identical to in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_store_pq").toString
    val idx = graft.sim.Sim.ivfIndex(spark, sfDir, k = 8, iters = 3)
    val books = graft.sim.Sim.pqBooks(spark, sfDir)
    val coded = graft.sim.Sim.ivfCoded(spark, sfDir)
    graft.sim.IvfStore.savePq(books, coded, dir)
    val (lBooks, lCoded) = graft.sim.IvfStore.loadPq(spark, dir)
    assert(lBooks.map(_.map { case (c, v) => (c, v.toList) }) ===
      books.map(_.map { case (c, v) => (c, v.toList) }))
    val mem = rows(graft.sim.Sim.searchIvfAdc(spark, sfDir, idx.centroids, books, coded))
    val disk = rows(graft.sim.Sim.searchIvfAdc(spark, sfDir, idx.centroids, lBooks, lCoded))
    assert(disk === mem)
    assert(mem.nonEmpty)
  }
}
