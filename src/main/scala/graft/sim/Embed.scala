package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Reusable exact all-pairs cosine via block-matrix tiles — the
  * library API behind d_embed_dup. Vectors hash into `nb` blocks; each
  * of the nb·(nb+1)/2 unordered block pairs is one task computing its
  * dense tile in a tight JVM loop (memory per task = two blocks, no
  * driver collect; `nb` scales with the cluster so tiles stay
  * cache-sized).
  *
  * Float contract: dots accumulate in ascending dim order (left fold)
  * and rounding is Spark round() semantics (BigDecimal.valueOf,
  * HALF_UP) — replayable in engines that expose a left fold.
  */
object Embed {

  /** All pairs (idA < idB) with round(cosine, 4) ≥ threshold.
    * Input must expose a long id column and an array<double> column.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, nb: Int = 16): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val blocks = vectors
      .select(col(idCol).cast("long").as("_id"), col(vecCol).cast("array<double>").as("_v"))
      .groupBy(pmod(col("_id"), lit(nb)).cast("int").as("bid"))
      .agg(collect_list(struct(col("_id"), col("_v"))).as("items"))
      .persist(StorageLevel.MEMORY_AND_DISK) // self-joined tiles
    val tiles = blocks.as("x").join(blocks.as("y"), col("x.bid") <= col("y.bid"))
      .select(col("x.bid").as("ba"), col("x.items").as("ia"),
        col("y.bid").as("bb"), col("y.items").as("ib"))
    val pairs = tiles.flatMap { r =>
      def block(i: Int): Array[(Long, Array[Double])] =
        r.getSeq[org.apache.spark.sql.Row](i)
          .map(x => (x.getLong(0), x.getSeq[Double](1).toArray)).toArray
      val same = r.getInt(0) == r.getInt(2)
      val ia = block(1)
      val ib = if (same) ia else block(3)
      def selfDot(v: Array[Double]): Double = {
        var s = 0.0; var k = 0
        while (k < v.length) { s += v(k) * v(k); k += 1 }
        s
      }
      val sa = ia.map(x => selfDot(x._2))
      val sb = if (same) sa else ib.map(x => selfDot(x._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < ia.length) {
        var j = 0
        while (j < ib.length) {
          val idA = ia(i)._1; val idB = ib(j)._1
          if (if (same) idA < idB else idA != idB) {
            val va = ia(i)._2; val vb = ib(j)._2
            var dab = 0.0; var k = 0
            while (k < va.length) { dab += va(k) * vb(k); k += 1 }
            val cos = dab / (math.sqrt(sa(i)) * math.sqrt(sb(j)))
            val rounded = java.math.BigDecimal.valueOf(cos)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            if (rounded >= threshold)
              out += (if (idA < idB) (idA, idB, rounded) else (idB, idA, rounded))
          }
          j += 1
        }
        i += 1
      }
      out
    }
    graft.Caching.releaseAfter(pairs.toDF("id_a", "id_b", "cos_sim"), blocks)
  }

  /** cosinePairs restricted to pairs sharing a LONG group key (e.g. a
    * cluster id): blocks form per (group, id%nb) and tiles join within
    * the group only, so cost is Σ_g n_g² / tiles — the within-cell
    * pair engine behind d_semantic_dedup. Same float contract as
    * cosinePairs; output carries the group key through.
    */
  def cosinePairsGrouped(vectors: DataFrame, idCol: String, vecCol: String,
                         groupCol: String, threshold: Double, nb: Int = 16): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val blocks = vectors
      .select(col(groupCol).cast("long").as("_g"),
        col(idCol).cast("long").as("_id"), col(vecCol).cast("array<double>").as("_v"))
      .groupBy(col("_g"), pmod(col("_id"), lit(nb)).cast("int").as("bid"))
      .agg(collect_list(struct(col("_id"), col("_v"))).as("items"))
      .persist(StorageLevel.MEMORY_AND_DISK) // self-joined tiles
    val tiles = blocks.as("x")
      .join(blocks.as("y"), col("x._g") === col("y._g") && col("x.bid") <= col("y.bid"))
      .select(col("x._g").as("g"), col("x.bid").as("ba"), col("x.items").as("ia"),
        col("y.bid").as("bb"), col("y.items").as("ib"))
      // tiles are compute-heavy and few: spread them instead of letting
      // them inherit the grouped shuffle's (possibly 1-partition) layout
      .repartition(s.sparkContext.defaultParallelism)
    val pairs = tiles.flatMap { r =>
      def block(i: Int): Array[(Long, Array[Double])] =
        r.getSeq[org.apache.spark.sql.Row](i)
          .map(x => (x.getLong(0), x.getSeq[Double](1).toArray)).toArray
      val g = r.getLong(0)
      val same = r.getInt(1) == r.getInt(3)
      val ia = block(2)
      val ib = if (same) ia else block(4)
      def selfDot(v: Array[Double]): Double = {
        var s = 0.0; var k = 0
        while (k < v.length) { s += v(k) * v(k); k += 1 }
        s
      }
      val sa = ia.map(x => selfDot(x._2))
      val sb = if (same) sa else ib.map(x => selfDot(x._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      var i = 0
      while (i < ia.length) {
        var j = 0
        while (j < ib.length) {
          val idA = ia(i)._1; val idB = ib(j)._1
          if (if (same) idA < idB else idA != idB) {
            val va = ia(i)._2; val vb = ib(j)._2
            var dab = 0.0; var k = 0
            while (k < va.length) { dab += va(k) * vb(k); k += 1 }
            val cos = dab / (math.sqrt(sa(i)) * math.sqrt(sb(j)))
            val rounded = java.math.BigDecimal.valueOf(cos)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            if (rounded >= threshold)
              out += (if (idA < idB) (g, idA, idB, rounded) else (g, idB, idA, rounded))
          }
          j += 1
        }
        i += 1
      }
      out
    }
    graft.Caching.releaseAfter(pairs.toDF("grp", "id_a", "id_b", "cos_sim"), blocks)
  }
}
