package graft.olap

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key top-k with a map-side partial reduction.
  *
  * The plain formulation — `row_number() over (partition by key order
  * by ...)` then `rn <= k` — shuffles EVERY row to rank them, then
  * discards all but k per key. At 100 TB that shuffle is the job. The
  * partial pass here sorts each input partition (Tungsten sort, no
  * shuffle), keeps the first k rows per key per partition — a superset
  * of the global top-k, since a row outside its partition's per-key
  * top-k cannot be in the global top-k — and only then shuffles the
  * ≤ k·keys·partitions survivors for the exact window ranking.
  */
object TopK {

  /** Rows of `df` in the per-key top-k under `order` (row_number
    * semantics — give `order` a deterministic tie-break).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val partial = df
      .sortWithinPartitions(keyCols.map(col) ++ order: _*)
      .mapPartitions { it =>
        var lastKey: Seq[Any] = null
        var n = 0
        it.flatMap { r =>
          val key = keyIdx.map(r.get)
          if (key != lastKey) { lastKey = key; n = 1; Some(r) }
          else if (n < k) { n += 1; Some(r) }
          else None
        }
      }(Encoders.row(schema))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    partial
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
