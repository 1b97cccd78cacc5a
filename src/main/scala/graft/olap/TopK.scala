package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key top-k.
  *
  * The plain formulation — `row_number() over (partition by key order
  * by ...)` then `rn <= k` — is what we emit: Spark ≥3.5 plans it
  * with WindowGroupLimit PARTIAL PUSHDOWN, inserting a per-partition
  * top-k pass BELOW the shuffle, so the exchange carries at most
  * k·keys·partitions candidate rows, not the stream (asserted in
  * PlanShapeSpec). A hand-rolled sortWithinPartitions+mapPartitions
  * partial (the r2 implementation) computes the same thing but pays
  * per-row InternalRow↔Row conversion and breaks whole-stage codegen
  * at two boundaries — measured (TopKBench, sf0.1): equal at k=1 and
  * ~25% slower at k=5. The optimizer's version won; keep it.
  */
object TopK {

  /** Rows of `df` in the per-key top-k under `order` (row_number
    * semantics — give `order` a deterministic tie-break).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
