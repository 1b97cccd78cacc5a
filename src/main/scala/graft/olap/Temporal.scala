package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic temporal-join APIs (the reusable form of q_asof_join /
  * q_range_join — library users call these on their own frames).
  */
object Temporal {

  /** As-of join: for every left row, the latest right row with
    * `rightTs ≤ leftTs` within the same `keys` (ties: the right row is
    * visible). Plan shape: union-tag + one `last(ignoreNulls)` window
    * pass — a single shuffle on the keys, linear work per partition, no
    * join operator at all (the only as-of shape that scales: an
    * inequality join would plan as a broadcast-nested-loop).
    *
    * Output: all left columns plus `rightCols` (null where no right row
    * precedes). `rightCols` must not clash with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_is_l"),
        lStruct.as("_l"), lit(null).cast(rType).as("_r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_is_l"),
        lit(null).cast(lType).as("_l"), rStruct.as("_r")): _*)

    // Right rows sort before left at equal ts (inclusive ≤); _r as the
    // final sort key makes same-ts right rows deterministic.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_is_l"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_l") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_asof.$c").as(c)): _*)
  }

  /** Nearest as-of join: for every left row, the right row minimizing
    * |rightTs − leftTs| within the same `keys`; an equidistant tie
    * prefers the earlier (backward) right row. Same zero-join plan as
    * asofJoin — union-tag + ONE sorted window pass computing both the
    * backward candidate (`last ignoreNulls` over preceding) and the
    * forward candidate (`first ignoreNulls` over following); both
    * windows share the sort, so this is still a single shuffle.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightCols: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(col(rightTs).as("_rts") +: rightCols.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_is_l"),
        lStruct.as("_l"), lit(null).cast(rType).as("_r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_is_l"),
        lit(null).cast(lType).as("_l"), rStruct.as("_r")): _*)

    val ord = Seq(col("_ts"), col("_is_l"), col("_r"))
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val db = abs(unix_micros(col("_back._rts")) - unix_micros(col("_ts")))
    val df = abs(unix_micros(col("_fwd._rts")) - unix_micros(col("_ts")))
    val chosen = when(col("_back").isNull, col("_fwd"))
      .when(col("_fwd").isNull, col("_back"))
      .when(db <= df, col("_back"))
      .otherwise(col("_fwd"))

    l2.unionByName(r2)
      .withColumn("_back", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_fwd", first(col("_r"), ignoreNulls = true).over(wf))
      .filter(col("_is_l") === 1)
      .withColumn("_nearest", chosen)
      .select(col("_l.*") +: rightCols.map(c => col(s"_nearest.$c").as(c)): _*)
  }

  /** Range join: pairs (probe, event) sharing `keys` with the event's
    * instant inside `(probeTs + lowerUs, probeTs + upperUs]`
    * (microsecond offsets). Bucketized: events bucket once by the
    * window width, probes explode into the two covering buckets, the
    * join is a plain equi shuffle join on (keys, bucket) with the
    * exact range predicate applied after — O(n·k) candidates, never an
    * inequality-join plan.
    *
    * `probeTs` / `eventTs` are timestamp columns; output keeps all
    * probe and event columns (caller aggregates as needed).
    */
  def rangeJoin(probe: DataFrame, event: DataFrame, keys: Seq[String],
                probeTs: String, eventTs: String,
                lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty range window")
    val w = upperUs - lowerUs
    val pus: Column = unix_micros(col(probeTs))
    val eus: Column = unix_micros(col(eventTs))
    val hiBucket = floor((pus + lit(upperUs)) / lit(w))
    val probes = probe
      .withColumn("_pus", pus)
      .withColumn("_bucket", explode(array(hiBucket, hiBucket - 1)))
    val events = event
      .withColumn("_eus", eus)
      .withColumn("_bucket", floor(col("_eus") / lit(w)))
    probes.join(events, keys :+ "_bucket")
      .filter(col("_eus") > col("_pus") + lowerUs && col("_eus") <= col("_pus") + upperUs)
      .drop("_bucket", "_pus", "_eus")
  }
}
