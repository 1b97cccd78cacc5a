package graft

import org.apache.spark.sql.functions._

/** PartitionOffsets must keep the plan shape partition-count
  * independent: the (pid → offset) map rides in as a BROADCAST JOIN,
  * so a 2,000-partition input (a 100 TB-scale partition count,
  * scaled) builds and runs the exact same O(1)-deep plan as a
  * 32-partition one. The r2 when-chain formulation grew one codegen
  * branch per partition and would hit the JVM 64 KB method limit
  * here.
  */
class PartitionOffsetsSpec extends SparkSpec {

  test("joinOffsets: correct global ranks + broadcast-join plan at 2000 partitions") {
    val n = 10000L
    val nParts = 2000
    val base = spark.range(0, n).toDF("id")
      .repartitionByRange(nParts, col("id"))
      .sortWithinPartitions("id")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("lrank", org.apache.spark.sql.types.LongType)))
    val ranked = base.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = 0L
      it.map { r => i += 1; org.apache.spark.sql.Row(r.getLong(0), pid, i) }
    }(org.apache.spark.sql.Encoders.row(schema))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranked.groupBy("pid").agg(max("lrank").as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq
    assert(counts.size > 1000, s"range partitioner used ${counts.size} partitions")
    val (withOff, total) = PartitionOffsets.joinOffsets(ranked, counts)
    assert(total === n)
    val out = withOff.select(col("id"), (col("_off") + col("lrank")).as("grank"))
    // global rank == global sort position, at any partition count
    assert(out.filter(col("grank") =!= col("id") + 1).count() === 0L)
    // the offsets must arrive via a broadcast join — never a
    // per-partition literal expression chain
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in plan:\n$plan")
    ranked.unpersist(blocking = false)
  }
}
