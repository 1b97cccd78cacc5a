package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing (§2.F): feature-extract batching, stub
  * determinism, and the harness-facing scalar projection.
  */
class MultimodalSpec extends SparkSpec {

  test("extractFeatures: 4-dim features, deterministic in the payload bytes") {
    val src = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val feats = graft.multimodal.Multimodal.extractFeatures(src)
    val r = feats.filter(col("doc_id") === 0).collect().head
    val f = r.getSeq[Double](2)
    assert(f.length === 4)
    assert(f(0) === r.getInt(1).toDouble)        // n = byte length
    assert(f(2) <= 255.0 && f(3) >= 0.0)         // max/min byte range
    assert(f(1) >= f(3) && f(1) <= f(2))         // mean within [min, max]
    // deterministic across invocations
    val again = graft.multimodal.Multimodal.extractFeatures(src)
      .filter(col("doc_id") === 0).collect().head.getSeq[Double](2)
    assert(again === f)
  }

  test("mm_feature_extract query: scalar columns only (harness-sortable), one row per doc") {
    val out = graft.multimodal.Multimodal.featureExtract.run(spark, sfDir)
    assert(out.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.count() === n)
    val r = out.filter(col("doc_id") === 0).collect().head
    // scalars mirror the stub feature vector: len, mean, max, min
    assert(r.getDouble(2) === r.getInt(1).toDouble)
    assert(r.getDouble(4) <= 255.0 && r.getDouble(5) >= 0.0)
    assert(r.getDouble(3) >= r.getDouble(5) && r.getDouble(3) <= r.getDouble(4))
  }
}
