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

  test("decodePpm: a known P6 fixture decodes byte-exactly through the batched pipeline") {
    // 2x2 image, maxval 255, pixels (R,G,B):
    //   (10,20,30) (50,60,70)
    //   (90,100,110) (130,140,150)
    // expected: w=2 h=2 meanR=(10+50+90+130)/4=70 meanG=80 meanB=90
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(10, 20, 30, 50, 60, 70, 90, 100, 110, 130, 140, 150)
      .map(_.toByte)
    val ppm = header ++ raster
    // fixture with comments + mixed whitespace in the header — the
    // netpbm grammar the parser must accept
    val commented = ("P6 # a comment\n# another\n 2\t2 # dims\n255\n")
      .getBytes("US-ASCII") ++ raster
    import spark.implicits._
    val src = Seq((0L, ppm), (1L, commented)).toDF("doc_id", "payload")
    val out = graft.multimodal.Multimodal.extractFeatures(src)
      .orderBy("doc_id").collect()
    for (r <- out) {
      val f = r.getSeq[Double](2)
      assert(f === Seq(2.0, 2.0, 70.0, 80.0, 90.0),
        s"doc ${r.getLong(0)} decoded $f")
      assert(r.getInt(1) === ppm.length || r.getInt(1) === commented.length)
    }
    // strictness: a payload that merely STARTS like a PPM falls back
    // to the stub (wrong raster length / non-numeric header), so text
    // corpora can never half-decode
    val fakes = Seq(
      "P6 but actually prose about image formats".getBytes("US-ASCII"),
      header ++ raster.dropRight(1), // truncated raster
      header ++ raster ++ Array(7.toByte)) // trailing junk
    val stubbed = graft.multimodal.Multimodal.extractFeatures(
      fakes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("doc_id", "payload")).collect()
    for (r <- stubbed) {
      val f = r.getSeq[Double](2)
      assert(f.length === 4, s"fake ${r.getLong(0)} took the PPM path: $f")
      assert(f(0) === r.getInt(1).toDouble) // stub feature 0 = byte length
    }
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
