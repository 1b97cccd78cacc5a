package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing (§2.F): feature-extract batching, stub
  * determinism, declared-format decode dispatch (PPM / WAV-PCM), and
  * the harness-facing scalar projection.
  */
class MultimodalSpec extends SparkSpec {

  // 2x2 P6 image, maxval 255, pixels (R,G,B):
  //   (10,20,30) (50,60,70)
  //   (90,100,110) (130,140,150)
  // expected: w=2 h=2 meanR=(10+50+90+130)/4=70 meanG=80 meanB=90
  private val ppmHeader = "P6\n2 2\n255\n".getBytes("US-ASCII")
  private val ppmRaster = Array(10, 20, 30, 50, 60, 70, 90, 100, 110, 130, 140, 150)
    .map(_.toByte)
  private val ppm = ppmHeader ++ ppmRaster

  /** Build a strict RIFF WAV-PCM payload: 16-bit LE mono unless told
    * otherwise. Sample values are signed shorts.
    */
  private def wav(samples: Seq[Int], channels: Int = 1, rate: Int = 8000,
      bits: Int = 16): Array[Byte] = {
    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val dataLen = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    tag("RIFF"); w32(4 + 24 + 8 + dataLen + (dataLen & 1)); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(channels); w32(rate.toLong)
    w32(rate.toLong * blockAlign); w16(blockAlign); w16(bits)
    tag("data"); w32(dataLen.toLong)
    if (bits == 8) samples.foreach(s => out.write(s & 0xff))
    else samples.foreach(w16)
    if ((dataLen & 1) == 1) out.write(0) // RIFF pad
    out.toByteArray
  }

  test("extractFeatures: 4-dim stub features for declared text, deterministic") {
    val src = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("format"))
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
    // fixture with comments + mixed whitespace in the header — the
    // netpbm grammar the parser must accept
    val commented = ("P6 # a comment\n# another\n 2\t2 # dims\n255\n")
      .getBytes("US-ASCII") ++ ppmRaster
    import spark.implicits._
    val src = Seq((0L, ppm, "image/ppm"), (1L, commented, "image/ppm"))
      .toDF("doc_id", "payload", "format")
    val out = graft.multimodal.Multimodal.extractFeatures(src)
      .orderBy("doc_id").collect()
    for (r <- out) {
      val f = r.getSeq[Double](2)
      assert(f === Seq(2.0, 2.0, 70.0, 80.0, 90.0),
        s"doc ${r.getLong(0)} decoded $f")
      assert(r.getInt(1) === ppm.length || r.getInt(1) === commented.length)
    }
    // strictness: a payload DECLARED image/ppm that doesn't strictly
    // validate (wrong raster length / non-numeric header) falls back
    // to the stub — declared-but-corrupt media can never half-decode
    val fakes = Seq(
      "P6 but actually prose about image formats".getBytes("US-ASCII"),
      ppmHeader ++ ppmRaster.dropRight(1), // truncated raster
      ppmHeader ++ ppmRaster ++ Array(7.toByte)) // trailing junk
    val stubbed = graft.multimodal.Multimodal.extractFeatures(
      fakes.zipWithIndex.map { case (b, i) => (i.toLong, b, "image/ppm") }
        .toDF("doc_id", "payload", "format")).collect()
    for (r <- stubbed) {
      val f = r.getSeq[Double](2)
      assert(f.length === 4, s"fake ${r.getLong(0)} took the PPM path: $f")
      assert(f(0) === r.getInt(1).toDouble) // stub feature 0 = byte length
    }
  }

  test("decodeWavPcm: known WAV fixtures decode byte-exactly; corrupt ones stub") {
    import spark.implicits._
    // 16-bit mono: samples 100, -200, 300, -400
    //   meanAbs = (100+200+300+400)/4 = 250, maxAbs = 400, frames = 4
    val w16 = wav(Seq(100, -200, 300, -400))
    // 8-bit stereo @ 11025: unsigned bytes 128,138,118,128 → amps 0,10,10,0
    //   frames = 2, meanAbs = 20/4 = 5, maxAbs = 10
    val w8 = wav(Seq(128, 138, 118, 128), channels = 2, rate = 11025, bits = 8)
    // odd-length data chunk (3 samples of 8-bit mono) exercises the
    // RIFF pad-byte rule: 135,128,121 → amps 7,0,7 → meanAbs 14/3
    val wOdd = wav(Seq(135, 128, 121), bits = 8)
    val src = Seq((0L, w16, "audio/wav"), (1L, w8, "audio/wav"),
      (2L, wOdd, "audio/wav")).toDF("doc_id", "payload", "format")
    val out = graft.multimodal.Multimodal.extractFeatures(src)
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Double](2) === Seq(1.0, 8000.0, 4.0, 250.0, 400.0))
    assert(out(1).getSeq[Double](2) === Seq(2.0, 11025.0, 2.0, 5.0, 10.0))
    assert(out(2).getSeq[Double](2) === Seq(1.0, 8000.0, 3.0, 14.0 / 3.0, 7.0))
    // strictness: declared audio/wav but corrupt → stub (4-dim)
    val truncated = w16.dropRight(1)
    val badSize = w16.clone(); badSize(4) = (badSize(4) + 1).toByte // RIFF size off-by-one
    val notPcm = w16.clone(); notPcm(20) = 3 // audioFormat = IEEE float
    val fakes = Seq(truncated, badSize, notPcm,
      "RIFF but actually prose about audio".getBytes("US-ASCII"))
    val stubbed = graft.multimodal.Multimodal.extractFeatures(
      fakes.zipWithIndex.map { case (b, i) => (i.toLong, b, "audio/wav") }
        .toDF("doc_id", "payload", "format")).collect()
    for (r <- stubbed)
      assert(r.getSeq[Double](2).length === 4,
        s"corrupt wav ${r.getLong(0)} took the real path")
  }

  test("dispatch is by declaration, never content sniffing") {
    import spark.implicits._
    // a payload that IS a strictly-valid P6 raster ("P6 1 1 255 abc"
    // shape) but is DECLARED text must take the stub path — the
    // latent-divergence case the format column exists to prevent
    val tinyPpm = "P6 1 1 255 ".getBytes("US-ASCII") ++ "abc".getBytes("US-ASCII")
    assert(graft.multimodal.Multimodal.decodePpm(tinyPpm).isDefined,
      "fixture must strictly validate as PPM for this test to bite")
    val src = Seq((0L, tinyPpm, "text/plain"), (1L, tinyPpm, "image/ppm"),
      (2L, wav(Seq(1, 2)), "application/octet-stream"))
      .toDF("doc_id", "payload", "format")
    val out = graft.multimodal.Multimodal.extractFeatures(src)
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Double](2).length === 4, "declared text must stub")
    assert(out(1).getSeq[Double](2) === Seq(1.0, 1.0, 97.0, 98.0, 99.0))
    assert(out(2).getSeq[Double](2).length === 4, "undeclared wav must stub")
  }

  /** Test-side PNG encoder: real chunks (CRC32'd), real DEFLATE, one
    * selectable scanline filter per row — so the decoder's five
    * filter reconstructions are each exercised against ground truth.
    * `pixels(row)(x)` are per-channel bytes, `bpp` channels per pixel.
    */
  private def png(w: Int, h: Int, colorType: Int,
                  pixels: Array[Array[Int]],
                  rowFilter: Int => Int = _ => 0): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
    val stride = w * bpp
    val raw = new java.io.ByteArrayOutputStream()
    for (row <- 0 until h) {
      val f = rowFilter(row)
      raw.write(f)
      for (x <- 0 until stride) {
        val cur = pixels(row)(x)
        val a = if (x >= bpp) pixels(row)(x - bpp) else 0
        val b = if (row > 0) pixels(row - 1)(x) else 0
        val c = if (row > 0 && x >= bpp) pixels(row - 1)(x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      (3 to 0 by -1).foreach(j => o.write(((v >> (8 * j)) & 0xff).toInt))
    def chunk(t: String, data: Array[Byte]): Unit = {
      be32(out, data.length.toLong)
      val td = t.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32(); crc.update(td)
      be32(out, crc.getValue)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    be32(ihdr, w.toLong); be32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  test("decodePng: same pixels as PPM decode to IDENTICAL features; all 5 filters") {
    import spark.implicits._
    // the PPM fixture's 2x2 RGB pixels as PNG colorType 2
    val px2x2 = Array(Array(10, 20, 30, 50, 60, 70),
      Array(90, 100, 110, 130, 140, 150))
    val pngRgb = png(2, 2, 2, px2x2)
    assert(graft.multimodal.Multimodal.decodePng(pngRgb).get.toSeq ===
      graft.multimodal.Multimodal.decodePpm(ppm).get.toSeq)
    // 4x5 RGB exercising every filter type (row i uses filter i),
    // values chosen to wrap the mod-256 byte recurrences
    val rnd = new scala.util.Random(42)
    val px = Array.fill(5)(Array.fill(4 * 3)(rnd.nextInt(256)))
    val pngF = png(4, 5, 2, px, rowFilter = i => i)
    val f = graft.multimodal.Multimodal.decodePng(pngF).get
    val meanCh = (ch: Int) =>
      px.flatMap(_.grouped(3).map(_(ch))).sum.toDouble / 20
    assert(f.toSeq === Seq(4.0, 5.0, meanCh(0), meanCh(1), meanCh(2)))
    // grayscale broadcast + alpha exclusion
    val gray = png(3, 1, 0, Array(Array(10, 20, 60)))
    assert(graft.multimodal.Multimodal.decodePng(gray).get.toSeq ===
      Seq(3.0, 1.0, 30.0, 30.0, 30.0))
    val grayA = png(2, 1, 4, Array(Array(10, 255, 30, 0))) // alpha ignored
    assert(graft.multimodal.Multimodal.decodePng(grayA).get.toSeq ===
      Seq(2.0, 1.0, 20.0, 20.0, 20.0))
    val rgba = png(1, 2, 6, Array(Array(10, 20, 30, 255), Array(30, 40, 50, 0)))
    assert(graft.multimodal.Multimodal.decodePng(rgba).get.toSeq ===
      Seq(1.0, 2.0, 20.0, 30.0, 40.0))
    // through the batched pipeline under the declared format
    val out = graft.multimodal.Multimodal.extractFeatures(
      Seq((0L, pngRgb, "image/png")).toDF("doc_id", "payload", "format"))
      .collect().head
    assert(out.getSeq[Double](2) === Seq(2.0, 2.0, 70.0, 80.0, 90.0))
  }

  test("decodePng strictness: corrupt/unsupported payloads stub, never half-decode") {
    import spark.implicits._
    val good = png(2, 2, 2, Array(Array(10, 20, 30, 50, 60, 70),
      Array(90, 100, 110, 130, 140, 150)))
    val badCrc = good.clone(); badCrc(badCrc.length - 5) =
      (badCrc(badCrc.length - 5) ^ 1).toByte // flip a bit in IEND's CRC
    val truncated = good.dropRight(1)
    val trailing = good ++ Array(7.toByte)
    val interlaced = good.clone(); interlaced(8 + 8 + 12) = 1 // Adam7 flag
    val depth16 = good.clone(); depth16(8 + 8 + 8) = 16
    val palette = good.clone(); palette(8 + 8 + 9) = 3
    // header-field mutations invalidate IHDR's CRC too, which is the
    // point: the decoder must reject them either way
    val fakes = Seq(badCrc, truncated, trailing, interlaced, depth16,
      palette, "PNG but actually prose".getBytes("US-ASCII"))
    for ((b, i) <- fakes.zipWithIndex)
      assert(graft.multimodal.Multimodal.decodePng(b).isEmpty,
        s"fake $i decoded")
    val stubbed = graft.multimodal.Multimodal.extractFeatures(
      fakes.zipWithIndex.map { case (b, i) => (i.toLong, b, "image/png") }
        .toDF("doc_id", "payload", "format")).collect()
    for (r <- stubbed)
      assert(r.getSeq[Double](2).length === 4,
        s"corrupt png ${r.getLong(0)} took the real path")
    // declared text/plain never content-sniffs into the PNG path
    val declaredText = graft.multimodal.Multimodal.extractFeatures(
      Seq((0L, good, "text/plain")).toDF("doc_id", "payload", "format"))
      .collect().head
    assert(declaredText.getSeq[Double](2).length === 4)
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
