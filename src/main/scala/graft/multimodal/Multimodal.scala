package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.F).
  *
  * Media payloads are opaque `binary` columns + a DECLARED media-type
  * column + typed metadata. The decode slot REALLY decodes three
  * public formats — binary PPM (P6) images ([[decodePpm]]), PNG
  * images ([[decodePng]] — chunk CRCs + DEFLATE raster via
  * java.util.zip, all five scanline filters), and RIFF WAV-PCM
  * audio ([[decodeWavPcm]]): pure-JVM parse + exact
  * pixel/sample stats, no codec libs, byte-exact against known
  * fixtures in MultimodalSpec. Dispatch is on the declared media type
  * (never content sniffing — a text payload that happens to parse as
  * a 1×1 PPM must NOT silently decode), and a declared-but-invalid
  * payload falls back to the deterministic STUB, as do all formats
  * whose codecs this container lacks (JPEG/MP4/...). Everything
  * Spark-side (schema, binary handling, partition batching, feature
  * schema) is real either way.
  */
object Multimodal {

  /** mm_binary_meta: binary payload + metadata extraction — byte
    * length, sha256 fingerprint, cheap format sniff on the leading
    * byte. All codegen'd built-ins over a binary column.
    */
  val binaryMeta = GraftQuery(
    "mm_binary_meta",
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS sha,
             CASE WHEN ascii(substr(text, 1, 1)) BETWEEN 97 AND 109 THEN 'lo'
                  WHEN ascii(substr(text, 1, 1)) BETWEEN 110 AND 122 THEN 'hi'
                  ELSE 'other' END AS kind
      FROM documents
      ORDER BY doc_id"""),
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          sha2(encode(col("text"), "UTF-8"), 256).as("sha"),
          when(ascii(substring(col("text"), 1, 1)).between(97, 109), "lo")
            .when(ascii(substring(col("text"), 1, 1)).between(110, 122), "hi")
            .otherwise("other").as("kind"))
        .orderBy("doc_id"),
  )

  /** Real decode of the binary PPM (P6) image format — a public,
    * codec-less format (netpbm): ASCII header `P6 <w> <h> <maxval>`
    * (any whitespace runs between tokens, `#` comments to end of line,
    * exactly ONE whitespace byte before the raster), then w·h packed
    * RGB triplets. Returns the pixel-stat feature vector
    * [w, h, meanR, meanG, meanB] — exact integer channel sums, one
    * double division each, so the features are bit-reproducible
    * (byte-exact fixture gate in MultimodalSpec).
    *
    * STRICT validation (None → caller falls back to the stub path):
    * magic, all three header ints present and in range (maxval ≤ 255 —
    * the 1-byte-per-sample variant), and the raster length EXACTLY
    * w·h·3 with no trailing bytes — so a text payload that merely
    * starts with "P6" can never half-decode.
    */
  private[graft] def decodePpm(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isWs(b: Byte): Boolean = {
      val c = b & 0xff
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == 0x0c
    }
    def skipWs(): Boolean = {
      var seen = false
      var go = true
      while (go && i < bytes.length) {
        if (isWs(bytes(i))) { i += 1; seen = true }
        else if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          seen = true
        } else go = false
      }
      seen
    }
    def readInt(): Long = {
      var v = -1L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' &&
             v <= Int.MaxValue) {
        v = (if (v < 0) 0L else v) * 10 + (bytes(i) - '0')
        i += 1
      }
      if (v > Int.MaxValue) -1L else v
    }
    if (!skipWs()) return None
    val w = readInt()
    if (w <= 0) return None
    if (!skipWs()) return None
    val h = readInt()
    if (h <= 0) return None
    if (!skipWs()) return None
    val maxval = readInt()
    if (maxval <= 0 || maxval > 255) return None
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    val np = w * h
    if (np > Int.MaxValue / 3 || bytes.length - i != np * 3) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = i
    var j = 0L
    while (j < np) {
      sr += bytes(p) & 0xff; sg += bytes(p + 1) & 0xff; sb += bytes(p + 2) & 0xff
      p += 3; j += 1
    }
    Some(Array(w.toDouble, h.toDouble,
      sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
  }

  /** Real decode of RIFF WAV with integer PCM samples — the other
    * public codec-less format (RIFF container grammar + raw samples):
    * `RIFF <size> WAVE`, then a chunk walk to `fmt ` (audioFormat 1 =
    * PCM, 8- or 16-bit) and `data`. Returns the sample-stat feature
    * vector [n_channels, sample_rate, n_frames, meanAbsAmp, maxAbsAmp]
    * — exact integer amplitude sums (8-bit unsigned centered at 128,
    * 16-bit signed little-endian), one double division, so the
    * features are bit-reproducible (byte-exact fixture gate in
    * MultimodalSpec).
    *
    * STRICT validation (None → caller falls back to the stub path):
    * RIFF size must equal the payload exactly, fmt must be integer PCM
    * with self-consistent blockAlign/byteRate, the data chunk must be
    * a whole number of frames and (modulo RIFF's odd-size pad byte)
    * end exactly at the payload end, and no chunk may overrun.
    */
  private[graft] def decodeWavPcm(bytes: Array[Byte]): Option[Array[Double]] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def tag(i: Int, t: String): Boolean =
      i + 4 <= bytes.length && (0 until 4).forall(j => bytes(i + j) == t.charAt(j))
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    if (u32(4) != bytes.length - 8L) return None
    var i = 12
    var channels = -1; var sampleRate = -1L; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= bytes.length) {
      val sz = u32(i + 4)
      val body = i + 8
      if (body + sz > bytes.length) return None
      if (tag(i, "fmt ")) {
        if (sz < 16) return None
        if (u16(body) != 1) return None // integer PCM only
        channels = u16(body + 2)
        sampleRate = u32(body + 4)
        val byteRate = u32(body + 8)
        blockAlign = u16(body + 12)
        bits = u16(body + 14)
        if (channels < 1 || channels > 8 || sampleRate <= 0) return None
        if (bits != 8 && bits != 16) return None
        if (blockAlign != channels * (bits / 8)) return None
        if (byteRate != sampleRate * blockAlign) return None
      } else if (tag(i, "data")) {
        dataOff = body; dataLen = sz
      }
      i = body + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
    }
    if (i != bytes.length) return None
    if (channels < 0 || dataOff < 0) return None
    if (blockAlign <= 0 || dataLen % blockAlign != 0) return None
    val nSamples = dataLen / (bits / 8)
    var sumAbs = 0L; var maxAbs = 0L
    var p = dataOff
    val end = dataOff + dataLen.toInt
    if (bits == 8) {
      while (p < end) {
        val a = math.abs((bytes(p) & 0xff) - 128).toLong
        sumAbs += a; if (a > maxAbs) maxAbs = a
        p += 1
      }
    } else {
      while (p < end) {
        val s = ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort
        val a = math.abs(s.toLong)
        sumAbs += a; if (a > maxAbs) maxAbs = a
        p += 2
      }
    }
    val nFrames = dataLen / blockAlign
    Some(Array(channels.toDouble, sampleRate.toDouble, nFrames.toDouble,
      if (nSamples == 0) 0.0 else sumAbs.toDouble / nSamples, maxAbs.toDouble))
  }

  /** Real decode of PNG — the third public codec-less-on-the-JVM
    * format: the container is chunks with CRC32s and the raster is
    * DEFLATE, both in java.util.zip (Inflater/CRC32), no codec libs.
    * Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4
    * (gray+alpha), 6 (RGBA), no interlace — the shapes PNG encoders
    * emit for photographic/synthetic data. Scanline filters 0–4
    * (None/Sub/Up/Average/Paeth) are fully reconstructed per the
    * spec's byte-recurrences, then the feature vector is the SAME
    * shape as [[decodePpm]]'s: [w, h, meanR, meanG, meanB] with
    * gray broadcast to all three channels and alpha excluded — so
    * the same pixels encoded as PPM and as PNG produce IDENTICAL
    * features (pinned in MultimodalSpec).
    *
    * STRICT validation (None → caller falls back to the stub path):
    * 8-byte signature, IHDR first, EVERY chunk CRC32 verified, chunk
    * walk must end exactly at the payload end with IEND last and
    * empty, inflated raster must be exactly h·(1 + w·bpp) bytes with
    * a valid filter id on every scanline, and the inflater must
    * consume ALL compressed input — so a truncated or padded payload
    * can never half-decode.
    */
  private[graft] def decodePng(bytes: Array[Byte]): Option[Array[Double]] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 8 + 25 || !sig.indices.forall(j => bytes(j) == sig(j)))
      return None
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
      ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def tag(i: Int): String =
      new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // chunk walk: verify every CRC (type + data), collect IHDR + IDAT
    var i = 8
    var w = -1L; var h = -1L; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (i < bytes.length && !sawIend) {
      if (i + 12 > bytes.length) return None
      val len = u32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return None
      val t = tag(i)
      crc.reset(); crc.update(bytes, i + 4, 4 + len.toInt)
      if (crc.getValue != u32(i + 8 + len.toInt)) return None
      t match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          w = u32(i + 8); h = u32(i + 12)
          val bitDepth = bytes(i + 16) & 0xff
          colorType = bytes(i + 17) & 0xff
          val (compression, filter, interlace) =
            (bytes(i + 18) & 0xff, bytes(i + 19) & 0xff, bytes(i + 20) & 0xff)
          if (w <= 0 || h <= 0 || w * h > Int.MaxValue / 8) return None
          if (bitDepth != 8 || compression != 0 || filter != 0 ||
              interlace != 0) return None
          if (colorType != 0 && colorType != 2 && colorType != 4 &&
              colorType != 6) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, i + 8, len.toInt)
        case "IEND" =>
          if (!sawIhdr || len != 0) return None
          sawIend = true
        case _ =>
          if (!sawIhdr) return None // ancillary chunks only after IHDR
      }
      i += 12 + len.toInt
    }
    if (!sawIend || i != bytes.length) return None
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    val stride = (w * bpp).toInt
    val rasterLen = (h * (1 + stride)).toInt
    // decompression-bomb guard: the raster buffer is allocated from
    // the DECLARED dims before inflating, so bound it by DEFLATE's
    // maximum expansion (~1032:1) over the actual compressed bytes —
    // a 100-byte payload declaring a gigapixel IHDR allocates nothing
    if (rasterLen > 1040L * idat.size() + 65536L) return None
    // +1 spare byte: a stream longer than the raster overflows into it
    // and fails the exact-length check below (inflate() is not
    // guaranteed to drain in one call, so loop to finished())
    val buf = new Array[Byte](rasterLen + 1)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      var stuck = false
      while (!inf.finished() && got < buf.length && !stuck) {
        val n = inf.inflate(buf, got, buf.length - got)
        if (n == 0 && !inf.finished()) stuck = true // truncated stream
        got += n
      }
      if (!inf.finished() || inf.getRemaining > 0) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got != rasterLen) return None
    val raster = buf
    // defilter in place into `px` (h rows × stride bytes)
    val px = new Array[Byte](h.toInt * stride)
    var row = 0
    while (row < h) {
      val fOff = row * (1 + stride)
      val ft = raster(fOff) & 0xff
      if (ft > 4) return None
      val out = row * stride
      val prev = out - stride
      var x = 0
      while (x < stride) {
        val rawB = raster(fOff + 1 + x) & 0xff
        val a = if (x >= bpp) px(out + x - bpp) & 0xff else 0
        val b = if (row > 0) px(prev + x) & 0xff else 0
        val c = if (row > 0 && x >= bpp) px(prev + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => rawB
          case 1 => rawB + a
          case 2 => rawB + b
          case 3 => rawB + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            rawB + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        px(out + x) = (rec & 0xff).toByte
        x += 1
      }
      row += 1
    }
    // channel means, alpha excluded; gray broadcast to R=G=B
    val np = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < px.length) {
      colorType match {
        case 0 | 4 =>
          val v = px(p) & 0xff
          sr += v; sg += v; sb += v
        case 2 | 6 =>
          sr += px(p) & 0xff; sg += px(p + 1) & 0xff; sb += px(p + 2) & 0xff
      }
      p += bpp
    }
    Some(Array(w.toDouble, h.toDouble,
      sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
  }

  /** The stub for formats without a pure-JVM decode: a real pipeline
    * would decode other media payloads here (JPEG/MP4/... — codec libs
    * absent from this container by declaration). Deterministic fake
    * features derived from the bytes, so the oracle replays them.
    */
  private def stubDecode(bytes: Array[Byte]): Array[Double] = {
    // STUB — stands in for codec output; deterministic in the bytes.
    val n = bytes.length.max(1)
    val mean = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    val mx = if (bytes.isEmpty) 0.0 else (bytes.map(b => b & 0xff).max).toDouble
    val mn = if (bytes.isEmpty) 0.0 else (bytes.map(b => b & 0xff).min).toDouble
    Array(n.toDouble, mean, mx, mn)
  }

  /** Per-batch decode dispatch, keyed on the DECLARED media type —
    * content sniffing is forbidden here: a text payload that happens
    * to strictly parse as a 1×1 PPM (e.g. "P6 1 1 255 abc") must take
    * the text path, or the features silently diverge from what the
    * caller declared. A declared-but-invalid payload falls back to
    * the stub. Signature and batch shape match what a vectorized
    * codec-backed decoder would use: batch of (payload, format) →
    * batch of features.
    */
  private def decodeBatch(
      payloads: Seq[Array[Byte]], formats: Seq[String]): Seq[Array[Double]] =
    payloads.lazyZip(formats).map { (b, fmt) =>
      fmt match {
        case "image/ppm" => decodePpm(b).getOrElse(stubDecode(b))
        case "image/png" => decodePng(b).getOrElse(stubDecode(b))
        case "audio/wav" => decodeWavPcm(b).getOrElse(stubDecode(b))
        case _           => stubDecode(b)
      }
    }

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(DoubleType)),
  ))

  /** Partition-batched decode/feature pipeline over any
    * (doc_id: long, payload: binary, format: string) frame —
    * mapPartitions with fixed-size batches (the shape a vectorized
    * codec needs), no shuffle: features are computed where the bytes
    * live. `format` is the caller-declared media type per row
    * ("image/ppm" and "audio/wav" get the real decodes); decode
    * dispatch never sniffs content. Returns
    * (doc_id, n_bytes, features: array<double>).
    */
  def extractFeatures(src: DataFrame, batchSize: Int = 32): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(_.getLong(0))
        val payloads = batch.map(_.getAs[Array[Byte]](1))
        val formats = batch.map(_.getString(2))
        val feats = decodeBatch(payloads, formats)
        ids.lazyZip(payloads).lazyZip(feats).map { (id, p, f) =>
          Row(id, p.length, f)
        }
      }
    }(enc)
  }

  /** mm_feature_extract: the canned harness entry over documents.
    * Document payloads are DECLARED "text/plain", so dispatch routes
    * every row to the stub path BY DECLARATION — not by content
    * sniffing, which could silently real-decode a text payload that
    * happens to parse as a tiny PPM. The stub features are pure byte
    * arithmetic (length, unsigned-byte mean/max/min — exact integer
    * sums, one double division) that the oracle replays in DuckDB by
    * hex-decoding the same blob: the whole partition-batched decode
    * pipeline is hash-checked, not just row-counted. The REAL decode
    * branches ([[decodePpm]], [[decodeWavPcm]]) are fixture-gated
    * byte-exactly in MultimodalSpec. Library users take
    * extractFeatures' array column directly; the harness gets the
    * features as scalars.
    */
  val featureExtract = GraftQuery(
    "mm_feature_extract",
    Some("""
      WITH d AS (SELECT doc_id, encode(text) AS b FROM documents),
      x AS (SELECT doc_id, b, list_transform(range(0, octet_length(b)), __bi ->
              CAST('0x' || substr(hex(b), 2*__bi + 1, 2) AS INT)) AS bytes FROM d)
      SELECT doc_id, octet_length(b) AS n_bytes,
             CAST(greatest(octet_length(b), 1) AS DOUBLE) AS feat_len,
             CAST(coalesce(list_sum(bytes), 0) AS DOUBLE) / greatest(octet_length(b), 1)
               AS feat_mean,
             CAST(coalesce(list_max(bytes), 0) AS DOUBLE) AS feat_max,
             CAST(coalesce(list_min(bytes), 0) AS DOUBLE) AS feat_min
      FROM x
      ORDER BY doc_id"""),
    (s, d) => {
      val src = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("format"))
      extractFeatures(src)
        .select(col("doc_id"), col("n_bytes"),
          element_at(col("features"), 1).as("feat_len"),
          element_at(col("features"), 2).as("feat_mean"),
          element_at(col("features"), 3).as("feat_max"),
          element_at(col("features"), 4).as("feat_min"))
        .orderBy("doc_id")
    },
  )

  /** mm_frame_sample: frame-sampling over a binary payload — the video
    * keyframe pattern: payload → fixed-size frames → every k-th frame →
    * per-frame fingerprint. Pure codegen'd expressions (sequence /
    * explode / substring / sha2); no shuffle — frames are derived where
    * the bytes live. Probe set doc_id < 100 bounds the output.
    */
  val frameSample = GraftQuery(
    "mm_frame_sample",
    Some("""
      WITH f AS (SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents WHERE doc_id < 100),
      x AS (SELECT doc_id, text, unnest(range(0, n_frames)) AS frame_idx FROM f)
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             sha256(substr(text, CAST(frame_idx * 16 + 1 AS INT), 16)) AS frame_sha
      FROM x
      WHERE frame_idx % 4 = 0
      ORDER BY doc_id, frame_idx"""),
    (s, d) => {
      val nFrames = (length(col("text")) / 16).cast("int")
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"),
          explode(when(nFrames >= 1, sequence(lit(0), nFrames - 1))
            .otherwise(array().cast("array<int>"))).as("frame_idx"))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("doc_id"), col("frame_idx"),
          sha2(encode(expr("substring(text, frame_idx * 16 + 1, 16)"), "UTF-8"), 256)
            .as("frame_sha"))
        .orderBy("doc_id", "frame_idx")
    },
  )

  /** mm_resize: payload downsample — the image-resize slot in the
    * pipeline. A real deployment decodes and resamples pixels; the
    * container has no codecs, so the stand-in is a deterministic 2:1
    * byte decimation (keep the first of every pair) with the output's
    * size + fingerprint tracked like a resized asset would be. Pure
    * map over the scan; no shuffle.
    */
  val resize = GraftQuery(
    "mm_resize",
    Some("""
      SELECT doc_id,
             length(text) AS n_bytes,
             length(regexp_replace(text, '(.).', '\1', 'g')) AS resized_bytes,
             sha256(regexp_replace(text, '(.).', '\1', 'g')) AS resized_sha
      FROM documents
      ORDER BY doc_id"""),
    (s, d) => {
      val resized = regexp_replace(col("text"), "(.).", "$1")
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("n_bytes"),
          length(resized).as("resized_bytes"),
          sha2(encode(resized, "UTF-8"), 256).as("resized_sha"))
        .orderBy("doc_id")
    },
  )

  /** mm_chunk_dedup: cross-document sub-payload dedup — the storage
    * dedup application of content-defined chunking: a chunk fingerprint
    * occurring in two different payloads is a byte range the chunk
    * store keeps ONCE. Surfaces every fingerprint shared by ≥2 docs
    * with its document spread, occurrence count, and the bytes saved by
    * single-instancing it (one groupBy over the chunk table).
    */
  val chunkDedup = GraftQuery(
    "mm_chunk_dedup",
    Some(s"""
      ${graft.dedup.Dedup.CdcChunksCte}
      SELECT chunk_fp,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_occurrences,
             MIN(chunk_len) AS chunk_len,
             CAST((COUNT(*) - 1) * MIN(chunk_len) AS BIGINT) AS bytes_saved
      FROM chunks
      GROUP BY chunk_fp
      HAVING COUNT(DISTINCT doc_id) >= 2
      ORDER BY bytes_saved DESC, chunk_fp"""),
    (s, d) =>
      graft.dedup.Dedup.cdcChunks.run(s, d)
        .groupBy("chunk_fp")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("chunk_len")).as("chunk_len"),
          ((count(lit(1)) - 1) * min(col("chunk_len"))).cast("long").as("bytes_saved"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("bytes_saved").desc, col("chunk_fp")),
  )

  def all: Seq[GraftQuery] =
    Seq(binaryMeta, featureExtract, frameSample, resize, chunkDedup)
}
