package thrivespark.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star requirement): media as opaque
  * BINARY columns + typed metadata, with decode/feature-extract implemented
  * as a distributed mapPartitions stage.
  *
  * The IMAGE path is REAL (r9): fixtures are genuine binary P6 PPM images
  * (deterministically generated — no image library needed to WRITE an
  * uncompressed format), and `decodePpm` is a real parser: it validates the
  * magic, skips whitespace/comments per the PPM grammar, reads the
  * width/height/maxval header and aggregates the interleaved RGB raster
  * into exact integer features — including (r12) a REAL 8×8 grayscale
  * box-filter thumbnail computed from the decoded raster. Because the
  * planted pixel function is closed-form in (media_id, x, y, channel), the
  * features are exactly recomputable by the DuckDB oracle — the decode AND
  * the downsample are differentially tested end-to-end, not just
  * shape-checked.
  *
  * The AUDIO (r12, RIFF/WAVE PCM) and VIDEO (r12, YUV4MPEG2) paths repeat
  * the same move: generate a genuine uncompressed container
  * deterministically, parse it for real, oracle every integer feature.
  * All three modalities have real decoders (r12); the early generic
  * resize/frame-sample stub surface was fully retired in r19 — payload
  * formats with no in-container codec (e.g. JPEG/H.264) would slot a real
  * library decoder into the same mapPartitions signatures used below. */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),    // opaque bytes
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  // ---------------------------------------------------------------- PPM ---

  /** Planted pixel function: value of channel c at (x, y) for image `id`.
    * Closed-form so the DuckDB oracle can recompute every feature exactly
    * (SURVEY §2 oracle discipline — differential, not shape-only). */
  @inline def ppmPixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((3 * id + x + 2L * y + 37L * c) % 256).toInt

  def ppmWidth(id: Long): Int  = 8 + (id % 9).toInt
  def ppmHeight(id: Long): Int = 8 + (id % 7).toInt

  /** Deterministic P6 PPM encoder: ASCII header ("P6\nW H\n255\n") followed
    * by the binary interleaved-RGB raster, row-major. This is a REAL image
    * file — `file` calls it "Netpbm image data"; any PPM reader decodes it. */
  def ppmBytes(id: Long): Array[Byte] = {
    val w = ppmWidth(id); val h = ppmHeight(id)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { out(p) = ppmPixel(id, x, y, c).toByte; p += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Exact decoded features: dims, raster size, per-channel mean in integer
    * micros (floor(sum * 1e6 / n_pixels) — integer math end-to-end, so no
    * float-rounding hazard between engines), plus the REAL 8×8 grayscale
    * box-filter thumbnail computed from the decoded raster (r12 — a real
    * downsample of real pixels, differentially oracled). */
  final case class PpmFeatures(
      width: Int, height: Int, nPixelBytes: Int,
      rMeanMicros: Long, gMeanMicros: Long, bMeanMicros: Long,
      thumb: Array[Byte], thumbChecksum: Long)

  /** REAL P6 parser: magic check, whitespace/`#`-comment skipping per the
    * Netpbm grammar, three ASCII header ints, single whitespace, then the
    * raw raster. Throws on malformed input (wrong magic, short raster,
    * maxval > 255) — decode errors must surface, not silently zero. */
  def decodePpm(payload: Array[Byte]): PpmFeatures = {
    if (payload == null) return null
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM decode: $msg at byte $pos")
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') fail("bad magic")
    pos = 2
    def skipWs(): Unit = {
      var more = true
      while (more && pos < payload.length) {
        val b = payload(pos)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else if (b == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def readInt(): Int = {
      skipWs()
      if (pos >= payload.length || payload(pos) < '0' || payload(pos) > '9') fail("expected int")
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    // exactly one whitespace byte separates the header from the raster
    if (pos >= payload.length) fail("missing raster")
    pos += 1
    val n = w * h * 3
    if (payload.length - pos < n) fail(s"short raster: need $n, have ${payload.length - pos}")
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    // 8×8 box-filter accumulators: pixel (x,y) lands in cell
    // (x*8/w, y*8/h) — integer division, so for w,h ≥ 8 every cell is
    // nonempty and both engines compute identical cell membership; images
    // smaller than the grid leave some cells empty (emitted as 0).
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cj = y * 8 / h
      var x = 0
      while (x < w) {
        val p = pos + (y * w + x) * 3
        val r = payload(p) & 0xff
        val g = payload(p + 1) & 0xff
        val b = payload(p + 2) & 0xff
        rSum += r; gSum += g; bSum += b
        val cell = cj * 8 + x * 8 / w
        cellSum(cell) += r + g + b
        cellN(cell) += 1
        x += 1
      }
      y += 1
    }
    // thumbnail byte = mean gray of the cell's box, gray = (r+g+b)/3 —
    // floor((Σ r+g+b) / (3·n_box)), all nonnegative integer math so
    // floor ≡ truncation on both engines
    val thumb = new Array[Byte](64)
    var checksum = 0L
    var c = 0
    while (c < 64) {
      val v = if (cellN(c) == 0) 0L else cellSum(c) / (3L * cellN(c))
      thumb(c) = v.toByte
      checksum += v
      c += 1
    }
    val px = w.toLong * h
    PpmFeatures(w, h, n,
      rSum * 1000000L / px, gSum * 1000000L / px, bSum * 1000000L / px,
      thumb, checksum)
  }

  private val ppmEncode = udf(ppmBytes _)

  /** Media frame with REAL image payloads: one deterministic P6 PPM per
    * document id. The encode is fixture generation (map-only, codegen'd
    * input column); the decode stage below is the operator under test. */
  def mediaPpmFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"))
      .withColumn("kind", lit("image"))
      .withColumn("payload", ppmEncode(col("media_id")))

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_pixel_bytes", IntegerType, nullable = true),
    StructField("r_mean_micros", LongType, nullable = true),
    StructField("g_mean_micros", LongType, nullable = true),
    StructField("b_mean_micros", LongType, nullable = true),
    StructField("thumb", BinaryType, nullable = true),
    StructField("thumb_checksum", LongType, nullable = true)))

  /** Distributed feature extraction: partition-parallel REAL decode of the
    * binary PPM payload into exact per-image features. mapPartitions keeps
    * per-partition codec initialization amortized (the shape a heavier
    * codec needs); rows with null payloads pass through with null features.
    * No shuffle — a map-only stage over however the media table is
    * partitioned, so it scales linearly with executors at 100 TB. */
  def extractPpmFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffer pools, …)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val f = decodePpm(r.getAs[Array[Byte]](payIdx))
        if (f == null) Row(id, null, null, null, null, null, null, null, null)
        else Row(id, f.width, f.height, f.nPixelBytes,
          f.rMeanMicros, f.gMeanMicros, f.bMeanMicros, f.thumb, f.thumbChecksum)
      }
    }(enc)
  }

  // ----------------------------------------------------------------- WAV ---

  /** Planted sample function: 16-bit PCM sample i of clip `id`. Nonnegative
    * (0..4000) so every derived statistic is floor-of-nonnegative integer
    * math — identical under truncating and flooring division, hence exactly
    * recomputable by the DuckDB oracle (the PPM move repeated for audio). */
  @inline def wavSample(id: Long, i: Int): Int =
    ((7 * id + 11L * i) % 4001).toInt

  def wavNumSamples(id: Long): Int = 256 + (id % 41).toInt * 4
  val WavSampleRate = 8000

  /** Deterministic RIFF/WAVE encoder: canonical 44-byte header (PCM fmt
    * chunk) + 16-bit little-endian mono samples. This is a REAL audio file —
    * any WAV reader plays it; no codec library is needed to WRITE
    * uncompressed PCM, which is the whole point of the format choice. */
  def wavBytes(id: Long): Array[Byte] = {
    val n = wavNumSamples(id)
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                            // audioFormat = PCM
      .putShort(1)                            // channels = mono
      .putInt(WavSampleRate)
      .putInt(WavSampleRate * 2)              // byteRate
      .putShort(2)                            // blockAlign
      .putShort(16)                           // bitsPerSample
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { out.putShort(wavSample(id, i).toShort); i += 1 }
    out.array()
  }

  /** Exact decoded audio features: format fields straight from the parsed
    * fmt chunk, integer statistics over the PCM samples (mean in micros =
    * floor(sum·1e6 / n) — nonnegative integer math end-to-end). */
  final case class WavFeatures(
      sampleRate: Int, nSamples: Int, durationMs: Long,
      meanMicros: Long, peak: Int)

  /** REAL RIFF/WAVE parser: validates the RIFF/WAVE magic, then walks the
    * chunk list generically (any chunk order, unknown chunks skipped, odd
    * sizes padded per the RIFF spec) to find fmt and data. Only
    * uncompressed 16-bit mono PCM is supported; anything else throws —
    * decode errors must surface, not silently zero. */
  def decodeWav(payload: Array[Byte]): WavFeatures = {
    if (payload == null) return null
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV decode: $msg")
    if (payload.length < 12) fail("too short for a RIFF header")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int) = new String(payload, off, 4, "US-ASCII")
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") fail("bad RIFF/WAVE magic")
    var pos = 12
    var sampleRate = -1; var bits = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= payload.length) {
      val cid = ascii(pos)
      val csize = buf.getInt(pos + 4)
      if (csize < 0 || pos + 8 + csize > payload.length)
        fail(s"chunk '$cid' overruns payload")
      cid match {
        case "fmt " =>
          if (csize < 16) fail("fmt chunk too short")
          val audioFormat = buf.getShort(pos + 8)
          if (audioFormat != 1) fail(s"unsupported audio format $audioFormat")
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        case "data" => dataOff = pos + 8; dataLen = csize
        case _ => // unknown chunk: skip
      }
      pos += 8 + csize + (csize & 1)          // RIFF pads odd chunks
    }
    if (sampleRate < 0) fail("missing fmt chunk")
    if (dataOff < 0) fail("missing data chunk")
    if (channels != 1 || bits != 16) fail(s"unsupported layout: $channels ch, $bits bit")
    val n = dataLen / 2
    if (n == 0) fail("empty data chunk")
    // real signed PCM oscillates around 0: peak is the max ABSOLUTE
    // amplitude (an all-negative clip must not report 0), and the mean is
    // floorDiv (truncation would round a negative mean toward zero). On
    // the planted nonnegative fixture both are identical to the simpler
    // forms the oracle mirrors — the distinction only bites on real audio.
    var sum = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = buf.getShort(dataOff + i * 2).toInt
      sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    WavFeatures(sampleRate, n, n.toLong * 1000 / sampleRate,
      Math.floorDiv(sum * 1000000L, n.toLong), peak)
  }

  private val wavEncode = udf(wavBytes _)

  /** Media frame with REAL audio payloads: one deterministic PCM WAV per
    * document id (fixture generation, like mediaPpmFromDocuments). */
  def mediaWavFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"))
      .withColumn("kind", lit("audio"))
      .withColumn("payload", wavEncode(col("media_id")))

  private val wavFeatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("mean_micros", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true)))

  /** Distributed audio feature extraction: partition-parallel REAL decode of
    * the binary WAV payload. Same scale shape as extractPpmFeatures — a
    * map-only mapPartitions stage, zero shuffles, linear in executors. */
  def extractWavFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wavFeatSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val f = decodeWav(r.getAs[Array[Byte]](payIdx))
        if (f == null) Row(id, null, null, null, null, null)
        else Row(id, f.sampleRate, f.nSamples, f.durationMs, f.meanMicros, f.peak)
      }
    }(enc)
  }

  // ----------------------------------------------------------------- Y4M ---

  /** Planted luma function: gray value of pixel (x, y) in frame f of clip
    * `id`. Closed-form and nonnegative, so every derived statistic is
    * floor-of-nonnegative integer math — exactly recomputable by the DuckDB
    * oracle (the PPM/WAV move repeated for video). */
  @inline def y4mLuma(id: Long, f: Int, x: Int, y: Int): Int =
    ((5 * id + 13L * f + x + 3L * y) % 256).toInt

  def y4mWidth(id: Long): Int   = 8 + (id % 5).toInt * 2
  def y4mHeight(id: Long): Int  = 8 + (id % 3).toInt * 2
  def y4mFrames(id: Long): Int  = 6 + (id % 9).toInt
  val Y4mFps = 10

  /** Deterministic YUV4MPEG2 encoder: ASCII stream header
    * ("YUV4MPEG2 W.. H.. F10:1 Ip A1:1 Cmono\n") followed by n frames, each
    * a "FRAME\n" marker plus the raw w×h luma plane. This is a REAL video
    * file — `ffplay`/`mpv` play it; Cmono is part of the published Y4M
    * grammar and needs no codec library to WRITE, which is the point. */
  def y4mBytes(id: Long): Array[Byte] = {
    val w = y4mWidth(id); val h = y4mHeight(id); val n = y4mFrames(id)
    val header = s"YUV4MPEG2 W$w H$h F$Y4mFps:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + n * (frameMark.length + w * h))
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var f = 0
    while (f < n) {
      System.arraycopy(frameMark, 0, out, p, frameMark.length)
      p += frameMark.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(p) = y4mLuma(id, f, x, y).toByte; p += 1; x += 1 }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Exact decoded-and-sampled video features. Statistics cover only the
    * SAMPLED frames (every `everyNth`, starting at frame 0) — the
    * frame-sampling semantics a training pipeline needs (keyframe grain
    * without decoding cost downstream); n_frames counts ALL frames walked. */
  final case class Y4mFeatures(
      width: Int, height: Int, nFrames: Int, fpsNum: Int, durationMs: Long,
      nSampled: Int, lumaSum: Long, meanMicros: Long, peak: Int)

  /** REAL YUV4MPEG2 parser + every-Nth frame sampler: validates the stream
    * magic, tokenizes the space-separated header tags (any order, unknown
    * tags skipped per the Y4M grammar), walks the FRAME list (per-frame
    * parameters allowed and skipped), and aggregates luma statistics over
    * every `everyNth` frame. Cmono (one w×h plane) and C420 family
    * (w×h·3/2, luma-prefixed) layouts are supported; anything else throws —
    * decode errors must surface, not silently zero. */
  def decodeY4m(payload: Array[Byte], everyNth: Int): Y4mFeatures = {
    if (payload == null) return null
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Y4M decode: $msg")
    var nl = 0
    while (nl < payload.length && payload(nl) != '\n') nl += 1
    if (nl >= payload.length) fail("missing stream-header newline")
    val header = new String(payload, 0, nl, "US-ASCII")
    val tags = header.split(" ")
    if (tags.isEmpty || tags(0) != "YUV4MPEG2") fail("bad magic")
    var w = -1; var h = -1; var fpsNum = -1; var fpsDen = 1
    var colorspace = "420"                    // Y4M default when C is absent
    tags.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val parts = t.substring(1).split(":")
          fpsNum = parts(0).toInt; fpsDen = parts(1).toInt
        case 'C' => colorspace = t.substring(1)
        case _   => // I (interlace), A (aspect), X (extension): skip
      }
    }
    if (w <= 0 || h <= 0) fail(s"missing/bad dimensions W$w H$h")
    if (fpsNum <= 0 || fpsDen <= 0) fail("missing/bad frame rate")
    val frameSize =
      if (colorspace == "mono") w * h
      else if (colorspace.startsWith("420")) w * h * 3 / 2
      else fail(s"unsupported colorspace C$colorspace")
    var pos = nl + 1
    var nFrames = 0; var nSampled = 0
    var lumaSum = 0L; var peak = 0
    while (pos < payload.length) {
      // each frame: "FRAME[ params]\n" then the raw plane(s)
      if (pos + 5 > payload.length ||
          new String(payload, pos, 5, "US-ASCII") != "FRAME")
        fail(s"expected FRAME marker at byte $pos")
      pos += 5
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      if (pos >= payload.length) fail("unterminated FRAME header")
      pos += 1
      if (payload.length - pos < frameSize)
        fail(s"short frame $nFrames: need $frameSize, have ${payload.length - pos}")
      if (nFrames % everyNth == 0) {
        nSampled += 1
        val lumaEnd = pos + w * h             // luma plane leads in both layouts
        var p = pos
        while (p < lumaEnd) {
          val v = payload(p) & 0xff
          lumaSum += v
          if (v > peak) peak = v
          p += 1
        }
      }
      pos += frameSize
      nFrames += 1
    }
    if (nFrames == 0) fail("no frames")
    val sampledPx = nSampled.toLong * w * h
    Y4mFeatures(w, h, nFrames, fpsNum,
      nFrames.toLong * 1000 * fpsDen / fpsNum,
      nSampled, lumaSum, lumaSum * 1000000L / sampledPx, peak)
  }

  private val y4mEncode = udf(y4mBytes _)

  /** Media frame with REAL video payloads: one deterministic Cmono Y4M clip
    * per document id (fixture generation, like mediaPpmFromDocuments). */
  def mediaY4mFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"))
      .withColumn("kind", lit("video"))
      .withColumn("payload", y4mEncode(col("media_id")))

  private val y4mFeatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("fps", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_sampled", IntegerType, nullable = true),
    StructField("luma_sum", LongType, nullable = true),
    StructField("mean_micros", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true)))

  /** Distributed video feature extraction: partition-parallel REAL decode +
    * every-Nth frame sampling of the binary Y4M payload. Same scale shape as
    * the image/audio legs — map-only mapPartitions, zero shuffles, linear in
    * executors; at 100 TB the frame sampling is exactly why this stage is
    * cheap (only 1/N of the raster bytes are aggregated). */
  def extractY4mFeatures(media: DataFrame, everyNth: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(y4mFeatSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val f = decodeY4m(r.getAs[Array[Byte]](payIdx), everyNth)
        if (f == null) Row(id, null, null, null, null, null, null, null, null, null)
        else Row(id, f.width, f.height, f.nFrames, f.fpsNum, f.durationMs,
          f.nSampled, f.lumaSum, f.meanMicros, f.peak)
      }
    }(enc)
  }

  // ------------------------------------------------ quarantine decode ---

  /** Classify a decode failure into a stable, engine-comparable code. The
    * raw exception message carries positions/sizes (useful in logs, hostile
    * to differential testing); the code is what the quarantine table keys
    * on. */
  def decodeErrCode(e: Throwable): String = {
    val m = if (e.getMessage == null) "" else e.getMessage
    if (m.contains("bad magic")) "bad_magic"
    else if (m.contains("short raster") || m.contains("short frame") ||
             m.contains("overruns")) "truncated"
    else "decode_error"
  }

  private val quarantineSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("r_mean_micros", LongType, nullable = true),
    StructField("err_code", StringType, nullable = true)))

  /** Fault-TOLERANT image decode: same map-only mapPartitions stage as
    * extractPpmFeatures, but a malformed payload quarantines its ROW
    * instead of killing the STAGE. At 100 TB a handful of corrupt blobs is
    * a certainty, and a Spark task failure retries the whole partition
    * (then fails the job after 4 attempts) — so per-row capture is the only
    * shape that survives real data. Good rows emit features with a null
    * err_code; bad rows emit nulls with a stable err_code, and the caller
    * routes on `status` (the dq_validate_reject pattern applied to media).
    * The strict decoders stay the default — errors must surface unless the
    * caller explicitly opts into quarantine semantics. */
  def extractPpmFeaturesQuarantine(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(quarantineSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val f = decodePpm(r.getAs[Array[Byte]](payIdx))
          if (f == null) Row(id, "quarantined", null, null, null, "null_payload")
          else Row(id, "ok", f.width, f.height, f.rMeanMicros, null)
        } catch {
          case e: IllegalArgumentException =>
            Row(id, "quarantined", null, null, null, decodeErrCode(e))
        }
      }
    }(enc)
  }

  /** Deterministic corruption fixture for the quarantine op: every
    * id % 7 == 3 payload is truncated mid-raster, every id % 7 == 5 gets
    * its magic byte clobbered. Closed-form ⇒ the oracle knows exactly
    * which rows quarantine with which code. */
  def corruptPpmBytes(id: Long): Array[Byte] = {
    val b = ppmBytes(id)
    if (id % 7 == 3) java.util.Arrays.copyOf(b, b.length / 2)
    else if (id % 7 == 5) { b(0) = 'X'; b }
    else b
  }

  private val corruptPpmEncode = udf(corruptPpmBytes _)

  /** Media frame with deterministically corrupted payloads (see
    * corruptPpmBytes) — the quarantine op's fixture generator. */
  def mediaCorruptPpmFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"))
      .withColumn("kind", lit("image"))
      .withColumn("payload", corruptPpmEncode(col("media_id")))

  // ------------------------------------- single-pass trimodal manifest ---

  /** Media frame carrying ALL THREE modality payloads per document — the
    * production table shape for a multimodal training corpus (one row = one
    * sample; image/audio/video columns side by side with the text), plus
    * the doc-level columns the manifest keeps. */
  def mediaTrimodalFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("image", ppmEncode(col("media_id")))
      .withColumn("audio", wavEncode(col("media_id")))
      .withColumn("video", y4mEncode(col("media_id")))

  private val trimodalSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("img_width", IntegerType, nullable = true),
    StructField("img_height", IntegerType, nullable = true),
    StructField("img_r_mean_micros", LongType, nullable = true),
    StructField("img_thumb_checksum", LongType, nullable = true),
    StructField("aud_n_samples", IntegerType, nullable = true),
    StructField("aud_mean_micros", LongType, nullable = true),
    StructField("aud_peak", IntegerType, nullable = true),
    StructField("vid_n_frames", IntegerType, nullable = true),
    StructField("vid_n_sampled", IntegerType, nullable = true),
    StructField("vid_mean_micros", LongType, nullable = true),
    StructField("vid_peak", IntegerType, nullable = true)))

  /** ONE partition-parallel pass decoding all three modality payloads per
    * row into the training-sample manifest. This is the decode stage in its
    * true cluster shape: in production the payloads live as sibling columns
    * of one table, so per-modality extract ops would each rescan the table
    * and re-join on media_id — three scans and two shuffles for what is
    * row-local work. Fusing them into a single mapPartitions keeps it one
    * scan, zero joins, zero Exchanges (pinned in PlanSpec), linear in
    * executors at 100 TB. Doc-level columns (lang, n_tokens) ride through
    * the same pass — n_tokens is computed by the codegen'd split/size
    * projection upstream, not inside the lambda. */
  def extractTrimodalManifest(media: DataFrame, everyNth: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(trimodalSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val langIdx = media.schema.fieldIndex("lang")
    val tokIdx = media.schema.fieldIndex("n_tokens")
    val imgIdx = media.schema.fieldIndex("image")
    val audIdx = media.schema.fieldIndex("audio")
    val vidIdx = media.schema.fieldIndex("video")
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodePpm(r.getAs[Array[Byte]](imgIdx))
        val aud = decodeWav(r.getAs[Array[Byte]](audIdx))
        val vid = decodeY4m(r.getAs[Array[Byte]](vidIdx), everyNth)
        Row(r.getLong(idIdx), r.get(langIdx), r.get(tokIdx),
          if (img == null) null else img.width,
          if (img == null) null else img.height,
          if (img == null) null else img.rMeanMicros,
          if (img == null) null else img.thumbChecksum,
          if (aud == null) null else aud.nSamples,
          if (aud == null) null else aud.meanMicros,
          if (aud == null) null else aud.peak,
          if (vid == null) null else vid.nFrames,
          if (vid == null) null else vid.nSampled,
          if (vid == null) null else vid.meanMicros,
          if (vid == null) null else vid.peak)
      }
    }(enc)
  }

}
