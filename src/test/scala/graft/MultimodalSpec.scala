package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import thrivespark.Tables
import thrivespark.multimodal.Multimodal

/** Multimodal binary-column plumbing: real P6 PPM payloads, the distributed
  * decode stage (mapPartitions), null passthrough, and the audio/video
  * resize/frame-sample stub surface. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Reference recomputation of the decoded features straight from the
    * planted pixel function — independent of the encoder+parser path. */
  private def expected(id: Long): (Int, Int, Int, Long, Long, Long) = {
    val w = Multimodal.ppmWidth(id); val h = Multimodal.ppmHeight(id)
    var r = 0L; var g = 0L; var b = 0L
    for (y <- 0 until h; x <- 0 until w) {
      r += Multimodal.ppmPixel(id, x, y, 0)
      g += Multimodal.ppmPixel(id, x, y, 1)
      b += Multimodal.ppmPixel(id, x, y, 2)
    }
    val px = w.toLong * h
    (w, h, w * h * 3, r * 1000000L / px, g * 1000000L / px, b * 1000000L / px)
  }

  test("extractPpmFeatures decodes real PPM payloads to exact features") {
    val media = Multimodal.mediaPpmFromDocuments(Tables.documents(spark, sf0001))
    val out = Multimodal.extractPpmFeatures(media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "n_pixel_bytes",
        "r_mean_micros", "g_mean_micros", "b_mean_micros",
        "thumb", "thumb_checksum"))
    assert(out.count() == 500)
    val byId = out.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for (id <- Seq(byId.keys.min, byId.keys.max, byId.keys.toSeq.sorted.apply(byId.size / 2))) {
      assert(byId(id) == expected(id), s"features mismatch for media_id=$id")
    }
  }

  test("decodePpm is a real parser: header grammar, malformed input throws") {
    val f = Multimodal.decodePpm(Multimodal.ppmBytes(42L))
    assert((f.width, f.height, f.nPixelBytes) ==
      (Multimodal.ppmWidth(42L), Multimodal.ppmHeight(42L),
        Multimodal.ppmWidth(42L) * Multimodal.ppmHeight(42L) * 3))
    // comments in the header are legal PPM
    val withComment = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(7))
    assert(Multimodal.decodePpm(withComment).width == 2)
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("not a ppm".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n4 4\n255\nxx".getBytes("US-ASCII")) // short raster
    }
  }

  test("decode is deterministic and partition-count independent") {
    val media = Multimodal.mediaPpmFromDocuments(Tables.documents(spark, sf0001))
    def run(np: Int) = Multimodal.extractPpmFeatures(media.repartition(np))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail.map {
        case a: Array[Byte] => a.toSeq   // value equality for the thumb bytes
        case x => x
      }).toMap
    assert(run(1) == run(7))
  }

  test("thumbnail is a real 8x8 box filter over the decoded raster") {
    // Brute-force reference: cell (i,j) collects pixels with x*8/w == i,
    // y*8/h == j; its byte is floor(Σ(r+g+b) / (3·n_box)). Computed here
    // straight from the planted pixel function, independent of the decoder.
    for (id <- Seq(0L, 7L, 42L, 123L)) {
      val w = Multimodal.ppmWidth(id); val h = Multimodal.ppmHeight(id)
      val sums = Array.fill(64)(0L); val ns = Array.fill(64)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        sums(cell) += Multimodal.ppmPixel(id, x, y, 0) +
          Multimodal.ppmPixel(id, x, y, 1) + Multimodal.ppmPixel(id, x, y, 2)
        ns(cell) += 1
      }
      val want = (0 until 64).map(c => (sums(c) / (3L * ns(c))).toByte)
      val f = Multimodal.decodePpm(Multimodal.ppmBytes(id))
      assert(f.thumb.toSeq == want, s"thumb mismatch for id=$id")
      assert(f.thumbChecksum == want.map(_.toLong & 0xff).sum,
        s"checksum mismatch for id=$id")
      assert(f.thumb.length == 64)
    }
  }

  test("extractWavFeatures decodes real RIFF/WAVE payloads to exact features") {
    val media = Multimodal.mediaWavFromDocuments(Tables.documents(spark, sf0001))
    val out = Multimodal.extractWavFeatures(media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "sample_rate", "n_samples", "duration_ms",
        "mean_micros", "peak"))
    assert(out.count() == 500)
    val byId = out.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    for (id <- Seq(byId.keys.min, byId.keys.max, byId.keys.toSeq.sorted.apply(byId.size / 2))) {
      // reference recomputation straight from the planted sample function
      val n = Multimodal.wavNumSamples(id)
      val samples = (0 until n).map(Multimodal.wavSample(id, _))
      val want = (Multimodal.WavSampleRate, n,
        n.toLong * 1000 / Multimodal.WavSampleRate,
        samples.map(_.toLong).sum * 1000000L / n, samples.max)
      assert(byId(id) == want, s"audio features mismatch for media_id=$id")
    }
  }

  test("decodeWav is a real parser: chunk walking, malformed input throws") {
    val good = Multimodal.wavBytes(42L)
    val f = Multimodal.decodeWav(good)
    assert(f.sampleRate == 8000 && f.nSamples == Multimodal.wavNumSamples(42L))
    // an unknown chunk between fmt and data is legal RIFF — splice one in
    val lePad = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(0).array()
    val spliced = good.take(36) ++ lePad ++ good.drop(36)
    // fix the RIFF size field (bytes 4..7) for the extra 8 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, good.length - 8 + 8)
    assert(Multimodal.decodeWav(spliced) == f, "unknown chunk must be skipped")
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not a wav at all".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(good.take(50)) // data chunk overruns payload
    }
    assert(Multimodal.decodeWav(null) == null)
  }

  test("resize + frame-sample stubs: shapes, determinism, null-safety") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
      .withColumn("thumb", Multimodal.resizeUdf(col("payload"), lit(8), lit(8)))
      .withColumn("frames", Multimodal.frameSampleUdf(col("payload"), lit(64), lit(2)))
    val r = media.select(col("media_id"), col("thumb"), col("frames")).limit(20).collect()
    r.foreach { row =>
      assert(row.getAs[Array[Byte]]("thumb").length == 64)
      assert(row.getSeq[Array[Byte]](2).nonEmpty)
    }
    // null payload → null outputs
    import spark.implicits._
    val n = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
      .withColumn("thumb", Multimodal.resizeUdf(col("payload"), lit(8), lit(8)))
      .withColumn("frames", Multimodal.frameSampleUdf(col("payload"), lit(64), lit(2)))
      .collect()(0)
    assert(n.isNullAt(2) || n.getAs[Array[Byte]]("thumb") == null)
  }

  test("null payloads pass through with null features") {
    val media = Multimodal.mediaPpmFromDocuments(Tables.documents(spark, sf0001))
      .withColumn("payload", when(col("media_id") % 2 === 0, col("payload")))
    val out = Multimodal.extractPpmFeatures(media)
    val nulls = out.filter(col("width").isNull)
    assert(nulls.count() > 0)
    assert(nulls.filter(col("r_mean_micros").isNotNull).count() == 0)
  }
}
