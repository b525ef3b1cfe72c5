package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the REAL multimodal kernels: javax.imageio image decode (dimensions,
  * channels, container format, banded luminance features), real bilinear
  * resize, and real 16-bit PCM parsing + DFT windowed audio features.
  */
class MultimodalSpec extends SparkSpec {

  private val binSchema = StructType(Seq(longCol("id"), StructField("payload", BinaryType)))

  private def lum(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
  }

  test("PNG roundtrip decodes REAL dimensions, channels, format") {
    val rgb = 0x1a2b3c
    val df = makeDf(binSchema, Seq(Row(1L, Multimodal.synthesizePng(7, 5, rgb))))
    val d = Multimodal.decodeImages(df, "payload", featureDim = 6, rebalance = false)
      .select("decoded").collect().head.getStruct(0)
    assert(d.getInt(0) === 7)   // width — actual decoded pixels, not a hash
    assert(d.getInt(1) === 5)   // height
    assert(d.getInt(2) === 3)   // RGB channels
    assert(d.getString(3) === "png")
    // solid fill: every band's mean luminance is exactly the fill color's
    val expected = lum(rgb).toFloat
    d.getSeq[Float](4).foreach(f => assert(math.abs(f - expected) < 1e-6f))
  }

  test("JPEG payloads decode with the jpeg container format") {
    val img = new BufferedImage(12, 9, BufferedImage.TYPE_3BYTE_BGR)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpeg", bos)
    val df = makeDf(binSchema, Seq(Row(1L, bos.toByteArray)))
    val d = Multimodal.decodeImages(df, "payload", featureDim = 4, rebalance = false)
      .select("decoded").collect().head.getStruct(0)
    assert((d.getInt(0), d.getInt(1)) === ((12, 9)))
    assert(d.getString(3) === "jpeg")
  }

  test("banded luminance features track pixel content per band") {
    // top half black, bottom half white: 4 bands -> [0, 0, 1, 1]
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 4 until 8; x <- 0 until 8) img.setRGB(x, y, 0xffffff)
    val feats = Multimodal.bandLuminance(img, 4)
    assert(feats(0) === 0f && feats(1) === 0f)
    assert(math.abs(feats(2) - 1f) < 1e-6f && math.abs(feats(3) - 1f) < 1e-6f)
    // more bands than rows: every band still a real pixel statistic
    val tall = Multimodal.bandLuminance(img, 16)
    assert(tall.length === 16)
    assert(tall.take(8).forall(_ === 0f) && tall.drop(8).forall(f => math.abs(f - 1f) < 1e-6f))
  }

  test("resizeImages rescales pixels; small payloads pass through untouched") {
    val big = Multimodal.synthesizePng(100, 40, 0x808080)
    val small = Multimodal.synthesizePng(4, 3, 0x808080)
    val df = makeDf(binSchema, Seq(Row(1L, big), Row(2L, small)))
    val out = Multimodal.resizeImages(df, "payload", maxSide = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val resized = ImageIO.read(new ByteArrayInputStream(out(1L)))
    assert((resized.getWidth, resized.getHeight) === ((10, 4)))
    assert(out(2L).toSeq === small.toSeq) // under the box: no-op, bit-identical
  }

  test("pcm16 parses 16-bit little-endian samples exactly") {
    // 0x4000 = 16384 -> 0.5 ; 0xC000 = -16384 -> -0.5 ; 0x0000 -> 0
    val bytes = Array[Byte](0x00, 0x40, 0x00, 0xC0.toByte, 0x00, 0x00, 0x01)
    val s = Multimodal.pcm16(bytes) // trailing odd byte dropped
    assert(s.toSeq === Seq(0.5, -0.5, 0.0))
  }

  test("DFT magnitudes: pure tone concentrates in its bin") {
    val n = 16
    val tone = Array.tabulate(n)(t => math.sin(2.0 * math.Pi * t / n))
    val mags = Multimodal.dftMagnitudes(tone, 0, n, 4)
    assert(math.abs(mags(0)) < 1e-6f)          // zero mean
    assert(math.abs(mags(1) - 0.5f) < 1e-6f)   // |X_1|/n of a unit sine = 1/2
    assert(math.abs(mags(2)) < 1e-6f && math.abs(mags(3)) < 1e-6f)
    val const = Multimodal.dftMagnitudes(Array.fill(8)(0.25), 0, 8, 3)
    assert(math.abs(const(0) - 0.25f) < 1e-6f) // bin 0 = |mean|
    assert(math.abs(const(1)) < 1e-6f)
  }

  test("audio windows: exact sample-count split and real per-window spectra") {
    // 10 samples of constant 0.5 -> 20 bytes of 0x00 0x40
    val bytes = Array.tabulate[Byte](20)(i => if (i % 2 == 0) 0x00 else 0x40)
    val df = makeDf(binSchema, Seq(Row(1L, bytes), Row(2L, null)))
    val rows = Multimodal.extractAudioFeatures(df, "payload", windows = 4, featureDim = 3)
      .select("id", "window_index", "n_samples", "features").collect()
    val byId = rows.groupBy(_.getLong(0))
    // [w*n/W, (w+1)*n/W) split of 10 samples: counts 2,3,2,3 summing to 10
    val counts = byId(1L).sortBy(_.getInt(1)).map(_.getInt(2)).toSeq
    assert(counts === Seq(2, 3, 2, 3))
    byId(1L).foreach { r =>
      val f = r.getSeq[Float](3)
      assert(f.size === 3)
      assert(math.abs(f.head - 0.5f) < 1e-6f) // constant signal: |mean| = 0.5
      assert(math.abs(f(1)) < 1e-6f)
    }
    // null payload: one row per window, zero samples, null features
    assert(byId(2L).length === 4)
    byId(2L).foreach(r => assert(r.getInt(2) === 0 && r.isNullAt(3)))
  }

  test("perceptual hash: identical pixels agree, distinct patterns split") {
    val hashes = (0 until 5).map { k =>
      Multimodal.perceptualHash(Multimodal.synthesizeStripePng(64, 48, k))
    }
    assert(hashes.forall(_ != null))
    assert(hashes.distinct.size === 5) // distinct spatial frequencies split
    // re-encoding the same pattern yields the same hash (pixels, not bytes)
    assert(Multimodal.perceptualHash(Multimodal.synthesizeStripePng(64, 48, 2))
      === hashes(2))
    // brightness invariance: DC is excluded and a positive luminance
    // rescale preserves every AC comparison, so solid fills of different
    // levels hash identically
    assert(Multimodal.perceptualHash(Multimodal.synthesizePng(64, 48, 0x808080))
      === Multimodal.perceptualHash(Multimodal.synthesizePng(64, 48, 0x404040)))
    assert(Multimodal.perceptualHash("not an image".getBytes) === null)
  }

  test("perceptual hash survives a real resize (small Hamming distance)") {
    val big = Multimodal.synthesizeStripePng(128, 96, 2)
    val small = Multimodal.resizePayload(big, 64)
    val h1 = Multimodal.perceptualHash(big).longValue
    val h2 = Multimodal.perceptualHash(small).longValue
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist <= 8, s"pHash moved $dist bits under a 2x downscale")
    // and an unrelated pattern stays far away
    val other = Multimodal.perceptualHash(Multimodal.synthesizeStripePng(128, 96, 0))
    assert(java.lang.Long.bitCount(h1 ^ other.longValue) > 8)
  }

  test("dedupImagesByPhash groups re-encoded copies, splits patterns") {
    val rows = (0 until 10).map { i =>
      Row(i.toLong, Multimodal.synthesizeStripePng(64, 48, i % 3))
    } :+ Row(10L, "junk bytes".getBytes) // undecodable: excluded, not crashed
    val df = makeDf(binSchema, rows)
    val out = Multimodal.dedupImagesByPhash(df, "id", "payload")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // representatives are the min ids 0, 1, 2; group sizes 4, 3, 3
    assert(out === Map(0L -> 4L, 1L -> 3L, 2L -> 3L))
  }

  test("video frames: REAL GIF container parsing, even sampling, true pixels") {
    // 5-frame animated GIF sampled at maxFrames=2 -> source frames 0 and 2
    val gif = Multimodal.synthesizeAnimatedGif(8, 6, 5)
    val frames = Multimodal.decodeFrames(gif, maxFrames = 2, featureDim = 4)
    assert(frames.map(f => (f._1, f._2)) === Seq((0, 5), (2, 5)))
    frames.foreach { case (_, _, d) =>
      assert((d.getInt(0), d.getInt(1)) === ((8, 6)))
      assert(d.getString(3) === "gif")
    }
    // stripe phase on an ODD width: frame 0 has 5 white columns of 9,
    // frame 1 has 4 — the decoded band means must track the real pixel
    // counts (even widths balance out and would hide a fake decode)
    val odd = Multimodal.synthesizeAnimatedGif(9, 6, 3)
    val all = Multimodal.decodeFrames(odd, maxFrames = 3, featureDim = 4)
    assert(all.map(_._1) === Seq(0, 1, 2)) // n <= max: every frame
    val lum0 = all(0)._3.getSeq[Float](4)
    val lum1 = all(1)._3.getSeq[Float](4)
    assert(lum0.forall(f => math.abs(f - 5f / 9f) < 1e-6f)) // 5/9 white
    assert(lum1.forall(f => math.abs(f - 4f / 9f) < 1e-6f)) // 4/9 white
    assert(all(2)._3.getSeq[Float](4) === lum0) // same phase, same pixels
  }

  test("video frames: fewer frames than the budget decode each exactly once") {
    // the regression regime 2 <= n < maxFrames: an index step divided by
    // maxFrames instead of the take count would decode frame 0 three times
    // odd width: stripe phases 0/1 have different white-column counts
    val gif = Multimodal.synthesizeAnimatedGif(9, 6, 3)
    val frames = Multimodal.decodeFrames(gif, maxFrames = 8, featureDim = 4)
    assert(frames.map(f => (f._1, f._2)) === Seq((0, 3), (1, 3), (2, 3)))
    val l0 = frames(0)._3.getSeq[Float](4)
    val l1 = frames(1)._3.getSeq[Float](4)
    assert(l0 !== l1, "distinct source frames must carry distinct pixels")
  }

  test("video frames: single-image payloads are one-frame containers; " +
      "undecodable payloads fall back; nulls vanish") {
    val png = Multimodal.synthesizePng(7, 5, 0x336699)
    val one = Multimodal.decodeFrames(png, maxFrames = 4, featureDim = 2)
    assert(one.map(f => (f._1, f._2)) === Seq((0, 1)))
    assert(one.head._3.getString(3) === "png")
    val junk = Multimodal.decodeFrames("not media".getBytes, 4, 2)
    assert(junk.map(f => (f._1, f._2)) === Seq((0, 1)))
    assert(junk.head._3.getString(3) === "opaque")
    assert(Multimodal.decodeFrames(null, 4, 2) === Nil)
    // the Spark surface: one row per sampled frame, nulls contribute none
    val df = makeDf(binSchema, Seq(
      Row(1L, Multimodal.synthesizeAnimatedGif(8, 6, 3)), Row(2L, null)))
    val rows = Multimodal.sampleVideoFrames(df, "payload", maxFrames = 2,
      rebalance = false).select("id", "frame_index", "frame_count").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ===
      Set((1L, 0, 3), (1L, 1, 3)))
  }

  test("audio fingerprint: tones split by dominant bin, invariant to volume") {
    // periods 4,8,16,32,64 over 64-sample windows -> peak bins 16,8,4,2,1
    val fps = Seq(4, 8, 16, 32, 64).map(p =>
      Multimodal.audioFingerprint(Multimodal.synthesizeTonePcm(512, p)))
    assert(fps.forall(_ != null))
    assert(fps.distinct.size === 5)
    // same tone -> same fingerprint (content, not byte coincidence)
    assert(Multimodal.audioFingerprint(Multimodal.synthesizeTonePcm(512, 8)) === fps(1))
    // amplitude scaling cannot move an argmax: half-volume tone matches
    val half = {
      val out = new Array[Byte](512 * 2)
      for (t <- 0 until 512) {
        val s = math.round(math.sin(2.0 * math.Pi * t / 8) * 6000.0).toInt
        out(2 * t) = (s & 0xff).toByte
        out(2 * t + 1) = ((s >> 8) & 0xff).toByte
      }
      out
    }
    assert(Multimodal.audioFingerprint(half) === fps(1))
    assert(Multimodal.audioFingerprint(null) === null)
    assert(Multimodal.audioFingerprint(Array.empty[Byte]) === null)
  }

  test("dedupAudioByFingerprint groups same tones, splits different ones") {
    val rows = (0 until 9).map { i =>
      Row(i.toLong, Multimodal.synthesizeTonePcm(512, 4 << (i % 3)))
    } :+ Row(9L, null)
    val df = makeDf(binSchema, rows)
    val out = Multimodal.dedupAudioByFingerprint(df, "id", "payload")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
  }

  test("multimodal operators are invariant to input partitioning") {
    // a cluster re-shards inputs freely: every released value must be a
    // pure function of the data, never of the partition layout
    val rows = (0L until 40L).map { i =>
      Row(i, Multimodal.synthesizeStripePng(16, 12, (i % 3).toInt),
        Multimodal.synthesizeTonePcm(128, 4 << (i % 3).toInt),
        Multimodal.synthesizeAnimatedGif(8, 6, (i % 3).toInt + 1))
    }
    val schema = StructType(Seq(longCol("id"),
      StructField("img", BinaryType), StructField("pcm", BinaryType),
      StructField("gif", BinaryType)))
    val base = makeDf(schema, rows)
    val shuffled = makeDf(schema,
      new scala.util.Random(7).shuffle(rows.toList)).repartition(7)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val ops = Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => Multimodal.dedupImagesByPhash(d, "id", "img"),
      d => Multimodal.dedupAudioByFingerprint(d, "id", "pcm", windows = 2),
      d => Multimodal.decodeImages(d.select("id", "img"), "img")
        .select(col("id"), col("decoded.width"), col("decoded.features")),
      d => Multimodal.sampleVideoFrames(d.select("id", "gif"), "gif", maxFrames = 2)
        .select("id", "frame_index", "frame_count"),
      d => Multimodal.extractAudioFeatures(d.select("id", "pcm"), "pcm", windows = 2)
        .select("id", "window_index", "n_samples", "features"))
    ops.zipWithIndex.foreach { case (op, i) =>
      assert(canon(op(base)) === canon(op(shuffled)), s"op $i layout-sensitive")
    }
  }

  test("undecodable payloads fall back deterministically, tagged opaque") {
    val junk = "definitely not an image".getBytes
    val df = makeDf(binSchema, Seq(Row(1L, junk)))
    val d = Multimodal.decodeImages(df, "payload", featureDim = 4, rebalance = false)
      .select("decoded").collect().head.getStruct(0)
    assert(d.getString(3) === "opaque")
    assert(d.getSeq[Float](4).size === 4)
  }
}
