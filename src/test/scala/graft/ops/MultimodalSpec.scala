package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MultimodalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a" * 300), // 300 bytes -> frames at 0,128,256? 256+64>300 -> 0,128
    (2L, "b" * 64), // exactly one frame
    (3L, "c" * 63) // too short: no frames
  ).toDF("doc_id", "text")

  test("frameSample slices [i*stride, i*stride+frameSize) per row") {
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs), 64, 128)
      .select($"doc_id", $"frame_no", length($"frame").as("len"))
      .as[(Long, Long, Int)].collect().toSet
    // doc 1: (300-64) div 128 + 1 = 2 frames; doc 2: 1; doc 3: 0
    assert(frames == Set((1L, 0L, 64), (1L, 1L, 64), (2L, 0L, 64)))
  }

  test("frameSample is declarative: no shuffle below the expansion") {
    val plan = Multimodal.frameSample(Multimodal.withPayload(docs), 64, 128)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize keeps every stride-th byte and shrinks length") {
    val out = Multimodal.resize(spark,
      Multimodal.withPayload(docs), stride = 4)
      .select($"doc_id", length($"payload").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == 75 && out(2L) == 16 && out(3L) == 16)
    assert(Multimodal.resizeStub("abcdefgh".getBytes, 3).toSeq ==
      "adg".getBytes.toSeq)
  }

  test("decode features match the payload bytes") {
    val f = Multimodal.extractFeatures(spark, docs.filter($"doc_id" === 2L))
      .as[Multimodal.MediaFeatures].head()
    assert(f.n_bytes == 64 && f.first_byte == 'b'.toInt)
  }

  test("declarative features equal the mapPartitions stub, incl. empty payload") {
    val withEmpty = docs.union(Seq((4L, "")).toDF("doc_id", "text"))
    val imperative = Multimodal.extractFeatures(spark, withEmpty)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val declarative = Multimodal.extractFeaturesDeclarative(withEmpty)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(declarative == imperative)
  }

  test("declarative features stay in codegen: no object boundary, no shuffle below sort") {
    val plan = Multimodal.extractFeaturesDeclarative(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
  }

  /** Encode a solid-color image to PNG bytes with the same JDK codec the
    * operator decodes with. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real codec: decodes actual PNG pixels; undecodable payloads are dropped") {
    // white 4x3, mid-gray 2x2, and a payload that is not an image at all
    val payloads = Seq(
      (10L, png(4, 3, 0xffffff)),
      (11L, png(2, 2, 0x808080)),
      (12L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractImageFeatures(spark, payloads)
      .as[Multimodal.ImageFeatures].collect().map(f => f.doc_id -> f).toMap
    assert(feats.keySet == Set(10L, 11L), "bad media must be dropped, good kept")
    val white = feats(10L)
    assert(white.width == 4 && white.height == 3 && white.n_pixels == 12)
    assert(math.abs(white.mean_luma - 255.0) < 1e-9) // 0.299+0.587+0.114 = 1
    val gray = feats(11L)
    assert(gray.width == 2 && gray.height == 2)
    assert(math.abs(gray.mean_luma - 128.0) < 1e-9)
    // direct decode agrees with the distributed path
    val direct = Multimodal.decodeImage(10L, png(4, 3, 0xffffff)).get
    assert(direct == white)
    assert(Multimodal.decodeImage(12L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("real resize: longest side scaled to budget, aspect kept, no upscale, bad media dropped") {
    val payloads = Seq(
      (20L, png(8, 4, 0x808080)),  // downscale to 4x2
      (21L, png(2, 2, 0x808080)),  // already within budget: pass through
      (22L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val resized = Multimodal.resizeImages(spark, payloads, maxDim = 4)
      .as[(Long, Array[Byte])].collect().toMap
    assert(resized.keySet == Set(20L, 21L))
    val f20 = Multimodal.decodeImage(20L, resized(20L)).get
    assert(f20.width == 4 && f20.height == 2, s"${f20.width}x${f20.height}")
    assert(math.abs(f20.mean_luma - 128.0) < 1.0) // solid gray survives scaling
    assert(resized(21L).toSeq == png(2, 2, 0x808080).toSeq, "no upscale")
  }

  test("real audio codec: PCM16 WAV round trip recovers exact features, bad media dropped") {
    val s = Array[Short](0, 100, -100, 32767, -32768, 1, -1)
    val f = Multimodal.decodeWavFeatures(1L,
      Multimodal.encodeWavPcm16(s)).get
    assert(f.n_samples == 7L)
    assert(f.sum_sq == s.map(x => x.toLong * x).sum)
    // sign flips: 100->-100, -100->32767, 32767->-32768, -32768->1, 1->-1
    assert(f.zero_cross == 5L)
    assert(f.peak == 32768L)
    // empty signal: decodes, zero everything
    val e = Multimodal.decodeWavFeatures(2L,
      Multimodal.encodeWavPcm16(Array.empty[Short])).get
    assert(e == Multimodal.AudioFeatures(2L, 0L, 0L, 0L, 0L))
    // junk bytes are not a WAV: dropped, never a crash
    assert(Multimodal.decodeWavFeatures(3L, Array[Byte](9, 9, 9)).isEmpty)
  }

  test("real audio codec: the distributed path equals the direct fold (random signals)") {
    val rnd = new scala.util.Random(0xA0D10L)
    val signals = (1L to 5L).map(id =>
      (id, Seq.fill(1 + rnd.nextInt(200))(rnd.nextInt(65536) - 32768)))
    val got = Multimodal.audioFeatures(spark, signals.toDF("user_id", "samples"))
      .as[Multimodal.AudioFeatures].collect().map(f => f.user_id -> f).toMap
    signals.foreach { case (id, s) =>
      val want = Multimodal.decodeWavFeatures(id,
        Multimodal.encodeWavPcm16(s.map(_.toShort).toArray)).get
      assert(got(id) == want, s"signal $id")
      // and the decoded-frame fold equals a direct fold on raw samples
      val sumSq = s.map(x => x.toLong * x).sum
      val zc = s.zip(s.tail).count { case (a, b) => a.toLong * b < 0 }.toLong
      assert(want.sum_sq == sumSq && want.zero_cross == zc)
    }
  }

  test("real image codec: BMP round trip is lossless (random pixel cards)") {
    val rnd = new scala.util.Random(0x1A6E5L)
    (1 to 5).foreach { _ =>
      val px = Array.fill(256)(rnd.nextInt(256))
      val bytes = Multimodal.encodeGrayBmp16(px)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 16 && img.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until 16)
        assert((img.getRGB(x, y) & 0xff) == px(y * 16 + x),
          s"pixel ($x,$y) not recovered")
    }
  }

  test("image aHash: hand-computed signature, strict mean threshold, bad media dropped") {
    // left half dark (0), right half bright (200): blocks with bx >= 4
    // are above the mean, bx < 4 below -> bits j where j % 8 >= 4, j < 60
    val px = Array.tabulate(256)(i => if (i % 16 < 8) 0 else 200)
    val got = Multimodal.decodeImageAHash(7L, Multimodal.encodeGrayBmp16(px)).get
    val want = (0 until 60).filter(j => j % 8 >= 4).map(1L << _).sum
    assert(got == Multimodal.ImageHash(7L, want))
    // uniform image: no block STRICTLY exceeds the mean -> sig 0
    val flat = Array.fill(256)(100)
    assert(Multimodal.decodeImageAHash(8L, Multimodal.encodeGrayBmp16(flat)).get.sig == 0L)
    // junk bytes are not an image: dropped, never a crash
    assert(Multimodal.decodeImageAHash(9L, Array[Byte](1, 2, 3)).isEmpty)
    // a decodable image of the wrong shape is rejected too
    val png = Multimodal.resizeImage(Multimodal.encodeGrayBmp16(px), 8).get
    assert(Multimodal.decodeImageAHash(10L, png).isEmpty)
  }

  test("image aHash: the distributed codec path equals the direct hash (random cards)") {
    val rnd = new scala.util.Random(0xBEEFL)
    val rows = (1L to 6L).map(id => (id, Seq.fill(256)(rnd.nextInt(256))))
    val got = Multimodal.imageAHash(spark, rows.toDF("doc_id", "pixels"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, px) =>
      val want = Multimodal.decodeImageAHash(id,
        Multimodal.encodeGrayBmp16(px.toArray)).get.sig
      assert(got(id) == want, s"card $id")
    }
  }

  test("framed audio features: frame cuts, in-frame-only zero crossings, partial tail") {
    // 10 samples, frame 4 -> frames of 4, 4, 2. Signs planted so one
    // crossing straddles the frame-1/frame-2 boundary and must NOT count.
    val s = Seq(100, -200, 300, 400, /*|*/ -500, 600, 700, -800, /*|*/ 900, 1000)
    val frames = Multimodal.decodeWavFrameFeatures(7L,
      Multimodal.encodeWavPcm16(s.map(_.toShort).toArray), 4)
    def feats(xs: Seq[Int]) = (
      xs.map(x => x.toLong * x).sum,
      xs.sliding(2).count(p => p.length == 2 && p(0).toLong * p(1) < 0),
      xs.map(x => math.abs(x.toLong)).max)
    assert(frames.map(f => (f.frame, f.n_samples)) ==
      Seq((0L, 4L), (1L, 4L), (2L, 2L)))
    frames.zip(Seq(s.slice(0, 4), s.slice(4, 8), s.slice(8, 10))).foreach {
      case (f, xs) =>
        val (sq, zc, pk) = feats(xs)
        assert((f.sum_sq, f.zero_cross, f.peak) == (sq, zc.toLong, pk), s"frame ${f.frame}")
    }
    // whole-clip features must equal the frame sums for energy/count
    val whole = Multimodal.decodeWavFeatures(7L,
      Multimodal.encodeWavPcm16(s.map(_.toShort).toArray)).get
    assert(frames.map(_.sum_sq).sum == whole.sum_sq)
    assert(frames.map(_.n_samples).sum == whole.n_samples)
  }
}
