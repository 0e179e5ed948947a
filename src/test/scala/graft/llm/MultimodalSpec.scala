package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media contract: schema, stub decode shape, determinism") {
    val docs = Seq((1L, "hello media"), (2L, "another payload")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")

    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.getLong(0))
    assert(f1.length == 2)
    f1.zip(f2).foreach { case (a, b) => assert(a == b) } // deterministic stub
    f1.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
    }
  }

  test("features differ across different payloads") {
    val docs = Seq((1L, "payload one"), (2L, "payload two")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .select("features").as[Seq[Float]].collect()
    assert(f(0) != f(1))
  }

  test("resize bounds dimensions by maxDim and preserves aspect") {
    val docs = Seq((1L, "a" * 500), (2L, "tiny")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, maxDim = 100).collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w <= 100 && h <= 100, s"resize exceeded maxDim: ${w}x$h")
      assert(w >= 1 && h >= 1)
    }
    // fake dims are always ≥ 64, so a 100-cap must actually rescale
    assert(resized.forall(_.getAs[Boolean]("resized")))
  }

  test("frame sampling emits 1:N bounded rows per video payload") {
    val docs = Seq((1L, "x" * 1000), (2L, "y" * 150), (3L, "z")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyNth = 5, maxFrames = 3)
    val perId = frames.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1000 bytes → 11 frames → ceil(11/5)=3 (capped); 150 → 2 frames → 1; 1 → 1
    assert(perId == Map(1L -> 3L, 2L -> 1L, 3L -> 1L), s"got $perId")
    // frame features are per-frame distinct and deterministic
    val f1 = frames.orderBy("id", "frame_idx").collect()
    val f2 = Multimodal.sampleFrames(media, everyNth = 5, maxFrames = 3)
      .orderBy("id", "frame_idx").collect()
    assert(f1.sameElements(f2))
    val id1feats = f1.filter(_.getLong(0) == 1L)
      .map(_.getAs[scala.collection.Seq[Float]]("features"))
    assert(id1feats.distinct.length == id1feats.length, "frames must differ")
  }

  /** Encode a solid-color image in the given container via the JDK. */
  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    val media = rows.toDF("doc_id", "payload")
    media.select(col("doc_id").as("id"), col("payload").as("media"),
      struct(lit("image/auto").as("format"),
        length(col("payload")).cast("long").as("n_bytes")).as("media_meta"))
  }

  test("real image decode: PNG/JPEG/BMP/GIF via javax.imageio, true dims + pixels") {
    val white = 0xFFFFFF; val black = 0x000000
    val media = mediaOf(Seq(
      (1L, imageBytes(100, 50, white, "png")),
      (2L, imageBytes(32, 64, black, "jpg")),
      (3L, imageBytes(20, 20, white, "bmp")),
      (4L, imageBytes(10, 40, black, "gif"))))
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.getLong(0) -> r).toMap
    // true container dimensions, not hash-derived stubs
    assert(feats(1L).getAs[Int]("width") == 100 && feats(1L).getAs[Int]("height") == 50)
    assert(feats(2L).getAs[Int]("width") == 32 && feats(2L).getAs[Int]("height") == 64)
    assert(feats(3L).getAs[Int]("width") == 20 && feats(3L).getAs[Int]("height") == 20)
    assert(feats(4L).getAs[Int]("width") == 10 && feats(4L).getAs[Int]("height") == 40)
    // real pixel luminance: all-white ≈ 1, all-black ≈ 0, in every grid cell
    val whiteFeats = feats(1L).getAs[scala.collection.Seq[Float]]("features")
    val blackFeats = feats(2L).getAs[scala.collection.Seq[Float]]("features")
    assert(whiteFeats.length == 16 && blackFeats.length == 16)
    assert(whiteFeats.forall(_ > 0.95f), s"white image luminance: $whiteFeats")
    assert(blackFeats.forall(_ < 0.05f), s"black image luminance: $blackFeats")
  }

  test("real decode: resize keeps aspect from true dimensions") {
    val media = mediaOf(Seq((1L, imageBytes(200, 100, 0x808080, "png"))))
    val r = Multimodal.resize(media, maxDim = 50).collect().head
    assert(r.getAs[Int]("width") == 50 && r.getAs[Int]("height") == 25,
      s"got ${r.getAs[Int]("width")}x${r.getAs[Int]("height")}")
    assert(r.getAs[Boolean]("resized"))
  }

  test("corrupt image bytes fall back to the stub instead of failing the task") {
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3) // PNG magic, garbage body
    val media = mediaOf(Seq((1L, junk)))
    val r = Multimodal.extractFeatures(media, dim = 8).collect().head
    assert(r.getAs[Int]("width") >= 64, "stub fallback dims expected")
    assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
  }

  test("real audio decode: WAV via javax.sound.sampled, true rate/channels + RMS envelope") {
    // synthesize a 0.5 s mono 8 kHz WAV: first half a full-scale square
    // wave (RMS 1.0), second half silence (RMS 0)
    def wavBytes(): Array[Byte] = {
      val rate = 8000f
      val n = 4000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n / 2) {
        val v: Short = if (i % 8 < 4) 32767 else -32768
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = mediaOf(Seq((1L, wavBytes())))
    val r = Multimodal.extractFeatures(media, dim = 8).collect().head
    // true container properties, not hash-derived stubs
    assert(r.getAs[Int]("width") == 8000, s"sample rate ${r.getAs[Int]("width")}")
    assert(r.getAs[Int]("height") == 1, s"channels ${r.getAs[Int]("height")}")
    val feats = r.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 8)
    // loud half: RMS ≈ 1.0; silent half: RMS ≈ 0 — real samples, not noise
    assert(feats.take(4).forall(_ > 0.9f), s"loud windows: $feats")
    assert(feats.drop(4).forall(_ < 0.05f), s"silent windows: $feats")
  }

  test("corrupt audio bytes fall back to the stub instead of failing the task") {
    val junk = "RIFFxxxxWAVEgarbage-not-a-real-wav".getBytes("UTF-8")
    assert(Multimodal.sniffAudioFormat(junk).contains("audio/wav"))
    val media = mediaOf(Seq((1L, junk)))
    val r = Multimodal.extractFeatures(media, dim = 8).collect().head
    assert(r.getAs[Int]("width") >= 64, "stub fallback dims expected")
    // deterministic: same junk, same stub output
    val r2 = Multimodal.extractFeatures(media, dim = 8).collect().head
    assert(r.getAs[scala.collection.Seq[Float]]("features") ==
      r2.getAs[scala.collection.Seq[Float]]("features"))
  }

  test("json convert-from infers schema from samples (reference CONVERT_FROM)") {
    val t = graft.engine.Tables(spark, TestSpark.sf)
    val parsed = graft.functions.JsonOps.convertFromJson(t.events, "props", "p")
    val k = parsed.select(col("p.k")).na.drop().count()
    assert(k > 0)
  }

  /** Deterministic block-pattern image: 8x8-px blocks whose gray level is
    * a hash of (block, seed) — rich enough that perceptual hashes are
    * non-degenerate, unlike solid colors or clean gradients. */
  private def patternBytes(w: Int, h: Int, seed: Int,
                           edit: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (bx, by) = (x / 8, y / 8)
      val g = edit match {
        case Some((ex, ey, v)) if ex == bx && ey == by => v
        case _ =>
          // seed must mix multiplicatively: a plain XOR shifts every block
          // by the same constant and can preserve all neighbor comparisons
          val m = (((bx * 73856093) ^ (by * 19349663)) + seed) * (2 * seed + 83492791)
          ((m >>> 8) ^ m) & 0xFF
      }
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("perceptual hashes: identical collide, one-block edit near, different pattern far") {
    for (kind <- Seq("ahash", "dhash")) {
      val media = mediaOf(Seq(
        (1L, patternBytes(64, 64, seed = 7)),
        (2L, patternBytes(64, 64, seed = 7)),                         // identical
        (3L, patternBytes(64, 64, seed = 7, edit = Some((3, 3, 255)))), // one block changed
        (4L, patternBytes(64, 64, seed = 99))))                       // different image
      val hs = Multimodal.perceptualHash(media, kind).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(hs.values.forall(_.getAs[Boolean]("decoded")), s"$kind: real decode expected")
      val h = hs.view.mapValues(_.getAs[Long]("phash")).toMap
      assert(h(1L) == h(2L), s"$kind: identical images must collide")
      val near = hamming(h(1L), h(3L))
      val far = hamming(h(1L), h(4L))
      assert(near <= 10, s"$kind: one-block edit moved $near bits")
      assert(far >= 16, s"$kind: different pattern only $far bits apart")
      assert(near < far, s"$kind: near ($near) must beat far ($far)")
    }
  }

  test("non-image payloads hash deterministically with decoded=false") {
    val media = Multimodal.asMedia(
      Seq((1L, "some text payload"), (2L, "some text payload"), (3L, "other"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val hs = Multimodal.perceptualHash(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(hs.values.forall(!_.getAs[Boolean]("decoded")))
    assert(hs(1L).getAs[Long]("phash") == hs(2L).getAs[Long]("phash"))
    assert(hs(1L).getAs[Long]("phash") != hs(3L).getAs[Long]("phash"))
  }

  test("imageNearDups: banded join returns exactly the planted near-dup pairs") {
    val media = mediaOf(Seq(
      (1L, patternBytes(64, 64, seed = 7)),
      (2L, patternBytes(64, 64, seed = 7)),                          // dup of 1
      (3L, patternBytes(64, 64, seed = 7, edit = Some((3, 3, 255)))), // near-dup of 1
      (4L, patternBytes(64, 64, seed = 99)),
      (5L, patternBytes(64, 64, seed = 123))))
    val exact = Multimodal.imageNearDups(media, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)), s"exact pairs: $exact")
    val near = Multimodal.imageNearDups(media, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((1L, 2L)) && near.contains((1L, 3L)) && near.contains((2L, 3L)),
      s"near pairs: $near")
    assert(!near.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      s"distinct images must not pair: $near")
  }

  /** Minimal spec-conformant MJPEG AVI: RIFF('AVI ') + LIST(hdrl){avih}
    * + LIST(movi){00dc JPEG frames}. Each frame is a solid-gray JPEG
    * encoded by the JDK — exactly what an MJPEG encoder emits. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le(n: Int): Array[Byte] =
      Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
        ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le(data.length) ++ data ++ pad
    }
    def list(typ: String, subs: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ subs)
    val avih = chunk("avih", new Array[Byte](56))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi
    "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
  }

  test("real MJPEG-AVI video decode: true dims, per-frame luminance, stride-only decode") {
    // 6 frames, brightness ramp 0, 40, 80, ... 200
    val frames = (0 until 6).map { i =>
      val g = i * 40
      imageBytes(48, 32, (g << 16) | (g << 8) | g, "jpg")
    }
    val avi = mjpegAvi(frames)
    assert(Multimodal.sniffVideoFormat(avi).contains("video/avi"))
    assert(Multimodal.aviFrameChunks(avi).length == 6)

    val media = mediaOf(Seq((1L, avi)))
    // extractFeatures: first-frame truth
    val feat = Multimodal.extractFeatures(media, dim = 4).collect().head
    assert(feat.getAs[Int]("width") == 48 && feat.getAs[Int]("height") == 32)
    assert(feat.getAs[scala.collection.Seq[Float]]("features").forall(_ < 0.05f),
      "frame 0 is black")

    // sampleFrames: every 2nd of 6 → idx 0, 2, 4 with RISING true luminance
    val rows = Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 8, dim = 4)
      .collect().sortBy(_.getInt(1))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    val lums = rows.map(_.getAs[scala.collection.Seq[Float]]("features"))
      .map(f => f.sum / f.length)
    assert(lums(0) < 0.05f, s"frame 0 luminance ${lums(0)}")
    assert(lums(0) < lums(1) && lums(1) < lums(2),
      s"luminance must rise with the planted ramp: ${lums.toSeq}")
    assert(math.abs(lums(2) - 160 / 255.0f) < 0.1f, s"frame 4 ≈ gray 160: ${lums(2)}")
  }

  test("corrupt AVI bytes fall back to the stub instead of failing") {
    val avi = mjpegAvi(Seq(imageBytes(16, 16, 0xFFFFFF, "jpg")))
    val corrupt = avi.take(40).toArray // movi truncated away
    val media = mediaOf(Seq((1L, corrupt)))
    val feat = Multimodal.extractFeatures(media, dim = 4).collect().head
    assert(feat.getAs[Int]("width") >= 64) // stub's hash-derived dims
    // and sampleFrames still yields deterministic stub frames
    val n = Multimodal.sampleFrames(media, everyNth = 1, maxFrames = 4, dim = 4).count()
    assert(n >= 1)
  }

  /** Animated GIF via the JDK's own sequence writer: `n` solid-gray
    * frames with a brightness ramp — what any GIF encoder emits. */
  private def animatedGif(n: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { i =>
      val g = math.min(255, i * 40)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(g, g, g)); gr.fillRect(0, 0, w, h); gr.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    out.toByteArray
  }

  test("real animated-GIF video decode: frame count, stride-only decode, true luminance ramp") {
    val gif = animatedGif(6)
    assert(Multimodal.gifFrameCount(gif) == 6)
    // a single-frame GIF is an IMAGE, not a video
    assert(Multimodal.gifFrameCount(animatedGif(1)) == 1)
    val media = mediaOf(Seq((1L, gif)))
    // every 2nd of 6 → frames 0, 2, 4 with RISING true luminance
    val rows = Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 8, dim = 4)
      .collect().sortBy(_.getInt(1))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    val lums = rows.map(_.getAs[scala.collection.Seq[Float]]("features"))
      .map(f => f.sum / f.length)
    assert(lums(0) < 0.05f, s"frame 0 is black: ${lums(0)}")
    assert(lums(0) < lums(1) && lums(1) < lums(2),
      s"luminance must rise with the planted ramp: ${lums.toSeq}")
    // GIF quantizes the palette — generous tolerance, still a REAL pixel read
    assert(math.abs(lums(2) - 160 / 255.0f) < 0.15f, s"frame 4 ≈ gray 160: ${lums(2)}")
  }
}
