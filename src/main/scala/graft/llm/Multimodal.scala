package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * IMAGE decode is REAL: payloads sniffed as PNG/JPEG/BMP/GIF by magic
  * bytes are decoded with the JDK's `javax.imageio` (headless, zero
  * external dependencies) — true width/height plus a g×g mean-luminance
  * grid as the feature vector. AUDIO decode is REAL the same way:
  * WAV/AIFF/AU payloads decode through `javax.sound.sampled` to true
  * (sample rate, channels) plus a dim-window RMS envelope. VIDEO decode
  * is REAL for MJPEG-in-AVI (the RIFF container walk is ~60 lines here
  * and every frame chunk is a standalone JPEG the image path already
  * decodes) AND for animated GIF (ImageIO addresses frames by index) —
  * true dimensions, true per-frame luminance, frame sampling that only
  * touches selected frames. Remaining payloads (non-MJPEG/GIF
  * codecs — no JDK decoder) fall back to the
  * deterministic STUB (hash-derived dimensions + features); the
  * Spark-side contract stays fully real and testable either way:
  *  - schema: (id, media binary, media_meta struct)
  *  - partition-level batch processing via mapPartitions (the Scala analog
  *    of an Arrow-batched python UDF: one decoder init per partition, not
  *    per row)
  *  - bounded memory: rows stream through the iterator, no partition-wide
  *    materialization.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Wrap any table with an id + string payload into the media contract
    * (fixture stand-in for real image/audio bytes). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("fake/raw").as("format"),
        length(col(payloadCol)).cast("long").as("n_bytes")).as("media_meta"))

  /** STUB decoder: deterministic pseudo-decode of a media blob.
    * A real deployment replaces the body with an image/audio codec call;
    * everything around it (batching, schema, null handling) stays. */
  private def payloadHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    h
  }

  private def fakeFeatures(seed: Long, dim: Int): Array[Float] = {
    val feats = new Array[Float](dim)
    var j = 0
    var s = seed
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      feats(j) = (s >>> 40).toFloat / (1 << 24).toFloat
      j += 1
    }
    feats
  }

  private def fakeDecode(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val h = payloadHash(bytes)
    val w = 64 + java.lang.Long.remainderUnsigned(h, 1024).toInt
    val ht = 64 + java.lang.Long.remainderUnsigned(h >>> 17, 1024).toInt
    (w, ht, fakeFeatures(h, dim))
  }

  /** Container sniffing by magic bytes — cheaper and more trustworthy than
    * the self-declared `media_meta.format` (user metadata lies; bytes
    * don't). Only formats the JDK decoder handles are claimed. */
  private[llm] def sniffImageFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("image/png")
    else if (b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte)
      Some("image/jpeg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some("image/gif")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      Some("image/bmp")
    else None

  /** Mean luminance (0..1) over a g×g spatial grid, g = floor(sqrt(dim));
    * remaining positions pad with the global mean so the vector is always
    * exactly `dim` wide. Real pixels, deterministic, O(pixels) one pass. */
  private def luminanceGrid(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val gy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val gx = math.min(g - 1, x * g / w)
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)) / 255.0
        val c = gy * g + gx
        sums(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(g * g)(i => if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
    if (cells.length >= dim) cells.take(dim)
    else {
      val mean = (cells.sum / cells.length).toFloat
      cells ++ Array.fill(dim - cells.length)(mean)
    }
  }

  /** Real JDK image decode for sniffed image payloads; None → caller falls
    * back to the stub (corrupt bytes, or a non-image container). */
  private def realDecode(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    sniffImageFormat(bytes).flatMap { _ =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None // no reader claimed the stream
        else Some((img.getWidth, img.getHeight, luminanceGrid(img, dim)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Audio container sniffing: the formats `javax.sound.sampled` reads
    * headless with zero external jars (same move as the ImageIO image
    * path). RIFF/WAVE, FORM/AIFF, .snd (AU). */
  private[llm] def sniffAudioFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      Some("audio/wav")
    else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F')
      Some("audio/aiff")
    else if (b.length >= 4 && b(0) == 0x2E.toByte && b(1) == 's' && b(2) == 'n' && b(3) == 'd')
      Some("audio/basic")
    else None

  /** Per-window RMS amplitude (0..1) over `dim` equal time windows of the
    * decoded PCM stream — the audio analog of the image luminance grid:
    * real samples, deterministic, O(samples) one pass, O(dim) memory. */
  private def rmsGrid(samples: Array[Double], dim: Int): Array[Float] = {
    if (samples.isEmpty) return new Array[Float](dim)
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < samples.length) {
      val w = math.min(dim - 1, (i.toLong * dim / samples.length).toInt)
      sums(w) += samples(i) * samples(i); counts(w) += 1
      i += 1
    }
    Array.tabulate(dim)(w =>
      if (counts(w) == 0) 0.0f else math.sqrt(sums(w) / counts(w)).toFloat)
  }

  /** Real JDK audio decode for sniffed WAV/AIFF/AU payloads: true sample
    * rate and channel count plus a dim-window RMS envelope as features
    * (PCM decoded via `javax.sound.sampled`, normalized to 16-bit signed).
    * (width, height) carry (sample rate Hz, channels) in the feature
    * contract. None → stub fallback (corrupt bytes / unsupported codec). */
  private def realAudioDecode(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    sniffAudioFormat(bytes).flatMap { _ =>
      try {
        val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = src.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
          try {
            val raw = pcm.readAllBytes()
            val n = raw.length / 2
            val samples = new Array[Double](n)
            var i = 0
            while (i < n) {
              val lo = raw(2 * i) & 0xFF
              val hi = raw(2 * i + 1).toInt
              samples(i) = ((hi << 8) | lo) / 32768.0
              i += 1
            }
            Some((f.getSampleRate.toInt, f.getChannels, rmsGrid(samples, dim)))
          } finally pcm.close()
        } finally src.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  // ---- video: MJPEG-in-AVI, decoded with ZERO external deps ----------
  // An AVI is a RIFF container; with the MJPEG codec every frame chunk
  // ('NNdc') is a standalone JPEG — which `javax.imageio` already decodes.
  // So the whole "video decode" problem for this ubiquitous archival
  // format reduces to walking RIFF chunk offsets (this file) + the image
  // path above. Other codecs (H.264 etc.) have no JDK decoder and keep
  // the deterministic stub.

  private[llm] def sniffVideoFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')
      Some("video/avi")
    else None

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (offset, size) of every video frame chunk ('..dc'/'..db') in the
    * movi list — one linear walk over chunk HEADERS (frames are never
    * copied), O(frames) memory at 8 bytes per frame. Malformed
    * structure → empty (caller falls back to the stub). */
  private[llm] def aviFrameChunks(b: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    def walk(from: Int, end: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = fourcc(b, p)
        val size = leInt(b, p + 4)
        if (size < 0 || p + 8 + size > end) return // malformed: stop
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(b, p + 8)
          if (listType == "movi" || (inMovi && listType == "rec "))
            walk(p + 12, p + 8 + size, inMovi = true)
        } else if (inMovi && size > 0 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          out += ((p + 8, size))
        }
        p += 8 + size + (size & 1) // chunks pad to even
      }
    }
    try {
      if (b.length < 12) return Vector.empty
      walk(12, math.min(b.length, 8 + leInt(b, 4)), inMovi = false)
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Vector.empty }
  }

  private def decodeAviFrame(b: Array[Byte], off: Int, size: Int): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b, off, size)))
    catch { case scala.util.control.NonFatal(_) => None }

  // ---- video #2: animated GIF — the other multi-frame format the JDK
  // decodes natively. ImageIO's gif reader addresses frames by index, so
  // stride sampling decodes ONLY the selected frames.

  /** Frame count of an animated GIF (≥2 = treat as video), 0 when the
    * payload is not a GIF or the reader balks. */
  private[llm] def gifFrameCount(b: Array[Byte]): Int =
    if (sniffImageFormat(b).contains("image/gif")) {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) 0
      else {
        val reader = it.next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try { reader.setInput(iis, false, true); reader.getNumImages(true) }
        catch { case scala.util.control.NonFatal(_) => 0 }
        finally { reader.dispose(); iis.close() }
      }
    } else 0

  /** Decode exactly the requested GIF frame indexes (one reader pass). */
  private[llm] def decodeGifFrames(b: Array[Byte], idxs: Seq[Int])
      : Map[Int, java.awt.image.BufferedImage] = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!it.hasNext) return Map.empty
    val reader = it.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      idxs.filter(i => i >= 0 && i < n).flatMap { i =>
        try Some(i -> reader.read(i))
        catch { case scala.util.control.NonFatal(_) => None }
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
    finally { reader.dispose(); iis.close() }
  }

  /** Real MJPEG-AVI decode: true first-frame dimensions + luminance grid.
    * None → not an AVI / no decodable frames → stub fallback. */
  private def realVideoDecode(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    sniffVideoFormat(bytes).flatMap { _ =>
      aviFrameChunks(bytes).iterator
        .flatMap { case (off, size) => decodeAviFrame(bytes, off, size) }
        .nextOption()
        .map(img => (img.getWidth, img.getHeight, luminanceGrid(img, dim)))
    }

  /** Image, audio, and MJPEG-AVI video decode for real; everything else
    * (non-MJPEG codecs — no JDK decoder) takes the deterministic stub. */
  private def decode(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) =
    realDecode(bytes, dim)
      .orElse(realAudioDecode(bytes, dim))
      .orElse(realVideoDecode(bytes, dim))
      .getOrElse(fakeDecode(bytes, dim))

  val frameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB resize: recompute dims bounded by `maxDim`, preserving aspect
    * (real deployment: codec rescale; the metadata/schema contract and the
    * single-projection shape are the real part). */
  def resize(media: DataFrame, dim: Int = 16, maxDim: Int = 256): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(featureSchema.fields.toSeq :+
      StructField("resized", BooleanType) :+ StructField("scale", FloatType)))
    media.select(col("id"), col("media"), col("media_meta.format").as("format"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h, feats) = decode(if (bytes == null) Array.emptyByteArray else bytes, dim)
          val scale = math.min(1.0f, maxDim.toFloat / math.max(w, h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          Row(r.getLong(0), r.getString(2), nw, nh, feats.toSeq, scale < 1.0f, scale)
        }
      }(enc)
  }

  /** Frame sampling for video payloads: every `everyNth` frame up to
    * `maxFrames`, emitted 1:N through the partition iterator (flatMap) —
    * no frame buffer materializes, so memory stays O(frame), the shape
    * that survives hour-long videos at 100 TB.
    *
    * MJPEG-AVI payloads are REAL: the frame count comes from the
    * container's movi chunk list and each SELECTED frame (only those —
    * the stride skips the rest without touching their bytes) decodes via
    * the JDK JPEG path into a true luminance grid. Other payloads keep
    * the deterministic stub (frame count from payload size, hash-derived
    * features; payload hashed ONCE, per-frame seeds mix the index —
    * copying the payload per frame would be O(frames × payload)). */
  def sampleFrames(media: DataFrame, everyNth: Int = 10, maxFrames: Int = 8,
                   dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val safe = if (bytes == null) Array.emptyByteArray else bytes
          val aviFrames =
            if (sniffVideoFormat(safe).isDefined) aviFrameChunks(safe) else Vector.empty
          val gifFrames = if (aviFrames.nonEmpty) 0 else gifFrameCount(safe)
          if (aviFrames.nonEmpty) {
            val h = payloadHash(safe)
            Iterator.range(0, aviFrames.length, everyNth).take(maxFrames).map { f =>
              val (off, size) = aviFrames(f)
              val feats = decodeAviFrame(safe, off, size)
                .map(luminanceGrid(_, dim))
                .getOrElse(fakeFeatures(h * 31 + f, dim)) // corrupt frame
              Row(r.getLong(0), f, feats.toSeq)
            }
          } else if (gifFrames >= 2) {
            // animated GIF = the JDK's other REAL multi-frame decode:
            // only the stride-selected frames are read
            val h = payloadHash(safe)
            val picked = Range(0, gifFrames, everyNth).take(maxFrames)
            val decoded = decodeGifFrames(safe, picked)
            picked.iterator.map { f =>
              val feats = decoded.get(f).map(luminanceGrid(_, dim))
                .getOrElse(fakeFeatures(h * 31 + f, dim)) // corrupt frame
              Row(r.getLong(0), f, feats.toSeq)
            }
          } else {
            val nFrames = (safe.length / 100) + 1
            val h = payloadHash(safe)
            Iterator.range(0, nFrames, everyNth).take(maxFrames).map { f =>
              Row(r.getLong(0), f, fakeFeatures(h * 31 + f, dim).toSeq)
            }
          }
        }
      }(enc)
  }

  /** Mean luminance (0..1) over an ARBITRARY gw×gh grid, row-major — the
    * perceptual-hash kernel (aHash wants 8×8, dHash 9×8). Same one-pass
    * real-pixel walk as luminanceGrid. */
  private def lumCells(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val gx = math.min(gw - 1, x * gw / w)
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)) / 255.0
        val c = gy * gw + gx
        sums(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
  }

  /** aHash: 8×8 grid, bit set where the cell beats the grid mean. */
  private[llm] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = lumCells(img, 8, 8)
    val mean = cells.sum / cells.length
    var bits = 0L
    var i = 0
    while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** dHash: 9×8 grid, bit r*8+c set where cell(r,c+1) > cell(r,c) —
    * horizontal gradient sign, the more rotation/brightness-robust of the
    * two classic hashes. */
  private[llm] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = lumCells(img, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) bits |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    bits
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("phash", LongType),
    StructField("decoded", BooleanType)))

  /** 64-bit perceptual hash per media row over REAL decoded pixels
    * (`ahash` | `dhash`); non-image payloads hash deterministically from
    * bytes (decoded=false) so the column is total. The near-dup key for
    * images the way MinHash is for text: map-only, one decode per row,
    * one decoder init per partition. */
  def perceptualHash(media: DataFrame, kind: String = "dhash"): DataFrame = {
    require(kind == "ahash" || kind == "dhash", s"perceptualHash: unknown kind '$kind'")
    val enc = org.apache.spark.sql.Encoders.row(phashSchema)
    media.select(col("id"), col("media"), col("media_meta.format").as("format"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]]("media")).getOrElse(Array.emptyByteArray)
          val decoded = sniffImageFormat(bytes).flatMap { _ =>
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          }
          val hash = decoded match {
            case Some(img) => if (kind == "ahash") aHash64(img) else dHash64(img)
            case None      => payloadHash(bytes) // deterministic fallback
          }
          Row(r.getLong(0), r.getString(2), hash, decoded.isDefined)
        }
      }(enc)
  }

  /** Image near-duplicate pairs by perceptual hash: band the 64-bit hash
    * into 4×16-bit chunks and equi-join per chunk (pigeonhole: hamming ≤ 3
    * guarantees a shared chunk; larger budgets trade recall, same contract
    * as the SimHash text path), then verify true hamming ≤ `maxHamming`.
    * Banded join on an 8-byte key — no all-pairs stage at any scale. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3,
                    kind: String = "dhash"): DataFrame = {
    val sig = perceptualHash(media, kind).select(col("id"), col("phash"))
    val chunked = sig.select(col("id"), col("phash"),
      explode(expr("transform(sequence(0, 3), c -> struct(c as chunk, " +
        "cast(shiftright(phash, c * 16) & 65535 as int) as ck))")).as("cc"))
      .select(col("id"), col("phash"), col("cc.chunk"), col("cc.ck"))
    val a = chunked.select(col("chunk"), col("ck"), col("id").as("a_id"), col("phash").as("a_hash"))
    val b = chunked.select(col("chunk"), col("ck"), col("id").as("b_id"), col("phash").as("b_hash"))
    a.join(b, Seq("chunk", "ck")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", graft.functions.Functions.hamming64(col("a_hash"), col("b_hash")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Decode + feature-extract, one decoder per partition. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("id"), col("media"), col("media_meta.format").as("format"))
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model weights…)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h, feats) = decode(if (bytes == null) Array.emptyByteArray else bytes, dim)
          Row(r.getLong(0), r.getString(2), w, h, feats.toSeq)
        }
      }(enc)
  }
}
