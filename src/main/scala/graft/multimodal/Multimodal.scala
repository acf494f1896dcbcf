package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Locale

import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing for training-data pipelines: media assets ride
 * through the engine as opaque `BINARY` payload columns plus typed metadata
 * structs, processed per-partition in bounded batches — payload bytes never
 * leave the executor, only compact features/metadata shuffle.
 *
 * The codec is REAL: [[ImageIoCodec]] decodes PNG and (multi-frame) GIF
 * through `javax.imageio` — a public JDK API, no external dependency — and
 * derives a pixel-statistics feature vector from the actual raster
 * ([meanR, meanG, meanB, stdR, stdG, stdB, meanLuma, stdLuma], each
 * normalized to [0,1]). Payloads no JDK reader claims (JPEG2000, audio,
 * video) decode to null meta/features — the honest boundary; a production
 * deployment adds codecs (JNI ffmpeg, `mapInPandas` + PIL) behind the same
 * `(payload) => (meta, features)` contract, and every surrounding operator
 * is codec-agnostic.
 */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** `javax.imageio`-backed image decode: format sniffed from the bytes,
    * metadata from the reader, features from the frame-0 raster. */
  object ImageIoCodec {
    /** Decode, or null if no installed reader recognizes the payload. */
    def decode(payload: Array[Byte], featureDim: Int): (Row, Array[Float]) = {
      // Memory-cache stream, NOT ImageIO.createImageInputStream: the
      // default disk cache writes/deletes a temp file per payload on the
      // executor — pure syscall churn when the bytes are already in memory.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val fmt = reader.getFormatName.toLowerCase(Locale.ROOT)
          val nFrames = try reader.getNumImages(true) catch { case _: Exception => 1 }
          val img = reader.read(0)
          val w = img.getWidth
          val h = img.getHeight
          // Color components (alpha excluded): 3 for every RGB-based model,
          // stable across direct and palette (PNG/GIF) representations.
          val channels = img.getColorModel.getNumColorComponents
          // Frame-0 pixel statistics in sRGB. getRGB converts exactly for
          // palette images (the palette IS sRGB entries).
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr, sg, sb, sl = 0.0
          var qr, qg, qb, ql = 0.0
          var i = 0
          while (i < px.length) {
            val p = px(i)
            val r = ((p >> 16) & 0xff).toDouble
            val g = ((p >> 8) & 0xff).toDouble
            val b = (p & 0xff).toDouble
            val l = (r + g + b) / 3.0
            sr += r; sg += g; sb += b; sl += l
            qr += r * r; qg += g * g; qb += b * b; ql += l * l
            i += 1
          }
          val n = px.length.toDouble
          def mean(s: Double) = s / n / 255.0
          def std(s: Double, q: Double) =
            math.sqrt(math.max(0.0, q / n - (s / n) * (s / n))) / 255.0
          val full = Array(
            mean(sr), mean(sg), mean(sb), std(sr, qr), std(sg, qg),
            std(sb, qb), mean(sl), std(sl, ql))
          val feats = Array.tabulate(featureDim)(i =>
            if (i < full.length) full(i).toFloat else 0.0f)
          (Row(w, h, channels, nFrames, fmt), feats)
        } finally reader.dispose()
      } catch {
        // NonFatal, not just IOException: imageio readers throw runtime
        // exceptions on payloads whose magic bytes they claim but whose
        // body is corrupt (truncated GIF, dimension overflow in getRGB) —
        // one bad asset must yield null, not kill the corpus job.
        case scala.util.control.NonFatal(_) => null
      } finally if (iis != null) iis.close()
    }
  }

  /**
   * Decode a binary payload column into `meta` + `features` columns.
   * Executes as a per-partition batch pipeline (`mapPartitions` via the Row
   * encoder): rows stream through the codec without materializing the
   * partition, which is the property that matters at 100 TB — payload bytes
   * never leave the executor, only compact features/metadata shuffle.
   * Undecodable payloads yield null meta/features.
   */
  def decode(df: DataFrame, payloadCol: String, featureDim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("meta", MetaSchema, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val decoded =
          if (payload == null) null
          else ImageIoCodec.decode(payload, featureDim)
        if (decoded == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else Row.fromSeq(r.toSeq ++ Seq(decoded._1, decoded._2))
      }
    }
  }

  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** `javax.sound.sampled`-backed audio decode (WAV/AU/AIFF — whatever the
    * JDK providers claim), 16-bit PCM payloads: metadata from the stream
    * format, features from the actual decoded samples, all channels pooled
    * ([mean, std, min, max, rms] normalized by 2¹⁵, zero-padded to
    * `featureDim`). Same honest boundary as [[ImageIoCodec]]: payloads no
    * provider claims, or whose PCM isn't 16-bit, decode to null. */
  object WavCodec {
    def decode(payload: Array[Byte], featureDim: Int): (Row, Array[Float]) = {
      var ais: AudioInputStream = null
      try {
        ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return null
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val nFrames = ais.getFrameLength.toInt
        val raw = ais.readAllBytes()
        val n = (raw.length / 2) // total 16-bit samples across channels
        if (n == 0) return null
        var sum, sumSq = 0.0
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var i = 0
        while (i + 1 < raw.length) {
          // 16-bit PCM, byte order per the stream format.
          val s: Int =
            if (fmt.isBigEndian) (raw(i) << 8) | (raw(i + 1) & 0xff)
            else (raw(i + 1) << 8) | (raw(i) & 0xff)
          sum += s; sumSq += s.toDouble * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 2
        }
        val mean = sum / n
        val std = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
        val rms = math.sqrt(sumSq / n)
        val sc = 32768.0
        val full = Array(mean / sc, std / sc, mn / sc, mx / sc, rms / sc)
        val feats = Array.tabulate(featureDim)(j =>
          if (j < full.length) full(j).toFloat else 0.0f)
        val name = AudioSystem.getAudioFileFormat(
          new ByteArrayInputStream(payload)).getType.getExtension
        (Row(fmt.getSampleRate.toInt, channels, nFrames,
          fmt.getSampleSizeInBits, name), feats)
      } catch {
        case scala.util.control.NonFatal(_) => null
      } finally if (ais != null) ais.close()
    }
  }

  /** Audio counterpart of [[decode]]: binary payloads → `meta`
    * ([[AudioMetaSchema]]) + `features`, per-partition streaming, nulls for
    * undecodable payloads. */
  def decodeAudio(df: DataFrame, payloadCol: String, featureDim: Int = 8): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("meta", AudioMetaSchema, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val decoded =
          if (payload == null) null
          else WavCodec.decode(payload, featureDim)
        if (decoded == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else Row.fromSeq(r.toSeq ++ Seq(decoded._1, decoded._2))
      }
    }
  }

  /** Explode a decoded asset into one row per sampled frame (`every`-th). */
  def sampleFrames(decoded: DataFrame, every: Int = 1): DataFrame =
    decoded.withColumn("frame_no",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(every))))

  /** Metadata-only resize: scales meta dims, leaves the payload opaque
    * (a real pipeline would re-encode; the schema contract is identical). */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("meta.width"), col("meta.height")))
    decoded.withColumn("meta",
      struct(
        ceil(col("meta.width") * scale).cast("int").as("width"),
        ceil(col("meta.height") * scale).cast("int").as("height"),
        col("meta.channels").as("channels"),
        col("meta.n_frames").as("n_frames"),
        col("meta.format").as("format")))
  }

  // --- deterministic fixtures (real encoded bytes) -------------------------

  /**
   * Synthetic-but-REAL image assets for tests and gates: per id, a two-color
   * vertical-split image (left columns one color, right another) encoded
   * through the actual JDK writers — even ids a PNG (1 frame), odd ids a
   * multi-frame GIF. Every parameter is a closed form of the id, so an
   * independent oracle can predict exactly what a true decode must recover:
   *
   *   width      = 16 + (id % 32)
   *   height     = 16 + ((id * 7) % 32)
   *   n_frames   = 1 (png) | 1 + ((id / 2) % 4) (gif)
   *   red        = (id * 37) % 256 left of column width/2, (id * 101) % 256 right
   *   green/blue = (id * 53) % 256 / (id * 91) % 256 everywhere
   *
   * so frame-0 channel sums are `red_l·(w/2)·h + red_r·(w−w/2)·h` etc.
   * Both writers are bit-exact here: the image is palette-typed with its
   * two exact colors, which PNG and GIF preserve losslessly.
   */
  def syntheticAssets(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idx)
        Row.fromSeq(r.toSeq :+ fixturePayload(id))
      }
    }
  }

  /**
   * Synthetic-but-REAL audio assets: per id, a 16-bit PCM WAV written
   * through the actual JDK encoder (`AudioSystem.write`). Every parameter
   * is a closed form of the id, so an independent oracle can predict what
   * a true decode must recover from the samples themselves:
   *
   *   sample_rate = 8000 + (id % 4) · 4000
   *   channels    = 1 + (id % 2)
   *   n_frames    = 256 + ((id · 13) % 512)
   *   a           = (id · 37) % 256 − 128,  b = (id · 91) % 256 − 128
   *   sample(frame i, channel c) = (a if i even else b) + c
   *
   * so with ha = ⌈n_frames/2⌉, hb = ⌊n_frames/2⌋ the pooled-sample sum is
   * `channels·(ha·a + hb·b) + n_frames·channels·(channels−1)/2`, the min
   * is `min(a,b)` and the max `max(a,b) + channels − 1`. |sum| < 2¹⁷ and
   * features normalize by 2¹⁵, so `round(mean_feat · N · 32768)` recovers
   * the sum bit-exactly through the float features (same device as the
   * image fixture's channel sums).
   */
  def syntheticAudioAssets(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idx)
        Row.fromSeq(r.toSeq :+ audioFixturePayload(id))
      }
    }
  }

  /** One WAV asset's bytes (see [[syntheticAudioAssets]] closed forms). */
  private[graft] def audioFixturePayload(id: Long): Array[Byte] = {
    val sr = 8000 + (id % 4).toInt * 4000
    val channels = 1 + (id % 2).toInt
    val frames = 256 + ((id * 13) % 512).toInt
    val a = ((id * 37) % 256).toInt - 128
    val b = ((id * 91) % 256).toInt - 128
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    var o = 0
    while (i < frames) {
      val base = if (i % 2 == 0) a else b
      var c = 0
      while (c < channels) {
        val s = base + c
        pcm(o) = (s & 0xff).toByte          // little-endian 16-bit
        pcm(o + 1) = ((s >> 8) & 0xff).toByte
        o += 2
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(sr.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos) finally ais.close()
    baos.toByteArray
  }

  /** One asset's bytes (see [[syntheticAssets]] for the closed forms). */
  private[graft] def fixturePayload(id: Long): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + ((id * 7) % 32).toInt
    val redL = ((id * 37) % 256).toInt
    val redR = ((id * 101) % 256).toInt
    val green = ((id * 53) % 256).toInt
    val blue = ((id * 91) % 256).toInt
    // Palette image with exactly the two used colors: both PNG and GIF
    // encode an explicit palette losslessly (a truecolor input would hit
    // the GIF writer's 216-color web-safe quantizer instead).
    val icm = new IndexColorModel(8, 2,
      Array(redL.toByte, redR.toByte),
      Array(green.toByte, green.toByte),
      Array(blue.toByte, blue.toByte))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    val split = w / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, if (x < split) 0 else 1)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    if (id % 2 == 0) {
      ImageIO.write(img, "png", baos)
    } else {
      val frames = 1 + ((id / 2) % 4).toInt
      // Memory-cache stream (see decode): no per-payload temp file.
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          writer.writeToSequence(new IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
    }
    baos.toByteArray
  }
}
