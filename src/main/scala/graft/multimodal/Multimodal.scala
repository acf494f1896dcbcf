package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Locale

import javax.imageio.{IIOImage, ImageIO}

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
