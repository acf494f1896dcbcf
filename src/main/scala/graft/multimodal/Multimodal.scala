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

  /** Decode-bomb ceiling for [[ImageIoCodec]]: payloads whose HEADER
    * declares more pixels than this yield null without allocating. */
  private[multimodal] val MaxDecodePixels: Long = 64L * 1024 * 1024

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
          // Decode-bomb guard BEFORE allocating the raster: a few-hundred-
          // byte payload can declare 40000x40000 in its header, and the
          // multi-GB allocation inside reader.read would surface as
          // OutOfMemoryError — which NonFatal deliberately does not catch,
          // so it would kill the task instead of yielding null. The header
          // dims are cheap to read; 64M pixels (~256 MB ARGB) is far above
          // any sane training asset.
          val declaredW = reader.getWidth(0)
          val declaredH = reader.getHeight(0)
          if (declaredW <= 0 || declaredH <= 0 ||
            declaredW.toLong * declaredH > MaxDecodePixels) return null
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
  def decode(df: DataFrame, payloadCol: String, featureDim: Int = 16): DataFrame =
    appendDecoded(df, payloadCol, MetaSchema)(ImageIoCodec.decode(_, featureDim))

  /** The shared per-partition scaffold: append `newFields` computed from
    * each row by `fn`, streaming through the Row encoder (rows never
    * accumulate; payload bytes never leave the executor). */
  private def appendComputed(df: DataFrame, newFields: Seq[StructField])(
      fn: Row => Seq[Any]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ newFields)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions(rows => rows.map(r => Row.fromSeq(r.toSeq ++ fn(r))))
  }

  /** Codec entry-point scaffold: payload → (`meta`: metaSchema,
    * `features`: float array), nulls for null/undecodable payloads. */
  private def appendDecoded(df: DataFrame, payloadCol: String,
      metaSchema: StructType)(
      codec: Array[Byte] => (Row, Array[Float])): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    appendComputed(df, Seq(
      StructField("meta", metaSchema, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = true))) { r =>
      val payload = r.get(idx).asInstanceOf[Array[Byte]]
      val decoded = if (payload == null) null else codec(payload)
      if (decoded == null) Seq(null, null) else Seq(decoded._1, decoded._2)
    }
  }

  /** Fixture-generator scaffold: `payload` bytes as a closed form of the
    * long id column. */
  private def appendPayload(df: DataFrame, idCol: String)(
      payloadFn: Long => Array[Byte]): DataFrame = {
    val idx = df.schema.fieldIndex(idCol)
    appendComputed(df,
      Seq(StructField("payload", BinaryType, nullable = false)))(
      r => Seq(payloadFn(r.getLong(idx))))
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
        // One header parse up front yields both the container type and the
        // stream format, and rejects non-PCM-16 before opening the stream.
        val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return null
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        if (frameBytes <= 0) return null
        ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val raw = ais.readAllBytes()
        // Frame count from the bytes actually read, not getFrameLength —
        // some providers report NOT_SPECIFIED (-1) for unknown-length
        // headers (e.g. AU with 0xffffffff data size), and -1 in the
        // metadata would silently corrupt any n_frames × channels math.
        val nFrames = raw.length / frameBytes
        val n = raw.length / 2 // total 16-bit samples across channels
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
        (Row(fmt.getSampleRate.toInt, channels, nFrames,
          fmt.getSampleSizeInBits, aff.getType.getExtension), feats)
      } catch {
        case scala.util.control.NonFatal(_) => null
      } finally if (ais != null) ais.close()
    }
  }

  /** Audio counterpart of [[decode]]: binary payloads → `meta`
    * ([[AudioMetaSchema]]) + `features`, per-partition streaming, nulls for
    * undecodable payloads. */
  def decodeAudio(df: DataFrame, payloadCol: String, featureDim: Int = 8): DataFrame =
    appendDecoded(df, payloadCol, AudioMetaSchema)(WavCodec.decode(_, featureDim))

  val VideoMetaSchema: StructType = StructType(Seq(
    StructField("duration_ms", LongType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("brand", StringType, nullable = false)))

  /**
   * ISO BMFF (MP4/MOV) container metadata parser — byte-level box
   * navigation per the PUBLIC ISO/IEC 14496-12 layout: `ftyp` major brand,
   * `moov/mvhd` timescale + duration (version 0 and 1), track count and
   * the first video track's `tkhd` 16.16 fixed-point dimensions.
   *
   * Honest boundary, stated plainly: this is CONTAINER parsing, not frame
   * decode — the JDK ships no video codec, so sample data stays opaque (a
   * production deployment decodes frames via JNI ffmpeg behind the same
   * per-partition contract). Unlike the image/audio fixtures, the video
   * fixture is written by this module too (no independent JDK encoder
   * exists); what the gate proves is that the parser truly navigates the
   * binary box tree — sizes, versions, fixed-point formats — not that a
   * third-party encode round-trips.
   */
  object Mp4Meta {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Top-level and nested box walk: invokes `f(type, start, end)` for
      * each box in [from, to); `f` recurses where it wants to. */
    private def walk(b: Array[Byte], from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size32 = u32(b, o)
        val typ = fourcc(b, o + 4)
        val (payload, size) =
          if (size32 == 1 && o + 16 <= to) (o + 16, u64(b, o + 8))
          else (o + 8, if (size32 == 0) (to - o).toLong else size32)
        if (size < 8 || o + size > to) return // malformed: stop, don't throw
        f(typ, payload, o + size.toInt)
        o += size.toInt
      }
    }

    /** Parse, or null if the payload is not ISO BMFF. */
    def parse(payload: Array[Byte]): Row = {
      try {
        if (payload.length < 12 || fourcc(payload, 4) != "ftyp") return null
        val brand = fourcc(payload, 8)
        var timescale = 0
        var duration = 0L
        var nTracks = 0
        var width = 0
        var height = 0
        walk(payload, 0, payload.length) { (typ, p, end) =>
          typ match {
            case "moov" => walk(payload, p, end) { (t2, p2, end2) =>
              t2 match {
                case "mvhd" =>
                  val v = payload(p2) & 0xff
                  if (v == 1) { // 64-bit times: ver/flags, 2x u64, u32 ts, u64 dur
                    timescale = u32(payload, p2 + 20).toInt
                    duration = u64(payload, p2 + 24)
                  } else {
                    timescale = u32(payload, p2 + 12).toInt
                    duration = u32(payload, p2 + 16)
                  }
                case "trak" =>
                  nTracks += 1
                  walk(payload, p2, end2) { (t3, p3, _) =>
                    if (t3 == "tkhd" && width == 0) {
                      val v = payload(p3) & 0xff
                      // width/height are the last two 16.16 fields: after
                      // ver/flags(4) + creation/modification (4+4 | 8+8) +
                      // track_id(4) + reserved(4) + duration(4|8) +
                      // reserved(8) + layer/alt/volume/reserved(8) +
                      // matrix(36) → offset 76 (v0) / 88 (v1).
                      val base = p3 + (if (v == 1) 88 else 76)
                      val w = (u32(payload, base) >> 16).toInt
                      val h = (u32(payload, base + 4) >> 16).toInt
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                  }
                case _ =>
              }
            }
            case _ =>
          }
        }
        if (timescale <= 0) return null
        val durationMs = duration * 1000L / timescale
        Row(durationMs, timescale, nTracks, width, height, brand)
      } catch {
        case scala.util.control.NonFatal(_) => null
      }
    }
  }

  /** Container-metadata extraction for video payloads: binary → `meta`
    * ([[VideoMetaSchema]]), nulls for non-BMFF payloads. Per-partition
    * streaming like [[decode]]/[[decodeAudio]]; no features column —
    * there is no JDK frame decoder, and a fake one would be dishonest. */
  def parseVideoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    appendComputed(df,
      Seq(StructField("meta", VideoMetaSchema, nullable = true))) { r =>
      val payload = r.get(idx).asInstanceOf[Array[Byte]]
      Seq(if (payload == null) null else Mp4Meta.parse(payload))
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
  def syntheticAssets(df: DataFrame, idCol: String): DataFrame =
    appendPayload(df, idCol)(fixturePayload)

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
  def syntheticAudioAssets(df: DataFrame, idCol: String): DataFrame =
    appendPayload(df, idCol)(audioFixturePayload)

  /**
   * Synthetic minimal-but-well-formed ISO BMFF assets with closed-form
   * metadata ([[Mp4Meta]] honesty note applies: the fixture shares this
   * module, the gate proves real box-tree navigation):
   *
   *   timescale = 600 + (id % 5) · 100,  brand = isom (even) | mp42 (odd)
   *   duration  = 6000 + (id · 17) % 9000  (units → ms = ·1000 / timescale)
   *   n_tracks  = 1 + (id % 2)   (video first; audio track has 0×0 tkhd)
   *   width     = 320 + (id % 64) · 2,  height = 180 + ((id · 3) % 64) · 2
   *
   * Box-format coverage varies by id: mvhd version 1 (64-bit times) on odd
   * ids, tkhd version 1 when id % 3 = 0, and a `free` box inserted before
   * `moov` when id % 4 = 2 (the walker must skip it).
   */
  def syntheticVideoAssets(df: DataFrame, idCol: String): DataFrame =
    appendPayload(df, idCol)(videoFixturePayload)

  /** One MP4 asset's bytes (see [[syntheticVideoAssets]] closed forms). */
  private[graft] def videoFixturePayload(id: Long): Array[Byte] = {
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val total = 8 + payload.map(_.length).sum
      val bb = ByteBuffer.allocate(total)
      bb.putInt(total)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      payload.foreach(bb.put)
      bb.array()
    }
    val timescale = 600 + (id % 5).toInt * 100
    val duration = 6000L + (id * 17) % 9000
    val width = 320 + (id % 64).toInt * 2
    val height = 180 + ((id * 3) % 64).toInt * 2
    val brand = if (id % 2 == 0) "isom" else "mp42"

    val mvhd =
      if (id % 2 == 1) { // version 1: 64-bit creation/modification/duration
        val bb = ByteBuffer.allocate(112)
        bb.putInt(0x01000000); bb.putLong(0L); bb.putLong(0L)
        bb.putInt(timescale); bb.putLong(duration)
        box("mvhd", bb.array())
      } else {
        val bb = ByteBuffer.allocate(100)
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putInt(timescale); bb.putInt(duration.toInt)
        box("mvhd", bb.array())
      }
    def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] =
      if (id % 3 == 0) { // version 1
        val bb = ByteBuffer.allocate(96)
        bb.putInt(0x01000000); bb.putLong(0L); bb.putLong(0L)
        bb.putInt(trackId); bb.putInt(0); bb.putLong(duration)
        bb.position(88); bb.putInt(w << 16); bb.putInt(h << 16)
        box("tkhd", bb.array())
      } else {
        val bb = ByteBuffer.allocate(84)
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putInt(trackId); bb.putInt(0); bb.putInt(duration.toInt)
        bb.position(76); bb.putInt(w << 16); bb.putInt(h << 16)
        box("tkhd", bb.array())
      }
    val traks =
      if (id % 2 == 0) Seq(box("trak", tkhd(1, width, height)))
      else Seq(box("trak", tkhd(1, width, height)), box("trak", tkhd(2, 0, 0)))
    val ftypPayload = ByteBuffer.allocate(8)
      .put(brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(0).array()
    val parts = Seq(box("ftyp", ftypPayload)) ++
      (if (id % 4 == 2) Seq(box("free", new Array[Byte](12))) else Seq.empty) ++
      Seq(box("moov", (mvhd +: traks): _*))
    parts.flatten.toArray
  }

  /** One WAV asset's bytes (see [[syntheticAudioAssets]] closed forms). */
  private[graft] def audioFixturePayload(id: Long): Array[Byte] =
    buildWav(8000 + (id % 4).toInt * 4000, 1 + (id % 2).toInt,
      256 + ((id * 13) % 512).toInt,
      ((id * 37) % 256).toInt - 128, ((id * 91) % 256).toInt - 128)

  /** Parameterized WAV writer behind [[audioFixturePayload]] — also the
    * device the WavCodec property test drives with arbitrary
    * (sr, channels, frames, a, b). Sample(i, c) = (a if i even else b) + c. */
  private[graft] def buildWav(sr: Int, channels: Int, frames: Int,
      a: Int, b: Int): Array[Byte] = {
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
