package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing for training-data pipelines: media assets ride
 * through the engine as opaque `BINARY` payload columns plus typed metadata
 * structs, processed per-partition in bounded batches — the schema,
 * partitioning, and iterator shapes are real and tested; only the codec
 * calls are stubbed.
 *
 * STUB BOUNDARY: this container has no image/audio codecs, so
 * [[StubCodec.decode]] derives deterministic fake metadata and features
 * from the payload bytes. A production deployment replaces StubCodec with a
 * real binding (JNI codec or `mapInPandas` + PIL/ffmpeg on the PySpark
 * side); every surrounding operator is codec-agnostic.
 */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic stand-in for a real media codec. */
  object StubCodec {
    /** "Decode" = derive (meta, feature vector) from the payload bytes. */
    def decode(payload: Array[Byte], featureDim: Int): (Row, Array[Float]) = {
      val n = payload.length
      val h0 = payload.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
      val width = 16 + math.floorMod(h0, 1024).toInt
      val height = 16 + math.floorMod(h0 >>> 10, 1024).toInt
      val channels = 1 + math.floorMod(h0 >>> 20, 4).toInt
      val frames = 1 + math.floorMod(n, 8)
      val fmt = if (n % 2 == 0) "img" else "vid"
      val feats = Array.tabulate(featureDim) { i =>
        val m = graft.expressions.TextHash.mix64(h0 + i)
        ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
      (Row(width, height, channels, frames, fmt), feats)
    }
  }

  /**
   * Decode a binary payload column into `meta` + `features` columns.
   * Executes as a per-partition batch pipeline (`mapPartitions` via the Row
   * encoder): rows stream through the codec without materializing the
   * partition, which is the property that matters at 100 TB — payload bytes
   * never leave the executor, only compact features/metadata shuffle.
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
        if (payload == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else {
          val (meta, feats) = StubCodec.decode(payload, featureDim)
          Row.fromSeq(r.toSeq ++ Seq(meta, feats))
        }
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
}
