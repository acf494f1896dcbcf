package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: schema, decode batching, frame
  * sampling, metadata resize. The codec itself is a documented stub. */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  private lazy val assets = Seq(
    (1L, "a.img", Array[Byte](1, 2, 3, 4, 5, 6)),
    (2L, "b.vid", Array[Byte](9, 8, 7, 6, 5, 4, 3)),
    (3L, "c.img", null.asInstanceOf[Array[Byte]])
  ).toDF("asset_id", "uri", "payload").repartition(2)

  test("decode adds typed meta + features, streams per partition") {
    val d = Multimodal.decode(assets, "payload", featureDim = 8)
    assert(d.schema.fieldNames.toSeq ==
      Seq("asset_id", "uri", "payload", "meta", "features"))
    val rows = d.orderBy("asset_id").collect()
    val m1 = rows(0).getStruct(3)
    assert(m1.getAs[Int]("width") >= 16 && m1.getAs[Int]("channels") >= 1)
    assert(rows(0).getSeq[Float](4).length == 8)
    // NULL payload -> NULL meta/features, row preserved
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(4))
    // deterministic: same payload, same decode
    val again = Multimodal.decode(assets, "payload", featureDim = 8)
      .orderBy("asset_id").collect()
    assert(again(0).getSeq[Float](4) == rows(0).getSeq[Float](4))
  }

  test("sampleFrames explodes by frame count") {
    val d = Multimodal.decode(assets.where(col("asset_id") =!= 3L), "payload")
    val frames = Multimodal.sampleFrames(d).groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_no")).as("last"))
      .orderBy("asset_id").collect()
    frames.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getInt(2) == r.getLong(1).toInt - 1) // frames 0..n-1, every=1
    }
  }

  test("sampleFrames with stride keeps every n-th frame") {
    val d = Multimodal.decode(assets.where(col("asset_id") === 2L), "payload")
    val n = d.select(col("meta.n_frames")).collect().head.getInt(0)
    val sampled = Multimodal.sampleFrames(d, every = 2)
      .select("frame_no").collect().map(_.getInt(0)).sorted
    assert(sampled.toSeq == (0 until n by 2).toSeq)
  }

  test("resizeMeta caps the longest side, preserves schema") {
    val d = Multimodal.resizeMeta(
      Multimodal.decode(assets.where(col("asset_id") === 1L), "payload"), maxSide = 32)
    val m = d.select(col("meta.*")).collect().head
    assert(math.max(m.getAs[Int]("width"), m.getAs[Int]("height")) <= 32)
    // same field names/types (nullability widens through the struct rebuild)
    val st = d.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
