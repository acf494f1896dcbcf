package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing with the real javax.imageio codec:
  * PNG/GIF decode, pixel-stat features, frame sampling, metadata resize. */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  // Real encoded bytes: id 2 → PNG (even), id 3 → GIF with 1+(3/2)%4 = 2
  // frames (odd), plus an undecodable payload and a NULL.
  private lazy val assets = Seq(
    (2L, "a.png", Multimodal.fixturePayload(2L)),
    (3L, "b.gif", Multimodal.fixturePayload(3L)),
    (4L, "c.bin", Array[Byte](1, 2, 3, 4, 5, 6)),
    (5L, "d.nul", null.asInstanceOf[Array[Byte]])
  ).toDF("asset_id", "uri", "payload").repartition(2)

  test("decode recovers true dims/format/frames from real PNG and GIF bytes") {
    val d = Multimodal.decode(assets, "payload", featureDim = 8)
    assert(d.schema.fieldNames.toSeq ==
      Seq("asset_id", "uri", "payload", "meta", "features"))
    val rows = d.orderBy("asset_id").collect()
    val png = rows(0).getStruct(3)
    assert(png.getAs[Int]("width") == 16 + 2 % 32)
    assert(png.getAs[Int]("height") == 16 + (2 * 7) % 32)
    assert(png.getAs[Int]("channels") == 3)
    assert(png.getAs[Int]("n_frames") == 1)
    assert(png.getAs[String]("format") == "png")
    val gif = rows(1).getStruct(3)
    assert(gif.getAs[Int]("width") == 16 + 3 % 32)
    assert(gif.getAs[Int]("n_frames") == 2)
    assert(gif.getAs[String]("format") == "gif")
    // undecodable and NULL payloads -> NULL meta/features, rows preserved
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(4))
    assert(rows(3).isNullAt(3) && rows(3).isNullAt(4))
    // deterministic
    val again = Multimodal.decode(assets, "payload", featureDim = 8)
      .orderBy("asset_id").collect()
    assert(again(0).getSeq[Float](4) == rows(0).getSeq[Float](4))
  }

  test("features are the true raster statistics") {
    // id 2: w=18, h=30, split=9; red 74 left / 202 right; green 106, blue 182.
    val id = 2L
    val (w, h, split) = (18, 30, 9)
    val (redL, redR, grn, blu) = ((id * 37 % 256).toInt, (id * 101 % 256).toInt,
      (id * 53 % 256).toInt, (id * 91 % 256).toInt)
    val f = Multimodal.decode(assets.where(col("asset_id") === 2L), "payload",
      featureDim = 8).select("features").head().getSeq[Float](0)
    val meanR = (redL * split + redR * (w - split)).toDouble / w / 255.0
    assert(math.abs(f(0) - meanR) < 1e-6, s"meanR ${f(0)} vs $meanR")
    assert(math.abs(f(1) - grn / 255.0) < 1e-6)
    assert(math.abs(f(2) - blu / 255.0) < 1e-6)
    // stdR of the two-value split; green/blue are constant -> std 0
    val p = split.toDouble / w
    val stdR = math.sqrt(p * (1 - p)) * math.abs(redR - redL) / 255.0
    assert(math.abs(f(3) - stdR) < 1e-6, s"stdR ${f(3)} vs $stdR")
    assert(f(4) == 0.0f && f(5) == 0.0f)
    val _ = h
  }

  test("sampleFrames explodes by frame count") {
    val d = Multimodal.decode(
      assets.where(col("asset_id") === 2L || col("asset_id") === 3L), "payload")
    val frames = Multimodal.sampleFrames(d).groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_no")).as("last"))
      .orderBy("asset_id").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // png 1, gif 2
    frames.foreach(r => assert(r.getInt(2) == r.getLong(1).toInt - 1))
  }

  test("sampleFrames with stride keeps every n-th frame") {
    // id 7 → GIF with 1 + (7/2) % 4 = 4 frames
    val gif4 = Seq((7L, Multimodal.fixturePayload(7L))).toDF("asset_id", "payload")
    val d = Multimodal.decode(gif4, "payload")
    assert(d.select(col("meta.n_frames")).head().getInt(0) == 4)
    val sampled = Multimodal.sampleFrames(d, every = 2)
      .select("frame_no").collect().map(_.getInt(0)).sorted
    assert(sampled.toSeq == Seq(0, 2))
  }

  test("decodeAudio recovers true WAV metadata and sample stats") {
    // id 6 → mono 16kHz, id 9 → stereo; closed forms at syntheticAudioAssets
    val d = Multimodal.decodeAudio(Seq(
      (6L, Multimodal.audioFixturePayload(6L)),
      (9L, Multimodal.audioFixturePayload(9L)),
      (10L, Array[Byte](1, 2, 3, 4)),      // undecodable
      (11L, Multimodal.fixturePayload(2L)) // a PNG is not audio
    ).toDF("asset_id", "payload").repartition(2), "payload", featureDim = 8)
    val rows = d.orderBy("asset_id").collect()
    def check(r: org.apache.spark.sql.Row, id: Long): Unit = {
      val m = r.getStruct(2)
      val channels = 1 + (id % 2).toInt
      val frames = 256 + ((id * 13) % 512).toInt
      val a = ((id * 37) % 256).toInt - 128
      val b = ((id * 91) % 256).toInt - 128
      assert(m.getAs[Int]("sample_rate") == 8000 + (id % 4).toInt * 4000)
      assert(m.getAs[Int]("channels") == channels)
      assert(m.getAs[Int]("n_frames") == frames)
      assert(m.getAs[Int]("bits") == 16 && m.getAs[String]("format") == "wav")
      val f = r.getSeq[Float](3)
      val n = frames.toLong * channels
      val sum = channels.toLong * (((frames + 1) / 2) * a + (frames / 2) * b) +
        frames.toLong * channels * (channels - 1) / 2
      assert(math.round(f(0).toDouble * n * 32768.0) == sum, s"sum id=$id")
      assert(math.round(f(2).toDouble * 32768.0) == math.min(a, b))
      assert(math.round(f(3).toDouble * 32768.0) == math.max(a, b) + channels - 1)
    }
    check(rows(0), 6L)
    check(rows(1), 9L)
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3))
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(3))
  }

  test("parseVideoMeta recovers box-tree metadata from minimal MP4s") {
    // id 12: v0 boxes, free-box padding (12%4=0? no — use 14: 14%4=2),
    // id 15: mvhd v1 + tkhd v1 (15%3=0) + audio track; id 16: plain v0.
    val d = Multimodal.parseVideoMeta(Seq(
      (14L, Multimodal.videoFixturePayload(14L)),
      (15L, Multimodal.videoFixturePayload(15L)),
      (16L, Multimodal.videoFixturePayload(16L)),
      (17L, Multimodal.fixturePayload(2L)),          // a PNG is not BMFF
      (18L, null.asInstanceOf[Array[Byte]])
    ).toDF("asset_id", "payload").repartition(2), "payload")
    val rows = d.orderBy("asset_id").collect()
    def check(r: org.apache.spark.sql.Row, id: Long): Unit = {
      val m = r.getStruct(2)
      val ts = 600 + (id % 5).toInt * 100
      val dur = 6000L + (id * 17) % 9000
      assert(m.getAs[Int]("timescale") == ts, s"ts id=$id")
      assert(m.getAs[Long]("duration_ms") == dur * 1000L / ts)
      assert(m.getAs[Int]("n_tracks") == 1 + (id % 2).toInt)
      assert(m.getAs[Int]("width") == 320 + (id % 64).toInt * 2)
      assert(m.getAs[Int]("height") == 180 + ((id * 3) % 64).toInt * 2)
      assert(m.getAs[String]("brand") == (if (id % 2 == 0) "isom" else "mp42"))
    }
    check(rows(0), 14L) // free-box padding skipped by the walker
    check(rows(1), 15L) // 64-bit mvhd + v1 tkhd + 0x0 audio track ignored
    check(rows(2), 16L)
    assert(rows(3).isNullAt(2) && rows(4).isNullAt(2))
  }

  test("decode-bomb guard: a giant declared dimension yields null, no allocation") {
    // A real PNG header rewritten to declare 40000x40000 (IHDR width/height
    // at bytes 16-23, CRC at 29-32 refreshed): reader.read would try a
    // multi-GB raster and die with OutOfMemoryError, which NonFatal
    // rightly does not catch — the guard must bail on the HEADER dims.
    val orig = Multimodal.fixturePayload(2L)
    val bomb = orig.clone()
    val bb = java.nio.ByteBuffer.wrap(bomb)
    bb.putInt(16, 40000); bb.putInt(20, 40000)
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // chunk type + IHDR payload
    bb.putInt(29, crc.getValue.toInt)
    assert(Multimodal.ImageIoCodec.decode(bomb, 8) == null)
    // the unmodified payload still decodes
    assert(Multimodal.ImageIoCodec.decode(orig, 8) != null)
  }

  test("Mp4Meta parses 64-bit largesize boxes (size32 == 1 + u64 size)") {
    // Rewrap a fixture's moov as a largesize box: size32=1, type, u64 size
    // covering the 16-byte header + original payload. The walker must read
    // the 64-bit length and still find mvhd/tkhd at their offsets.
    val orig = Multimodal.videoFixturePayload(16L)
    // locate the moov box (ftyp is first; moov follows at its size)
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var off = 0
    while (new String(orig, off + 4, 4, "US-ASCII") != "moov") off += u32(orig, off)
    val moovPayload = orig.slice(off + 8, off + u32(orig, off))
    val bb = java.nio.ByteBuffer.allocate(16 + moovPayload.length)
    bb.putInt(1) // size32 == 1 -> largesize follows the type
    bb.put("moov".getBytes("US-ASCII"))
    bb.putLong(16L + moovPayload.length)
    bb.put(moovPayload)
    val rewrapped = orig.take(off) ++ bb.array()
    val m = Multimodal.Mp4Meta.parse(rewrapped)
    // schemaless Row — positional: (duration_ms, timescale, n_tracks, w, h, brand)
    assert(m != null)
    assert(m.getInt(1) == 600 + (16 % 5) * 100)
    assert(m.getInt(3) == 320 + (16 % 64) * 2)
    assert(m.getInt(2) == 1)
  }

  test("WavCodec property: decode recovers the closed forms for arbitrary params") {
    // Arbitrary (sr, channels, frames, a, b) through the real JDK encode →
    // decode loop: metadata, pooled sum (through the float features, the
    // same recovery the gate does), and exact min/max must match the
    // closed forms — not just on the fixture's id-derived parameter grid.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      sr <- Gen.chooseNum(4000, 48000)
      ch <- Gen.chooseNum(1, 2)
      fr <- Gen.chooseNum(1, 2000)
      a <- Gen.chooseNum(-128, 127)
      b <- Gen.chooseNum(-128, 127)
    } yield (sr, ch, fr, a, b)
    val prop = Prop.forAll(gen) { case (sr, ch, fr, a, b) =>
      val decoded = Multimodal.WavCodec.decode(
        Multimodal.buildWav(sr, ch, fr, a, b), 8)
      val (m, f) = (decoded._1, decoded._2)
      val n = fr.toLong * ch
      val sum = ch.toLong * (((fr + 1) / 2).toLong * a + (fr / 2).toLong * b) +
        fr.toLong * ch * (ch - 1) / 2
      // fr == 1 → only even frame indices exist, b never appears
      val (lo, hi) = if (fr == 1) (a, a) else (math.min(a, b), math.max(a, b))
      m.getInt(0) == sr && m.getInt(1) == ch && m.getInt(2) == fr &&
        m.getInt(3) == 16 && m.getString(4) == "wav" &&
        math.round(f(0).toDouble * n * 32768.0) == sum &&
        math.round(f(2).toDouble * 32768.0) == lo &&
        math.round(f(3).toDouble * 32768.0) == hi + ch - 1
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("codecs never throw on corrupt payloads: truncations and random bytes") {
    // Every prefix truncation of a real payload, plus seeded random junk —
    // a corrupt asset must yield null (or a best-effort parse), never an
    // exception that would kill a corpus job.
    val realImg = Multimodal.fixturePayload(3L)
    val realWav = Multimodal.audioFixturePayload(6L)
    val realMp4 = Multimodal.videoFixturePayload(15L)
    val rnd = new scala.util.Random(42)
    val junk = (1 to 50).map { i =>
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
    }
    val cases = junk ++
      (0 until realImg.length by 7).map(realImg.take) ++
      (0 until realWav.length by 97).map(realWav.take) ++
      (0 until realMp4.length by 11).map(realMp4.take)
    cases.foreach { payload =>
      Multimodal.ImageIoCodec.decode(payload, 8) // null or value, no throw
      Multimodal.WavCodec.decode(payload, 8)
      Multimodal.Mp4Meta.parse(payload)
    }
    // and all three reject each other's intact formats cleanly
    assert(Multimodal.WavCodec.decode(realImg, 8) == null)
    assert(Multimodal.Mp4Meta.parse(realWav) == null)
    assert(Multimodal.ImageIoCodec.decode(realMp4, 8) == null)
  }

  test("resizeMeta caps the longest side, preserves schema") {
    val d = Multimodal.resizeMeta(
      Multimodal.decode(assets.where(col("asset_id") === 2L), "payload"), maxSide = 16)
    val m = d.select(col("meta.*")).collect().head
    assert(math.max(m.getAs[Int]("width"), m.getAs[Int]("height")) <= 16)
    // same field names/types (nullability widens through the struct rebuild)
    val st = d.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
