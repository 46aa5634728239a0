package graft

import graft.Tables.T
import graft.operators.Multimodal

/** Multimodal plumbing: schema shape, batch execution, determinism. */
class MultimodalSpec extends SparkSpec {

  private lazy val t = T(spark, "/root/testdata/sf0.001")

  test("media table carries opaque binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(t)
    // names + types must match the contract; nullability follows the input
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = media.orderBy("media_id").first()
    assert(Set("image", "audio", "video").contains(row.getString(1)))
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("feature extraction preserves row count, schema, and determinism") {
    val media = Multimodal.mediaTable(t)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema == Multimodal.featureSchema)
    assert(feats.count() == media.count())
    val a = feats.orderBy("media_id").collect().map(_.getSeq[Float](3))
    val b = feats.orderBy("media_id").collect().map(_.getSeq[Float](3))
    assert(a.toSeq == b.toSeq) // stub decode is deterministic
    assert(a.forall(_.length == 8))
  }

  test("features join back to metadata and roll up per kind") {
    val out = Multimodal.q57MultimodalFeatures(t).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(out.forall(_.getLong(1) > 0))
  }

  test("frame sampling emits one row per 5s step, deterministic bytes") {
    val media = Multimodal.mediaTable(t)
    val frames = Multimodal.sampleFrames(media, 5000L)
    assert(frames.schema == Multimodal.frameSchema)
    val byId = frames.collect().groupBy(_.getLong(0))
    val durations = media.filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("media_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == durations.keySet) // only videos, all videos
    byId.foreach { case (id, rows) =>
      assert(rows.length == durations(id) / 5000 + 1, s"media $id")
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (0L to durations(id) by 5000L).toSeq, s"media $id timestamps")
    }
    val a = frames.orderBy("media_id", "frame_ts").collect()
      .map(_.getAs[Array[Byte]]("frame").toSeq)
    val b = frames.orderBy("media_id", "frame_ts").collect()
      .map(_.getAs[Array[Byte]]("frame").toSeq)
    assert(a.toSeq == b.toSeq) // stub grab is deterministic
  }

  test("real PNG codec round-trip: ImageIO decodes the synthesized pixels exactly") {
    val bytes = Multimodal.pngPayload(42L)
    // a real PNG signature, decoded by the real codec
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 16 && img.getHeight == 16)
    // pixel (3, 5) must round-trip losslessly through encode+decode
    val rgb = img.getRGB(3, 5)
    assert(((rgb >> 16) & 0xff) == ((42L * 31 + 3 * 7 + 5 * 13) % 256).toInt)
    assert(((rgb >> 8) & 0xff) == ((42L * 17 + 3 * 5 + 5 * 3) % 256).toInt)
    assert((rgb & 0xff) == ((42L * 13 + 3 * 11 + 5 * 19) % 256).toInt)
  }

  test("real WAV codec round-trip: AudioSystem reads the PCM16 samples exactly") {
    val bytes = Multimodal.wavPayload(7L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    val data = ais.readAllBytes(); ais.close()
    assert(data.length == 512 * 2)
    val s0 = ((data(0) & 0xff) | (data(1) << 8)).toShort
    assert(s0.toInt == ((7L * 7 + 0 * 11) % 65536).toInt - 32768)
  }

  test("decodeMedia: image/audio decode ok with exact checksums; video flags false") {
    import spark.implicits._
    val media = Multimodal.realMediaTable(graft.Tables.T(spark, "/root/testdata/sf0.001"))
    val out = Multimodal.decodeMedia(media)
      .filter($"media_id" < 6).orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toList == List("image", "audio", "video", "image", "audio", "video"))
    assert(out.map(_.getBoolean(2)).toList == List(true, true, false, true, true, false))
    // image 0: checksum equals the closed form summed over the 16x16 grid
    val expected0 = (for (x <- 0 until 16; y <- 0 until 16) yield
      ((0L * 31 + x * 7 + y * 13) % 256) + ((0L * 17 + x * 5 + y * 3) % 256) +
        ((0L * 13 + x * 11 + y * 19) % 256)).sum
    assert(out(0).getLong(6) == expected0)
    // corrupt payload → ok=false, not a task failure
    val bad = Seq((99L, "image", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeMedia(bad).collect().head
    assert(!r.getBoolean(2) && r.isNullAt(6))
  }

  test("avi demux: real container round-trips the closed form; malformed bytes flag") {
    import spark.implicits._
    val video = Multimodal.realVideoTable(t).filter($"media_id" === 2L)
    val r = Multimodal.decodeVideo(video).collect().head
    assert(r.getBoolean(1) && r.getInt(2) == Multimodal.VidFrames &&
      r.getInt(3) == Multimodal.VidW && r.getInt(4) == Multimodal.VidH)
    // frame 0 of id 2: closed form summed over the grid
    def frameSum(fid: Long) = (for (x <- 0 until 16; y <- 0 until 16) yield
      ((fid * 31 + x * 7 + y * 13) % 256) + ((fid * 17 + x * 5 + y * 3) % 256) +
        ((fid * 13 + x * 11 + y * 19) % 256)).sum
    val all = (0 until 4).map(f => frameSum(2L + 101L * f)).sum
    val sampled = Seq(0, 2).map(f => frameSum(2L + 101L * f)).sum
    assert(r.getLong(5) == all)
    assert(r.getLong(6) == sampled)
    // malformed containers flag ok = false, never fail the task:
    // garbage, a RIFF that is not AVI, and a truncated real AVI
    val avi = Multimodal.aviPayload(2L)
    val bad = Seq(
      (90L, Array[Byte](1, 2, 3)),
      (91L, "RIFF0000WAVE".getBytes("US-ASCII")),
      (92L, java.util.Arrays.copyOf(avi, avi.length / 2)))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeVideo(bad).orderBy("media_id").collect()
    assert(rows.forall(!_.getBoolean(1)))
    assert(rows.forall(_.isNullAt(5)))
  }

  test("resize retargets image metadata, passes other kinds through") {
    val media = Multimodal.mediaTable(t)
    val resized = Multimodal.resizeImages(media, 224, 224)
    assert(resized.count() == media.count())
    val images = resized.filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("meta.width", "meta.height").distinct().collect()
    assert(images.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((224, 224)))
    // non-image rows are byte-identical to their input
    val othersIn = media.filter(org.apache.spark.sql.functions.col("kind") =!= "image")
      .orderBy("media_id").collect().map(_.getAs[Array[Byte]]("payload").toSeq)
    val othersOut = resized.filter(org.apache.spark.sql.functions.col("kind") =!= "image")
      .orderBy("media_id").collect().map(_.getAs[Array[Byte]]("payload").toSeq)
    assert(othersIn.toSeq == othersOut.toSeq)
  }
}
