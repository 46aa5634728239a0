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
