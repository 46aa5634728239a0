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
}
