package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.multimodal.Multimodal
import graft.queries.MultimodalQueries

/** Multimodal plumbing: the mapPartitions decoder must agree with the
  * expression-level mirror, and frame sampling must be deterministic. */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode agrees with the expression mirror") {
    val docs = VectorModel.documents(spark, Sf0001)
    val viaExpr = MultimodalQueries.mediaFeatures(spark, Sf0001)
      .select("doc_id", "width", "height", "n_frames", "size_bytes")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val viaMap = Multimodal.decodeMeta(
      Multimodal.withPayload(docs, "text").select("doc_id", "payload"), "doc_id")
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.nFrames"), col("meta.sizeBytes"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong, r.getLong(4))))
      .toMap
    assert(viaMap === viaExpr)
  }

  test("payload is real binary and metadata-only plans do not decode") {
    val withPayload = Multimodal.withPayload(VectorModel.documents(spark, Sf0001), "text")
    val first = withPayload.select("payload").limit(1).collect()(0)
    assert(first.get(0).isInstanceOf[Array[Byte]])
  }

  test("resize plan preserves aspect, bounds the longest side, no-ops when small") {
    assert(Multimodal.resizePlan(100, 50, 256) === ((100, 50)))
    assert(Multimodal.resizePlan(512, 256, 256) === ((256, 128)))
    assert(Multimodal.resizePlan(300, 400, 256) === ((192, 256)))
    val (w, h) = Multimodal.resizePlan(641, 480, 256)
    assert(math.max(w, h) === 256 && w * 480 <= 641 * h + 641) // aspect within floor error
  }

  test("frame sampling is deterministic and bounded") {
    assert(Multimodal.sampleFrameIndices(3, 4) === Seq(0, 1, 2))
    assert(Multimodal.sampleFrameIndices(30, 4) === Seq(0, 7, 15, 22))
    assert(Multimodal.sampleFrameIndices(30, 4) === Multimodal.sampleFrameIndices(30, 4))
  }
}
