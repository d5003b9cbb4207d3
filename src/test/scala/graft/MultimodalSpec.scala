package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

/** Multimodal plumbing: schema, batch shape, and the deterministic
  * stub behaviors (decode shape, histogram normalization, frame-slice
  * reassembly, resize metadata).
  */
class MultimodalSpec extends SparkSpec {

  private def rec(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRecord(id, kind, bytes, MediaMeta(4, 3, 16000, 8))

  private def mediaDs(rs: MediaRecord*) = {
    import spark.implicits._
    spark.createDataset(rs)
  }

  test("decode: image → (h, w) tensor shape, audio → flat") {
    val ds = mediaDs(
      rec(1, "image", Array.fill(12)(7.toByte)),
      rec(2, "audio", Array.fill(5)(1.toByte)))
    val out = Multimodal.decode(ds).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).shape == Seq(3, 4)) // 12 bytes / width 4
    assert(out(1L).tensor.length == 12)
    assert(out(2L).shape == Seq(5))
    // stub maps byte b → (b & 0xff)/256
    assert(out(1L).tensor.head == 7f / 256f)
  }

  test("features: 16-bin histogram, normalized, ANN-ready length") {
    val ds = mediaDs(rec(1, "image", Array[Byte](0, 1, 15, 16, -1)))
    val f = Multimodal.features(ds).collect().head
    assert(f.features.length == Multimodal.FeatureDim)
    assert(f.n_bytes == 5)
    // bytes 0,1,15 → bin 0; 16 → bin 1; 255 → bin 15
    assert(f.hist == Seq(3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1))
    assert(f.features(0) == 3f / 5f)
    assert(f.features(1) == 1f / 5f)
    assert(f.features(15) == 1f / 5f)
    assert(math.abs(f.features.sum - 1f) < 1e-6)
  }

  test("sampleFrames: slices concatenate back to the payload") {
    val payload = (0 until 100).map(_.toByte).toArray
    val ds = mediaDs(rec(9, "video", payload))
    val frames = Multimodal.sampleFrames(ds, 8).collect().head
      .getAs[scala.collection.Seq[Array[Byte]]]("frames")
    assert(frames.length == 8)
    assert(frames.flatMap(_.toSeq) == payload.toSeq)
  }

  test("resize touches metadata only") {
    val ds = mediaDs(rec(1, "image", Array[Byte](1, 2)))
    val r = Multimodal.resize(ds, 64, 48).collect().head
    assert(r.meta.width == 64 && r.meta.height == 48)
    assert(r.payload.toSeq == Seq[Byte](1, 2))
  }

  test("fromDocuments synthesizes stable kinds and UTF-8 payloads") {
    import spark.implicits._
    val df = Seq((0L, "héllo"), (1L, "x"), (2L, "y"))
      .toDF("doc_id", "text")
    val ms = Multimodal.fromDocuments(df).collect().map(m => m.media_id -> m).toMap
    assert(ms(0L).kind == "image" && ms(1L).kind == "audio" && ms(2L).kind == "video")
    assert(ms(0L).payload.toSeq == "héllo".getBytes("UTF-8").toSeq)
  }
}
