package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def media() = {
    val rows = Seq(
      Row(1L, "image", Array.tabulate(256)(_.toByte), Row(800, 600, null, null)),
      Row(2L, "audio", Array.tabulate(64)(i => (i * 3).toByte), Row(null, null, 44100, 2000)),
      Row(3L, "video", Array.tabulate(1024)(i => (i % 7).toByte), Row(1920, 1080, null, 60000)),
      Row(4L, "image", null, Row(10, 10, null, null)),  // broken payload
    )
    spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
  }

  test("decodeFeatures: deterministic stub features, null payloads dropped") {
    val feats = Multimodal.decodeFeatures(media()).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.features.length == Multimodal.StubCodec.dim))
    assert(feats.forall(_.features.forall(f => f >= 0f && f <= 1f)))
    // determinism
    val again = Multimodal.decodeFeatures(media()).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames: n frames per row, bytes partition the payload") {
    val byId = Multimodal.sampleFrames(media(), 4)
      .groupBy("media_id").agg(count(lit(1)).as("n"), sum("frame_bytes").as("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((4L, 256L)))
    assert(byId(3L) == ((4L, 1024L)))
    assert(!byId.contains(4L))
  }

  test("sampleFrames partitions exactly when payload size is not divisible by n") {
    val rows = Seq(Row(9L, "audio", Array.tabulate(11)(_.toByte),
      Row(null, null, 8000, 100)))
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val frames = Multimodal.sampleFrames(df, 3)
      .orderBy("frame_idx")
      .select("frame_bytes").collect().map(_.getInt(0)).toSeq
    assert(frames.sum == 11, s"frames $frames must cover all 11 bytes")
    assert(frames == Seq(3, 4, 4))
    // reassembled frames equal the original payload (no gaps/overlap)
    val bytes = Multimodal.sampleFrames(df, 3).orderBy("frame_idx")
      .select("frame").collect().flatMap(_.getAs[Array[Byte]](0)).toSeq
    assert(bytes == Array.tabulate(11)(_.toByte).toSeq)
  }

  test("resizeMeta clamps to max side preserving aspect") {
    val resized = Multimodal.resizeMeta(media(), 400)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => (r.getLong(0), (r.get(1), r.get(2)))).toMap
    assert(resized(1L) == ((400, 300)))
    assert(resized(3L) == ((400, 225)))
    assert(resized(4L) == ((10, 10)))  // already under the cap
  }
}
