package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world this is payload"), (2L, "short")).toDF("doc_id", "text"),
    "doc_id", "text", "txt")

  test("fromText produces the canonical (media_id, content, meta) layout") {
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val meta = media.filter($"media_id" === 1).select("meta.n_bytes").as[Long].head()
    assert(meta === "hello world this is payload".getBytes("UTF-8").length.toLong)
  }

  test("decodeStub is deterministic and adds width/height") {
    val a = Multimodal.decodeStub(media).select("media_id", "width", "height")
      .as[(Long, Int, Int)].collect().toSet
    val b = Multimodal.decodeStub(media).select("media_id", "width", "height")
      .as[(Long, Int, Int)].collect().toSet
    assert(a === b)
    assert(a.forall { case (_, w, h) => w >= 16 && h >= 16 })
  }

  test("featureStub emits fixed-dim float vectors usable by Similarity") {
    val feats = Multimodal.featureStub(media, dim = 8)
    val v = feats.filter($"media_id" === 1).select("features")
      .as[Seq[Float]].head()
    assert(v.length === 8)
    // identical content => identical features (deterministic)
    val v2 = Multimodal.featureStub(media, dim = 8)
      .filter($"media_id" === 1).select("features").as[Seq[Float]].head()
    assert(v === v2)
  }

  test("frameSample splits payload bytes into n chunks covering the payload") {
    val frames = Multimodal.frameSample(media, n = 4)
      .select($"media_id", $"frame_no", length($"frame_bytes").as("len"))
      .as[(Long, Int, Int)].collect()
    val byMedia = frames.groupBy(_._1)
    assert(byMedia(1L).length === 4)
    val total = byMedia(1L).map(_._3).sum
    assert(total === "hello world this is payload".getBytes("UTF-8").length)
  }
}
