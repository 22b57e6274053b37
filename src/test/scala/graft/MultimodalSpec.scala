package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, MediaItem}
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.Sf0001)

  test("media fabrication: binary payload with typed metadata, one row per doc") {
    val media = Multimodal.mediaFromDocuments(spark, docs)
    assert(media.count() === docs.count())
    val kinds = media.map(_.kind).distinct().collect().toSet
    assert(kinds === Set("image", "audio", "video"))
    val m = media.filter(_.media_id == 0L).head()
    assert(new String(m.payload, "UTF-8").startsWith("the "))
  }

  test("batched feature extraction is deterministic and batch-size independent") {
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val f1 = Multimodal.extractFeatures(media, batchSize = 7)
      .collect().map(f => f.media_id -> f.checksum).toMap
    val f64 = Multimodal.extractFeatures(media, batchSize = 64)
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(f1 === f64)
    val feats = Multimodal.extractFeatures(media).head()
    assert(feats.features.length === 8)
  }

  test("decode stub: features depend only on bytes") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val c = Multimodal.decodeStub("other bytes".getBytes("UTF-8"))
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("frame sampling: only video items, every Nth fixed-size slice") {
    val one = spark.createDataset(Seq(
      MediaItem(1L, "video", Array.fill[Byte](300)(7), 16, 16, 0L),
      MediaItem(2L, "image", Array.fill[Byte](300)(7), 16, 16, 0L)))
    val frames = Multimodal.sampleFrames(one, frameBytes = 64, everyN = 2).collect()
    // 300/64 = 4 frames → indices 0,2 kept
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSet === Set((1L, 0), (1L, 2)))
    assert(frames.forall(_.frame_bytes.length === 64))
  }

  test("feature summary aggregates per kind with integral, partition-stable values") {
    val s1 = Multimodal.featureSummary(spark, docs).collect().toSeq
    val s2 = Multimodal.featureSummary(spark, docs.repartition(13)).collect().toSeq
    assert(s1 === s2)
    assert(s1.map(_.getString(0)) === Seq("audio", "image", "video"))
  }
}
