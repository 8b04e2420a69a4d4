package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.operators.Multimodal.{MediaFeatures, MediaItem}

class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("binary plumbing: documents -> media items -> batch feature " +
    "extraction is deterministic and preserves ids") {
    import s.implicits._
    val items = Multimodal.asMediaItems(
      Tables.documents(s, "/root/testdata/sf0.001").limit(50),
      "doc_id", "text").as[MediaItem]
    val feats1 = Multimodal.extractFeatures(items).collect()
      .sortBy(_.id)
    val feats2 = Multimodal.extractFeatures(items).collect()
      .sortBy(_.id)
    assert(feats1.length == 50)
    assert(feats1.toSeq == feats2.toSeq, "decode stub must be deterministic")
    assert(feats1.forall(f => f.width >= 16 && f.height >= 16))
    assert(feats1.forall(_.mediaType == "text/plain"))
    // payload length survives the pipeline
    val sizes = items.collect().map(i => i.id -> i.sizeBytes).toMap
    assert(feats1.forall(f => sizes(f.id) == f.sizeBytes))
  }

  test("identical payloads yield identical features") {
    import s.implicits._
    val items = Seq(
      MediaItem(1L, "same bytes".getBytes("UTF-8"), "text/plain", 10L),
      MediaItem(2L, "same bytes".getBytes("UTF-8"), "text/plain", 10L))
      .toDS()
    val out = Multimodal.extractFeatures(items).collect().sortBy(_.id)
    assert(out(0).copy(id = 0L) == out(1).copy(id = 0L))
  }
}
