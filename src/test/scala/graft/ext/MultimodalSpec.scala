package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("toMediaDocs carries payload bytes + metadata faithfully") {
    val docs = Tables.t(spark, TestSpark.Sf, "documents").limit(20)
    val media = Multimodal.toMediaDocs(docs, "doc_id", "text").collect()
    assert(media.length == 20)
    media.foreach { m =>
      assert(m.n_bytes == m.payload.length)
      assert(m.mime == "application/x-graft-fake")
    }
  }

  test("extractFeatures: one feature per chunk, deterministic checksums") {
    val docs = Tables.t(spark, TestSpark.Sf, "documents").limit(10)
    val media = Multimodal.toMediaDocs(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(f => (f.doc_id, f.frame_idx))
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.nonEmpty)
    f1.foreach { f =>
      assert(f.width >= 32 && f.width < 96 && f.height >= 32 && f.height < 96)
    }
    // chunk count matches payload length
    val byDoc = f1.groupBy(_.doc_id).view.mapValues(_.length).toMap
    media.collect().foreach { m =>
      assert(byDoc(m.doc_id) == math.max(1, (m.n_bytes + 63) / 64))
    }
  }

  test("frameEvery subsamples frames") {
    val docs = Tables.t(spark, TestSpark.Sf, "documents").limit(10)
    val media = Multimodal.toMediaDocs(docs, "doc_id", "text")
    val all = Multimodal.extractFeatures(media, frameEvery = 1).count()
    val sampled = Multimodal.extractFeatures(media, frameEvery = 2).count()
    assert(sampled <= all && sampled > 0)
  }
}
