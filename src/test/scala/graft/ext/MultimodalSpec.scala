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

  test("resizeDims fits within the box, preserves aspect, never upscales") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val frames = Seq((1, 200, 100), (2, 100, 200), (3, 50, 40), (4, 1000, 10))
      .toDF("id", "w", "h")
    val (rw, rh) = Multimodal.resizeDims(col("w"), col("h"), maxDim = 64)
    val got = frames.select(col("id"), rw.as("rw"), rh.as("rh"))
      .orderBy("id").as[(Int, Long, Long)].collect()
    assert(got(0) == ((1, 64L, 32L)))   // landscape downscale
    assert(got(1) == ((2, 32L, 64L)))   // portrait downscale
    assert(got(2) == ((3, 50L, 40L)))   // inside the box: untouched
    assert(got(3) == ((4, 64L, 1L)))    // extreme aspect clamps to >= 1
  }
}
