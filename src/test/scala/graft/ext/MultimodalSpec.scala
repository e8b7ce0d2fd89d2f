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

  test("audioWindows: hop/window geometry, partial tail, empty payload") {
    import Multimodal._
    val docs = spark.createDataset(Seq(
      MediaDoc(1L, "audio/x-fake", 300, Array.fill(300)(7.toByte)),
      MediaDoc(2L, "audio/x-fake", 0, Array.empty[Byte])))(Multimodal.mediaDocEnc)
    val wins = Multimodal.audioWindows(docs, winSize = 256, hop = 128)
      .collect().groupBy(_.doc_id)
    // 300 bytes, hop 128 -> starts 0,128,256: sizes 256, 172, 44
    val w1 = wins(1L).sortBy(_.win_idx)
    assert(w1.map(_.n_samples).toSeq == Seq(256, 172, 44))
    // constant signal -> identical per-sample energy, scaled by length
    val perSample = (7 - 128).toLong * (7 - 128).toLong
    assert(w1.map(_.energy).toSeq == w1.map(_.n_samples.toLong * perSample).toSeq)
    // empty payload still yields one (empty) window, not a dropped doc
    assert(wins(2L).map(w => (w.win_idx, w.n_samples, w.energy)).toSeq == Seq((0, 0, 0L)))
  }

  test("scoreFramesBatched: one batch per batchSize frames, scores placement-independent") {
    import Multimodal._
    val docs = Multimodal.toMediaDocs(
      graft.Tables.t(spark, graft.TestSpark.Sf, "documents").limit(40),
      "doc_id", "text")
    val frames = Multimodal.extractFeatures(docs.repartition(2))
    val scored = Multimodal.scoreFramesBatched(frames, batchSize = 16).collect()
    assert(scored.nonEmpty)
    // batching contract: every batch except each partition's tail is full
    val nFull = scored.count(_.batch_size == 16)
    assert(nFull > 0, "expected at least one full batch")
    assert(scored.forall(s => s.batch_size <= 16 && s.batch_size > 0))
    // score is a pure function of the frame, not of batch placement
    val again = Multimodal.scoreFramesBatched(
      Multimodal.extractFeatures(docs.repartition(5)), batchSize = 7).collect()
    def key(s: FrameScore) = (s.doc_id, s.frame_idx)
    assert(scored.map(s => key(s) -> s.score).toMap == again.map(s => key(s) -> s.score).toMap)
  }
}
