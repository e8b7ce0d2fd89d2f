package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, and
  * decode/feature-extraction runs per partition so each executor core
  * amortizes codec setup across its batch.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — implemented as a deterministic fake over the payload bytes.
  * Everything around it (schema, Dataset plumbing, partition batching,
  * feature row shape) is real and tested; a production build swaps
  * `fakeDecode` for a codec call without touching the dataflow.
  */
object Multimodal {

  case class MediaDoc(doc_id: Long, mime: String, n_bytes: Int, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                          checksum: Long)

  implicit val mediaDocEnc: Encoder[MediaDoc] = Encoders.product[MediaDoc]
  implicit val mediaFeatureEnc: Encoder[MediaFeature] = Encoders.product[MediaFeature]

  /** Wrap a text table's content as binary payloads + metadata (the shape
    * an ingestion job would produce for real media files). */
  def toMediaDocs(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaDoc] = {
    val withCols = docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("application/x-graft-fake").as("mime"),
      octet_length(col(textCol)).as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))
    withCols.as[MediaDoc](mediaDocEnc)
  }

  /** STUB decode: deterministic pseudo-frame per 64-byte chunk. A real
    * implementation decodes payload with a codec bound once per partition. */
  private[ext] def fakeDecode(payload: Array[Byte], frameEvery: Int): Iterator[(Int, Int, Int, Long)] = {
    val chunks = math.max(1, (payload.length + 63) / 64)
    (0 until chunks by frameEvery).iterator.map { idx =>
      val off = idx * 64
      val b0 = if (off < payload.length) payload(off) & 0xff else 0
      val b1 = if (off + 1 < payload.length) payload(off + 1) & 0xff else 0
      var sum = 0L
      var i = off
      val end = math.min(payload.length, off + 64)
      while (i < end) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      (idx, 32 + b0 % 64, 32 + b1 % 64, sum)
    }
  }

  /** Per-partition feature extraction: one pass, codec-style setup cost
    * paid once per partition, not per row. `frameEvery` is the
    * frame-sampling stride (keep every n-th decoded frame). */
  def extractFeatures(ds: Dataset[MediaDoc], frameEvery: Int = 1): Dataset[MediaFeature] =
    ds.mapPartitions { it =>
      // per-partition setup would bind the codec here
      it.flatMap { d =>
        fakeDecode(d.payload, frameEvery).map { case (idx, w, h, sum) =>
          MediaFeature(d.doc_id, idx, w, h, sum)
        }
      }
    }(mediaFeatureEnc)

  case class AudioWindow(doc_id: Long, win_idx: Int, n_samples: Int, energy: Long)

  implicit val audioWindowEnc: Encoder[AudioWindow] = Encoders.product[AudioWindow]

  /** 1D-signal windowing (the audio shape): treat the payload as a
    * sample stream and emit overlapping windows of `winSize` bytes every
    * `hop` bytes with a per-window energy statistic. The decode to real
    * PCM is part of the stubbed codec; the window/hop geometry, partial
    * final window, and per-partition batching are the production
    * dataflow. */
  def audioWindows(ds: Dataset[MediaDoc], winSize: Int = 256,
                   hop: Int = 128): Dataset[AudioWindow] = {
    require(winSize > 0 && hop > 0, s"winSize/hop must be positive: $winSize/$hop")
    ds.mapPartitions { it =>
      it.flatMap { d =>
        val n = d.payload.length
        val starts = if (n == 0) Seq(0) else 0 until math.max(1, n) by hop
        starts.iterator.zipWithIndex.collect {
          case (off, idx) if off < n || n == 0 =>
            val end = math.min(n, off + winSize)
            var e = 0L
            var i = off
            while (i < end) { val v = (d.payload(i) & 0xff) - 128; e += v.toLong * v; i += 1 }
            AudioWindow(d.doc_id, idx, math.max(0, end - off), e)
        }
      }
    }(audioWindowEnc)
  }

  case class FrameScore(doc_id: Long, frame_idx: Int, batch_id: Long,
                        batch_size: Int, score: Double)

  implicit val frameScoreEnc: Encoder[FrameScore] = Encoders.product[FrameScore]

  /** Batched-inference plumbing: frames are grouped into fixed-size
    * batches WITHIN each partition and the "model" is invoked once per
    * batch — the shape every embedding/caption model needs at scale
    * (per-row invocation wastes the accelerator; cross-partition
    * batching would shuffle). The stub model is a deterministic
    * function of the batch; a production build binds the real model in
    * the partition setup and calls it with the same batch signature.
    * Emitted rows carry (batch_id, batch_size) so tests can assert the
    * batching contract itself. */
  def scoreFramesBatched(ds: Dataset[MediaFeature], batchSize: Int): Dataset[FrameScore] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    ds.mapPartitions { it =>
      // per-partition setup: bind the model once here
      var batchId = -1L
      it.grouped(batchSize).flatMap { batch =>
        batchId += 1
        // stub "model": one call per BATCH (this is the contract);
        // deterministic per-frame score independent of batch placement
        batch.map { f =>
          FrameScore(f.doc_id, f.frame_idx, batchId, batch.size,
            (f.checksum % 10000L).toDouble / 10000.0)
        }
      }
    }(frameScoreEnc)
  }

  /** Resize plan for a frame: fit (width, height) inside a maxDim box
    * preserving aspect ratio, never upscaling. The geometry is the real
    * production math; applying it to pixels is part of the stubbed codec
    * step. Exposed as a Column pair so it composes with any frame
    * DataFrame. */
  def resizeDims(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
                 maxDim: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val longest = greatest(width, height)
    // 10000-scaled integer ratio keeps the arithmetic exact and portable
    val scale1e4 = when(longest <= maxDim, lit(10000L))
      .otherwise((lit(maxDim.toLong * 10000L) / longest).cast("long"))
    def apply(c: org.apache.spark.sql.Column) =
      greatest(lit(1L), (c * scale1e4 / 10000L).cast("long"))
    (apply(width), apply(height))
  }
}
