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
