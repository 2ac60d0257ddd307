package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages as batched per-partition transforms.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB (`fakeDecode`) — everything
  * around it (schema, batching, partitioning, output shape) is the real
  * Spark plumbing a production decoder would drop into: swap `fakeDecode`
  * for an FFI call and nothing else changes.
  */
object MediaOps {
  /** One media object: opaque payload + typed metadata. */
  final case class MediaFile(
      media_id: Long,
      doc_id: Long,
      kind: String,            // image | audio | video
      format: String,          // png | wav | mp4 | ...
      width: Int,
      height: Int,
      duration_ms: Long,
      payload: Array[Byte],
      ts: Timestamp
  )

  /** Decoded/extracted features for one media object. */
  final case class MediaFeatures(
      media_id: Long,
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      sha_lo: Long,            // content hash (integrity / exact dedup key)
      features: Array[Float],  // embedding-like feature vector
      frames: Int              // frames sampled (video) / windows (audio)
  )

  /** ======== STUB: deterministic fake decoder ========
    * A real implementation would decode the payload with an image/audio
    * library here. This stand-in derives a deterministic pseudo-feature
    * vector from the payload bytes so the full pipeline (schema, batch
    * shape, partitioning, downstream ANN) is exercised end-to-end.
    */
  def fakeDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 0xc2b2ae3d27d4eb4fL
      out(i % dims) += ((h >>> 40).toInt / 16777216.0f) - 0.5f
      i += 1
    }
    out
  }

  private def contentHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** Synthesize a deterministic media table from a documents table: the
    * payload is the UTF-8 text bytes standing in for real image/audio
    * payloads (same opaque-binary plumbing).
    */
  def synthesize(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (docId, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = (docId % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val fmt = kind match { case "image" => "png"; case "audio" => "wav"; case _ => "mp4" }
        MediaFile(docId * 10 + 1, docId, kind, fmt,
          width = if (kind == "image") 64 + (docId % 8).toInt * 32 else 0,
          height = if (kind == "image") 64 else 0,
          duration_ms = if (kind != "image") 1000 + (docId % 60) * 250 else 0,
          payload = payload,
          ts = new Timestamp(1700000000000L + docId * 1000))
      }
  }

  /** Decode + feature-extract, batched per partition (the Scala analogue of
    * a vectorized mapInPandas stage: one decoder instance per partition,
    * rows streamed through it).
    */
  def extractFeatures(media: Dataset[MediaFile], dims: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      // per-partition decoder state would be initialized here
      iter.map { m =>
        val feats = fakeDecode(m.payload, dims)
        val frames = m.kind match {
          case "video" => math.max(1, (m.duration_ms / 1000).toInt)
          case "audio" => math.max(1, (m.duration_ms / 500).toInt)
          case _       => 1
        }
        MediaFeatures(m.media_id, m.doc_id, m.kind, m.payload.length,
          contentHash(m.payload), feats, frames)
      }
    }
  }

  /** Resize stage for image payloads — ======== STUB decode/re-encode:
    * a real implementation decodes, scales, re-encodes; this stand-in
    * deterministically downsamples the payload bytes in proportion to the
    * target area so payload size tracks the resize like a real codec's
    * would. The metadata contract (width/height updated, payload replaced)
    * and the batched per-partition shape are the real plumbing.
    */
  def resizeImages(media: Dataset[MediaFile], targetW: Int, targetH: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        if (m.kind != "image" || m.width <= 0 || m.height <= 0) m
        else {
          val scale = math.min(1.0,
            (targetW.toLong * targetH).toDouble / (m.width.toLong * m.height))
          val outLen = math.max(1, (m.payload.length * scale).toInt)
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            // nearest-neighbor byte sampling (stands in for pixel resampling)
            out(i) = m.payload((i.toLong * m.payload.length / outLen).toInt)
            i += 1
          }
          m.copy(width = targetW, height = targetH, payload = out)
        }
      }
    }
  }

  /** Frame sampling for video payloads: split the payload into `frames`
    * equal chunks (stub for real frame extraction), emitting one row per
    * sampled frame — the explode-shaped stage a video pipeline needs.
    */
  def sampleFrames(media: Dataset[MediaFile], everyNth: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = math.max(1, (m.duration_ms / 1000).toInt)
      val chunk = math.max(1, m.payload.length / frames)
      (0 until frames by everyNth).map { f =>
        val from = f * chunk
        val until = math.min(m.payload.length, from + chunk)
        (m.media_id, m.doc_id, f, if (from < until) m.payload.slice(from, until) else Array.emptyByteArray)
      }
    }.toDF("media_id", "doc_id", "frame_idx", "frame_payload")
  }
}
