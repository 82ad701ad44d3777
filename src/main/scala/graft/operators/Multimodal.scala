package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns travelling next to typed metadata, with decode /
 * feature-extraction as per-partition batch transforms.
 *
 * The actual media codecs are NOT in this environment, so `decodeFake` is a
 * clearly-marked deterministic stand-in — what IS real and tested is the
 * Spark-side contract that matters at 100 TB: the schema (binary payload +
 * metadata struct), batch-per-partition execution (`mapPartitions`, so a
 * real decoder would amortize model/codec init per partition, not per row),
 * and the columnar metadata ops that never touch payload bytes.
 */
object Multimodal {

  /** One media row: opaque payload + typed metadata (the schema contract). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features: fixed-width vector + payload provenance. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  /**
   * STUB decoder — a real deployment would replace the body with an image /
   * audio codec call (e.g. JNI or an ONNX runtime session held per
   * partition). Deterministic fake: byte-fold checksum + a `dim`-wide
   * feature vector derived from payload bytes. The `mapPartitions` shape is
   * the contract: per-partition init happens once (where a codec/model
   * session would be created), rows stream through in one pass.
   */
  def decodeFake(rows: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init site (codec/model session in a real decoder)
      it.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum = (sum * 31 + (r.payload(i) & 0xff)) & 0x7fffffffL; i += 1 }
        val feats = Array.tabulate(dim) { d =>
          ((sum >> (d * 4)) & 0xff).toFloat / 255.0f
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum, feats)
      }
    }
  }

  /**
   * Columnar metadata/payload ops that never deserialize the payload into
   * JVM objects: byte length, header hex, truncation — all Catalyst
   * expressions over BinaryType, codegen'd end to end.
   */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("header_hex", substring(hex(col(payloadCol)), 1, 16))

  /**
   * STUB resize — a real implementation would decode, scale, re-encode via
   * an image codec held per partition. The Spark-side contract is real:
   * per-partition batching, output schema (payload + updated dims), and the
   * deterministic fake (truncate the payload proportionally to the pixel
   * reduction) keeps tests meaningful.
   */
  def resizeFake(rows: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init site (codec in a real resizer)
      it.map { r =>
        val inPixels = math.max(1L, r.width.toLong * r.height)
        val ratio = math.min(1.0, (outW.toLong * outH).toDouble / inPixels)
        val nBytes = math.max(0, math.ceil(r.payload.length * ratio).toInt)
        r.copy(payload = r.payload.take(nBytes), width = outW, height = outH)
      }
    }
  }

  /**
   * STUB frame sampling — a real implementation would demux the container
   * and decode every Nth frame. Deterministic fake: split the payload into
   * `frameCount` equal chunks and emit every `stride`-th chunk as one
   * "frame" row (media_id, frame_no, frame payload) — the 1→N row shape a
   * video pipeline actually produces.
   */
  def frameSampleFake(rows: Dataset[MediaRow], frameCount: Int, stride: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      val chunk = math.max(1, r.payload.length / math.max(1, frameCount))
      (0 until frameCount by stride).map { f =>
        (r.media_id, f, r.payload.slice(f * chunk, (f + 1) * chunk))
      }
    }.toDF("media_id", "frame_no", "frame_payload")
  }
}
