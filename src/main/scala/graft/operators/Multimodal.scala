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
   * THE CODEC CONTRACT — the precise interface a real deployment implements
   * to replace the `*Fake` stubs outside this (codec-less) sandbox.
   *
   * Lifecycle, enforced by [[decodeWith]]:
   *  1. the codec object itself is java-serialized to executors, so it must
   *     hold only cheap config (model path, target dims) — never native
   *     handles;
   *  2. `open()` runs ONCE PER PARTITION on the executor — this is where a
   *     real codec loads native libraries, mmaps a model, or creates an
   *     ONNX/JNI session (seconds of init amortized over the partition's
   *     rows, the entire point of the mapPartitions shape);
   *  3. `Session.decode(kind, payload)` maps payload bytes ⇒ [[Decoded]] for
   *     each row, streaming (no payload batch is ever held);
   *  4. the session is closed via task-completion listener — also on
   *     failure/early exit, so native resources cannot leak.
   *
   * `decode` must be deterministic per (kind, payload) — retried/speculated
   * tasks re-decode the same rows and their outputs must agree — and must
   * THROW on malformed payloads (fail the task loudly; quarantine upstream
   * with a filter if skipping is wanted).
   */
  trait MediaCodec extends Serializable {
    def open(): MediaCodec.Session
  }

  object MediaCodec {
    /** What a decode produces: real media metadata + a fixed-width feature
      * vector (embedding / mel stats / frame summary — codec's choice, but
      * the WIDTH must be constant per codec so the column is a usable
      * `array<float>` downstream). */
    final case class Decoded(
        width: Int, height: Int, sampleRate: Int, nFrames: Int,
        features: Array[Float])

    trait Session extends AutoCloseable {
      def decode(kind: String, payload: Array[Byte]): Decoded
    }
  }

  /** One decoded row: provenance + the codec's [[MediaCodec.Decoded]]. */
  final case class MediaDecoded(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, n_frames: Int,
      features: Array[Float])

  /**
   * Run any [[MediaCodec]] over a media table with the per-partition session
   * lifecycle described on the trait. This is the REAL production entry
   * point — `decodeFake` stays only because the driver's oracle pins its
   * exact output; [[FakeMediaCodec]] routes the same fake
   * math through this interface, and MultimodalSpec asserts the two agree
   * (so swapping in a real codec is exactly one `MediaCodec` implementation,
   * with the plumbing already certified).
   */
  def decodeWith(rows: Dataset[MediaRow], codec: MediaCodec): Dataset[MediaDecoded] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val session = codec.open()
      // close on task completion — covers normal exhaustion, limit()-style
      // early exit, and task failure alike
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => session.close()))
      it.map { r =>
        val d = session.decode(r.kind, r.payload)
        MediaDecoded(r.media_id, r.kind, r.payload.length.toLong,
          d.width, d.height, d.sampleRate, d.nFrames, d.features)
      }
    }
  }

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

  /** [[decodeFake]]'s byte-fold math behind the [[MediaCodec]] contract —
    * the reference implementation a real codec replaces. Width/height/
    * sample-rate pass through from nothing real to decode, so it reports
    * 0×0/0Hz/1 frame; features/checksum math is IDENTICAL to decodeFake
    * (agreement asserted in MultimodalSpec). */
  final class FakeMediaCodec(dim: Int = 8) extends MediaCodec {
    def open(): MediaCodec.Session = new MediaCodec.Session {
      def decode(kind: String, payload: Array[Byte]): MediaCodec.Decoded = {
        var sum = 0L
        var i = 0
        while (i < payload.length) { sum = (sum * 31 + (payload(i) & 0xff)) & 0x7fffffffL; i += 1 }
        val feats = Array.tabulate(dim)(d => ((sum >> (d * 4)) & 0xff).toFloat / 255.0f)
        MediaCodec.Decoded(0, 0, 0, 1, feats)
      }
      def close(): Unit = ()
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
