package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `BinaryType` payloads next to a typed metadata struct; decode /
  * feature-extraction / frame-sampling run per-partition in batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * byte→pixels step is behind [[MediaCodec]] with a deterministic fake
  * implementation ([[StubCodec]]) — the Spark-side contract (schema,
  * batching, partitioning, column shapes) is real and tested. In
  * production, swap [[StubCodec]] for a JNI/javacv-backed codec; nothing
  * else changes.
  *
  * Scale notes: payloads never pass through a shuffle unless the caller
  * repartitions; decode is mapPartitions (one codec instance per task,
  * amortized init — the Scala analog of a Pandas-UDF batch); features are
  * fixed-width float arrays ready for the similarity operators.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)
  final case class Asset(asset_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class Decoded(asset_id: Long, kind: String, n_bytes: Long,
      checksum: Long, features: Array[Float])
  final case class Frame(asset_id: Long, frame_no: Int, frame_bytes: Array[Byte])
  final case class Resized(asset_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long,
      /** lowercase-hex MD5 of the resized bytes — unlike the rolling
        * checksum (Long overflow semantics), this is reproducible by any
        * other engine, so the declared query can be oracle-checked */
      md5_hex: String)

  /** Byte→media decode boundary. One instance per partition/task. */
  trait MediaCodec extends Serializable {
    /** Decode payload into a fixed-width feature vector. */
    def decodeFeatures(meta: MediaMeta, payload: Array[Byte], dim: Int): Array[Float]
    /** Sample up to `n` evenly spaced frames from a video payload. */
    def sampleFrames(meta: MediaMeta, payload: Array[Byte], n: Int): Seq[Array[Byte]]
    /** Re-encode the payload at `w`×`h` (image resize / thumbnailing). */
    def resize(meta: MediaMeta, payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic stand-in codec: features from a rolling byte hash (so
    * tests are stable); frames are even byte slices. A real codec would
    * inflate pixels here — everything downstream is shape-compatible. */
  final class StubCodec extends MediaCodec {
    override def decodeFeatures(meta: MediaMeta, payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = h * 31 + (payload(i) & 0xFF)
        out(i % dim) += ((h >>> 40) & 0xFF).toFloat / 255f
        i += 1
      }
      out
    }
    override def sampleFrames(meta: MediaMeta, payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty) return Seq.empty
      val k = math.min(n, payload.length)
      val step = payload.length.toDouble / k
      (0 until k).map { i =>
        val lo = (i * step).toInt
        val hi = math.min(payload.length, ((i + 1) * step).toInt max (lo + 1))
        payload.slice(lo, hi)
      }
    }
    /** Deterministic "resize": nearest-byte downsample to w·h bytes —
      * output length tracks the target dims like real pixel data would. */
    override def resize(meta: MediaMeta, payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, w * h)
      if (payload.isEmpty) return Array.emptyByteArray
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = payload(((i.toLong * payload.length) / n).toInt)
        i += 1
      }
      out
    }
  }

  /** Synthesize an asset table from `documents` (text bytes as payload,
    * metadata derived deterministically) — stands in for a real
    * image/audio manifest at identical schema. */
  def manifest(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, bytes, MediaMeta(kind, 64 + (id % 8).toInt * 16,
          64 + (id % 5).toInt * 16, 16000, r.getLong(2) * 10))
      }
  }

  /** Decode + feature-extract, batched per partition (codec init once per
    * task). `dim` matches the embeddings table so outputs feed the
    * similarity operators directly. */
  def decodeAll(assets: Dataset[Asset], codec: MediaCodec, dim: Int = 64): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feats = codec.decodeFeatures(a.meta, a.payload, dim)
        var h = 0L
        a.payload.foreach(b => h = h * 131 + (b & 0xFF))
        Decoded(a.asset_id, a.meta.kind, a.payload.length.toLong, h, feats)
      }
    }
  }

  /** Resize the image assets to `w`×`h` (thumbnail pass): per-partition
    * codec batches, payloads stay executor-side. */
  def resizeAll(assets: Dataset[Asset], codec: MediaCodec,
      w: Int = 32, h: Int = 32): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    assets.filter(_.meta.kind == "image").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // one per task
      it.map { a =>
        val bytes = codec.resize(a.meta, a.payload, w, h)
        var cs = 0L
        bytes.foreach(b => cs = cs * 131 + (b & 0xFF))
        md.reset()
        val hex = md.digest(bytes).map(b => f"$b%02x").mkString
        Resized(a.asset_id, a.meta.kind, w, h, bytes.length.toLong, cs, hex)
      }
    }
  }

  /** Frame-sample the video assets: one output row per sampled frame. */
  def sampleFrames(assets: Dataset[Asset], codec: MediaCodec, framesPer: Int = 4): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.meta.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        codec.sampleFrames(a.meta, a.payload, framesPer).zipWithIndex.map {
          case (bytes, i) => Frame(a.asset_id, i, bytes)
        }
      }
    }
  }
}
