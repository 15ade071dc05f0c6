package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as partition-batched functions.
  *
  * The media codecs themselves are STUBBED (no image/audio libraries in
  * this environment): [[FakeCodec]] derives deterministic metadata from
  * the bytes. Everything Spark-side is real — the binary schema, the
  * mapPartitions batching shape (one codec init per partition, reused
  * across rows, exactly how a JNI/FFI decoder would be held), and the
  * pruned-column flow.
  */
object Multimodal {

  /** Decoded-asset metadata row. */
  case class MediaMeta(
      asset_id: Long,
      byte_len: Long,
      magic: String,      // first-4-bytes hex, the format sniff
      width: Long,
      height: Long,
      frames: Long)

  /** STUB codec: deterministic fake decode. A real deployment swaps
    * this object for the FFI decoder; the call shape (init once,
    * decode per payload) is the contract. */
  object FakeCodec {
    def sniffMagic(bytes: Array[Byte]): String =
      bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    def decode(assetId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(assetId, n, sniffMagic(bytes),
        width = 64 + n % 1024,
        height = 64 + (n * 7) % 1024,
        frames = 1 + n % 30)
    }
  }

  /** Wrap a text table as a binary-payload asset table — the ingest
    * shape a media pipeline starts from: (asset_id, payload binary). */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** Partition-batched decode: one codec per partition, streamed rows.
    * Selecting only (asset_id, payload) before the mapPartitions keeps
    * column pruning intact — the scan reads just the payload column. */
  def decodeMeta(spark: SparkSession, assets: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = FakeCodec // real impl: init native decoder here, once
        rows.map { case (id, bytes) => codec.decode(id, bytes) }
      }
  }

  /** Frame-sampling plumbing: explode each asset into `every`-th frame
    * index up to its frame count — the fan-out stage a video pipeline
    * runs before per-frame feature extraction. */
  def sampleFrames(meta: DataFrame, every: Int): DataFrame =
    meta.select(col("asset_id"), col("frames"),
      explode(sequence(lit(0L), col("frames") - 1, lit(every.toLong)))
        .as("frame_idx"))
}
