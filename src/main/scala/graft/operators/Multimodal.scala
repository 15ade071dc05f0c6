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

  /** Resized-asset metadata row. */
  case class ResizeMeta(
      asset_id: Long,
      width: Long,
      height: Long,
      out_w: Long,
      out_h: Long,
      out_bytes: Long)

  /** STUB resize: aspect-preserving downscale to fit maxDim, integer
    * math only (deterministic, oracle-replicable). out_bytes models an
    * uncompressed RGB buffer — the real codec would return the encoded
    * size. */
  def fakeResize(m: MediaMeta, maxDim: Long): ResizeMeta = {
    val longest = math.max(m.width, m.height)
    val (ow, oh) =
      if (longest <= maxDim) (m.width, m.height)
      else (m.width * maxDim / longest, m.height * maxDim / longest)
    ResizeMeta(m.asset_id, m.width, m.height, ow, oh, ow * oh * 3L)
  }

  /** Partition-batched resize over decoded metadata: the per-asset
    * stage a real pipeline runs against the decoded buffer. Same
    * batching shape as [[decodeMeta]] — one codec per partition. */
  def resize(spark: SparkSession, meta: Dataset[MediaMeta],
      maxDim: Long): Dataset[ResizeMeta] = {
    import spark.implicits._
    meta.mapPartitions { rows =>
      // real impl: init the native scaler here, once per partition
      rows.map(m => fakeResize(m, maxDim))
    }
  }

  /** Per-asset feature row: byte stats + content hash + a 4-bin byte
    * histogram (the fixed-dim "embedding" a real extractor would emit). */
  case class MediaFeatures(
      asset_id: Long,
      n_bytes: Long,
      mean_byte: Long,
      content_hash: Long,
      h0: Long, h1: Long, h2: Long, h3: Long)

  /** STUB feature extraction over raw payload bytes: deterministic
    * stand-in for an image/audio feature network. All math is integer
    * and byte-order-sequential, so the DuckDB oracle replays it
    * exactly (content hash = the polyHash fold, seed 7, mod 2^20). */
  def fakeFeatures(assetId: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    var sum = 0L
    var h = 7L
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      h = (h * 31 + b) % (1 << 20)
      hist(b % 4) += 1
      i += 1
    }
    MediaFeatures(assetId, n, if (n == 0) 0L else sum / n, h,
      hist(0), hist(1), hist(2), hist(3))
  }

  /** Partition-batched feature extraction: same contract as
    * [[decodeMeta]] — select only (asset_id, payload) so column
    * pruning reaches the scan, one extractor per partition. */
  def extractFeatures(spark: SparkSession,
      assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: load the feature model here, once per partition
        rows.map { case (id, bytes) => fakeFeatures(id, bytes) }
      }
  }
}
