package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as partition-batched functions.
  *
  * The IMAGE path is real: [[PngCodec]] encodes and decodes actual PNG
  * bytes with the JDK's own `javax.imageio` (no external libraries),
  * and the decode queries are gated on a pixel checksum the oracle
  * predicts — a garbled decode cannot pass. Only the VIDEO-shaped path
  * ([[FakeCodec]], frame counts) remains a deterministic stub, because
  * no video codec ships with the JDK. Everything Spark-side is real
  * for both — the binary schema, the mapPartitions batching shape (one
  * codec init per partition, reused across rows, exactly how a JNI/FFI
  * decoder would be held), and the pruned-column flow.
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

  /** STUB codec for the VIDEO-shaped path (frame counts): the JDK
    * ships no video decoder, so metadata is derived deterministically
    * from the bytes. A real deployment swaps this object for the FFI
    * decoder; the call shape (init once, decode per payload) is the
    * contract. Image payloads use the real [[PngCodec]] instead. */
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

  /** REAL image codec over the JDK's own `javax.imageio` — zero
    * external dependencies. Payload dims and pixel values derive
    * deterministically from the source document, so a SQL oracle can
    * predict exactly what a CORRECT decode must return (width, height,
    * and a pixel checksum); PNG is lossless, so one wrong pixel fails
    * the gate. */
  object PngCodec {
    /** PNG signature, first 4 bytes as lowercase hex. */
    val Magic = "89504e47"

    /** Deterministic asset geometry from the payload's byte length:
      * small images (8..31 px a side) keep per-row encode cost flat.
      * Mirrored by the DuckDB oracle (MultimodalQueries). */
    def dims(n: Long): (Int, Int, Int) =
      ((8 + n % 24).toInt, (8 + (n * 7) % 24).toInt, (n % 251).toInt)

    /** Deterministic pixel: integer polynomials mod 256 per channel —
      * SQL-replicable, and varied enough that a stride/endianness bug
      * in the decode path breaks the checksum. */
    def rgb(x: Int, y: Int, seed: Int): Int = {
      val r = (x * 7 + y * 13 + seed) % 256
      val g = (x * 3 + y * 5 + seed * 11) % 256
      val b = (x + y + seed * 17) % 256
      (r << 16) | (g << 8) | b
    }

    /** Render + encode one REAL PNG. ImageIO's disk cache is off —
      * a temp-file write per encode would put filesystem latency on
      * the per-row path. */
    def encode(w: Int, h: Int, seed: Int): Array[Byte] = {
      javax.imageio.ImageIO.setUseCache(false)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y, seed)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    }

    /** Checksum over decoded pixels: Σ (r + 2g + 3b). The weights keep
      * channel swaps from cancelling out. */
    def pixSum(img: java.awt.image.BufferedImage): Long = {
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          s += ((p >> 16) & 0xff) + 2L * ((p >> 8) & 0xff) + 3L * (p & 0xff)
          x += 1
        }
        y += 1
      }
      s
    }
  }

  /** Wrap a text table as a REAL-PNG asset table: each document
    * becomes (asset_id, payload) where payload is an actual encoded
    * PNG whose geometry and pixels derive deterministically from the
    * document ([[PngCodec.dims]]/[[PngCodec.rgb]]) — so decode results
    * are oracle-predictable without the oracle decoding anything.
    * Partition-batched like every codec stage. */
  def asImageAssets(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
        length(col(textCol)).cast("long").as("__n"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, n) =>
          val (w, h, seed) = PngCodec.dims(n)
          (id, PngCodec.encode(w, h, seed))
        }
      }
      .toDF("asset_id", "payload")
  }

  /** Decoded-image metadata row: real dims + pixel checksum. */
  case class ImageMeta(
      asset_id: Long,
      magic: String,
      width: Long,
      height: Long,
      pix_sum: Long)

  /** REAL partition-batched image decode: `javax.imageio` parses the
    * PNG bytes and the checksum covers every decoded pixel. Selecting
    * only (asset_id, payload) keeps column pruning intact. */
  def decodeImages(spark: SparkSession,
      assets: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = PngCodec.decode(bytes)
          ImageMeta(id, FakeCodec.sniffMagic(bytes),
            img.getWidth.toLong, img.getHeight.toLong,
            PngCodec.pixSum(img))
        }
      }
  }

  /** Resized-image metadata row: input dims and re-decoded output
    * dims. */
  case class ImageResizeMeta(
      asset_id: Long,
      width: Long,
      height: Long,
      out_w: Long,
      out_h: Long)

  /** REAL resize: decode the PNG, aspect-preserving integer downscale
    * to fit `maxDim` (floor division clamped to 1 px — the oracle
    * replays both), render
    * through Graphics2D, re-encode, then RE-DECODE the output so the
    * reported out dims come from actual produced bytes, not the
    * arithmetic. Interpolated pixel values are encoder-dependent, so
    * only geometry is surfaced for oracle comparison; the decode
    * checksum gate lives in [[decodeImages]]. */
  def resizeImages(spark: SparkSession, assets: DataFrame,
      maxDim: Long): Dataset[ImageResizeMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = PngCodec.decode(bytes)
          val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
          val longest = math.max(w, h)
          // clamp to 1 px: integer floor division can zero the short
          // side for extreme aspect ratios / tiny maxDim, and a
          // 0-width BufferedImage throws
          val (tw, th) =
            if (longest <= maxDim) (w, h)
            else (math.max(1L, w * maxDim / longest),
              math.max(1L, h * maxDim / longest))
          val scaled = new java.awt.image.BufferedImage(tw.toInt, th.toInt,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          try g.drawImage(img, 0, 0, tw.toInt, th.toInt, null)
          finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", out)
          val redecoded = PngCodec.decode(out.toByteArray)
          ImageResizeMeta(id, w, h,
            redecoded.getWidth.toLong, redecoded.getHeight.toLong)
        }
      }
  }

  /** REAL audio codec over the JDK's own `javax.sound.sampled` — zero
    * external dependencies, same design as [[PngCodec]]: payload PCM
    * samples derive deterministically from the source document, so a
    * SQL oracle predicts what a CORRECT decode must return (sample
    * rate, channel count, frame count, and an amplitude checksum);
    * 16-bit PCM WAV is lossless, so one wrong sample, byte-order slip,
    * or header misparse fails the gate. */
  object WavCodec {
    /** RIFF signature ("RIFF"), first 4 bytes as lowercase hex. */
    val Magic = "52494646"

    val SampleRate = 8000f

    /** The JDK's WAVE providers, resolved ONCE per JVM. Every
      * `AudioSystem.write`/`getAudioInputStream` call re-scans the SPI
      * registry under a global class lock
      * (`JDK13Services.getProviders` synchronizes on
      * `JSSecurityManager.class`), which serializes all executor
      * threads: jstack during an sf10 run showed 14 of 15 decode
      * threads BLOCKED on that monitor, and the per-clip cost read
      * ~8 ms for a few-hundred-byte clip. Resolving the providers here
      * and invoking them directly keeps the hot path lock-free; the
      * probe WAV below picks the WAVE reader by behavior (public SPI
      * only, no com.sun class names). */
    private lazy val (wavWriter, wavReader): (
        javax.sound.sampled.spi.AudioFileWriter,
        javax.sound.sampled.spi.AudioFileReader) = {
      import scala.jdk.CollectionConverters._
      val wtype = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val writer = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter],
          classOf[javax.sound.sampled.spi.AudioFileWriter].getClassLoader)
        .asScala.find(_.isFileTypeSupported(wtype))
        .getOrElse(sys.error("no WAVE AudioFileWriter provider in JDK"))
      val probe = encodeVia(writer, 64, 1)
      val reader = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader],
          classOf[javax.sound.sampled.spi.AudioFileReader].getClassLoader)
        .asScala.find { r =>
          try {
            r.getAudioInputStream(
              new java.io.ByteArrayInputStream(probe)).close(); true
          } catch { case _: Exception => false }
        }
        .getOrElse(sys.error("no WAVE AudioFileReader provider in JDK"))
      (writer, reader)
    }

    /** Deterministic sample count / seed from the payload's byte
      * length (small clips keep per-row encode cost flat). Mirrored by
      * the DuckDB oracle (MultimodalQueries). */
    def params(n: Long): (Int, Int) =
      ((64 + n % 256).toInt, (n % 251).toInt)

    /** Deterministic 16-bit sample: integer polynomial, range
      * [-1001, 1001] — SQL-replicable, byte-order-sensitive. */
    def sample(i: Int, seed: Int): Int = (i * seed + 7) % 2003 - 1001

    /** Render + encode one REAL mono 16-bit PCM WAV. */
    def encode(nSamples: Int, seed: Int): Array[Byte] =
      encodeVia(wavWriter, nSamples, seed)

    private def encodeVia(
        writer: javax.sound.sampled.spi.AudioFileWriter,
        nSamples: Int, seed: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1,
        true, false) // signed, little-endian
      val data = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = sample(i, seed)
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val out = new java.io.ByteArrayOutputStream()
      writer.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decoded-clip metadata: format fields from the parsed header,
      * amplitude checksum Σ|sample| over the decoded PCM stream. */
    def decode(bytes: Array[Byte]): (Float, Int, Long, Long) = {
      val in = wavReader.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // the checksum loop below assumes this exact sample layout; a
        // foreign WAV (8-bit, big-endian, stereo, float) must fail
        // loudly, not produce a silently wrong amp_sum
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1,
          s"WavCodec.decode supports 16-bit little-endian signed mono " +
            s"PCM only, got $fmt")
        val frames = in.getFrameLength
        val pcm = in.readAllBytes()
        var s = 0L
        var i = 0
        while (i + 1 < pcm.length) {
          // little-endian signed 16-bit
          val v = ((pcm(i + 1).toInt << 8) | (pcm(i) & 0xff)).toShort
          s += math.abs(v.toInt)
          i += 2
        }
        (fmt.getSampleRate, fmt.getChannels, frames, s)
      } finally in.close()
    }
  }

  /** Wrap a text table as a REAL-WAV asset table — the audio twin of
    * [[asImageAssets]]: (asset_id, payload) where payload is an actual
    * RIFF/WAVE clip whose PCM samples derive deterministically from
    * the document. Partition-batched like every codec stage. */
  def asAudioAssets(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
        length(col(textCol)).cast("long").as("__n"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, n) =>
          val (len, seed) = WavCodec.params(n)
          (id, WavCodec.encode(len, seed))
        }
      }
      .toDF("asset_id", "payload")
  }

  /** Decoded-audio metadata row: parsed header fields + amplitude
    * checksum over the decoded samples. */
  case class AudioMeta(
      asset_id: Long,
      magic: String,
      sample_rate: Long,
      channels: Long,
      n_samples: Long,
      amp_sum: Long)

  /** REAL partition-batched audio decode: `javax.sound.sampled`
    * parses the RIFF/WAVE header and streams the PCM frames; the
    * checksum covers every decoded sample. */
  def decodeAudio(spark: SparkSession,
      assets: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, channels, frames, ampSum) = WavCodec.decode(bytes)
          AudioMeta(id, FakeCodec.sniffMagic(bytes), rate.toLong,
            channels.toLong, frames, ampSum)
        }
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
