package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: decode, resize, feature extraction, frame
  * sampling. The image path is REAL (javax.imageio PNG round trips);
  * the video-shaped path keeps the deterministic stub. Specs verify
  * byte-exact pixel round trips plus the Spark-side contracts
  * (schemas, fan-out arithmetic, kernel equivalence). */
class MultimodalSpec extends SparkSpec {

  private def assets = Multimodal.asAssets(
    Tables.load(spark, sf001, "documents").limit(200), "doc_id", "text")

  private def imageAssets = Multimodal.asImageAssets(
    Tables.load(spark, sf001, "documents").limit(200), "doc_id", "text")

  test("PNG round trip: encode -> imageio decode reproduces every pixel") {
    val (w, h, seed) = (13, 9, 42)
    val bytes = Multimodal.PngCodec.encode(w, h, seed)
    // real PNG signature on the wire
    assert(Multimodal.FakeCodec.sniffMagic(bytes) == Multimodal.PngCodec.Magic)
    val img = Multimodal.PngCodec.decode(bytes)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) ==
        Multimodal.PngCodec.rgb(x, y, seed),
        s"pixel ($x,$y) corrupted by the codec round trip")
  }

  test("codec round trips hold across the full parameter envelope") {
    // every geometry the deterministic generators can produce, plus
    // degenerate 1-px edges the clamp path can reach
    for (w <- Seq(1, 2, 8, 17, 31); h <- Seq(1, 9, 24, 31);
         seed <- Seq(0, 1, 127, 250)) {
      val img = Multimodal.PngCodec.decode(
        Multimodal.PngCodec.encode(w, h, seed))
      assert(img.getWidth == w && img.getHeight == h, s"($w,$h,$seed)")
      assert((img.getRGB(w - 1, h - 1) & 0xffffff) ==
        Multimodal.PngCodec.rgb(w - 1, h - 1, seed), s"($w,$h,$seed)")
    }
    for (n <- Seq(1, 2, 64, 319); seed <- Seq(0, 1, 250)) {
      val (rate, ch, frames, amp) =
        Multimodal.WavCodec.decode(Multimodal.WavCodec.encode(n, seed))
      assert(rate == Multimodal.WavCodec.SampleRate && ch == 1)
      assert(frames == n, s"($n,$seed)")
      val expect = (0 until n)
        .map(i => math.abs(Multimodal.WavCodec.sample(i, seed)).toLong).sum
      assert(amp == expect, s"($n,$seed)")
    }
  }

  test("decodeImages: real decode matches oracle-predictable geometry") {
    val s = spark
    import s.implicits._
    val metas = Multimodal.decodeImages(s, imageAssets).collect()
    val lens = Tables.load(s, sf001, "documents").limit(200)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(metas.length == lens.size)
    metas.foreach { m =>
      val (w, h, seed) = Multimodal.PngCodec.dims(lens(m.asset_id))
      assert(m.magic == Multimodal.PngCodec.Magic)
      assert(m.width == w && m.height == h)
      // recompute the checksum from the formula, not the image
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.PngCodec.rgb(x, y, seed)
        expect += ((p >> 16) & 0xff) + 2L * ((p >> 8) & 0xff) + 3L * (p & 0xff)
      }
      assert(m.pix_sum == expect)
    }
  }

  test("WAV round trip: encode -> sound API decode reproduces every sample") {
    val (n, seed) = (200, 42)
    val bytes = Multimodal.WavCodec.encode(n, seed)
    assert(Multimodal.FakeCodec.sniffMagic(bytes) == Multimodal.WavCodec.Magic)
    val (rate, channels, frames, ampSum) = Multimodal.WavCodec.decode(bytes)
    assert(rate == Multimodal.WavCodec.SampleRate)
    assert(channels == 1 && frames == n)
    val expect = (0 until n)
      .map(i => math.abs(Multimodal.WavCodec.sample(i, seed)).toLong).sum
    assert(ampSum == expect, "PCM samples corrupted by the codec round trip")
  }

  test("WAV decode rejects foreign sample layouts instead of mis-summing") {
    // stereo 16-bit and mono 8-bit clips parse as valid WAVs but break
    // the checksum loop's layout assumption — decode must fail loudly
    for ((bits, channels) <- Seq((16, 2), (8, 1))) {
      val fmt = new javax.sound.sampled.AudioFormat(
        Multimodal.WavCodec.SampleRate, bits, channels, true, false)
      val frameBytes = (bits / 8) * channels
      val data = new Array[Byte](50 * frameBytes)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 50L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      intercept[IllegalArgumentException] {
        Multimodal.WavCodec.decode(out.toByteArray)
      }
    }
  }

  test("decodeAudio: real decode matches oracle-predictable stats") {
    val s = spark
    import s.implicits._
    val audio = Multimodal.asAudioAssets(
      Tables.load(s, sf001, "documents").limit(100), "doc_id", "text")
    val metas = Multimodal.decodeAudio(s, audio).collect()
    val lens = Tables.load(s, sf001, "documents").limit(100)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(metas.length == lens.size)
    metas.foreach { m =>
      val (len, seed) = Multimodal.WavCodec.params(lens(m.asset_id))
      assert(m.magic == Multimodal.WavCodec.Magic)
      assert(m.sample_rate == 8000 && m.channels == 1)
      assert(m.n_samples == len)
      val expect = (0 until len)
        .map(i => math.abs(Multimodal.WavCodec.sample(i, seed)).toLong).sum
      assert(m.amp_sum == expect)
    }
  }

  test("resizeImages: re-decoded output dims follow integer aspect math") {
    val s = spark
    import s.implicits._
    val out = Multimodal.resizeImages(s, imageAssets, maxDim = 16L).collect()
    assert(out.nonEmpty)
    assert(out.exists(r => math.max(r.width, r.height) > 16),
      "test data should include images that actually get resized")
    out.foreach { r =>
      if (math.max(r.width, r.height) <= 16) {
        assert(r.out_w == r.width && r.out_h == r.height)
      } else {
        val longest = math.max(r.width, r.height)
        assert(math.max(r.out_w, r.out_h) <= 16)
        assert(r.out_w == r.width * 16 / longest)
        assert(r.out_h == r.height * 16 / longest)
      }
    }
  }

  test("extractFeatures matches the plain-Scala kernel and invariants") {
    val s = spark
    import s.implicits._
    val got = Multimodal.extractFeatures(s, assets).collect()
      .map(f => f.asset_id -> f).toMap
    val raw = assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])].collect()
    assert(raw.nonEmpty && got.size == raw.length)
    raw.foreach { case (id, bytes) =>
      val f = got(id)
      assert(f == Multimodal.fakeFeatures(id, bytes))
      assert(f.n_bytes == bytes.length)
      assert(f.h0 + f.h1 + f.h2 + f.h3 == f.n_bytes)
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
      assert(f.content_hash >= 0 && f.content_hash < (1 << 20))
    }
  }

  test("decode -> frame sample fan-out matches frames arithmetic") {
    val s = spark
    import s.implicits._
    val meta = Multimodal.decodeMeta(s, assets).toDF()
    val sampled = Multimodal.sampleFrames(meta, every = 7)
      .groupBy("asset_id").agg(count(lit(1)).as("n"),
        max("frames").as("frames"))
      .as[(Long, Long, Long)].collect()
    sampled.foreach { case (_, n, frames) =>
      assert(n == (frames + 6) / 7) // ceil(frames / 7)
    }
  }
}
