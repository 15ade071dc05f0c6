package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: decode, resize, feature extraction, frame
  * sampling. The codec is the deterministic STUB; the specs verify the
  * Spark-side contracts (schemas, fan-out arithmetic, invariants) and
  * equivalence with the plain-Scala kernel. */
class MultimodalSpec extends SparkSpec {

  private def assets = Multimodal.asAssets(
    Tables.load(spark, sf001, "documents").limit(200), "doc_id", "text")

  test("resize fits maxDim, preserves aspect via integer scale") {
    val s = spark
    import s.implicits._
    val meta = Multimodal.decodeMeta(s, assets)
    val out = Multimodal.resize(s, meta, maxDim = 256L).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (math.max(r.width, r.height) <= 256) {
        assert(r.out_w == r.width && r.out_h == r.height)
      } else {
        val longest = math.max(r.width, r.height)
        assert(math.max(r.out_w, r.out_h) <= 256)
        assert(r.out_w == r.width * 256 / longest)
        assert(r.out_h == r.height * 256 / longest)
      }
      assert(r.out_bytes == r.out_w * r.out_h * 3)
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
