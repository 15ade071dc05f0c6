package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Product quantization (Similarity.pqTopK / pqEncode): deterministic
  * rebuilds, code-shape invariants, and non-degenerate ranking. The
  * bit-exact pipeline itself is oracle-gated (q_ann_pq_topk). */
class PqSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf001, "embeddings")

  test("codes have length m and values within [0, ksub)") {
    val s = spark
    import s.implicits._
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 16)
      .select($"codes").as[Seq[Int]].collect()
    assert(codes.nonEmpty)
    assert(codes.forall(_.length == 4))
    assert(codes.forall(_.forall(c => c >= 0 && c < 16)))
    // a degenerate codebook (all vectors → one code word) would also
    // satisfy the bounds — require some spread
    assert(codes.distinct.length > 4)
  }

  test("training is deterministic: two builds produce identical output") {
    val s = spark
    import s.implicits._
    def run() = Similarity.pqTopK(
      emb.filter($"vec_id" % 100 === 0), emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 16, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("stored index round-trip ranks identically to the fresh build") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq")
      .toString + "/idx"
    Similarity.pqIndex(emb, "vec_id", "embedding", dim = 64).write(dir)
    val idx = Similarity.readPqIndex(s, dir, "vec_id")
    assert(idx.m == 4 && idx.ksub == 16 && idx.dim == 64)
    val q = emb.filter($"vec_id" % 100 === 0)
    val stored = Similarity.pqTopKWithIndex(q, idx, "embedding", k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val fresh = Similarity.pqTopK(q, emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 16, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stored == fresh)
  }

  test("PQ ranking overlaps exact brute-force top-k") {
    val s = spark
    import s.implicits._
    val q = emb.filter($"vec_id" % 100 === 0)
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 16, k = 5)
      .select($"q_id", $"nn_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
      k = 5).select($"q_id", $"nn_id").as[(Long, Long)].collect().toSet
    // 16-word codebooks on synthetic embeddings are coarse; require
    // genuine signal, not parity (the quality knobs are m and ksub)
    val overlap = pq.intersect(exact).size.toDouble / exact.size
    assert(overlap > 0.1, s"PQ@5 overlap with exact top-5 = $overlap")
  }
}
