package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the semantic-dedup (q_embed_dedup) operating-point sweep.
  *
  * The chain is pair-volume-bound: lshNearDup's cost is flat-ish in
  * the threshold (bucketing is threshold-free; the threshold only
  * filters verified cosines) but dupClusters' cost tracks the
  * DUPLICATE GRAPH it is handed. At sf10 the oracle-scale threshold
  * (0.3) turns the synthetic corpus into a dense graph (6.8M pairs
  * over 200k vectors, average degree ~68) — that is not a dedup
  * workload, it is a similarity graph, and min-label propagation over
  * it is the wrong tool. This sweep records pair volume and
  * end-to-end survivors cost per threshold so the operating envelope
  * is a measured table, not advice.
  *
  * Usage: runMain graft.tools.ProfileSemantic <sfDir> [t1,t2,...]
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val ts = args.lift(1).getOrElse("0.9,0.6,0.3").split(",").map(_.toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-semantic",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.{Curation, Dedup, Similarity}

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    emb.persist()
    val n = emb.count()

    // the measured operating rule: estimate the corpus's background
    // cosine mode and the derived threshold (expected degree ≤ 8 —
    // under the density guard's 32), then include the derived τ in
    // the sweep so "derived never trips the guard" is a recorded
    // row, not an assertion
    val hist = Similarity.backgroundCosineHistogram(emb, "vec_id",
      "embedding")
    val mode = Similarity.histogramMode(hist)
    val derived = Similarity.derivedDedupThreshold(hist, n,
      targetDegree = 8.0)
    println(f"[semantic] background mode=$mode%.3f derived_t=$derived%.3f " +
      f"(n=$n, sample pairs=${hist.map(_._2).sum})")

    (ts :+ derived).distinct.foreach { t =>
      val t0 = System.nanoTime()
      val pairs = Similarity.lshNearDup(emb, "vec_id", "embedding",
        dim = 64, threshold = t)
      pairs.persist()
      val np = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      // dense graphs no longer hang-then-OOM: the dupClusters guard
      // fails fast, and the degree-capped fallback (keep each node's
      // top-D strongest edges) completes bounded — this sweep records
      // both branches so the envelope row in BASELINE.md is measured
      val t1 = System.nanoTime()
      val (clusters, mode) =
        try (Dedup.dupClusters(pairs), "uncapped")
        catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("denseDegreeLimit") =>
            println(f"[semantic] t=$t%.1f dense guard tripped " +
              f"(+${(System.nanoTime() - t1) / 1e9}%.1f s): falling " +
              "back to capDegree D=8")
            (Dedup.dupClusters(Dedup.capDegree(pairs,
              weightCol = "cos", maxDegree = 8)), "capped-D8")
        }
      val n = Curation.survivors(emb.select("vec_id"), "vec_id",
        clusters).count()
      val tClust = (System.nanoTime() - t1) / 1e9
      println(f"[semantic] t=$t%.1f pairs=$np pairs_s=$tPairs%.2f " +
        f"cluster+survivors_s=$tClust%.2f survivors=$n mode=$mode")
      pairs.unpersist()
    }
    spark.stop()
  }
}
