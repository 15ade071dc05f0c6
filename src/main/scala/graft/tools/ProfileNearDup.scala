package graft.tools

/** Dev tool: measure the SRP-LSH near-dup planes tradeoff at a given
  * sf dir — the evidence behind BASELINE.md's "mitigated by more
  * planes" claim. More planes = more buckets = smaller within-bucket
  * quadratic, at the cost of recall for moderate-similarity pairs.
  * Usage: runMain graft.tools.ProfileNearDup <sfDir> <planes...> */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val planes = args.tail.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-neardup-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    planes.foreach { p =>
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity
        .lshNearDup(emb, "vec_id", "embedding", dim = 64, planes = p,
          threshold = 0.3)
        .count()
      println(f"[neardup] planes=$p pairs=$n " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
