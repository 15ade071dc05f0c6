package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the IVF nlist/nprobe/refine tradeoff at a given
  * sf dir — the evidence behind
  * `Similarity.derivedNlist`/`derivedNprobe` and the Lloyd-refinement
  * recall numbers in BASELINE.md. Computes brute-force ground truth
  * once (the recall oracle), then times each requested config and
  * reports recall against it.
  * Usage: runMain graft.tools.ProfileIvf <sfDir> <nlist:nprobe[:refine]...>
  * (`0:0` exercises the derived-default path; refine defaults to 1,
  * the operator default). A literal `amortize` token instead of a
  * config measures the persisted-index serving shape: one ivfIndex
  * build+write (derived params), then repeated reload+probe batches —
  * the evidence that the stored index amortizes the build-dominated
  * cost across query batches. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val (amortizeToks, cfgToks) = args.tail.toSeq.partition(_ == "amortize")
    val configs = cfgToks.map { s =>
      s.split(":").map(_.toInt) match {
        case Array(nl, np) => (nl, np, 1)
        case Array(nl, np, r) => (nl, np, r)
        case _ => sys.error(s"bad config '$s': want nlist:nprobe[:refine]")
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-ivf-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import spark.implicits._
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    // ~50 queries at any sf: enough for a stable recall estimate,
    // small enough that brute-force truth stays cheap at sf10
    val mod = math.max(1L, emb.count() / 50)
    val queries = emb.filter($"vec_id" % mod === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val t0 = System.nanoTime()
    val exact = pairs(graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    println(f"[ivf] brute_force truth=${exact.size} " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    configs.foreach { case (nl, np, r) =>
      val t1 = System.nanoTime()
      val approx = pairs(graft.operators.Similarity.ivfTopK(
        queries, emb, "vec_id", "embedding", k = 5,
        nlist = nl, nprobe = np, refine = r))
      println(f"[ivf] nlist=$nl nprobe=$np refine=$r " +
        f"recall=${(exact & approx).size.toDouble / exact.size}%.3f " +
        f"secs=${(System.nanoTime() - t1) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    if (amortizeToks.nonEmpty) {
      // the serving shape: build+persist ONCE (derived params), then
      // each batch is reload+probe only
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ivf_amortize").toString
      val tb = System.nanoTime()
      graft.operators.Similarity
        .ivfIndex(emb, "vec_id", "embedding").write(dir)
      println(f"[ivf] amortize build+write " +
        f"secs=${(System.nanoTime() - tb) / 1e9}%.2f")
      for (b <- 1 to 3) {
        val tp = System.nanoTime()
        val idx = graft.operators.Similarity
          .readIvfIndex(spark, dir, "vec_id", "embedding")
        val got = pairs(graft.operators.Similarity
          .ivfTopKWithIndex(queries, idx, k = 5))
        println(f"[ivf] amortize probe batch=$b " +
          f"recall=${(exact & got).size.toDouble / exact.size}%.3f " +
          f"secs=${(System.nanoTime() - tp) / 1e9}%.2f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
