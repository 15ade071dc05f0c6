package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: one-plan vs staged execution of the pretrain curation
  * chain (q_pipeline_pretrain).
  *
  * The benched query composes dedup-best -> decontaminate -> quality
  * quartiles -> train order into ONE DataFrame. Later stages
  * reference earlier frames more than once (thresholds aggregate
  * `clean` and then join back to it; trainOrder joins `kept` twice),
  * and Spark recomputes a repeated subtree unless an identical
  * exchange happens to be reused — so the one-plan form pays the
  * shared prefix repeatedly. At 100 TB a pipeline materializes stage
  * boundaries instead. This times both forms on the same input so
  * the "checkpoint your stage boundaries" advice is a measured
  * number, not folklore.
  *
  * Usage: runMain graft.tools.ProfilePretrain <sfDir>
  */
object ProfilePretrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-pretrain",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.{Curation, Dedup}
    import graft.functions.TextFunctions.alphaRatio

    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // one-plan form: exactly the benched registry query
    val (tOne, nOne) = time {
      graft.queries.Registry.all("q_pipeline_pretrain")
        .run(spark, sfDir).count()
    }
    println(f"[pretrain] one-plan: $tOne%.2f s (n=$nOne)")
    spark.catalog.clearCache()

    // staged form: same stages, each boundary persisted once
    val (tStaged, nStaged) = time {
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      val scored = docs.select(col("doc_id"), col("lang"),
        col("source"), col("text"), alphaRatio(col("text")).as("score"))
      val deduped = Curation.survivorsBest(scored, "doc_id", "score",
          Dedup.dupClusters(Dedup.minhashLshPairs(docs, "doc_id",
            "text", n = 3, numHashes = 16, rowsPerBand = 4,
            threshold = 0.5)))
        .persist()
      val corpus = deduped.filter(col("source") =!= "src0")
      val contaminated = Curation.decontaminate(corpus,
          docs.filter(col("source") === "src0"), "doc_id", "text", 4)
        .select("doc_id")
      val clean = corpus.join(broadcast(contaminated), Seq("doc_id"),
        "left_anti").persist()
      clean.count() // materialize the boundary
      val buckets = Curation.qualityBuckets(clean, "doc_id", "text",
          "lang", nBuckets = 4)
        .filter(col("bucket") >= 3).select(col("doc_id"), col("bucket"))
      val kept = clean.join(buckets, Seq("doc_id")).persist()
      kept.count()
      val n = Curation.trainOrder(kept, "doc_id", Seq("doc_id", "text"),
          numShards = 8)
        .join(kept.select(col("doc_id"), col("lang"), col("bucket")),
          Seq("doc_id"))
        .count()
      deduped.unpersist(); clean.unpersist(); kept.unpersist()
      n
    }
    println(f"[pretrain] staged:   $tStaged%.2f s (n=$nStaged)")
    require(nOne == nStaged,
      s"staged form diverged: $nOne vs $nStaged rows")
    spark.stop()
  }
}
