package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the LM-model store's amortization — the claim
  * behind LmScore.writeModel is that a quality-filtering deployment
  * pays the reference scan once per model lifetime, then scores every
  * corpus batch from two vocab-bounded count tables. This times, on
  * real volume:
  *
  *   1. fresh train+score (the cost a store-less pipeline pays per
  *      scoring run — reference re-scanned every time),
  *   2. model write (the once-per-lifetime cost),
  *   3. stored-model score of the full corpus (the amortized per-run
  *      cost),
  *   4. stored-model score of a 1/16 ingest batch (the per-batch
  *      serving cost `lmLookupStream` pays),
  *   5. appendModel of a new reference batch + the post-append score
  *      (partials summed at read — correctness never waits for
  *      compaction).
  *
  * Usage: runMain graft.tools.ProfileLm <sfDir>
  * (or set SPARK_GRAFT_SF_DIR — no machine-specific default)
  */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error(
        "ProfileLm: pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-lm",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.LmScore

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val ref = docs.filter(col("lang") === "en")
    val dir = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_proflm_" +
        ProcessHandle.current().pid())

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[proflm] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    // warmup: full pipeline shape once at small volume
    LmScore.bitsPerBigram(ref.limit(200), docs.limit(200), "doc_id",
      "text").count()

    time("fresh train+score (store-less per-run cost)") {
      LmScore.bitsPerBigram(ref, docs, "doc_id", "text").count()
    }
    time("writeModel (once per model lifetime)") {
      LmScore.writeModel(ref.filter(col("doc_id") % 16 =!= 0), "text",
        dir)
      1L
    }
    time("stored score, full corpus (amortized per-run)") {
      LmScore.score(LmScore.readModel(spark, dir), docs, "doc_id",
        "text").count()
    }
    time("stored score, 1/16 batch (lmLookupStream's per-batch serve)") {
      LmScore.score(LmScore.readModel(spark, dir),
        docs.filter(col("doc_id") % 16 === 0), "doc_id", "text").count()
    }
    time("appendModel (1/16 reference batch)") {
      LmScore.appendModel(ref.filter(col("doc_id") % 16 === 0), "text",
        dir, tag = "batch16")
      1L
    }
    time("stored score over partials (post-append, pre-compact)") {
      LmScore.score(LmScore.readModel(spark, dir), docs, "doc_id",
        "text").count()
    }
    spark.stop()
  }
}
