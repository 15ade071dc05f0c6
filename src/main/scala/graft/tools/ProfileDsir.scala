package graft.tools

import org.apache.spark.sql.functions._

/** Phase decomposition for the DSIR stored-model path: how much of
  * q_text_dsir_stored's wall-clock is the ONE-TIME store build
  * (train + sized write of both models) vs the RECURRING weighting
  * run (read both stored models + importanceBits over the corpus) —
  * the amortization argument behind the deployment shape
  * (`LmScore.importanceBits` scaladoc): the whole-pool source model
  * trains once per pool lifetime, every later weighting run pays only
  * the stored-dim joins. Usage:
  * {{{ runMain graft.tools.ProfileDsir [sfDir] }}}
  */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/repo/benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-dsir",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val root = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_profile_dsir_p${ProcessHandle.current().pid()}")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile-dsir] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the file/footer caches so the phases compare compute
    docs.count()
    timed("build stores (train+write both models, once per pool)") {
      graft.operators.LmScore.writeModel(
        docs.filter(col("lang") === "en"), "text", s"$root/target")
      graft.operators.LmScore.writeModel(docs, "text", s"$root/source")
    }
    (1 to 2).foreach { i =>
      timed(s"weighting run $i (read stored models + importanceBits)") {
        val t = graft.operators.LmScore.readModel(spark, s"$root/target")
        val s = graft.operators.LmScore.readModel(spark, s"$root/source")
        graft.operators.LmScore.importanceBits(t, s, docs,
          "doc_id", "text").count()
        graft.operators.LmScore.releaseDsirCache(t, s)
      }
      spark.catalog.clearCache()
    }
    // serve-loop A/B (round-17 finding #3): the STREAM serve's
    // per-batch fixed cost — four parquet reads of the two stores —
    // with the sidecar-stamp ModelCache off vs on. Same batches, same
    // stores; the cache arm pays the read on batch 1 and stamp
    // probes after.
    locally {
      import spark.implicits._
      val rows = docs.select(col("doc_id"), col("text"))
        .limit(3000).as[(Long, String)].collect().toSeq
      def serveLoop(label: String, on: Boolean): Unit = {
        graft.streaming.ModelCache.clear()
        graft.streaming.ModelCache.enabled = on
        try {
          val run = graft.core.FsUtil.deleteOnExit(
            s"$root/serve_${if (on) "cached" else "uncached"}")
          implicit val sqlCtx = spark.sqlContext
          val in = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, String)]
          val q = graft.streaming.StreamJobs.dsirLookupStream(
              in.toDS().toDF("doc_id", "text"), s"$root/target",
              s"$root/source", s"$run/out", "doc_id", "text")
            .option("checkpointLocation", s"$run/ckpt").start()
          try rows.grouped(1000).zipWithIndex.foreach { case (b, i) =>
            val t0 = System.nanoTime()
            in.addData(b); q.processAllAvailable()
            println(f"[profile-dsir] $label batch $i: " +
              f"${(System.nanoTime() - t0) / 1e9}%.2f s")
          } finally q.stop()
        } finally graft.streaming.ModelCache.enabled = true // a mid-arm
        // throw must not leave the JVM-global switch off
        spark.catalog.clearCache()
      }
      serveLoop("serve UNCACHED (read both stores per batch)", on = false)
      serveLoop("serve CACHED (stamp probe per batch)", on = true)
    }

    // the in-query comparison arm: fresh two-model train + weighting
    timed("in-query arm (train both models fresh + importanceBits)") {
      val t = graft.operators.LmScore.train(
        docs.filter(col("lang") === "en"), "text")
      val s = graft.operators.LmScore.train(docs, "text")
      graft.operators.LmScore.importanceBits(t, s, docs,
        "doc_id", "text").count()
      graft.operators.LmScore.releaseDsirCache(t, s)
    }
    spark.stop()
  }
}
