package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the NB classifier store and serve
  * — where does q_stream_nb_classify's wall-clock go at scale? Times,
  * on real volume:
  *
  *   1. fresh train+classify (the store-less per-run cost),
  *   2. model write (once-per-lifetime),
  *   3. stored-model classify of the full corpus (amortized per-run),
  *   4. stored-model classify of a 1/3 batch ×3 with a model re-read
  *      and cache release per batch (exactly `nbLookupStream`'s
  *      per-batch shape, minus the MemoryStream harness),
  *   5. appendNbModel of a new labeled batch + post-append classify
  *      (partials summed at read).
  *
  * Usage: runMain graft.tools.ProfileClassify <sfDir>
  * (or set SPARK_GRAFT_SF_DIR — no machine-specific default)
  */
object ProfileClassify {
  // handoff between the timed collect phase and the stream phase
  private var rows: Seq[(Long, String)] = Nil

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error(
        "ProfileClassify: pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-nb",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.Classify

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val dir = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_profnb_" +
        ProcessHandle.current().pid())

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profnb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    // warmup: full shape once at small volume
    {
      val m = Classify.trainNb(train.limit(200), "source", "text")
      Classify.classifyNb(m, docs.limit(200), "doc_id", "text").count()
      Classify.releaseNbCache(m)
      spark.catalog.clearCache()
    }

    time("fresh train+classify, full corpus") {
      val m = Classify.trainNb(train, "source", "text")
      val n = Classify.classifyNb(m, docs, "doc_id", "text").count()
      Classify.releaseNbCache(m); n
    }
    spark.catalog.clearCache()

    time("writeNbModel") {
      Classify.writeNbModel(train, "source", "text", s"$dir/model"); 0L
    }

    time("stored-model classify, full corpus") {
      val m = Classify.readNbModel(spark, s"$dir/model")
      val n = Classify.classifyNb(m, docs, "doc_id", "text").count()
      Classify.releaseNbCache(m); n
    }
    spark.catalog.clearCache()

    time("3 serve batches (re-read model + classify + release each)") {
      (0 until 3).map { i =>
        val m = Classify.readNbModel(spark, s"$dir/model")
        val n = Classify.classifyNb(m,
          docs.filter(col("doc_id") % 3 === i), "doc_id", "text").count()
        Classify.releaseNbCache(m); n
      }.sum
    }
    spark.catalog.clearCache()

    time("appendNbModel (1/8 batch) + post-append classify") {
      Classify.appendNbModel(
        docs.filter(col("doc_id") % 8 === 1), "source", "text",
        s"$dir/model", "prof-1")
      val m = Classify.readNbModel(spark, s"$dir/model")
      val n = Classify.classifyNb(m, docs, "doc_id", "text").count()
      Classify.releaseNbCache(m); n
    }

    // the full gate-harness shape (q_stream_nb_classify's body) with
    // sub-phase timing — where the MemoryStream convention's cost goes
    {
      val s = spark
      import s.implicits._
      val run = s"$dir/run_gate"
      time("gate: collect corpus to driver") {
        val rows = docs.select($"doc_id", $"text")
          .as[(Long, String)].collect().toSeq
        ProfileClassify.rows = rows; rows.size.toLong
      }
      time("gate: stream 3 batches through nbLookupStream") {
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = graft.streaming.StreamJobs.nbLookupStream(
            input.toDS().toDF("doc_id", "text"), s"$dir/model",
            s"$run/out", "doc_id", "text")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          val rows = ProfileClassify.rows
          rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { b =>
            val t0 = System.nanoTime()
            input.addData(b)
            val t1 = System.nanoTime()
            q.processAllAvailable()
            println(f"[profnb]   addData ${(t1 - t0) / 1e9}%.2f s, " +
              f"batch ${(System.nanoTime() - t1) / 1e9}%.2f s")
          }
        } finally q.stop()
        s.read.parquet(s"$run/out").count()
      }
      // the same serve body, manual foreachBatch phases, on a
      // 1-partition local batch (the MemoryStream shape)
      time("gate: manual 1/3 batch, 1-partition input") {
        val b = ProfileClassify.rows.take(ProfileClassify.rows.size / 3)
        val batch = s.createDataFrame(
          s.sparkContext.parallelize(b.map(t =>
            org.apache.spark.sql.Row(t._1, t._2)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
        val t0 = System.nanoTime()
        val m = Classify.readNbModel(s, s"$dir/model")
        val t1 = System.nanoTime()
        val n = Classify.classifyNb(m, batch, "doc_id", "text").count()
        val t2 = System.nanoTime()
        Classify.releaseNbCache(m)
        println(f"[profnb]   read ${(t1 - t0) / 1e9}%.2f s, " +
          f"classify ${(t2 - t1) / 1e9}%.2f s")
        n
      }
    }
    spark.stop()
  }
}
