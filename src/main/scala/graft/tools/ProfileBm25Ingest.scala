package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase breakdown of q_stream_bm25_ingest's gate shape —
  * seed build, per-batch ingest, quiesced compaction, final serve —
  * to attribute the row's wall-clock at scale.
  * Usage: runMain graft.tools.ProfileBm25Ingest <sfDir> */
object ProfileBm25Ingest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-bm25i",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions.tokens

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val dir = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_profbi_" +
        ProcessHandle.current().pid())
    val idxDir = s"$dir/idx"

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profbi] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("seed build+write (1/3 corpus)") {
      graft.operators.TextProfile.bm25Index(
        docs.filter($"doc_id" % 3 === 0), "doc_id", "text").write(idxDir)
    }
    time("collect rest (2/3 corpus) to driver") {
      ProfileBm25Ingest.rest = docs.filter($"doc_id" % 3 =!= 0)
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    }
    ProfileBm25Ingest.rest.grouped(
        math.max(1, ProfileBm25Ingest.rest.size / 3 + 1))
      .zipWithIndex.foreach { case (b, i) =>
        time(s"ingest batch $i (${b.size} docs, direct call)") {
          val df = s.createDataset(b).toDF("doc_id", "text")
            .repartition(s.sparkContext.defaultParallelism)
          graft.operators.TextProfile.bm25IngestBatch(df, "text",
            idxDir, s"prof-$i")
        }
      }
    time("compactAll (term-sorted re-pack)") {
      graft.operators.Maintenance.compactAll(s, Seq(idxDir))
      ()
    }
    // serve timed twice back-to-back: the box bursts, one reading is
    // not evidence
    (1 to 2).foreach { pass =>
      time(s"readBm25Index + serve pass $pass (corpus/100 queries, k=5)") {
        val idx = graft.operators.TextProfile.readBm25Index(s, idxDir,
          "doc_id")
        val queries = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
        graft.operators.TextProfile.bm25TopKWithIndex(queries, "q_id",
          "qtext", idx, k = 5, stopwordCut = false).count()
        s.catalog.clearCache()
        ()
      }
    }
    spark.stop()
  }

  private var rest: Seq[(Long, String)] = Nil
}
