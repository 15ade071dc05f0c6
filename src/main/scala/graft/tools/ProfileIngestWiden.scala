package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: the round-19 A/B behind VERDICT r18 task #2 — both
  * profile rows read ~1.9× bar in the round-18 official capture, and
  * the open hypothesis was that the widen gate's
  * `rdd.getNumPartitions` fallback (round-17 ADVICE) misjudges
  * skewed-but-many-partition batches and skips the exchange the
  * round-16 serve-parallelism fix exists to add.
  *
  * This replays q_stream_profile_ingest's exact streaming shape
  * (MemoryStream, a third seeded batch-side, the rest in 3
  * micro-batches through `CorpusProfile.ingestBatch`) under three
  * arms over identical input:
  *
  *   - as-is:        the production path (`profileIngestStream`
  *                   passes the raw batch — no widen call at all)
  *   - widen-gated:  `StreamJobs.widen(batch)` (what the serve
  *                   scorers run)
  *   - widen-forced: unconditional `repartition(defaultParallelism)`
  *
  * and prints, per batch, what the gate WOULD decide (plan-reported
  * partitions, the RDD fallback, the bounded row probe) — so "the
  * fallback misjudged the batch" is observable directly rather than
  * inferred from wall clocks.
  *
  * Usage: runMain graft.tools.ProfileIngestWiden <sfDir>
  */
object ProfileIngestWiden {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-ingest-widen",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import spark.implicits._
    import graft.operators.CorpusProfile

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val seed = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang"), col("text"))
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val root = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_piw_" +
        ProcessHandle.current().pid())
    println(s"[ingest-widen] $sfDir rest=${rest.size} docs, " +
      s"parallelism=${spark.sparkContext.defaultParallelism}")

    def arm(label: String, xform: DataFrame => DataFrame): Unit = {
      val run = s"$root/$label"
      val pDir = s"$run/profile"
      CorpusProfile.write(
        CorpusProfile.build(seed, "doc_id", "lang", "text"), pDir)
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val q = input.toDS().toDF("doc_id", "lang", "text")
        .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
          val t0 = System.nanoTime()
          if (!batch.isEmpty) {
            // the gate's own probes, printed (not just timed):
            val planParts = batch.queryExecution.executedPlan
              .outputPartitioning.numPartitions
            val rddParts = batch.rdd.getNumPartitions
            val probeRows = batch
              .limit(graft.streaming.StreamJobs.WidenRowFloor.toInt)
              .count()
            CorpusProfile.ingestBatch(
              CorpusProfile.build(xform(batch), "doc_id", "lang",
                "text"), pDir, s"r0-$batchId")
            val dt = (System.nanoTime() - t0) / 1e9
            times += dt
            println(f"[ingest-widen] $label batch=$batchId " +
              f"planParts=$planParts rddParts=$rddParts " +
              f"probeRows=$probeRows wall=$dt%.2f s")
          }
          ()
        }
        .option("checkpointLocation", s"$run/ckpt").start()
      val t0 = System.nanoTime()
      try {
        rest.grouped(math.max(1, rest.size / 3 + 1)).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[ingest-widen] $label TOTAL=$total%.2f s " +
        f"batches=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup arm (codegen + file caches), then the measured three
    arm("warmup", identity)
    arm("as-is", identity)
    arm("widen-gated", b => graft.streaming.StreamJobs.widen(b))
    arm("widen-forced",
      b => b.repartition(spark.sparkContext.defaultParallelism))
    spark.stop()
  }
}
