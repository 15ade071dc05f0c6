package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Fault tolerance (SURVEY §2.8): Samza restores offsets + changelogged
  * state on restart; the Spark analog is checkpointLocation. A stateful
  * streaming aggregation is stopped mid-stream and restarted from its
  * checkpoint — counts must continue from restored state, with no loss
  * and no double-counting of already-committed batches. */
class CheckpointSpec extends SparkSpec {

  test("stateful aggregation resumes from checkpoint across restarts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val input = MemoryStream[(String, Long)]
    def agg = input.toDS().toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))

    // phase 1: two batches, then stop
    val q1 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ckpt_phase1")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    input.addData(("a", 1L), ("a", 2L), ("b", 10L))
    val run1 = q1.start(); run1.awaitTermination()

    // phase 2: restart from the same checkpoint, more data
    input.addData(("a", 4L), ("c", 100L))
    val run2 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ckpt_phase2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    run2.awaitTermination()

    val out = s.table("ckpt_phase2")
      .as[(String, Long, Long)].collect().toSet
    // restored state: a's prior (2, 3) continues to (3, 7); b survives
    // the restart untouched; c is new
    assert(out == Set(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 100L)),
      s"got $out")
  }

  test("streaming dedup state survives restart: no duplicate re-admitted") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt").toString

    val outDir = Files.createTempDirectory("graft_dedup_out").toString

    val input = MemoryStream[(Long, String)]
    // the corpusCleanStream dedup core: stateful dropDuplicates on the
    // normalized-text fingerprint. File sink: the memory sink does not
    // support checkpoint recovery in append mode; parquet is the
    // exactly-once production shape anyway.
    def cleaned = graft.streaming.StreamJobs.corpusCleanStream(
      input.toDS().toDF("doc_id", "text"))
    def runPhase(): Unit = {
      val q = cleaned.writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // phase 1: two docs admitted (both pass the en-quality gates)
    val good1 = "the quick brown fox and the lazy dog it is a fine day " +
      "in the park and everyone is happy about it"
    val good2 = "this is another perfectly fine english document of " +
      "reasonable length and it is mostly alphabetic words"
    input.addData((1L, good1), (2L, good2))
    runPhase()
    assert(s.read.parquet(outDir).count() == 2)

    // phase 2 AFTER RESTART: a byte-identical duplicate of doc 1 (new
    // id), a whitespace-variant duplicate of doc 2 (same fingerprint),
    // and one genuinely new doc — only the new doc joins the output
    val good3 = "a third and final english document which is also of " +
      "good quality and it is long enough to pass the gates"
    input.addData((10L, good1), (20L, good2.replace(" ", "  ")),
      (30L, good3))
    runPhase()

    val out = s.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 30L),
      s"restored dedup state must reject cross-restart duplicates; got $out")
  }
}
