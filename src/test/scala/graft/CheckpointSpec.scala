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
}
