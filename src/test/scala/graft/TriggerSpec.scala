package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamWindows
import graft.streaming.StreamWindows.WindowConfig

/** Time-based early triggers need real processing-time timeouts, so
  * these run as actual streaming queries with a MemoryStream and
  * wall-clock sleeps (generous margins to stay robust under load). */
class TriggerSpec extends SparkSpec {

  test("timeSinceFirstMessage fires an EARLY pane before window close") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Int)]
    // 1-hour window (never closes during the test); early trigger 300ms
    val cfg = WindowConfig(intervalMs = 3600000L,
      earlyTimeSinceFirstMs = Some(300L))
    val panes = StreamWindows.keyedTumblingFold[(String, Int), String, Int](
      input.toDS(), _._1, 0, (a, t) => a + t._2, cfg)
    val q = panes.writeStream.outputMode("append")
      .format("memory").queryName("trigger_test")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(("u", 1), ("u", 2))
      // no processAllAvailable: a stateful query with armed timers runs
      // no-data batches continuously, so just poll the sink until the
      // timeout path emits the EARLY pane
      val deadline = System.currentTimeMillis() + 30000
      var fired = Seq.empty[(String, Int, String)]
      while (fired.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        fired = s.table("trigger_test")
          .as[(String, Long, Int, String, Long)]
          .collect().map(r => (r._1, r._3, r._4)).toSeq
      }
      assert(fired.contains(("u", 3, "EARLY")),
        s"expected EARLY pane with sum 3, got $fired")
    } finally q.stop()
  }
}
