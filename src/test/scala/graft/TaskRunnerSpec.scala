package graft

import graft.streaming.TaskRunner
import graft.streaming.TaskRunner.{Collector, KVStore, StreamTaskLike}

/** Low-level task API (surface 3): per-message process() with keyed
  * store state, delivery ordering, and the WindowableTask tick. */
class TaskRunnerSpec extends SparkSpec {

  test("process() sees messages in orderBy order with persistent store") {
    val s = spark
    import s.implicits._
    // running per-key sum task: emits (key, runningTotal) per message.
    // Local class so the closure does not capture the (non-serializable)
    // spec instance.
    class SumTask extends StreamTaskLike[(String, Long, Long), (String, Long)] {
      override def process(msg: (String, Long, Long), store: KVStore,
          collector: Collector[(String, Long)]): Unit = {
        val total = store.get("sum").map(_.toLong).getOrElse(0L) + msg._2
        store.put("sum", total.toString)
        collector.send((msg._1, total))
      }
    }
    // deliberately shuffled input order; orderBy = seq restores it
    val ds = Seq(("a", 10L, 2L), ("a", 1L, 1L), ("b", 5L, 1L),
      ("a", 100L, 3L)).toDS().repartition(4)
    val out = TaskRunner.run[(String, Long, Long), String, (String, Long)](
      ds, _._1, new SumTask, orderBy = _._3).collect()
    assert(out.filter(_._1 == "a").map(_._2).sorted.toSeq ==
      Seq(1L, 11L, 111L))
    assert(out.filter(_._1 == "b").map(_._2).toSeq == Seq(5L))
  }

  test("WindowableTask.window() ticks when windowMs elapsed") {
    val s = spark
    import s.implicits._
    // task counts messages in the store; window() flushes the count
    class FlushTask extends StreamTaskLike[(String, Long, Long), (String, Long)] {
      override def process(msg: (String, Long, Long), store: KVStore,
          collector: Collector[(String, Long)]): Unit = {
        val n = store.get("n").map(_.toLong).getOrElse(0L) + 1
        store.put("n", n.toString)
      }
      override def window(store: KVStore,
          collector: Collector[(String, Long)]): Unit = {
        collector.send(("flush", store.get("n").map(_.toLong).getOrElse(0L)))
        store.delete("n")
      }
    }
    val ds = Seq(("k", 1L, 1L), ("k", 1L, 2L), ("k", 1L, 3L)).toDS()
    // clock jumps past windowMs between state init and invocation end
    var t = 0L
    val advancing = () => { t += 5000L; t }
    val out = TaskRunner.run[(String, Long, Long), String, (String, Long)](
      ds, _._1, new FlushTask, orderBy = _._3, windowMs = Some(1000L),
      clock = advancing).collect()
    assert(out.toSeq == Seq(("flush", 3L)))
  }

  test("streaming window() keeps ticking while the task is idle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // emits the tick count on every window() call; data arrives once,
    // then the task sits idle — Samza's WindowableTask keeps ticking
    // every task.window.ms, so at least two ticks must surface
    class TickTask extends StreamTaskLike[(String, Long, Long), (String, Long)] {
      override def process(msg: (String, Long, Long), store: KVStore,
          collector: Collector[(String, Long)]): Unit = ()
      override def window(store: KVStore,
          collector: Collector[(String, Long)]): Unit = {
        val n = store.get("ticks").map(_.toLong).getOrElse(0L) + 1
        store.put("ticks", n.toString)
        collector.send(("tick", n))
      }
    }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val out = TaskRunner.run[(String, Long, Long), String, (String, Long)](
      input.toDS(), _._1, new TickTask, orderBy = _._3,
      windowMs = Some(300L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("task_ticks")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(("k", 1L, 1L))
      val deadline = System.currentTimeMillis() + 30000
      var maxTick = 0L
      while (maxTick < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        val ticks = s.table("task_ticks").as[(String, Long)].collect()
        if (ticks.nonEmpty) maxTick = ticks.map(_._2).max
      }
      assert(maxTick >= 2,
        s"window() must keep ticking after the first timeout, got $maxTick")
    } finally q.stop()
  }

  test("store delete and all behave like KeyValueStore") {
    val store = new KVStore(Map("a" -> "1", "b" -> "2"))
    store.delete("a")
    store.put("c", "3")
    assert(store.get("a").isEmpty)
    assert(store.all == Map("b" -> "2", "c" -> "3"))
  }
}
