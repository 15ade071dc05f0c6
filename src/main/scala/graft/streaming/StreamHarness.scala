package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Deterministic micro-batch driver for the faithful streaming
  * operators (StreamWindows / TtlJoin / TaskRunner): feeds timestamped
  * batches through a MemoryStream under an injected clock so a
  * STREAMING run of the stateful implementation produces a result a
  * batch SQL oracle can verify hash-exactly.
  *
  * This is the parity/test harness, not a scale path: input batches
  * are driver-resident (like the reference's TestRunner in-memory
  * system, samza-test/.../framework/TestRunner.java) and the clock is
  * a process-global — valid in local mode where driver and executors
  * share one JVM. The production operators take an arbitrary
  * `clock: () => Long` and run on ordinary distributed Datasets /
  * streams; only this harness is local-by-design.
  */
object StreamHarness {

  /** Injected wall clock read by operator lambdas executor-side.
    * Volatile: written by the driver between micro-batches, read by
    * task threads during them (same JVM in local mode). */
  @volatile var nowMs: Long = 0L

  val clock: () => Long = () => nowMs

  private val nameCounter = new AtomicInteger(0)

  /** Run `build` over a MemoryStream fed with `steps`: for each
    * (clockMs, batch) the harness sets the injected clock, adds the
    * batch, and drains the micro-batch before moving on — so state
    * crosses batch boundaries exactly as it would across Samza
    * process() invocations over time. Returns the collected append
    * output. */
  def run[T: Encoder](spark: SparkSession, steps: Seq[(Long, Seq[T])])(
      build: Dataset[T] => Dataset[_]): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[T]
    val name = s"graft_stream_parity_${nameCounter.incrementAndGet()}"
    val q = build(input.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      steps.foreach { case (t, batch) =>
        nowMs = t
        if (batch.nonEmpty) {
          input.addData(batch)
          q.processAllAvailable()
        }
      }
    } finally q.stop()
    spark.table(name)
  }
}
