package graft.testkit

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** In-memory pipeline test harness — the analog of the reference's
  * public test framework (samza-test/.../framework/TestRunner.java +
  * StreamAssert.java, over InMemorySystemDescriptor): feed typed
  * messages into a pipeline, drain it, assert on collected output.
  *
  * Batch mode runs the pipeline over a bounded Dataset; stream mode
  * runs it through a MemoryStream + memory sink with AvailableNow so
  * bounded-input streaming semantics (EOS flush) apply.
  */
object TestRunner {

  def of[I](spark: SparkSession): Builder[I] = new Builder[I](spark)

  final class Builder[I](spark: SparkSession) {
    private var input: Seq[I] = Seq.empty
    def withInput(rows: I*): Builder[I] = { input = rows; this }

    /** Run as a bounded Dataset (the common case for operator tests). */
    def runBatch[O](pipeline: Dataset[I] => Dataset[O])(
        implicit ie: Encoder[I]): StreamAssert[O] = {
      val ds = spark.createDataset(input)(ie)
      new StreamAssert(pipeline(ds).collect().toSeq)
    }

    /** Run through Structured Streaming (MemoryStream → AvailableNow →
      * memory sink), for pipelines whose semantics are stream-specific.
      * The append-mode EOS caveat documented on
      * graft.streaming.StreamJobs.drainToTable applies here too. */
    def runStream[O](pipeline: Dataset[I] => Dataset[O])(
        implicit ie: Encoder[I], oe: Encoder[O]): StreamAssert[O] = {
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[I]
      mem.addData(input: _*)
      val name = "testrunner_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = pipeline(mem.toDS()).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      try {
        q.awaitTermination()
        new StreamAssert(spark.table(name).as[O](oe).collect().toSeq)
      } finally {
        if (q.isActive) q.stop()
        spark.catalog.dropTempView(name) // don't leak the cached sink
      }
    }
  }

  /** StreamAssert analog: order-insensitive by default, mirroring the
    * reference's sorted asserts (TestSamzaSqlEndToEnd.java:71-76).
    * Failures throw unconditionally (never elidable Predef.assert — a
    * test harness must not no-op under -Xdisable-assertions). */
  final class StreamAssert[O](val output: Seq[O]) {
    private def fail(msg: String): Nothing = throw new AssertionError(msg)

    def containsInAnyOrder(expected: O*): StreamAssert[O] = {
      val got = output.groupBy(identity).view.mapValues(_.size).toMap
      val want = expected.groupBy(identity).view.mapValues(_.size).toMap
      if (got != want) fail(s"expected $want, got $got")
      this
    }
    def hasSize(n: Int): StreamAssert[O] = {
      if (output.size != n) fail(s"expected $n rows, got ${output.size}")
      this
    }
    def satisfies(p: Seq[O] => Boolean): StreamAssert[O] = {
      if (!p(output)) fail(s"predicate failed on $output")
      this
    }
  }
}
