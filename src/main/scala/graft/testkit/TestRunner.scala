package graft.testkit

import scala.reflect.ClassTag

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
      * memory sink), for pipelines whose semantics are stream-specific. */
    def runStream[O](pipeline: Dataset[I] => Dataset[O])(
        implicit ie: Encoder[I], oe: Encoder[O],
        ct: ClassTag[O]): StreamAssert[O] = {
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[I]
      mem.addData(input: _*)
      val name = "testrunner_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = pipeline(mem.toDS()).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      new StreamAssert(spark.table(name).as[O](oe).collect().toSeq)
    }
  }

  /** StreamAssert analog: order-insensitive by default, mirroring the
    * reference's sorted asserts (TestSamzaSqlEndToEnd.java:71-76). */
  final class StreamAssert[O](val output: Seq[O]) {
    def containsInAnyOrder(expected: O*): StreamAssert[O] = {
      val got = output.groupBy(identity).view.mapValues(_.size).toMap
      val want = expected.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"expected $want, got $got")
      this
    }
    def hasSize(n: Int): StreamAssert[O] = {
      assert(output.size == n, s"expected $n rows, got ${output.size}")
      this
    }
    def satisfies(p: Seq[O] => Boolean): StreamAssert[O] = {
      assert(p(output), s"predicate failed on $output")
      this
    }
  }
}
