package graft

import org.apache.spark.sql.functions._

import graft.streaming.Startpoint
import graft.testkit.TestRunner

class TestKitSpec extends SparkSpec {

  test("TestRunner batch mode runs a pipeline and asserts in any order") {
    val s = spark
    import s.implicits._
    TestRunner.of[Int](s)
      .withInput(3, 1, 2, 2)
      .runBatch(ds => ds.filter(_ > 1).map(_ * 10))
      .containsInAnyOrder(30, 20, 20)
      .hasSize(3)
  }

  test("TestRunner stream mode drains a MemoryStream pipeline") {
    val s = spark
    import s.implicits._
    TestRunner.of[(String, Int)](s)
      .withInput(("a", 1), ("b", 2), ("a", 3))
      .runStream(ds => ds.toDF("k", "v")
        .filter(col("k") === "a")
        .select(col("v")).as[Int])
      .containsInAnyOrder(1, 3)
  }

  test("TestRunner surfaces mismatches") {
    val s = spark
    import s.implicits._
    intercept[AssertionError] {
      TestRunner.of[Int](s).withInput(1)
        .runBatch(ds => ds)
        .containsInAnyOrder(2)
    }
  }

  test("startpoints map to source options") {
    assert(Startpoint.Oldest.kafkaOptions("startingOffsets") == "earliest")
    assert(Startpoint.Upcoming.kafkaOptions("startingOffsets") == "latest")
    assert(Startpoint.Upcoming.fileOptions("maxFileAge") == "0ms")
    assert(Startpoint.Specific("""{"t":{"0":42}}""")
      .kafkaOptions("startingOffsets").contains("42"))
    val ts = Startpoint.Timestamp(1000L)
    assert(ts.kafkaOptions("startingTimestamp") == "1000")
    // Samza fallback: timestamp past the end resolves to upcoming
    assert(ts.kafkaOptions("startingOffsetsByTimestampStrategy") == "latest")
    // modifiedAfter is batch-only (file stream source rejects it) —
    // timestamp has no file-stream mapping
    assert(ts.fileOptions.isEmpty)
  }

  test("eventsStream accepts a startpoint (Oldest reads full history)") {
    val s = spark
    val events = graft.streaming.StreamJobs.eventsStream(s, sf0001,
      Some(Startpoint.Oldest))
    val n = graft.streaming.StreamJobs
      .drainToTable(s, events.groupBy().count(), outputMode = "complete")
      .collect().head.getLong(0)
    assert(n == 1000L)
  }
}
