package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{StreamDedup, StreamHarness}

/** Streaming near-dup detection (StreamDedup): batch-parity of the
  * emitted pair set, single emission per pair even when a pair
  * collides in SEVERAL bands across DIFFERENT micro-batches, and
  * detection latency (a pair surfaces in the batch its second member
  * arrives). */
class StreamDedupSpec extends SparkSpec {

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy dog today",
    3L -> "an entirely different sentence about spark streaming state",
    4L -> "the quick brown fox jumps over the lazy dog tonight", // dup of 1
    5L -> "an entirely different sentence about spark streaming engines")

  private def streamPairs(steps: Seq[(Long, Seq[(Long, String)])]) = {
    val s = spark
    import s.implicits._
    StreamHarness.run(s, steps) { ds =>
      StreamDedup.nearDupPairs(ds.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, numHashes = 16, rowsPerBand = 4,
        threshold = 0.5)
    }.select("id_a", "id_b", "jaccard")
  }

  test("streamed pairs equal the batch LSH pair set") {
    val s = spark
    import s.implicits._
    val steps = docs.grouped(2).zipWithIndex
      .map { case (c, i) => (i * 1000L, c) }.toSeq
    val streamed = streamPairs(steps).as[(Long, Long, Double)]
      .collect().toSet
    val batch = Dedup.minhashLshPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "fixture must produce near-dup pairs")
    assert(streamed == batch)
  }

  test("exact duplicates collide in every band yet emit ONCE") {
    val s = spark
    import s.implicits._
    // docs 1 and 4 are identical → all 4 bands match; they also
    // arrive in different micro-batches, so the minimal-band rule has
    // to hold across batch boundaries
    val steps = docs.grouped(2).zipWithIndex
      .map { case (c, i) => (i * 1000L, c) }.toSeq
    val hits = streamPairs(steps)
      .filter($"id_a" === 1L && $"id_b" === 4L).count()
    assert(hits == 1L)
  }

  test("pairs surface in the arrival batch of the later document") {
    val s = spark
    import s.implicits._
    // one doc per batch: after feeding only docs 1-3 no (1,4) pair
    // can exist; this run stops mid-corpus and checks the prefix
    val steps = docs.take(3).zipWithIndex
      .map { case (d, i) => (i * 1000L, Seq(d)) }
    val prefix = streamPairs(steps).as[(Long, Long, Double)]
      .collect().toSet
    assert(!prefix.exists(p => p._2 == 4L || p._2 == 5L))
    // (1,2) is a near-dup and both arrived → it must already be out
    assert(prefix.exists(p => p._1 == 1L && p._2 == 2L))
  }
}
