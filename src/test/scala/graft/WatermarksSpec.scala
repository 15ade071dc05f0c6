package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Choosers.StreamPartition
import graft.streaming.Watermarks
import graft.streaming.Watermarks.{NotExist, WatermarkStates}

/** Per-input watermark aggregation with the idle-timeout and quorum
  * escape hatches (WatermarkStates.java:40-94 semantics). */
class WatermarksSpec extends AnyFunSuite {

  private val p0 = StreamPartition("int", 0)
  private val p1 = StreamPartition("int", 1)
  private val src = StreamPartition("src", 0)

  private def mkStates(idleMs: Long = 0, quorum: Double = 1.0,
      now: () => Long = () => 0L) =
    new WatermarkStates(Set(p0, p1, src), Map("int" -> 3),
      idleTimeoutMs = idleMs, quorumPct = quorum, now = now)

  test("source partitions (no producer) take max of reports") {
    val w = mkStates()
    assert(w.watermarkOf(src) == NotExist)
    w.update(src, 100L)
    w.update(src, 50L) // stale report: max keeps 100
    assert(w.watermarkOf(src) == 100L)
  }

  test("intermediate watermark moves only when ALL producers report") {
    val w = mkStates()
    w.update(p0, 10L, Some("t1"))
    w.update(p0, 20L, Some("t2"))
    assert(w.watermarkOf(p0) == NotExist) // t3 missing
    w.update(p0, 30L, Some("t3"))
    assert(w.watermarkOf(p0) == 10L) // min over producers
  }

  test("per-producer regression is dropped, not applied") {
    val w = mkStates()
    w.update(p0, 10L, Some("t1"))
    w.update(p0, 20L, Some("t2"))
    w.update(p0, 30L, Some("t3"))
    w.update(p0, 5L, Some("t1")) // regressed report ignored
    assert(w.watermarkOf(p0) == 10L)
    w.update(p0, 40L, Some("t1"))
    assert(w.watermarkOf(p0) == 20L) // min now governed by t2
  }

  test("stream watermark is min over partitions; job over all inputs") {
    val w = mkStates()
    for (p <- Seq(p0, p1); (t, ts) <- Seq("t1" -> 10L, "t2" -> 20L,
      "t3" -> 30L)) w.update(p, ts + (if (p == p1) 5 else 0), Some(t))
    assert(w.watermark("int") == 10L) // min(10, 15)
    assert(w.jobWatermark == NotExist) // src never reported
    w.update(src, 7L)
    assert(w.jobWatermark == 7L)
  }

  test("idle producer is excluded once past the timeout with quorum") {
    var clock = 0L
    val w = mkStates(idleMs = 100L, quorum = 0.5, now = () => clock)
    w.update(p0, 10L, Some("t1"))
    w.update(p0, 12L, Some("t2"))
    w.update(p0, 14L, Some("t3"))
    assert(w.watermarkOf(p0) == 10L)
    // t1 goes idle; t2/t3 keep advancing past the idle timeout
    clock = 200L
    w.update(p0, 50L, Some("t2"))
    // plain min (t1's 10) would stall; active = {t2, t3} >= quorum
    // (3 * 0.5 = 1), so the idle hatch advances to min(50, 14)
    w.update(p0, 52L, Some("t3"))
    assert(w.watermarkOf(p0) == 50L)
  }

  test("below quorum the idle hatch does NOT advance the watermark") {
    var clock = 0L
    val w = mkStates(idleMs = 100L, quorum = 0.9, now = () => clock)
    w.update(p0, 10L, Some("t1"))
    w.update(p0, 12L, Some("t2"))
    w.update(p0, 14L, Some("t3"))
    clock = 200L
    w.update(p0, 50L, Some("t2")) // only t2 active < quorum (2.7 -> 2)
    assert(w.watermarkOf(p0) == 10L) // held
  }

  test("quorum lets the watermark establish without every producer") {
    // t3 NEVER reports; with the idle timeout elapsed and a quorum of
    // reporters, the watermark still establishes (canUpdateWatermark's
    // second arm) — the exact case Spark's global watermark cannot
    // express (one silent source pins the watermark forever)
    var clock = 0L
    val w = mkStates(idleMs = 100L, quorum = 0.6, now = () => clock)
    w.update(p0, 10L, Some("t1"))
    assert(w.watermarkOf(p0) == NotExist)
    clock = 150L
    w.update(p0, 20L, Some("t2")) // 2 reporters >= quorum (3*0.6 -> 1)
    assert(w.watermarkOf(p0) != NotExist)
  }

  test("unregistered partition report fails loudly") {
    val w = mkStates()
    intercept[IllegalArgumentException] {
      w.update(StreamPartition("nope", 9), 1L)
    }
  }
}
