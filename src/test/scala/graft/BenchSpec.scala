package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench burst-adjudication rules, driven through the scenarios a
  * live run can't stage on demand: a clean run, a mid-run burst band,
  * a fully-throttled run, and the retry selection bounds. The live
  * plumbing (probe cadence, min-of-2 sampling, retry min-reporting)
  * runs in every real `graft.Bench` invocation; these pin the
  * decision rules themselves. */
class BenchSpec extends AnyFunSuite {
  import BenchAdjudication._

  private val idleProbes = Seq(0.1, 0.12, 0.08, 0.14, 0.11)

  test("clean run: no probe flags, no retries") {
    assert(burstProbeCount(0.12, idleProbes, 0.09) == 0)
    val times = IndexedSeq(5.0, 2.0, 0.8, 0.1, 3.0, 0.5)
    assert(retryCandidates(times, 2, 0.12, idleProbes.take(2), 0.09)
      .isEmpty)
  }

  test("mid-run burst: the bursting probes flag; bracketed rows retry") {
    // probes: clean, BURST, BURST, clean — the round-10 signature
    // (clean endpoints, a contiguous mid-run band)
    val probes = Seq(0.1, 1.4, 2.2, 0.11)
    // a mild 2x fair-share burst also flags now (staged-hog evidence)
    assert(burstProbeCount(0.08, Seq(0.1, 0.2, 0.09), 0.08) == 1)
    assert(burstProbeCount(0.1, probes, 0.09) == 2)
    // calEvery=2 → segments: [0,1] bracketed (cal, p0), [2,3] (p0,p1),
    // [4,5] (p1,p2), [6,7] (p2,p3), [8,9] (p3, cal2). Burst probes
    // p1/p2 bracket queries 2..7.
    val times = IndexedSeq(0.5, 0.2, 0.6, 4.0, 0.2, 1.5, 2.0, 0.1,
      0.9, 0.4)
    val picked = retryCandidates(times, 2, 0.1, probes, 0.09)
    // rows 2..7 are burst-bracketed; of those, >= 0.3 s keeps
    // {2 (0.6), 3 (4.0), 5 (1.5), 6 (2.0)}; slowest first
    assert(picked == Seq(3, 6, 5, 2), picked)
    // rows outside the band (0, 8) never retry even though slow-ish
    assert(!picked.contains(0) && !picked.contains(8))
  }

  test("fully-throttled run: every sample high, nothing flags (cal normalization handles it)") {
    // the whole run at ~10x: probes scale WITH the best cal, so the
    // relative flag line stays quiet — this case is adjudicated by
    // cal-vs-idle-bar normalization, not by burst retries
    val probes = Seq(1.0, 1.2, 0.9, 1.1)
    assert(burstProbeCount(1.1, probes, 1.0) == 0)
  }

  test("flag line: 2x best cal with an absolute 0.1 s jitter floor") {
    // tiny cals: the absolute floor governs (0.05*2 = 0.10 < 0.15)
    assert(burstThreshold(0.05, Seq(0.06), 0.05) == 0.05 + 0.1)
    // larger cals: the 2x term governs
    assert(burstThreshold(0.5, Seq(0.6), 0.55) == 1.0)
    // the BEST sample anywhere in the run anchors the line
    assert(burstThreshold(0.5, Seq(0.1, 0.6), 0.55) ==
      math.max(2.0 * 0.1, 0.1 + 0.1))
    // the staged 2x fair-share hog's probe band (0.16-0.22 at
    // calBase ~0.08) must flag — the 3x line missed it
    assert(burstThreshold(0.08, Seq(0.09), 0.08) < 0.19)
  }

  test("retry selection is bounded at 20 rows, slowest first") {
    val probes = Seq(5.0) // one huge burst probe
    val times = IndexedSeq.tabulate(60)(i => 0.3 + i * 0.01)
    val picked = retryCandidates(times, 60, 0.1, probes, 0.1)
    assert(picked.size == 20)
    // slowest-first: the top indices by time
    assert(picked.head == 59 && picked(1) == 58)
  }

  test("bar-relative arm: a 2x-bar row retries with every probe idle") {
    // the round-11 miss: an I/O burst inflates rows while the
    // CPU-bound probes read idle — selection must not need a probe
    val times = IndexedSeq(0.5, 4.0, 0.25, 1.0)
    val barsV = IndexedSeq(Some(0.6), Some(1.5), Some(0.1), Some(0.9))
    val picked = retryCandidates(times, 2, 0.1, idleProbes.take(1), 0.09,
      barsV)
    // row 1 (4.0 vs 1.5 bar = 2.7x) selects; row 0 is under 2x its
    // bar; row 2 breaches its bar but sits under the 0.3 s floor;
    // row 3 (1.0 vs 0.9) is nowhere near 2x
    assert(picked == Seq(1), picked)
  }

  test("bar-relative arm: rows without a bar need a probe breach") {
    val times = IndexedSeq(5.0, 5.0)
    // no bars at all: idle probes select nothing (the clean-run case)
    assert(retryCandidates(times, 2, 0.1, Seq(0.1), 0.09,
      IndexedSeq(None, None)).isEmpty)
    // same readings, bars present: both select, slowest-first stable
    assert(retryCandidates(times, 2, 0.1, Seq(0.1), 0.09,
      IndexedSeq(Some(1.0), Some(1.0))) == Seq(0, 1))
  }

  test("both arms union and stay bounded at 20") {
    // probes flag segment [0,1]; bars flag rows 30-59; total
    // candidates > 20 — the ratio-ordered cap applies across the union
    val probes = Seq(5.0) ++ Seq.fill(29)(0.1)
    val times = IndexedSeq.tabulate(60)(i => 0.4 + i * 0.01)
    val barsV = IndexedSeq.tabulate(60)(i =>
      if (i >= 30) Some(0.01) else None)
    val picked = retryCandidates(times, 2, 0.1, probes, 0.1, barsV)
    assert(picked.size == 20)
    assert(picked.head == 59)
  }

  test("retry candidates: multi-second 2x-bar rows take guaranteed slots, then ratio order") {
    // the round-12 failure: a wide burst inflates an expensive row to
    // 2.2x bar and two cheap rows to 4.5-5x bar; seconds-ordering
    // spent the slots on the expensive row and shipped the MOST
    // anomalous (and cheapest-to-retry) rows uncorrected. Round 14
    // then showed the pure-ratio fix over-rotates: the only
    // multi-second breach (q_dedup_jaccard, 11 s at 2.6x) ranked 21st
    // of 20 slots behind sub-second high-ratio rows the ±noise rule
    // adjudicates anyway. So: (>= 1 s AND >= 2x bar) rows first by
    // ratio, then the remaining candidates by ratio, then bar-less.
    val times = IndexedSeq(12.0, 1.0, 0.5, 6.0)
    val barsV = IndexedSeq(Some(5.5), Some(0.22), Some(0.1), Some(4.0))
    val picked = retryCandidates(times, 2, 0.1, Seq(0.1), 0.09, barsV)
    // row 3 sits at 1.5x bar — not a candidate; rows 0 (12 s, 2.2x)
    // and 1 (1.0 s, 4.5x) are multi-second breaches → guaranteed
    // first, by ratio (1 before 0); the sub-second row 2 (5.0x)
    // queues after them despite the highest ratio
    assert(picked == Seq(1, 0, 2), picked)
  }

  test("a multi-second breach can never be squeezed out by sub-second candidates (round-14 rank-21 case)") {
    // 21 sub-second rows at 5x bar + one 11 s row at 2.6x bar: under
    // pure ratio order the expensive row ranked 21st and the 20-slot
    // budget cut exactly it. The priority arm guarantees it a slot.
    val times = IndexedSeq.tabulate(22)(i =>
      if (i == 21) 11.0 else 0.5 + i * 0.001)
    val barsV = IndexedSeq.tabulate(22)(i =>
      if (i == 21) Some(4.25) else Some(0.1))
    val picked = retryCandidates(times, 30, 0.1, Seq(0.1), 0.09, barsV)
    assert(picked.size == 20)
    assert(picked.head == 21,
      s"the multi-second breach must retry first: $picked")
  }

  test("retry-cal bracketing: a breach retried under a degraded cal is suppressed as burst") {
    // round 14: retries ran at end-of-run under a ~4x throttle
    // (cal3 0.33 vs cal 0.07) and their still-breached minima shipped
    // as formal breaches. With the retry's own probe on record the
    // verdict is mechanical.
    val cal = 0.07; val mids = Seq(0.1, 0.53, 0.64); val cal2 = 0.33
    // line = max(2*0.07, 0.17) = 0.17; a retry cal of 0.33 certifies
    // the retry ran degraded, 0.12 certifies it ran clean
    assert(retryCalDegraded(0.33, cal, mids, cal2))
    assert(!retryCalDegraded(0.12, cal, mids, cal2))
    // suppression needs BOTH a live breach and a degraded retry cal
    assert(suppressAsBurst(12.0, Some(5.83), Some(0.33), cal, mids,
      cal2), "q_stream_ann's round-14 shape must suppress")
    assert(!suppressAsBurst(12.0, Some(5.83), Some(0.12), cal, mids,
      cal2), "a clean-cal retry verdict must ship")
    assert(!suppressAsBurst(5.9, Some(5.83), Some(0.33), cal, mids,
      cal2), "an at-bar row has no breach to suppress")
    assert(!suppressAsBurst(12.0, None, Some(0.33), cal, mids, cal2),
      "bar-less rows never suppress")
    assert(!suppressAsBurst(12.0, Some(5.83), None, cal, mids, cal2),
      "never-retried rows never suppress")
  }

  test("barless probe-flagged rows queue after every barred candidate") {
    // a burst segment holding one bar-less row (new query) and one
    // barred row: the barred row's ratio is computable and it goes
    // first however large the bar-less row's absolute reading
    val probes = Seq(5.0)
    val times = IndexedSeq(9.0, 0.6)
    val barsV = IndexedSeq(None, Some(0.2))
    val picked = retryCandidates(times, 2, 0.1, probes, 0.1, barsV)
    assert(picked == Seq(1, 0), picked)
  }

  test("generated bars cover the registry queries at sf0.1") {
    // BenchBars is generated from BASELINE.md; every bar name must
    // be a real registry query (a rename otherwise silently drops
    // the row from both the retry arm and the breach-only emitter)
    val names = SparkEntry.queries.keySet
    val orphans = BenchBars.sf01.keySet.diff(names)
    assert(orphans.isEmpty, s"bars without a registry query: $orphans")
    // and the converse: every registry query must carry a bar — a
    // bar-less query is invisible to the bar-relative retry arm and
    // floods the breach-only line unconditionally. Adding a query
    // means recording its idle pair in BASELINE.md's first table and
    // regenerating (scripts/gen_bench_bars.sh) before this passes.
    val missing = names.diff(BenchBars.sf01.keySet)
    assert(missing.isEmpty, s"registry queries without a bar: $missing")
    assert(BenchBars.sf01.keySet == BenchBars.sf1.keySet)
    assert(BenchBars.forSf("sf0.42").isEmpty)
  }

  test("breach recheck triggers on a whole-run throttle or an implausibly wide breach dict, never on a clean capture") {
    // the round-17 official capture: opening cal 3.98 (~40× idle), 28
    // breach rows — BOTH arms fire; each alone must also fire
    assert(recheckTriggered(3.98, 28))
    assert(recheckTriggered(0.40, 0))  // whole-run throttle, no breaches
    assert(recheckTriggered(0.09, 11)) // idle cals, wide breach dict
    // a clean capture (idle cal, a few breach rows) never rechecks —
    // a handful of at-2×-bar rows after retries is exactly the
    // regression signal the gate must NOT launder away
    assert(!recheckTriggered(0.09, 10))
    assert(!recheckTriggered(0.11 * 3.0, 3)) // the 3×-idle boundary is exclusive
    // the relative burst machinery stays blind to the whole-run case
    // (fully-throttled test above) — the recheck gate is the arm that
    // catches it, via the RECORDED idle constant
    val probes = Seq(4.1, 4.4, 3.9)
    assert(burstProbeCount(3.98, probes, 4.2) == 0 &&
      recheckTriggered((3.98 +: 4.2 +: probes).min, 0))
  }

  test("brackets attribute each query to its surrounding probes") {
    val probes = Seq(0.2, 0.3)
    // calEvery=4, 10 queries → probes before q4 and q8
    assert(brackets(0, 4, 0.1, probes, 0.15) == Seq(0.1, 0.2))
    assert(brackets(3, 4, 0.1, probes, 0.15) == Seq(0.1, 0.2))
    assert(brackets(4, 4, 0.1, probes, 0.15) == Seq(0.2, 0.3))
    assert(brackets(9, 4, 0.1, probes, 0.15) == Seq(0.3, 0.15))
  }
}
