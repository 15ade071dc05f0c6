package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Samza DSL windows on Structured Streaming, with the reference's
  * processing-time semantics (WindowOperatorImpl.java:338-354: window
  * position comes from the wall clock, not event time), early triggers
  * and accumulation modes (triggers/Triggers.java, AccumulationMode).
  *
  * Built on flatMapGroupsWithState + processing-time timeouts — the
  * Spark analog of Samza's per-task RocksDB window store + timer tick.
  * State per key is one open pane per window start; firings carry
  * EARLY/DEFAULT labels exactly like FiringType.
  *
  * Event-time windows (the Spark-idiomatic route, used by the engine's
  * query inventory) are `groupBy(window(...))`/`session_window` — see
  * graft.queries.WindowQueries. This class exists for semantic parity
  * where wall-clock panes and count-triggers genuinely matter.
  */
object StreamWindows {

  /** One emitted pane. firing: "EARLY" (count trigger) or "DEFAULT"
    * (window close), matching FiringType (triggers/FiringType.java). */
  case class Pane[K, A](key: K, windowStartMs: Long, value: A,
      firing: String, paneCount: Long)

  /** Early-trigger spec — the Triggers.java factory set with ANY-of
    * combination semantics (Triggers.any:88): count(n):54,
    * timeSinceFirstMessage(d):66, timeSinceLastMessage(d):77;
    * `repeatEarly` = Triggers.repeat(t):106 (re-arm after each firing;
    * false = fire early at most once per pane). */
  case class WindowConfig(
      intervalMs: Long,
      earlyTriggerCount: Option[Int] = None,
      earlyTimeSinceFirstMs: Option[Long] = None,
      earlyTimeSinceLastMs: Option[Long] = None,
      repeatEarly: Boolean = true,
      accumulating: Boolean = false)

  /** Open-pane state (public so call sites can summon its Encoder). */
  case class PaneState[A](windowStartMs: Long, acc: A,
      sinceLastFire: Int, fired: Long, firstAtMs: Long, lastAtMs: Long)

  /** Keyed tumbling window, incremental fold
    * (Windows.keyedTumblingWindow:128). `clock` is injectable for
    * deterministic tests; production uses the wall clock like the
    * reference.
    *
    * `timeout` picks how IDLE keys learn that a pane is due (keys with
    * traffic always flush on the data path, which checks the injected
    * clock every invocation):
    *  - `ProcessingTimeTimeout` (default): real wall-clock timers —
    *    the production mode, where `clock` IS the wall clock (RunLoop
    *    timer-thread analog, container/RunLoop.java:79-121). NOTE:
    *    Spark reruns no-data batches continuously while any
    *    processing-time timeout is armed (it cannot know the next
    *    deadline), so `processAllAvailable` NEVER RETURNS on such a
    *    query — drive it with a real trigger and poll the sink
    *    (TriggerSpec's shape), not with processAllAvailable.
    *  - `EventTimeTimeout`: deadlines are event-time ms, delivered
    *    when the WATERMARK passes them — the replay/harness mode,
    *    where simulated time is carried by a watermarked column and
    *    `clock` returns the same simulated time
    *    (StreamHarness.runWithTicks builds exactly this). The engine
    *    runs one extra batch per watermark advance and then quiesces,
    *    so processAllAvailable terminates.
    *  - `NoTimeout`: data-path only; idle keys flush on their NEXT
    *    message. For bounded/replay runs that feed every key. */
  def keyedTumblingFold[T, K: Encoder, A: Encoder](
      ds: Dataset[T], keyFn: T => K, init: A, fold: (A, T) => A,
      cfg: WindowConfig, clock: () => Long = () => System.currentTimeMillis(),
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)(
      implicit paneEnc: Encoder[Pane[K, A]],
      stateEnc: Encoder[Map[Long, PaneState[A]]]): Dataset[Pane[K, A]] = {

    def fire(out: scala.collection.mutable.Builder[Pane[K, A], Seq[Pane[K, A]]],
        key: K, ws: Long, p: PaneState[A], firing: String): PaneState[A] = {
      out += Pane(key, ws, p.acc, firing, p.fired + 1)
      // DISCARDING resets the pane after each firing; ACCUMULATING
      // keeps folding into the same pane (AccumulationMode.java:32-34)
      if (cfg.accumulating)
        p.copy(sinceLastFire = 0, fired = p.fired + 1, lastAtMs = p.lastAtMs)
      else p.copy(acc = init, sinceLastFire = 0, fired = p.fired + 1)
    }

    def timeTriggerDue(p: PaneState[A], now: Long): Boolean = {
      val canFire = cfg.repeatEarly || p.fired == 0
      canFire && p.sinceLastFire > 0 && (
        cfg.earlyTimeSinceFirstMs.exists(d => now - p.firstAtMs >= d) ||
        cfg.earlyTimeSinceLastMs.exists(d => now - p.lastAtMs >= d))
    }

    /** earliest wakeup this key needs: pane close or a time trigger */
    def nextDeadline(panes: Map[Long, PaneState[A]], now: Long): Long = {
      val closes = panes.keys.map(_ + cfg.intervalMs)
      val triggers = panes.values.flatMap { p =>
        val canFire = cfg.repeatEarly || p.fired == 0
        if (!canFire || p.sinceLastFire == 0) Nil
        else cfg.earlyTimeSinceFirstMs.map(p.firstAtMs + _).toSeq ++
          cfg.earlyTimeSinceLastMs.map(p.lastAtMs + _).toSeq
      }
      (closes ++ triggers).min
    }

    def process(key: K, values: Iterator[T],
        state: GroupState[Map[Long, PaneState[A]]]): Iterator[Pane[K, A]] = {
      var panes = state.getOption.getOrElse(Map.empty[Long, PaneState[A]])
      val out = Seq.newBuilder[Pane[K, A]]
      val now = clock()

      // expiry + due time-triggers run on EVERY invocation, not just
      // timeouts: Spark only delivers hasTimedOut for keys with no data
      // in a batch, so a key with continuous traffic would otherwise
      // never flush closed windows (and would grow one pane per
      // elapsed interval forever)
      val (expired, open) = panes.partition(_._1 + cfg.intervalMs <= now)
      expired.toSeq.sortBy(_._1).foreach { case (ws, p) =>
        out += Pane(key, ws, p.acc, "DEFAULT", p.fired + 1)
      }
      panes = open.map { case (ws, p) =>
        ws -> (if (timeTriggerDue(p, now)) fire(out, key, ws, p, "EARLY")
               else p)
      }

      if (!state.hasTimedOut) {
        values.foreach { v =>
          val ws = (now / cfg.intervalMs) * cfg.intervalMs
          val prev = panes.getOrElse(ws, PaneState(ws, init, 0, 0L, now, now))
          var next = prev.copy(acc = fold(prev.acc, v),
            sinceLastFire = prev.sinceLastFire + 1, lastAtMs = now)
          val countDue = cfg.earlyTriggerCount.exists(n =>
            next.sinceLastFire >= n && (cfg.repeatEarly || next.fired == 0))
          if (countDue) next = fire(out, key, ws, next, "EARLY")
          panes = panes.updated(ws, next)
        }
      }
      if (panes.nonEmpty) {
        state.update(panes)
        // deadlines are strictly > now (expired panes were flushed
        // above; due early-triggers fired), and the watermark never
        // exceeds the current simulated clock, so setTimeoutTimestamp
        // cannot trip Spark's timestamp-behind-watermark check
        if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
          state.setTimeoutDuration(
            math.max(1L, nextDeadline(panes, now) - now))
        else if (timeout == GroupStateTimeout.EventTimeTimeout)
          state.setTimeoutTimestamp(nextDeadline(panes, now))
      } else state.remove()
      out.result().iterator
    }

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(process)
  }

  /** Keyed tumbling window, collect form (Windows.keyedTumblingWindow:159)
    * — fold specialized to list accumulation. */
  def keyedTumblingCollect[T: Encoder, K: Encoder](
      ds: Dataset[T], keyFn: T => K, cfg: WindowConfig,
      clock: () => Long = () => System.currentTimeMillis())(
      implicit seqEnc: Encoder[Seq[T]],
      paneEnc: Encoder[Pane[K, Seq[T]]],
      stateEnc: Encoder[Map[Long, PaneState[Seq[T]]]]): Dataset[Pane[K, Seq[T]]] =
    keyedTumblingFold[T, K, Seq[T]](ds, keyFn, Seq.empty[T],
      (acc, t) => acc :+ t, cfg, clock)

  /** Global (non-keyed) tumbling fold (Windows.tumblingWindow:191) —
    * the reference's Void-key form; every message lands in one pane
    * stream. NOTE: a global window is a single-task bottleneck by
    * construction (exactly as in the reference, where it runs on one
    * task); prefer keyed windows at scale. */
  def tumblingFold[T, A: Encoder](
      ds: Dataset[T], init: A, fold: (A, T) => A, cfg: WindowConfig,
      clock: () => Long = () => System.currentTimeMillis())(
      implicit unitEnc: Encoder[Boolean], paneEnc: Encoder[Pane[Boolean, A]],
      stateEnc: Encoder[Map[Long, PaneState[A]]]): Dataset[Pane[Boolean, A]] =
    keyedTumblingFold[T, Boolean, A](ds, _ => true, init, fold, cfg, clock)

  /** Global tumbling collect (Windows.tumblingWindow:221). */
  def tumblingCollect[T: Encoder](
      ds: Dataset[T], cfg: WindowConfig,
      clock: () => Long = () => System.currentTimeMillis())(
      implicit seqEnc: Encoder[Seq[T]], unitEnc: Encoder[Boolean],
      paneEnc: Encoder[Pane[Boolean, Seq[T]]],
      stateEnc: Encoder[Map[Long, PaneState[Seq[T]]]])
      : Dataset[Pane[Boolean, Seq[T]]] =
    keyedTumblingFold[T, Boolean, Seq[T]](ds, _ => true, Seq.empty[T],
      (acc, t) => acc :+ t, cfg, clock)

  /** Keyed session window, collect form (Windows.keyedSessionWindow:295). */
  def keyedSessionCollect[T: Encoder, K: Encoder](
      ds: Dataset[T], keyFn: T => K, gapMs: Long,
      clock: () => Long = () => System.currentTimeMillis(),
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)(
      implicit seqEnc: Encoder[Seq[T]], paneEnc: Encoder[Pane[K, Seq[T]]],
      stateEnc: Encoder[(Long, Long, Seq[T])]): Dataset[Pane[K, Seq[T]]] =
    keyedSessionFold[T, K, Seq[T]](ds, keyFn, Seq.empty[T],
      (acc, t) => acc :+ t, gapMs, clock, timeout)

  /** Keyed session window with gap close
    * (Windows.keyedSessionWindow:259). One open session per key;
    * arrival extends the session (WindowOperatorImpl: session windows
    * extend by latest arrival); `gapMs` idle closes it. Gap expiry
    * runs on EVERY invocation against the injected clock (Spark only
    * delivers hasTimedOut to keys with no data in a batch, and a
    * stale session must close BEFORE a late arrival starts the next
    * one), with `timeout` — same modes as [[keyedTumblingFold]] —
    * deciding how idle keys learn their gap elapsed. State per key is
    * (sessionStartMs, lastArrivalMs, acc). */
  def keyedSessionFold[T, K: Encoder, A: Encoder](
      ds: Dataset[T], keyFn: T => K, init: A, fold: (A, T) => A,
      gapMs: Long, clock: () => Long = () => System.currentTimeMillis(),
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)(
      implicit paneEnc: Encoder[Pane[K, A]],
      stateEnc: Encoder[(Long, Long, A)]): Dataset[Pane[K, A]] = {

    def process(key: K, values: Iterator[T],
        state: GroupState[(Long, Long, A)]): Iterator[Pane[K, A]] = {
      val now = clock()
      val out = Seq.newBuilder[Pane[K, A]]
      var open = state.getOption
      open.foreach { case (start, lastAt, acc) =>
        if (now - lastAt >= gapMs) {
          out += Pane(key, start, acc, "DEFAULT", 1L)
          open = None
        }
      }
      if (!state.hasTimedOut) {
        values.foreach { v =>
          open = open match {
            case None => Some((now, now, fold(init, v)))
            case Some((start, _, acc)) => Some((start, now, fold(acc, v)))
          }
        }
      }
      open match {
        case Some(st) =>
          state.update(st)
          // EventTime: lastAt+gap > watermark holds — lastAt is `now`
          // for keys with data, and an unexpired idle session has
          // lastAt > now - gap, with watermark <= now always
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration(gapMs)
          else if (timeout == GroupStateTimeout.EventTimeTimeout)
            state.setTimeoutTimestamp(st._2 + gapMs)
        case None => state.remove()
      }
      out.result().iterator
    }

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(process)
  }
}
