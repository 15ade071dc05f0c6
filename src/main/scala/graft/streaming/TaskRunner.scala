package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's LOW-LEVEL task API (its third query surface) on
  * Spark: per-message `process()` callbacks with a persistent
  * KeyValueStore plus a periodic `window()` tick.
  *
  * Reference surface (samza-api):
  *  - task/StreamTask.java:49 — process(envelope, collector, coordinator)
  *  - task/WindowableTask.java:38 — window(collector, coordinator),
  *    called every task.window.ms (TaskConfig.java:54)
  *  - storage/kv/KeyValueStore.java:40 — get:59 put:89 delete:105
  *    all:152 over the task's local RocksDB store
  *
  * Spark mapping: a Samza task owns one partition of a keyed stream and
  * a store scoped to it. Here each distinct task key (the user's
  * partitionBy) is a "task"; its store is keyed state managed by
  * flatMapGroupsWithState — Spark's analog of the per-task RocksDB +
  * RunLoop timer (container/RunLoop.java:79-121). Messages are sorted
  * by `orderBy` inside each invocation because groupByKey does NOT
  * preserve cross-partition arrival order (Samza delivers a partition
  * in offset order; the sort restores determinism).
  *
  * `window()` runs when `windowMs` has elapsed since the last tick, at
  * invocation granularity on the data path plus processing-time
  * timeouts for idle tasks — batch granularity is the micro-batch
  * analog of RunLoop's timer thread.
  */
object TaskRunner {

  /** KeyValueStore.java:40 essentials over the task's state map; string
    * key/value like the reference's serde-wrapped byte store (callers
    * layer typed serdes the same way). */
  final class KVStore private[graft] (
      private[graft] var map: Map[String, String]) {
    def get(k: String): Option[String] = map.get(k)
    def put(k: String, v: String): Unit = map = map.updated(k, v)
    def delete(k: String): Unit = map = map - k
    def all: Map[String, String] = map
  }

  /** MessageCollector analog. */
  final class Collector[OUT] private[graft] () {
    private[graft] val out = Seq.newBuilder[OUT]
    def send(m: OUT): Unit = out += m
  }

  /** StreamTask + WindowableTask in one trait; override `window` for
    * the periodic tick (default: no-op, plain StreamTask). */
  trait StreamTaskLike[T, OUT] extends Serializable {
    def process(msg: T, store: KVStore, collector: Collector[OUT]): Unit
    def window(store: KVStore, collector: Collector[OUT]): Unit = ()
  }

  /** Persisted per-task state: the store plus the last window tick. */
  case class TaskState(store: Map[String, String], lastWindowMs: Long)

  /** Run a low-level task over a (bounded or streaming) Dataset.
    * `taskKeyFn` plays partitionBy: one logical task per key.
    * `orderBy` restores per-task delivery order within an invocation.
    *
    * Ordering caveats vs Samza's per-partition offset order:
    * (1) order is restored only WITHIN one invocation — messages of a
    * key split across micro-batches process in batch-arrival order, so
    * a later batch carrying an earlier `orderBy` value is delivered
    * late (feed streams in `orderBy`-monotonic batches, as the
    * StreamHarness parity queries do, for exact replay);
    * (2) each invocation materializes its group's messages to sort
    * them — per-(key, micro-batch) volume must fit a task, which holds
    * for keyed streams at Samza-like granularity but makes a single
    * hot key with an unbounded batch the same OOM it would be in a
    * Samza task's process loop backlog. */
  def run[T, K, OUT](ds: Dataset[T], taskKeyFn: T => K,
      task: StreamTaskLike[T, OUT], orderBy: T => Long,
      windowMs: Option[Long] = None,
      clock: () => Long = () => System.currentTimeMillis(),
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)(
      implicit kEnc: Encoder[K], outEnc: Encoder[OUT],
      stateEnc: Encoder[TaskState]): Dataset[OUT] = {

    // timeouts exist only on the streaming path; batch invocations get
    // the window tick from the data-path elapsed check alone.
    // `timeout` picks the mode exactly as in StreamWindows: wall-clock
    // ProcessingTimeTimeout for live jobs, EventTimeTimeout for
    // replay/harness runs where the injected clock is carried by a
    // watermarked column (StreamHarness.runWithTicks) — that is the
    // RunLoop timer-thread analog that ticks window() on idle tasks
    // (container/RunLoop.java:79-121).
    val streaming = ds.isStreaming

    def invoke(key: K, values: Iterator[T],
        state: GroupState[TaskState]): Iterator[OUT] = {
      var st = state.getOption.getOrElse(TaskState(Map.empty, clock()))
      val store = new KVStore(st.store)
      val collector = new Collector[OUT]
      values.toSeq.sortBy(orderBy).foreach { m =>
        task.process(m, store, collector)
      }
      val now = clock()
      windowMs.foreach { w =>
        if (now - st.lastWindowMs >= w || state.hasTimedOut) {
          task.window(store, collector)
          st = st.copy(lastWindowMs = now)
        }
        // re-arm on EVERY invocation, including the timed-out one:
        // GroupState clears the timeout each call, so skipping re-arm
        // after a fire would tick an idle task exactly once and then
        // never again (WindowableTask is every task.window.ms, forever)
        if (streaming) {
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration(w)
          else if (timeout == GroupStateTimeout.EventTimeTimeout)
            // next tick in injected-clock time; > watermark because a
            // fire just set lastWindowMs = now >= watermark, and an
            // unfired tick has lastWindowMs > now - w
            state.setTimeoutTimestamp(st.lastWindowMs + w)
        }
      }
      state.update(TaskState(store.map, st.lastWindowMs))
      collector.out.result().iterator
    }

    ds.groupByKey(taskKeyFn)
      .flatMapGroupsWithState(OutputMode.Append,
        if (windowMs.isDefined) timeout
        else GroupStateTimeout.NoTimeout)(invoke)
  }
}
