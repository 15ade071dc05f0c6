package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Faithful Samza stream-stream TTL join
  * (samza-core/.../operators/impl/PartialJoinOperatorImpl.java):
  * symmetric hash join where each side's store keeps the LAST value per
  * key with a TTL; a new arrival on one side joins the other side's
  * buffered value iff that value is still within TTL (:84-90).
  * Duplicate keys OVERWRITE — this is last-value-per-key, not a
  * multiset join, which is exactly where a naive Spark stream-stream
  * join would diverge (it multiplies; SURVEY §7.4.3).
  *
  * Implemented as a keyed co-process: both sides union-tagged, state =
  * one (value, timestamp) slot per side, TTL enforced on read and via
  * state timeout for cleanup. Works identically over bounded Datasets
  * (one pass, arrival order = dataset order) and streams.
  */
object TtlJoin {

  /** Tagged envelope: exactly one of left/right is set. */
  case class Tagged[K, L, R](key: K, left: Option[L], right: Option[R],
      atMs: Long)

  case class Joined[K, L, R](key: K, left: L, right: R)

  private case class SideState[L, R](
      left: Option[(L, Long)], right: Option[(R, Long)])

  /** `timers = false` skips the processing-time cleanup timeout (TTL is
    * enforced on read regardless — state just lingers until the key's
    * next arrival). Use for bounded/replay runs: an armed
    * processing-time timeout makes Spark's micro-batch engine rerun
    * no-data batches continuously. */
  def join[K: Encoder, L, R](
      tagged: Dataset[Tagged[K, L, R]], ttlMs: Long,
      timers: Boolean = true)(
      implicit outEnc: Encoder[Joined[K, L, R]],
      stateEnc: Encoder[(Option[(L, Long)], Option[(R, Long)])])
      : Dataset[Joined[K, L, R]] = {

    def process(key: K, values: Iterator[Tagged[K, L, R]],
        state: GroupState[(Option[(L, Long)], Option[(R, Long)])])
        : Iterator[Joined[K, L, R]] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var (l, r) = state.getOption.getOrElse(
        (None: Option[(L, Long)], None: Option[(R, Long)]))
      val out = Seq.newBuilder[Joined[K, L, R]]
      // process in timestamp order: groupByKey does NOT preserve
      // cross-partition arrival order, so "last value per key" over a
      // multi-partition bounded input would otherwise be
      // nondeterministic; sorting also guarantees the buffered side is
      // never newer than the arrival, keeping the TTL check one-sided
      // like the reference's monotonic processing-time store
      values.toSeq.sortBy(t => (t.atMs, t.right.isDefined)).foreach { t =>
        t.left.foreach { lv =>
          l = Some((lv, t.atMs)) // overwrite: last value per key
          r.foreach { case (rv, rts) =>
            if (t.atMs - rts <= ttlMs) out += Joined(key, lv, rv)
          }
        }
        t.right.foreach { rv =>
          r = Some((rv, t.atMs))
          l.foreach { case (lv, lts) =>
            if (t.atMs - lts <= ttlMs) out += Joined(key, lv, rv)
          }
        }
      }
      state.update((l, r))
      if (timers) state.setTimeoutDuration(ttlMs)
      out.result().iterator
    }

    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (timers) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(process)
  }

  /** Convenience: tag two keyed datasets for [[join]]. `atMs` defaults
    * to processing time like the reference; tests inject timestamps. */
  def tag[K, L, R](key: K, left: Option[L] = None, right: Option[R] = None,
      atMs: Long = System.currentTimeMillis()): Tagged[K, L, R] =
    Tagged(key, left, right, atMs)
}
