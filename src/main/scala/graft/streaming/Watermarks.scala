package graft.streaming

import scala.collection.mutable

import graft.streaming.Choosers.StreamPartition

/** The reference's per-input watermark aggregation with the idle and
  * quorum escape hatches — the piece of its watermark model that
  * Spark's single global watermark cannot express (a straggling or
  * idle producer task holds a Spark query's watermark back forever;
  * the reference drops such producers from the min once they exceed an
  * idle timeout, provided a quorum of producers is still reporting).
  *
  * Reference surface (re-derived behavior, not a translation):
  *  - operators/impl/WatermarkStates.java:40 — per-partition state:
  *    expected producer count, per-producer-task timestamps and last
  *    update times, watermark = max(old, min over producers)
  *  - WatermarkStates.java:92-94 (canUpdateWatermark) — the watermark
  *    may move once ALL producers reported, or, with an idle timeout
  *    configured, once the state is older than the timeout and at
  *    least a quorum reported
  *  - WatermarkStates.java:66-80 — when the plain min stalls the
  *    watermark, recompute it over only the producers that updated
  *    within the idle timeout; accept it only if they form a quorum
  *  - WatermarkStates.java:147 (getWatermark) — a stream's watermark
  *    is the min over its partitions' watermark times
  *  - TaskConfig.java watermark idle-timeout / quorum-percentage knobs
  *
  * Where it plugs in here: the faithful stateful operators
  * (StreamWindows / TaskRunner / TtlJoin) take an injected
  * `clock: () => Long`, and StreamHarness.runWithTicks turns clock
  * advances into event-time ticks. An instance of this class is the
  * multi-producer clock SOURCE for that path: feed every producer's
  * watermark report in, read `watermark(stream)` out, advance the
  * harness clock with it — idle producers then stop holding back pane
  * flushes exactly as in the reference. Spark's own `withWatermark`
  * paths keep Spark's semantics; this divergence and the escape hatch
  * are documented in OPERATORS.md §2.8.
  *
  * Thread-safety: updates are synchronized per instance (the reference
  * synchronizes per state; one lock here keeps min-over-partitions
  * reads consistent with updates).
  */
object Watermarks {

  /** "No watermark yet" sentinel (WatermarkStates.java:38). */
  val NotExist: Long = -1L

  /** One stream partition's aggregation state over the tasks that
    * produce into it. `expectedProducers` = number of upstream
    * producer tasks (0 for a source partition, where reports carry no
    * producer name and the watermark is simply max of reports). */
  private final class PartitionState(expectedProducers: Int,
      idleTimeoutMs: Long, quorumPct: Double, now: () => Long) {
    private val timestamps = mutable.Map.empty[String, Long]
    private val lastUpdate = mutable.Map.empty[String, Long]
    private val quorumSize: Int = (expectedProducers * quorumPct).toInt
    private val createTime: Long = now()
    var watermark: Long = NotExist

    /** May the watermark move at all? All producers reported, OR the
      * idle escape hatch: the state has existed past the idle timeout
      * and a quorum reported (some producers may never report). */
    private def canUpdate(currentTime: Long): Boolean =
      timestamps.size == expectedProducers ||
        (idleTimeoutMs > 0 && currentTime - createTime >= idleTimeoutMs &&
          timestamps.size >= quorumSize)

    def update(ts: Long, producer: Option[String]): Unit = {
      val currentTime = now()
      producer.foreach { p =>
        // per-producer watermarks never regress; a smaller incoming
        // value is a late/reordered report and is dropped
        if (!timestamps.get(p).exists(_ > ts)) {
          timestamps(p) = ts
          lastUpdate(p) = currentTime
        }
      }
      producer match {
        case None => // source partition: no producer set to min over
          watermark = math.max(watermark, ts)
        case Some(_) if canUpdate(currentTime) =>
          var min = timestamps.values.min
          if (min <= watermark && idleTimeoutMs > 0) {
            // plain min is stalled — drop producers idle past the
            // timeout, accept the active min only if a quorum of
            // producers is still actively reporting
            val threshold = currentTime - idleTimeoutMs
            val active = timestamps.collect {
              case (p, t) if lastUpdate(p) > threshold => t
            }
            min = if (active.size >= quorumSize && active.nonEmpty)
              active.min
            else NotExist
          }
          watermark = math.max(watermark, min)
        case Some(_) => () // not enough producers reported yet
      }
    }
  }

  /** Watermark aggregation across a job's input partitions.
    *
    * @param partitions        every input stream partition
    * @param producerCounts    stream -> upstream producer task count
    *                          (streams absent are source streams whose
    *                          reports carry no producer name)
    * @param idleTimeoutMs     0 disables the idle escape hatch (then
    *                          the watermark moves only when ALL
    *                          producers of a partition have reported —
    *                          Spark-global-watermark-like strictness)
    * @param quorumPct         fraction of producers that must be
    *                          actively reporting for the idle hatch to
    *                          advance the watermark
    * @param now               injected time source (tests; harness)
    */
  final class WatermarkStates(partitions: Set[StreamPartition],
      producerCounts: Map[String, Int], idleTimeoutMs: Long = 0L,
      quorumPct: Double = 1.0,
      now: () => Long = () => System.currentTimeMillis()) {
    require(quorumPct > 0 && quorumPct <= 1.0,
      s"quorumPct must be in (0, 1]: $quorumPct")
    private val states: Map[StreamPartition, PartitionState] =
      partitions.map { sp =>
        sp -> new PartitionState(producerCounts.getOrElse(sp.stream, 0),
          idleTimeoutMs, quorumPct, now)
      }.toMap

    /** Record one producer's watermark report for a partition.
      * `producer` is None for source partitions (no upstream task
      * set); unknown partitions are ignored loudly. */
    def update(sp: StreamPartition, ts: Long,
        producer: Option[String] = None): Unit = synchronized {
      states.get(sp) match {
        case Some(st) => st.update(ts, producer)
        case None => throw new IllegalArgumentException(
          s"watermark report for unregistered partition $sp")
      }
    }

    /** A partition's current watermark ([[NotExist]] until it can be
      * established). */
    def watermarkOf(sp: StreamPartition): Long = synchronized {
      states.get(sp).fold(NotExist)(_.watermark)
    }

    /** A stream's watermark: min over its partitions
      * (WatermarkStates.java:147). */
    def watermark(stream: String): Long = synchronized {
      val of = states.collect {
        case (sp, st) if sp.stream == stream => st.watermark
      }
      if (of.isEmpty) NotExist else of.min
    }

    /** The job watermark: min over ALL input partitions — the
      * min-of-inputs rule the operators consume. */
    def jobWatermark: Long = synchronized {
      if (states.isEmpty) NotExist else states.valuesIterator
        .map(_.watermark).min
    }
  }
}
