package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's MessageChooser surface: programmatic fine-grain
  * control over which input stream's next message is processed when a
  * task consumes several streams — priority tiers, per-partition
  * batching, and bootstrap streams that must be fully read before
  * normal processing starts.
  *
  * Reference surface:
  *  - system/chooser/MessageChooser.java:79 — the contract
  *    (register/start/update/choose/stop; at most ONE outstanding
  *    envelope per stream partition; choose may return null to
  *    throttle; never returns the same envelope twice)
  *  - chooser/RoundRobinChooser.scala:14 — FIFO queue, which under the
  *    one-outstanding-per-partition contract yields round-robin
  *  - chooser/BatchingChooser.scala:11 — sticks to the last chosen
  *    partition for up to batchSize messages
  *  - chooser/TieredPriorityChooser.scala:12 — per-stream priority
  *    tiers, higher tier always drained first
  *  - chooser/BootstrappingChooser.scala:30 — holds back processing
  *    until every lagging bootstrap stream has a message available;
  *    partitions leave the lagging set when their newest recorded
  *    offset is read (or an end-of-stream marker arrives)
  *  - chooser/DefaultChooser.scala:260 — the standard composition:
  *    bootstrapping(batching(priority(tie-break round-robins)))
  *
  * Spark mapping. A Samza task owns partition i of EVERY input stream
  * and one chooser serializes its consumption; the cluster runs one
  * chooser per task, independently. The same shape here:
  * [[interleave]] runs one chooser over an in-memory task's buffers
  * (the TestRunner-style harness path), and [[deliveryOrder]] runs one
  * chooser per task INSIDE each `flatMapGroups` group — tasks are
  * distributed exactly as Samza distributes containers, and no chooser
  * ever sees another task's data. The per-(task, invocation)
  * materialization bound is the same one documented on
  * `TaskRunner.run` (a task's messages must fit that task).
  */
object Choosers {

  /** SystemStreamPartition analog (SystemStreamPartition.java:29); the
    * "system" qualifier collapses into the stream name here. */
  final case class StreamPartition(stream: String, partition: Int)

  /** IncomingMessageEnvelope analog. Offsets are longs, totally
    * ordered per partition (the reference keeps them opaque strings
    * and defers comparison to a per-system admin,
    * SystemAdmin.offsetComparator; every source in this environment
    * has long-comparable offsets). `endOfStream` mirrors
    * IncomingMessageEnvelope.isEndOfStream — delivered to the chooser
    * so bootstrap partitions can be marked caught-up, never emitted
    * to user code. */
  final case class Envelope[T](sp: StreamPartition, offset: Long, value: T,
      endOfStream: Boolean = false)

  /** MessageChooser.java:79 contract. Implementations are
    * single-threaded and unrecovered on failure, as in the reference
    * ("a MessageChooser will not have any of its in-memory state
    * restored in the event of a failure"). */
  trait MessageChooser[T] {
    /** Called once per stream partition before start. */
    def register(sp: StreamPartition, offset: Long): Unit = ()
    def start(): Unit = ()
    def stop(): Unit = ()
    /** Offer the next buffered envelope of its partition. Callers
      * guarantee at most one outstanding envelope per partition. */
    def update(env: Envelope[T]): Unit
    /** Pick the next envelope to process; None = nothing should be
      * processed right now (throttle), even if updates are pending. */
    def choose(): Option[Envelope[T]]
  }

  /** RoundRobinChooser.scala:14 — FIFO over offered envelopes. With
    * one outstanding envelope per partition, the queue interleaves
    * partitions round-robin. */
  final class RoundRobinChooser[T] extends MessageChooser[T] {
    private val q = mutable.Queue.empty[Envelope[T]]
    override def update(env: Envelope[T]): Unit = q.enqueue(env)
    override def choose(): Option[Envelope[T]] =
      if (q.isEmpty) None else Some(q.dequeue())
  }

  /** BatchingChooser.scala:11 — after the wrapped chooser picks a
    * partition, keep choosing that partition (bypassing the wrapped
    * chooser) while messages for it keep arriving, up to `batchSize`;
    * then reset so other partitions get a turn. Improves cache/state
    * locality for keyed state, same motivation as the reference. */
  final class BatchingChooser[T](wrapped: MessageChooser[T],
      batchSize: Int = 100) extends MessageChooser[T] {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    private var preferredSp: StreamPartition = null
    private var preferredEnv: Envelope[T] = null
    private var batchCount = 0

    override def register(sp: StreamPartition, offset: Long): Unit =
      wrapped.register(sp, offset)
    override def start(): Unit = wrapped.start()
    override def stop(): Unit = wrapped.stop()

    override def update(env: Envelope[T]): Unit =
      if (env.sp == preferredSp) preferredEnv = env
      else wrapped.update(env)

    override def choose(): Option[Envelope[T]] =
      if (preferredEnv == null) {
        val chosen = wrapped.choose()
        chosen.foreach { env => // start a new batch on this partition
          preferredSp = env.sp
          batchCount = 1
        }
        chosen
      } else {
        val env = preferredEnv
        preferredEnv = null
        batchCount += 1
        if (batchCount >= batchSize) { // give other partitions a turn
          preferredSp = null
          batchCount = 0
        }
        Some(env)
      }
  }

  /** TieredPriorityChooser.scala:12 — streams map to priority tiers,
    * each tier has its own tie-breaking chooser; choose() drains the
    * highest tier that has an envelope. Streams with no configured
    * priority fall through to `default` (required if any such stream
    * appears, as in the reference's loud failure). */
  final class TieredPriorityChooser[T](priorities: Map[String, Int],
      choosers: Map[Int, MessageChooser[T]],
      default: Option[MessageChooser[T]] = None) extends MessageChooser[T] {
    priorities.values.toSet.foreach { (p: Int) =>
      require(choosers.contains(p), s"missing chooser for priority tier $p")
    }
    private val descending: List[MessageChooser[T]] =
      choosers.toList.sortBy(-_._1).map(_._2)

    private def chooserFor(sp: StreamPartition): MessageChooser[T] =
      priorities.get(sp.stream).map(choosers) .orElse(default).getOrElse(
        throw new IllegalArgumentException(
          s"no priority for stream '${sp.stream}' and no default chooser"))

    override def register(sp: StreamPartition, offset: Long): Unit =
      chooserFor(sp).register(sp, offset)
    override def start(): Unit = {
      default.foreach(_.start()); choosers.values.foreach(_.start())
    }
    override def stop(): Unit = {
      default.foreach(_.stop()); choosers.values.foreach(_.stop())
    }
    override def update(env: Envelope[T]): Unit = chooserFor(env.sp).update(env)

    override def choose(): Option[Envelope[T]] =
      descending.iterator.map(_.choose()).collectFirst {
        case Some(env) => env
      }.orElse(default.flatMap(_.choose()))
  }

  /** Newest (last existing) offset per bootstrap stream partition —
    * the slice of SystemStreamMetadata (SystemStreamMetadata.java's
    * per-partition newest/upcoming offsets) that catch-up detection
    * needs. A partition absent from the map is not a bootstrap
    * partition. Upcoming offset = newest + 1, the append position. */
  final case class BootstrapMetadata(newestOffsets: Map[StreamPartition, Long])

  /** BootstrappingChooser.scala:30 — wraps another chooser and refuses
    * to choose until every still-lagging bootstrap stream has an
    * envelope available, so (combined with the priority tier
    * DefaultChooser puts bootstrap streams in) bootstrap data is fully
    * consumed before normal streams are processed. A partition stops
    * lagging when the message at its newest recorded offset is read,
    * when an end-of-stream envelope arrives, or at registration if its
    * starting offset is already past newest (checkOffset with UPCOMING
    * at start, NEWEST per message; BootstrappingChooser.scala:218). */
  final class BootstrappingChooser[T](wrapped: MessageChooser[T],
      metadata: BootstrapMetadata) extends MessageChooser[T] {
    private val registered = mutable.Map.empty[StreamPartition, Long]
    private var lagging = Set.empty[StreamPartition]
    // per-STREAM count of available (updated, not yet chosen) envelopes
    // from lagging partitions — okToChoose wants every lagging stream
    // represented, not every partition
    private val available = mutable.Map.empty[String, Int].withDefaultValue(0)

    override def register(sp: StreamPartition, offset: Long): Unit = {
      wrapped.register(sp, offset)
      // SAMZA-1100: when registered twice (e.g. bootstrap + broadcast
      // consumption sharing the chooser), keep the LOWEST offset
      registered.get(sp) match {
        case Some(existing) if existing <= offset => ()
        case _ => registered(sp) = offset
      }
    }

    override def start(): Unit = {
      // a partition whose starting offset is already the upcoming
      // (append) position has nothing to bootstrap
      lagging = metadata.newestOffsets.collect {
        case (sp, newest) if registered.contains(sp) &&
          registered(sp) <= newest => sp
      }.toSet
      wrapped.start()
    }
    override def stop(): Unit = wrapped.stop()

    override def update(env: Envelope[T]): Unit = {
      wrapped.update(env)
      if (lagging(env.sp)) available(env.sp.stream) += 1
    }

    private def laggingStreams: Set[String] = lagging.map(_.stream)

    private def okToChoose: Boolean =
      laggingStreams.forall(available(_) > 0)

    override def choose(): Option[Envelope[T]] =
      if (lagging.isEmpty) wrapped.choose()
      else if (okToChoose) {
        val chosen = wrapped.choose()
        chosen.foreach { env =>
          if (lagging(env.sp)) {
            available(env.sp.stream) -= 1
            val caughtUp = env.endOfStream ||
              metadata.newestOffsets.get(env.sp).exists(env.offset >= _)
            if (caughtUp) lagging -= env.sp
          }
        }
        chosen
      } else None // block until every lagging stream has a message
  }

  /** DefaultChooser.scala:260 composition: normal streams at tier 0,
    * bootstrap streams at Int.MaxValue (drained first), optional
    * explicit priorities override either; round-robin tie-break per
    * tier; optional batching; bootstrapping outermost when bootstrap
    * metadata is present. */
  def default[T](streams: Set[String],
      bootstrap: BootstrapMetadata = BootstrapMetadata(Map.empty),
      priorities: Map[String, Int] = Map.empty,
      batchSize: Option[Int] = None): MessageChooser[T] = {
    val bootstrapStreams = bootstrap.newestOffsets.keySet.map(_.stream)
    val usePriority = bootstrapStreams.nonEmpty || priorities.nonEmpty
    val base: MessageChooser[T] = new RoundRobinChooser[T]
    val prioritized: MessageChooser[T] = if (usePriority) {
      val tiers: Map[String, Int] =
        streams.map(_ -> 0).toMap ++
          bootstrapStreams.map(_ -> Int.MaxValue).toMap ++ priorities
      new TieredPriorityChooser[T](tiers,
        tiers.values.toSet.map((p: Int) => p -> new RoundRobinChooser[T])
          .toMap, Some(base))
    } else base
    val batched = batchSize.fold(prioritized)(
      new BatchingChooser[T](prioritized, _))
    if (bootstrapStreams.nonEmpty)
      new BootstrappingChooser[T](batched, bootstrap)
    else batched
  }

  /** Drive one chooser over fully-buffered inputs and return the
    * delivery order — the SystemConsumers.choose loop
    * (system/SystemConsumers.scala update/choose cycle) replayed to
    * completion: register everything, keep exactly one outstanding
    * envelope per partition, refill a partition as its envelope is
    * chosen. End-of-stream envelopes pass through the chooser but are
    * not part of the returned order.
    *
    * Each input partition's seq must be offset-ascending (a Samza
    * consumer delivers a partition in offset order). Throws if the
    * chooser permanently refuses to choose while messages remain —
    * with fully-buffered input a persistent null means misconfigured
    * bootstrap metadata (a live container would block forever;
    * a bounded replay fails loudly instead). */
  def interleave[T](inputs: Map[StreamPartition, Seq[Envelope[T]]],
      chooser: MessageChooser[T]): Vector[Envelope[T]] = {
    val sps = inputs.keys.toSeq.sortBy(sp => (sp.stream, sp.partition))
    sps.foreach { sp =>
      chooser.register(sp, inputs(sp).headOption.map(_.offset).getOrElse(0L))
    }
    chooser.start()
    val cursors = mutable.Map(sps.map(sp => sp -> inputs(sp).iterator): _*)
    def refill(sp: StreamPartition): Unit = {
      val it = cursors(sp)
      if (it.hasNext) chooser.update(it.next())
    }
    sps.foreach(refill)
    var pending = inputs.valuesIterator.map(_.size).sum
    val out = Vector.newBuilder[Envelope[T]]
    while (pending > 0) {
      chooser.choose() match {
        case Some(env) =>
          pending -= 1
          if (!env.endOfStream) out += env
          refill(env.sp)
        case None =>
          chooser.stop()
          throw new IllegalStateException(
            s"chooser stalled with $pending messages pending — a " +
              "lagging bootstrap partition has no data left; its " +
              "newest offset in BootstrapMetadata is beyond the " +
              "buffered input (or the end-of-stream envelope is missing)")
      }
    }
    chooser.stop()
    out.result()
  }

  /** Distributed delivery order: one chooser PER TASK, where task i
    * owns partition i of every input stream — exactly the reference's
    * task/SSP assignment (a Samza task processes one partition of each
    * input; SamzaContainer wires one chooser per container loop).
    * Returns each envelope with its task id and its delivery sequence
    * number within the task.
    *
    * Scale shape: a single shuffle on partition id co-locates each
    * task's partitions; choosers run executor-side in parallel, one
    * per task, never seeing another task's data — the chooser loop is
    * sequential per task by the MessageChooser contract (not
    * thread-safe, one per consumption loop), so per-task sequential IS
    * the reference's own parallelism bound. Each task's messages
    * materialize in one group invocation (same bound as
    * TaskRunner.run: a task's batch must fit that task). */
  def deliveryOrder[T](envelopes: Dataset[Envelope[T]],
      chooserFor: () => MessageChooser[T])(implicit
      outEnc: Encoder[(Int, Long, Envelope[T])])
      : Dataset[(Int, Long, Envelope[T])] = {
    import envelopes.sparkSession.implicits._
    envelopes.groupByKey(_.sp.partition).flatMapGroups {
      (task: Int, envs: Iterator[Envelope[T]]) =>
        val buffered = envs.toSeq.groupBy(_.sp)
          .map { case (sp, es) => sp -> es.sortBy(_.offset) }
        interleave(buffered, chooserFor()).iterator.zipWithIndex.map {
          case (env, i) => (task, i.toLong, env)
        }
    }
  }
}
