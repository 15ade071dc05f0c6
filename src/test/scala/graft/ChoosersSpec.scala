package graft

import graft.streaming.Choosers
import graft.streaming.Choosers._

/** MessageChooser surface: round-robin / batching / priority /
  * bootstrapping semantics and the per-task distributed delivery
  * order (MessageChooser.java:79 contract; the chooser package's
  * RoundRobin/Batching/TieredPriority/Bootstrapping impls). */
class ChoosersSpec extends SparkSpec {

  private def sp(s: String, p: Int) = StreamPartition(s, p)
  private def envs(s: String, p: Int, vs: String*): Seq[Envelope[String]] =
    vs.zipWithIndex.map { case (v, i) => Envelope(sp(s, p), i.toLong, v) }

  test("round-robin interleaves partitions, offset order within each") {
    val inputs = Map(
      sp("a", 0) -> envs("a", 0, "a0", "a1", "a2"),
      sp("b", 0) -> envs("b", 0, "b0", "b1"))
    val out = Choosers.interleave(inputs, new RoundRobinChooser[String])
    assert(out.map(_.value) == Vector("a0", "b0", "a1", "b1", "a2"))
  }

  test("batching chooser sticks to a partition up to batchSize") {
    val inputs = Map(
      sp("a", 0) -> envs("a", 0, "a0", "a1", "a2", "a3"),
      sp("b", 0) -> envs("b", 0, "b0", "b1"))
    val out = Choosers.interleave(inputs,
      new BatchingChooser(new RoundRobinChooser[String], batchSize = 2))
    // batches of 2 per partition before yielding the turn
    assert(out.map(_.value) == Vector("a0", "a1", "b0", "b1", "a2", "a3"))
  }

  test("priority tiers drain high tier first; default takes the rest") {
    val inputs = Map(
      sp("low", 0) -> envs("low", 0, "l0", "l1"),
      sp("high", 0) -> envs("high", 0, "h0", "h1"),
      sp("other", 0) -> envs("other", 0, "o0"))
    val chooser = new TieredPriorityChooser[String](
      Map("high" -> 2, "low" -> 1),
      Map(2 -> new RoundRobinChooser[String],
        1 -> new RoundRobinChooser[String]),
      default = Some(new RoundRobinChooser[String]))
    val out = Choosers.interleave(inputs, chooser)
    assert(out.map(_.value) == Vector("h0", "h1", "l0", "l1", "o0"))
  }

  test("priority chooser rejects unconfigured stream with no default") {
    val chooser = new TieredPriorityChooser[String](
      Map("known" -> 1), Map(1 -> new RoundRobinChooser[String]))
    intercept[IllegalArgumentException] {
      chooser.update(Envelope(sp("unknown", 0), 0L, "x"))
    }
  }

  test("bootstrap stream is fully consumed before normal streams") {
    val boot = envs("boot", 0, "b0", "b1", "b2")
    val inputs = Map(
      sp("boot", 0) -> boot,
      sp("live", 0) -> envs("live", 0, "v0", "v1"))
    val chooser = Choosers.default[String](Set("boot", "live"),
      bootstrap = BootstrapMetadata(Map(sp("boot", 0) -> 2L)))
    val out = Choosers.interleave(inputs, chooser)
    assert(out.map(_.value) == Vector("b0", "b1", "b2", "v0", "v1"))
  }

  test("multi-partition bootstrap: all partitions caught up first") {
    val inputs = Map(
      sp("boot", 0) -> envs("boot", 0, "b00", "b01"),
      sp("boot", 1) -> envs("boot", 1, "b10"),
      sp("live", 0) -> envs("live", 0, "v0"),
      sp("live", 1) -> envs("live", 1, "v1"))
    val chooser = Choosers.default[String](Set("boot", "live"),
      bootstrap = BootstrapMetadata(
        Map(sp("boot", 0) -> 1L, sp("boot", 1) -> 0L)))
    val out = Choosers.interleave(inputs, chooser)
    val (bootOut, liveOut) = out.map(_.value).partition(_.startsWith("b"))
    assert(out.map(_.value).take(3).toSet == bootOut.toSet)
    assert(bootOut == Vector("b00", "b10", "b01") ||
      bootOut == Vector("b00", "b01", "b10") ||
      bootOut == Vector("b10", "b00", "b01"))
    assert(liveOut == Vector("v0", "v1"))
  }

  test("end-of-stream envelope marks a bootstrap partition caught up") {
    // newest offset says 99 (beyond the data): without EOS the replay
    // would stall; the EOS envelope releases the partition
    val boot = envs("boot", 0, "b0") :+
      Envelope(sp("boot", 0), 1L, "eos", endOfStream = true)
    val inputs = Map(
      sp("boot", 0) -> boot,
      sp("live", 0) -> envs("live", 0, "v0"))
    val chooser = Choosers.default[String](Set("boot", "live"),
      bootstrap = BootstrapMetadata(Map(sp("boot", 0) -> 99L)))
    val out = Choosers.interleave(inputs, chooser)
    assert(out.map(_.value) == Vector("b0", "v0")) // EOS not emitted
  }

  test("stalled bootstrap replay fails loudly, not silently") {
    // newest offset beyond buffered data and no EOS: a live container
    // would block forever; the bounded replay throws
    val inputs = Map(
      sp("boot", 0) -> envs("boot", 0, "b0"),
      sp("live", 0) -> envs("live", 0, "v0"))
    val chooser = Choosers.default[String](Set("boot", "live"),
      bootstrap = BootstrapMetadata(Map(sp("boot", 0) -> 99L)))
    intercept[IllegalStateException] {
      Choosers.interleave(inputs, chooser)
    }
  }

  test("bootstrap partition registered past newest is never lagging") {
    // starting offset 3 > newest 2: partition was already fully read
    // in a previous run (checkOffset-at-start, UPCOMING analog)
    val chooser = new BootstrappingChooser[String](
      new RoundRobinChooser[String], BootstrapMetadata(Map(sp("b", 0) -> 2L)))
    chooser.register(sp("b", 0), 3L)
    chooser.register(sp("live", 0), 0L)
    chooser.start()
    chooser.update(Envelope(sp("live", 0), 0L, "v0"))
    // not blocked: no lagging partitions remain
    assert(chooser.choose().map(_.value) == Some("v0"))
  }

  test("double registration keeps the lowest offset (SAMZA-1100)") {
    val chooser = new BootstrappingChooser[String](
      new RoundRobinChooser[String], BootstrapMetadata(Map(sp("b", 0) -> 1L)))
    chooser.register(sp("b", 0), 5L) // would be past newest: not lagging
    chooser.register(sp("b", 0), 0L) // lower wins: lagging after all
    chooser.register(sp("live", 0), 0L)
    chooser.start()
    chooser.update(Envelope(sp("live", 0), 0L, "v0"))
    assert(chooser.choose() == None) // blocked on the lagging bootstrap
    chooser.update(Envelope(sp("b", 0), 0L, "b0"))
    assert(chooser.choose().isDefined)
  }

  test("deliveryOrder: one chooser per task, bootstrap-first per task") {
    val s = spark
    import s.implicits._
    // two tasks (partitions 0/1), each with a bootstrap and a live slice
    val all = Seq(
      Envelope(sp("boot", 0), 0L, "b00"), Envelope(sp("boot", 0), 1L, "b01"),
      Envelope(sp("live", 0), 0L, "v00"),
      Envelope(sp("boot", 1), 0L, "b10"),
      Envelope(sp("live", 1), 0L, "v10"), Envelope(sp("live", 1), 1L, "v11"))
    val newest = Map(sp("boot", 0) -> 1L, sp("boot", 1) -> 0L)
    val out = Choosers.deliveryOrder(
      all.toDS().repartition(4),
      () => Choosers.default[String](Set("boot", "live"),
        BootstrapMetadata(newest))).collect()
    val byTask = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.value).toSeq).toMap
    assert(byTask(0) == Seq("b00", "b01", "v00"))
    assert(byTask(1) == Seq("b10", "v10", "v11"))
  }
}
