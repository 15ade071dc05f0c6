package graft

import graft.sources.Kafka
import graft.streaming.Startpoint

/** Pins the Kafka descriptor → connector-option contract. The
  * connector jar is absent in this environment (no cluster either), so
  * the exact option maps ARE the testable surface: every Startpoint
  * variant must land in the connector's documented option names with
  * the documented values (reference mapping:
  * KafkaSystemConsumer/KafkaInputDescriptor → startingOffsets et al).
  */
class KafkaContractSpec extends SparkSpec {

  private def cfg(sp: Startpoint) = Kafka.SourceConfig(
    bootstrapServers = "broker:9092", topic = "events", startpoint = sp)

  test("Oldest → startingOffsets=earliest") {
    assert(Kafka.sourceOptions(cfg(Startpoint.Oldest)) == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "events",
      "failOnDataLoss" -> "true",
      "startingOffsets" -> "earliest"))
  }

  test("Upcoming → startingOffsets=latest") {
    assert(Kafka.sourceOptions(cfg(Startpoint.Upcoming))
      .get("startingOffsets").contains("latest"))
  }

  test("Specific → per-partition offsets JSON passed through verbatim") {
    val json = """{"events":{"0":42,"1":7}}"""
    assert(Kafka.sourceOptions(cfg(Startpoint.Specific(json)))
      .get("startingOffsets").contains(json))
  }

  test("Timestamp → startingTimestamp with latest fallback strategy") {
    val opts = Kafka.sourceOptions(cfg(Startpoint.Timestamp(1704067200000L)))
    assert(opts.get("startingTimestamp").contains("1704067200000"))
    // past-the-end timestamps resolve to upcoming, like Samza's
    // KafkaSystemAdmin startpoint resolution — not a query failure
    assert(opts.get("startingOffsetsByTimestampStrategy").contains("latest"))
    assert(!opts.contains("startingOffsets"), "conflicting start options")
  }

  test("consumer overrides get the kafka. passthrough prefix; sink options") {
    val opts = Kafka.sourceOptions(Kafka.SourceConfig(
      "b:9092", "t", maxOffsetsPerTrigger = Some(1000L),
      consumerOverrides = Map("max.poll.records" -> "250")))
    assert(opts.get("kafka.max.poll.records").contains("250"))
    assert(opts.get("maxOffsetsPerTrigger").contains("1000"))
    assert(Kafka.sinkOptions("b:9092", "out",
      Map("linger.ms" -> "5")) == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "out",
      "kafka.linger.ms" -> "5"))
  }

  test("readStream surfaces the absent-connector error, not a graft bug") {
    // in this environment the connector jar is missing; the descriptor
    // path must reach Spark's data-source resolution (proving the
    // option plumbing runs) and fail there with the standard
    // missing-source error
    val e = intercept[Exception] {
      Kafka.readStream(spark, cfg(Startpoint.Oldest))
    }
    val msg = e.toString.toLowerCase
    assert(msg.contains("kafka"), msg)
  }
}
