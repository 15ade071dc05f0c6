package graft.streaming

/** Position-override startpoints
  * (samza-api/.../startpoint/Startpoint{Specific,Timestamp,Oldest,
  * Upcoming}.java) mapped onto Spark source options.
  *
  * Samza applies a startpoint per system-stream-partition on restart;
  * Spark's equivalents are source options applied when a query starts
  * WITHOUT checkpoint state (a checkpoint always wins — same precedence
  * as Samza, where checkpoints beat startpoints unless explicitly
  * overridden). Apply via `StreamJobs.eventsStream(..., startpoint)` or
  * `readStream.options(sp.kafkaOptions)`.
  *
  * File-stream caveats: Spark's file source rejects `modifiedAfter`
  * (batch-only) and has no true seek-to-latest, so [[Startpoint.Timestamp]]
  * and [[Startpoint.Specific]] return empty file options (full-history
  * read) and [[Startpoint.Upcoming]] approximates via `maxFileAge` —
  * only files near the newest are processed. Kafka mappings are exact.
  */
sealed trait Startpoint {
  /** Options for the Kafka source (`format("kafka")`). */
  def kafkaOptions: Map[String, String]
  /** Options for file-based streams (best-effort; see class doc). */
  def fileOptions: Map[String, String]
}

object Startpoint {

  /** StartpointOldest: read from the beginning. */
  case object Oldest extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> "earliest")
    val fileOptions = Map.empty[String, String] // full history = default
  }

  /** StartpointUpcoming: only new data from now on. File approximation:
    * maxFileAge keeps only files written close to the newest one —
    * Spark has no exact skip-backlog option for file streams. */
  case object Upcoming extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> "latest")
    val fileOptions = Map("maxFileAge" -> "0ms")
  }

  /** StartpointSpecific: exact per-partition offsets (JSON in Spark's
    * `{"topic":{"0":offset,…}}` shape). No file-stream analog. */
  final case class Specific(offsetsJson: String) extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> offsetsJson)
    val fileOptions = Map.empty[String, String]
  }

  /** StartpointTimestamp: start at the first record at/after a
    * timestamp (ms since epoch). The fallback strategy mirrors Samza:
    * a timestamp past the end resolves to "upcoming" rather than
    * failing the query (KafkaSystemAdmin's StartpointTimestamp
    * resolution). No file-stream analog (modifiedAfter is batch-only
    * and rejected by the file stream source). */
  final case class Timestamp(ms: Long) extends Startpoint {
    val kafkaOptions = Map(
      "startingTimestamp" -> ms.toString,
      "startingOffsetsByTimestampStrategy" -> "latest")
    val fileOptions = Map.empty[String, String]
  }
}
