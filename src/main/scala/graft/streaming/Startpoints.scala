package graft.streaming

/** Position-override startpoints
  * (samza-api/.../startpoint/Startpoint{Specific,Timestamp,Oldest,
  * Upcoming}.java) mapped onto Spark source options.
  *
  * Samza applies a startpoint per system-stream-partition on restart;
  * Spark's equivalents are source options applied when a query starts
  * WITHOUT checkpoint state (a checkpoint always wins — same precedence
  * as Samza, where checkpoints beat startpoints unless explicitly
  * overridden).
  */
sealed trait Startpoint {
  /** Options for the Kafka source (`format("kafka")`). */
  def kafkaOptions: Map[String, String]
  /** Options for file-based streams. */
  def fileOptions: Map[String, String]
}

object Startpoint {

  /** StartpointOldest: read from the beginning. */
  case object Oldest extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> "earliest")
    val fileOptions = Map("latestFirst" -> "false")
  }

  /** StartpointUpcoming: only new data from now on. */
  case object Upcoming extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> "latest")
    // file source has no true "latest": closest is newest-first listing
    val fileOptions = Map("latestFirst" -> "true")
  }

  /** StartpointSpecific: exact per-partition offsets (JSON in Spark's
    * `{"topic":{"0":offset,…}}` shape). */
  final case class Specific(offsetsJson: String) extends Startpoint {
    val kafkaOptions = Map("startingOffsets" -> offsetsJson)
    val fileOptions = Map.empty[String, String] // not applicable to files
  }

  /** StartpointTimestamp: start at the first record at/after a
    * timestamp (ms since epoch). */
  final case class Timestamp(ms: Long) extends Startpoint {
    val kafkaOptions = Map("startingTimestamp" -> ms.toString)
    val fileOptions = Map("modifiedAfter" ->
      java.time.Instant.ofEpochMilli(ms).toString)
  }
}
