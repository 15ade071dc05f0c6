package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: A/B the per-key latest-row shapes on the events table —
  * the evidence behind operators/Latest.scala's claim that the
  * bounded-heap aggregate beats the row_number window it replaced.
  * Both forms compute the q_table_upsert projection; row counts are
  * printed so a mismatch is loud.
  * Usage: runMain graft.tools.ProfileLatest <sfDir> [reps] */
object ProfileLatest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-latest-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, sfDir, "events")

    def windowForm() = {
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      e.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", $"value")
    }
    def aggForm() =
      graft.operators.Latest.latestBy(e, Seq("user_id"),
        Seq($"ts", $"event_id"), Seq("event_id", "event_type", "value"))

    for (r <- 1 to reps; (name, f) <- Seq(
        "window" -> (() => windowForm()), "latest" -> (() => aggForm()))) {
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[latest] rep=$r form=$name rows=$n " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
