package graft.tools

/** One-off diagnostic: why does every events-reading query fail?
  * (Round 9: 21/75 correctness entries vanished; all touch events.) */
object ProbeEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession("graft-probe",
      master = Some("local[4]"), shufflePartitions = Some(4))
    try {
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      df.printSchema()
      df.show(3, truncate = false)
      println("count=" + df.count())
    } catch { case e: Throwable =>
      println("RAW READ FAILED:")
      e.printStackTrace()
    }
    try {
      val out = graft.SparkEntry.queries("q_merge")(spark, sfDir)
      println("q_merge rows=" + out.count())
    } catch { case e: Throwable =>
      println("q_merge FAILED:")
      e.printStackTrace()
    }
    spark.stop()
  }
}
