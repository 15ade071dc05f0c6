package graft.tools

/** Dev tool: time named registry queries end-to-end (one count() action
  * each) at a given sf dir — the per-query view of what Bench measures.
  * Usage: runMain graft.tools.ProfileQueries <sfDir> <q1> <q2> ...
  * Each query runs twice (warm codegen, then measured) with a cache
  * clear between, mirroring Bench's steady-state numbers. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    // A/B lever for stateful-query experiments (RocksDB vs HDFS-backed)
    sys.env.get("SPARK_GRAFT_STATESTORE").foreach { cls =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
    }
    names.foreach { name =>
      val q = graft.queries.Registry.all(name)
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[warmup] $name: $e") }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
