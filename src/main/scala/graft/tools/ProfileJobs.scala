package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: per-JOB time breakdown of one registry query — where the
  * guide's §1 "measure first" loop goes when the data is overhead-sized
  * (sf0.1: 5k docs / 2k vectors), because then the bench seconds live
  * in the NUMBER of driver round-trips (collects, writes, probe jobs),
  * not in task compute, and the Spark UI is disabled in the sessions.
  * Prints every job's duration + callsite and the wall-vs-jobs gap
  * (driver-only time: planning, FS metadata, sidecar reads).
  * Usage: runMain graft.tools.ProfileJobs <sfDir> <name> [name...] */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileJobs <sfDir> <name> [name...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-jobs",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))

    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var jobNanos = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties).flatMap { p =>
          val exec = Option(p.getProperty("spark.sql.execution.id"))
            .map(e => s"exec=$e ").getOrElse("")
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))
            .map(exec + _).orElse(if (exec.nonEmpty) Some(exec) else None)
        }.getOrElse("?").take(160).replace('\n', ' ')
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES")) {
          val si = sc.stageInfo
          val ms = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          log.add(f"      stage ${si.stageId}%4d ${ms}%6d ms " +
            f"tasks=${si.numTasks}%3d  ${si.name.take(110)}")
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          jobNanos += (System.nanoTime() - t0)
          log.add(f"    job ${je.jobId}%4d ${ms}%8.1f ms  $site")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val q = graft.queries.Registry.all(name)
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[warmup] $name: $e") }
      spark.catalog.clearCache()
      graft.streaming.ModelCache.clear()
      log.clear(); jobNanos = 0L
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading the log (listenerBus is
      // private[spark]; a short sleep suffices for a dev tool)
      Thread.sleep(300)
      println(f"[jobs] $name: wall ${wall}%.2f s, jobs ${log.size}, " +
        f"job-time ${jobNanos / 1e9}%.2f s (n=$n)")
      log.forEach(println(_))
      spark.catalog.clearCache()
      graft.streaming.ModelCache.clear()
    }
    spark.stop()
  }
}
