package graft
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 9, where the driver's window closed on a
  * ~45×-throttled box mid-run and 21 of 75 entries silently vanished
  * (unordered Map iteration meant an arbitrary subset was lost):
  *  - oracle_sql.json is written FIRST, so a partial run still lets
  *    the driver compare everything that did finish;
  *  - batch queries run through a small thread pool (Spark schedules
  *    concurrent jobs fine; the pool overlaps IO waits and planning
  *    gaps, which is most of what a throttled box starves);
  *  - the five StreamHarness-driven queries run SEQUENTIALLY after
  *    the pool drains — the harness pins an injected clock and swaps
  *    the session's shuffle-partition conf, both JVM-global;
  *  - per-query wall-clock and failures go to stderr, so a truncated
  *    round is diagnosable from the driver's log instead of by
  *    set-differencing correctness files. */
object Verify {

  /** Queries that mutate JVM-global harness state (StreamHarness
    * clock + session shuffle-partition conf) — must not overlap any
    * other query. Shared with tools.LintReport, which drives these
    * rows' MemoryStream feeds LIVE and lints the actual micro-batch
    * execution through StreamHarness.liveQueryProbe (linting their
    * batch-result frame would read a misleading 0 shuffles). */
  val harnessBound = Set(
    "q_stream_tumbling_fold", "q_stream_session_fold",
    "q_stream_ttl_join", "q_stream_task", "q_bootstrap_chooser",
    "q_stream_neardup")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4")
      .toInt.max(1)
    val spark = graft.core.GraftSession("graft-verify",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    new java.io.File(outDir).mkdirs()

    def q(s: String): String = graft.core.Json.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // pre-register the table views once: the SQL-surface queries all
    // call Tables.registerAll and the memoized hit makes their
    // concurrent calls no-ops instead of racing the registration
    graft.sources.Tables.registerAll(spark, sfDir)

    val t0 = System.nanoTime()
    def elapsed(): String = f"${(System.nanoTime() - t0) / 1e9}%.1f"
    def runOne(name: String,
        fn: (org.apache.spark.sql.SparkSession, String)
          => org.apache.spark.sql.DataFrame): Unit = {
      val s0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify +${elapsed()}s] $name ok " +
          f"(${(System.nanoTime() - s0) / 1e9}%.1f s)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify +${elapsed()}s] $name FAILED: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

    val (harness, batch) =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .partition { case (n, _) => harnessBound(n) }

    // batch phase: a fixed pool; each worker pulls the next query.
    // No per-query clearCache here — it is session-global and would
    // yank another in-flight query's persisted frame (results stay
    // correct, the recompute churn is just waste); sf0.01 persists
    // are far below this JVM's headroom.
    val queue = new java.util.concurrent.ConcurrentLinkedQueue(
      scala.jdk.CollectionConverters.SeqHasAsJava(batch).asJava)
    val workers = (1 to threads.min(batch.size)).map { _ =>
      val th = new Thread(() => {
        var item = queue.poll()
        while (item != null) {
          runOne(item._1, item._2)
          item = queue.poll()
        }
      })
      th.setDaemon(true); th.start(); th
    }
    workers.foreach(_.join())
    spark.catalog.clearCache() // drop batch-phase persists

    // harness phase: strictly sequential (shared injected clock)
    harness.foreach { case (name, fn) =>
      runOne(name, fn)
      spark.catalog.clearCache()
    }
    System.err.println(s"[verify +${elapsed()}s] done")
    spark.stop()
  }
}
