package graft.tools

import scala.collection.mutable

/** Dev tool: decompose the streaming parity queries' per-micro-batch
  * cost into the engine's own durationMs phases (queryPlanning =
  * incremental re-planning, addBatch = execution incl. state store
  * commit, walCommit/commitOffsets = checkpoint log fsyncs, ...) —
  * the evidence behind BASELINE.md's "the ~200 ms/batch floor is
  * harness-bound" claim. Uses StreamHarness.progressProbe, so the
  * measured run IS the benched query, not a lookalike.
  * Usage: runMain graft.tools.ProfileStreamFloor <sfDir> <queries...>
  */
object ProfileStreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-stream-floor",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    // keep every batch's progress row (default cap is 100)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    names.foreach { name =>
      val phases = mutable.LinkedHashMap.empty[String, Long]
      var batches = 0
      graft.streaming.StreamHarness.progressProbe = { ps =>
        batches += ps.length
        ps.foreach { p =>
          p.durationMs.forEach { (k, v) =>
            phases(k) = phases.getOrElse(k, 0L) + v
          }
        }
      }
      val t0 = System.nanoTime()
      try graft.queries.Registry.all(name).run(spark, sfDir).count()
      finally graft.streaming.StreamHarness.progressProbe = null
      val wall = (System.nanoTime() - t0) / 1e9
      val total = phases.getOrElse("triggerExecution", 0L)
      println(f"[floor] $name wall=$wall%.2f s batches=$batches " +
        f"trigger_total=${total / 1000.0}%.2f s " +
        f"per_batch=${if (batches > 0) total.toDouble / batches else 0}%.0f ms")
      phases.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        println(f"[floor]   $k%-18s ${v / 1000.0}%8.2f s " +
          f"${if (batches > 0) v.toDouble / batches else 0}%6.1f ms/batch")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
