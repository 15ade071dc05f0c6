package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the incremental corpus profile's amortization —
  * the claim behind CorpusProfile is that maintaining corpus stats
  * under ingest costs O(batch) per batch (append partials) instead of
  * O(corpus) (full recompute), with a periodic compact bounding the
  * read-time partial count. This times, on real volume:
  *
  *   1. full build+write of the corpus profile (the rebuild a
  *      non-incremental pipeline pays per ingest),
  *   2. build+append of a 1/16 batch (the incremental path's actual
  *      per-ingest cost),
  *   3. merged stats read over the accumulated partials,
  *   4. compact, then the same stats read over compacted frames.
  *
  * Usage: runMain graft.tools.ProfileProfile <sfDir>
  */
object ProfileProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.CorpusProfile

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val dir = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_profprof_" +
        ProcessHandle.current().pid())

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    // warmup: full pipeline shape once at small volume
    CorpusProfile.stats(CorpusProfile.build(
      docs.limit(500), "doc_id", "lang", "text")).count()

    // 1. the non-incremental baseline: full rebuild per ingest
    time("full build+write (corpus)") {
      CorpusProfile.write(CorpusProfile.build(
        docs.filter(col("doc_id") % 16 =!= 0), "doc_id", "lang",
        "text"), dir)
      1L
    }
    // 2. the incremental path: one 1/16 batch appended
    time("build+append (1/16 batch)") {
      CorpusProfile.append(CorpusProfile.build(
        docs.filter(col("doc_id") % 16 === 0), "doc_id", "lang",
        "text"), dir)
      1L
    }
    // 3. merged read over partials (15/16 store + 1 batch)
    time("stats read (partials)") {
      CorpusProfile.stats(
        CorpusProfile.read(spark, dir, "lang", "text")).count()
    }
    // 4. compact, then the same read over collapsed frames
    time("compact") {
      CorpusProfile.compact(spark, dir, "lang", "text"); 1L
    }
    time("stats read (compacted)") {
      CorpusProfile.stats(
        CorpusProfile.read(spark, dir, "lang", "text")).count()
    }
    spark.stop()
  }
}
