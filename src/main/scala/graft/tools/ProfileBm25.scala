package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measures what the BM25 stopword cut is FOR — the
  * posting-volume bound — on a corpus whose vocabulary actually has a
  * Zipf-ish tail (the synthetic gate corpus is ~31 near-universal
  * words, so the gate row must run cut=false and its slope is the
  * no-cut explosion by construction; this tool grafts a tail on so
  * the production default is measurable).
  *
  * Corpus = the sf documents with two tokens appended per doc: a
  * `rare<doc_id>` token (df = 1 — the discriminative tail) and a
  * `mid<doc_id % 1000>` token (df ≈ N/1000 — mid-frequency). Queries
  * ask for another document's rare token plus a mid token plus one
  * universal word. With the cut ON, the universal word's ~N-row
  * posting list never enters the candidate join; with it OFF every
  * query scores essentially the whole corpus.
  *
  * Usage: runMain graft.tools.ProfileBm25 <sfDir>
  */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-bm25-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .withColumn("text", concat_ws(" ", col("text"),
        concat(lit("rare"), col("doc_id")),
        concat(lit("mid"), col("doc_id") % 1000)))
      .persist()
    val n = docs.count()

    // each query targets the NEXT query-doc's rare token (a genuine
    // cross-document lookup), shares its own mid bucket, and carries
    // one universal word ("the" appears in ~80% of synthetic docs)
    val queries = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ",
          concat(lit("rare"), (col("doc_id") + 100) % (n - n % 100)),
          concat(lit("mid"), col("doc_id") % 1000),
          lit("the")).as("qtext"))
      .persist()
    queries.count()

    // untimed warmup: the first bm25 run pays codegen + broadcast
    // machinery; without it the first timed mode reads ~35% high
    graft.operators.TextProfile.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "qtext", k = 5, stopwordCut = true).count()

    // persisted-index amortization: build+write once, then repeated
    // reload+probe batches — the per-batch cost a serving deployment
    // pays (no tokenize, no tf/df recompute). Two probe shapes: the
    // full 3-term query set (broadcast-join arm) and a single-query
    // lookup (In-pushdown file-pruning arm).
    locally {
      val dir = graft.core.FsUtil.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_bm25idx_profile_" +
          ProcessHandle.current().pid())
      def timed[T](what: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[bm25-profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      timed("index build+write (tokenize + tf/df + term-sorted store)") {
        graft.operators.TextProfile.bm25Index(docs, "doc_id", "text")
          .write(dir)
      }
      (1 to 3).foreach { i =>
        timed(s"reload+probe batch $i (full query set, k=5)") {
          val idx = graft.operators.TextProfile.readBm25Index(spark,
            dir, "doc_id")
          graft.operators.TextProfile.bm25TopKWithIndex(queries,
            "q_id", "qtext", idx, k = 5).count()
        }
      }
      timed("reload+probe single-query lookup (In pushdown)") {
        val idx = graft.operators.TextProfile.readBm25Index(spark,
          dir, "doc_id")
        val q1 = queries.limit(1)
        graft.operators.TextProfile.bm25TopKWithIndex(q1, "q_id",
          "qtext", idx, k = 5).count()
      }
    }

    Seq(true, false).foreach { cut =>
      val t0 = System.nanoTime()
      val res = graft.operators.TextProfile.bm25TopK(docs, "doc_id",
        "text", queries, "q_id", "qtext", k = 5, stopwordCut = cut)
        .persist()
      val rows = res.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // retrieval quality: the rank-1 hit should be the doc owning
      // the requested rare token (df=1 dominates any idf form)
      val hits = res.filter(col("rank") === 1 &&
        col("doc_id") === (col("q_id") + 100) % (n - n % 100)).count()
      val qn = queries.count()
      println(f"[bm25-profile] cut=$cut n=$n queries=$qn " +
        f"time=$secs%.2f s rows=$rows rank1_rare_hits=$hits/$qn")
      res.unpersist()
    }
    spark.stop()
  }
}
