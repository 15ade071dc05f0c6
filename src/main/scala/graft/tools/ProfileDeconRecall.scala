package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the banded semantic-decon recall/cost measurement behind
  * BASELINE.md's round-18 note — the round-17 finding was that the
  * decon arm's retrieval quality was ASSERTED, never measured; this
  * sweep records it. For each threshold: the exact arm (recall 1.0 by
  * definition — the reference), the GATE shape (6 bands × 2 planes),
  * and the recall-first derived shape at τ
  * (Similarity.derivedDeconShape), each with measured recall in basis
  * points against exact plus wall seconds. Bench = every 50th vector
  * (the gate convention), corpus = the rest.
  *
  * Usage: runMain graft.tools.ProfileDeconRecall <sfDir> [t1,t2,...]
  */
object ProfileDeconRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val ts = args.lift(1).getOrElse("0.3,0.8").split(",").map(_.toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-decon-recall",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.{Retrieval, Similarity}

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 50 =!= 0).persist()
    val bench = emb.filter(col("vec_id") % 50 === 0).persist()
    val (nc, nb) = (corpus.count(), bench.count())
    println(s"[decon-recall] $sfDir corpus=$nc bench=$nb")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    ts.foreach { t =>
      val (exact, te) = timed {
        val e = Similarity.decontaminateSemanticExact(corpus, bench,
          "vec_id", "embedding", t).persist()
        e.count(); e
      }
      val nTrue = exact.count()
      def probe(label: String, b: Int, r: Int): Unit = {
        val (hits, tw) = timed {
          val h = Similarity.decontaminateSemanticBanded(corpus, bench,
            "vec_id", "embedding", t, dim = 64, bands = b,
            rowsPerBand = r).persist()
          h.count(); h
        }
        val bp = Retrieval.setRecall(hits, exact, "vec_id")
          .select("recall_bp").head().getLong(0)
        val analytic = Similarity.bandedDeconRecall(t, b, r)
        println(f"[decon-recall] t=$t%.1f $label ($b,$r): " +
          f"recall_bp=$bp (analytic floor ${analytic * 10000}%.0f) " +
          f"wall=$tw%.2f s vs exact $te%.2f s (n_true=$nTrue)")
        hits.unpersist(); ()
      }
      probe("gate", 6, 2)
      val (db, dr) = Similarity.derivedDeconShape(t)
      if ((db, dr) != ((6, 2))) probe("derived", db, dr)
      exact.unpersist(); ()
    }
    spark.stop()
  }
}
