package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the serve-side A/B behind the round-19 crossover
  * dispatch (round-18 finding #1) — for a STORED banded decon set at
  * a dominated shape (bands ≥ 2^rowsPerBand, e.g. the τ=0.3 gate
  * shape (6,2)), time the two probe closures
  * `embedDeconLookupStream` dispatches between on the SAME store:
  *
  *  (a) the banded OR-construction probe
  *      (`decontaminateSemanticBandedWithSet` — the pre-dispatch
  *      serve arm), and
  *  (b) the exact probe over the store's band-0 (bv, bnrm) slice
  *      (`decontaminateSemanticExactWithSet` — what the dispatch
  *      routes dominated shapes to).
  *
  * The banded arm at a dominated shape verifies
  * bands/2^rowsPerBand × the exact arm's cosines AND misses pairs
  * (recall < 1), so (b) should read strictly cheaper at recall 1.0 —
  * BASELINE.md quotes the measured sf10 rows. Probes run
  * alternating A/B/A/B after a shared warmup so neither arm owns the
  * cache-warm advantage.
  *
  * Usage: runMain graft.tools.ProfileDeconServe <sfDir> [tau] [bands] [rowsPerBand]
  */
object ProfileDeconServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val bands = args.lift(2).map(_.toInt).getOrElse(6)
    val rpb = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-decon-serve",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import graft.operators.Similarity

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding")).persist()
    val bench = emb.filter(col("vec_id") % 50 === 0)
    val nc = corpus.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-decon-serve").toString + "/set"
    Similarity.writeSemanticDeconSetBanded(bench, "embedding", dir,
      dim = 64, bands = bands, rowsPerBand = rpb)
    val (set, dim, b, r) = Similarity.readSemanticDeconSetBanded(spark, dir)
    println(s"[decon-serve] $sfDir corpus=$nc stored shape=($b,$r) " +
      s"dominated=${Similarity.bandedShapeDominated(b, r)} tau=$tau")

    val bandedProbe = () => Similarity.decontaminateSemanticBandedWithSet(
      corpus, set, "vec_id", "embedding", tau, dim, b, r).count()
    val exactProbe = () => Similarity.decontaminateSemanticExactWithSet(
      corpus, set.filter(col("band") === 0).select("bv", "bnrm"),
      "vec_id", "embedding", tau).count()
    def timed(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // shared warmup: one pass of each (codegen + store file cache)
    bandedProbe(); exactProbe()
    (1 to 2).foreach { i =>
      val (tb, nb) = timed(bandedProbe)
      val (te, ne) = timed(exactProbe)
      println(f"[decon-serve] round $i banded=$tb%.2f s ($nb hits) " +
        f"exact=$te%.2f s ($ne hits)")
    }
    spark.stop()
  }
}
