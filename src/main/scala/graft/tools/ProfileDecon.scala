package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the exact-vs-bloom decontamination crossover as
  * the bench:corpus ratio shrinks toward the production shape (a
  * fixed-MB eval set against a TB corpus, rare contamination).
  *
  * The benched q_decontaminate_bloom configuration is the WORST case
  * for the two-phase path — src0 is 10% of the corpus and grows with
  * sf, contamination ~50%, so the bloom build dominates and the
  * prefilter discards little (BASELINE.md round-10 note). This tool
  * sweeps the bench fraction down (every k-th src0 doc) and times
  * both paths on the same input, so the claim "the production shape
  * inverts the small-scale loss" is a measured row, not an argument.
  *
  * Usage: runMain graft.tools.ProfileDecon <sfDir> [k1,k2,...]
  * (bench = src0 docs with doc_id % k == 0; k=1 is the benched query)
  */
object ProfileDecon {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val ks = args.lift(1).getOrElse("1,10,50").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-profile-decon",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // full warmup of BOTH paths (codegen + file caches + the bloom
    // expression's lazy deserialization) — a limit()-sized warmup
    // leaves the first timed row paying ~1s of residual JIT, which at
    // these magnitudes inverts the comparison
    graft.operators.Curation.decontaminate(
      corpus, docs.filter(col("source") === "src0"),
      "doc_id", "text", 4).count()
    graft.operators.Curation.decontaminateExactViaBloom(
      corpus, docs.filter(col("source") === "src0"),
      "doc_id", "text", 4).count()
    spark.catalog.clearCache()

    ks.foreach { k =>
      val bench = docs.filter(col("source") === "src0" &&
        pmod(col("doc_id"), lit(k)) === 0)
      val nb = bench.count()
      // best-of-2 per path, alternating, so a background stall on one
      // sample can't brand either path
      def best(body: => Long): (Double, Long) = {
        val a = time(body); spark.catalog.clearCache()
        val b = time(body); spark.catalog.clearCache()
        (math.min(a._1, b._1), a._2)
      }
      val (tExact, nExact) = best(graft.operators.Curation
        .decontaminate(corpus, bench, "doc_id", "text", 4).count())
      val (tBloom, nBloom) = best(graft.operators.Curation
        .decontaminateExactViaBloom(corpus, bench, "doc_id", "text", 4)
        .count())
      require(nExact == nBloom, s"two-phase diverged: $nExact vs $nBloom")
      println(f"[decon] k=$k%-3d bench=$nb%6d contaminated=$nExact%7d " +
        f"exact=$tExact%6.2f s  bloom+exact=$tBloom%6.2f s  " +
        f"ratio=${tBloom / tExact}%4.2f")
    }
    spark.stop()
  }
}
