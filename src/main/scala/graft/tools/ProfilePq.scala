package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: the PQ-index amortization evidence — one pqIndex
  * build+write, then repeated reload+probe batches against the
  * stored codes, plus recall@k of PQ ranking vs exact brute force.
  * The PQ analog of ProfileIvf's `amortize` mode: training dominates
  * (seeds + Lloyd + encode scan), probing reads only the compressed
  * corpus.
  * Usage: runMain graft.tools.ProfilePq <sfDir> [batches] */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession("graft-pq-profile",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    import spark.implicits._

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .persist()
    val n = emb.count()
    val q = emb.filter(col("vec_id") % 100 === 0)
    val dir = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_pq_profile_" +
        ProcessHandle.current().pid())

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq-profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    println(s"[pq-profile] corpus n=$n")
    timed("build+write (train + encode + parquet)") {
      Similarity.pqIndex(emb, "vec_id", "embedding", dim = 64).write(dir)
    }
    (1 to batches).foreach { i =>
      timed(s"reload+probe batch $i (k=5)") {
        val idx = Similarity.readPqIndex(spark, dir, "vec_id")
        Similarity.pqTopKWithIndex(q, idx, "embedding", k = 5).count()
      }
    }
    // recall@5 vs exact across code budgets — the m/ksub quality
    // knob curve. NOTE the corpus here is SYNTHETIC UNIFORM-RANDOM
    // (PQ's adversarial case: no intrinsic low-dimensional structure
    // for the codebooks to exploit), so absolute recall is far below
    // what real embeddings give; the evidence is the MONOTONE climb
    // with code budget.
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
      k = 5).select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    Seq((4, 16), (8, 64), (16, 256)).foreach { case (m, ksub) =>
      val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding",
        dim = 64, m = m, ksub = ksub, k = 5)
        .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
      val bits = m * (math.log(ksub) / math.log(2)).toInt
      println(f"[pq-profile] recall@5 m=$m ksub=$ksub ($bits%d-bit codes, " +
        f"${64 * 32 / bits}%dx compression): " +
        f"${pq.intersect(exact).size.toDouble / exact.size}%.3f")
    }
    // composed-index amortization: the IVF-PQ serving stack built
    // once (both quantizers trained + corpus encoded + parquet), then
    // probed per batch from stored state — the per-batch cost is what
    // a 100 TB deployment actually pays per query wave
    val dir2 = graft.core.FsUtil.deleteOnExit(
      s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_profile_" +
        ProcessHandle.current().pid())
    timed("ivfpq build+write (ivf train + residual pq train + encode)") {
      Similarity.ivfPqIndex(emb, "vec_id", "embedding", dim = 64,
        nlist = 16, residual = true).write(dir2)
    }
    (1 to batches).foreach { i =>
      timed(s"ivfpq reload+probe batch $i (k=5)") {
        val idx = Similarity.readIvfPqIndex(spark, dir2, "vec_id",
          "embedding")
        Similarity.ivfPqTopKWithIndex(q, idx, k = 5, nprobe = 4).count()
      }
    }
    // raw vs RESIDUAL encoding at the SAME code budget through the
    // full IVF-PQ stack (nlist=16, nprobe=4): both rankings are
    // probe-limited, so the exact set is restricted per query to the
    // probed candidates' ideal — recall here isolates what the PQ
    // encoding itself loses, which is the quantity residual encoding
    // improves.
    val ivfExact = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    Seq(false, true).foreach { res =>
      val pq = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 4, m = 4, ksub = 16,
        residual = res)
        .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
      val mode = if (res) "residual" else "raw"
      println(f"[pq-profile] ivfpq recall@5 vs ivf-float ($mode, " +
        f"m=4 ksub=16): " +
        f"${pq.intersect(ivfExact).size.toDouble / ivfExact.size}%.3f")
    }
    // DERIVED-parameter operating point (the production path the
    // fixed-16 gate rows deliberately bypass): build with no explicit
    // nlist/nprobe, report the engaged sqrt(N) width and recall vs
    // the float-IVF ranking at the same derived parameters. PqSpec
    // pins the wiring on planted data; this measures it on the
    // actual corpus at scale.
    locally {
      val dir3 = graft.core.FsUtil.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_derived_" +
          ProcessHandle.current().pid())
      timed("ivfpq DERIVED build+write (nlist=sqrt(N))") {
        Similarity.ivfPqIndex(emb, "vec_id", "embedding", dim = 64,
          residual = true).write(dir3)
      }
      val idx = Similarity.readIvfPqIndex(spark, dir3, "vec_id",
        "embedding")
      val nl = idx.codebook.count().toInt
      val np = Similarity.derivedNprobe(nl)
      val probe = timed(s"ivfpq DERIVED reload+probe (nlist=$nl nprobe=$np)") {
        Similarity.ivfPqTopKWithIndex(q, idx, k = 5)
          .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
      }
      val floatRef = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        k = 5, nlist = nl, nprobe = np)
        .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
      println(f"[pq-profile] DERIVED nlist=$nl (n=$n, " +
        f"expected ${Similarity.derivedNlist(n)}) nprobe=$np " +
        f"scanned-fraction=${np.toDouble / nl}%.3f")
      println(f"[pq-profile] DERIVED recall@5 vs ivf-float same params: " +
        f"${probe.intersect(floatRef).size.toDouble / floatRef.size}%.3f")
    }
    spark.stop()
  }
}
