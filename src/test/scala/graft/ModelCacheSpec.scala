package graft

import org.apache.spark.sql.functions._

import graft.streaming.ModelCache

/** The sidecar-stamp model cache behind the serve streams (round-17
  * finding #3): per-batch store reads must collapse to stamp probes,
  * WITHOUT weakening the freshness contract — a mid-stream append
  * still takes effect from the next micro-batch, because the append
  * moves the stamp. */
class ModelCacheSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mc-$name").toString

  test("cache mechanics: same stamp = one load; a moved control file reloads and releases the stale entry; invalidate releases") {
    ModelCache.clear()
    val s = spark
    val dir = tmp("mech") + "/store"
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), """{"v":1}""")
    var loads = 0
    var releases = 0
    def get(): String = ModelCache.getOrLoad(s, dir, Seq("t.parquet")) {
      loads += 1; s"model-$loads"
    } { _ => releases += 1 }
    assert(get() === "model-1" && get() === "model-1")
    assert(loads === 1 && releases === 0)
    // the stamp includes mtime+content of params.json AND each
    // table's manifest: moving either forces a reload that first
    // releases the stale entry
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), """{"v":2}""")
    assert(get() === "model-2")
    assert(loads === 2 && releases === 1)
    val mdir = new org.apache.hadoop.fs.Path(dir, "t.parquet")
    fs.mkdirs(mdir)
    graft.core.FsUtil.writeSidecar(fs, new org.apache.hadoop.fs.Path(
      mdir, graft.sources.Sinks.ManifestFile), """{"names":["a"]}""")
    assert(get() === "model-3")
    assert(loads === 3 && releases === 2)
    // a caller whose loaded value bakes in per-stream parameters
    // keys the entry by (dir + params): two keys on one dir are
    // INDEPENDENT entries (the embedDeconLookupStream contract — two
    // streams probing one set at different thresholds must not share
    // the first stream's probe closure)
    var l2 = 0
    var rel2 = 0
    def getKeyed(k: String): String =
      ModelCache.getOrLoad(s, dir, Seq("t.parquet"), key = k) {
        l2 += 1; s"$k-model-$l2"
      } { _ => rel2 += 1 }
    assert(getKeyed(s"$dir#0.3") === s"$dir#0.3-model-1")
    assert(getKeyed(s"$dir#0.8") === s"$dir#0.8-model-2")
    assert(getKeyed(s"$dir#0.3") === s"$dir#0.3-model-1") // still cached
    assert(l2 === 2)
    // invalidate(dir) retires the STORE: it must release the plain
    // entry AND every composite-keyed (dir#...) entry built over it
    // (round-18 ADVICE — before, the keyed probe closures lingered
    // forever despite the scaladoc's bound-the-map-via-invalidate)
    ModelCache.invalidate(dir)
    assert(releases === 3)
    assert(rel2 === 2, "composite-keyed entries survived invalidate(dir)")
    assert(getKeyed(s"$dir#0.3") === s"$dir#0.3-model-3",
      "a retired key should reload fresh")
    ModelCache.invalidate(dir)
    assert(rel2 === 3)
    // disabled = the pre-cache behavior, one batch deferred: every
    // call is a forced miss that loads fresh and releases the
    // PREVIOUS entry — storage stays bounded at one model per key
    ModelCache.enabled = false
    try {
      get(); assert(loads === 4 && releases === 3) // entry was gone
      get(); assert(loads === 5 && releases === 4) // prior forced miss released
    } finally ModelCache.enabled = true
  }

  test("retiring a decon-set dir via invalidate(dir) releases the serve's composite-keyed probe entry") {
    ModelCache.clear()
    val s = spark
    import s.implicits._
    val root = tmp("retire")
    val setDir = s"$root/set"
    val bench = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    graft.operators.Similarity.writeSemanticDeconSetBanded(
      bench, "embedding", setDir, dim = 4, bands = 2, rowsPerBand = 2)
    implicit val sqlCtx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamJobs.embedDeconLookupStream(
        in.toDS().toDF("vec_id", "embedding"), setDir, s"$root/out",
        "vec_id", "embedding", threshold = 0.5)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      val l0 = ModelCache.loads
      in.addData(Seq((10L, Array(1f, 0f, 0f, 0f)))); q.processAllAvailable()
      assert(ModelCache.loads === l0 + 1)
      in.addData(Seq((11L, Array(0f, 1f, 0f, 0f)))); q.processAllAvailable()
      assert(ModelCache.loads === l0 + 1,
        "unchanged set re-read — the probe closure should be cached")
      // retire the set by its DIR alone — the retiring caller doesn't
      // know the stream's composite key ($setDir#id#vec#threshold);
      // prefix invalidation must reach it (round-18 ADVICE)
      ModelCache.invalidate(setDir)
      in.addData(Seq((12L, Array(1f, 0f, 0f, 0f)))); q.processAllAvailable()
      assert(ModelCache.loads === l0 + 2,
        "retired dir's composite-keyed probe entry survived invalidate(dir)")
      // the probes themselves stayed correct across the retire
      assert(s.read.parquet(s"$root/out").filter($"cos" >= 0.5).count() === 3)
    } finally q.stop()
  }

  test("lm serve: unchanged store is read once across batches; a mid-stream append takes effect next batch") {
    ModelCache.clear()
    val s = spark
    import s.implicits._
    val root = tmp("lm")
    val modelDir = s"$root/model"
    val outDir = s"$root/out"
    val ref1 = Seq((1L, "alpha beta alpha gamma"))
      .toDF("doc_id", "text")
    graft.operators.LmScore.writeModel(ref1, "text", modelDir)
    implicit val sqlCtx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.StreamJobs.lmLookupStream(
        in.toDS().toDF("doc_id", "text"), modelDir, outDir,
        "doc_id", "text")
      .option("checkpointLocation", s"$root/ckpt").start()
    def bitsOf(id: Long): Long =
      s.read.parquet(outDir).filter($"doc_id" === id)
        .select("bits").as[Long].head()
    try {
      val loads0 = ModelCache.loads
      in.addData(Seq((10L, "alpha beta gamma"))); q.processAllAvailable()
      assert(ModelCache.loads === loads0 + 1)
      // same store, next batch: stamp unchanged → NO reload, and the
      // identical text scores identically (same model)
      in.addData(Seq((11L, "alpha beta gamma"))); q.processAllAvailable()
      assert(ModelCache.loads === loads0 + 1,
        "unchanged store re-read — the fixed cost the cache exists to drop")
      assert(bitsOf(11L) === bitsOf(10L))
      // mid-stream append: new reference mass moves the stamp; the
      // NEXT batch must score against the grown model
      // enough repeated (alpha, beta) mass that the integer
      // bit-length cost of the scored bigram itself moves — the
      // backoff formula quantizes to bin lengths, so a token-scale
      // append can reload correctly yet score identically
      graft.operators.LmScore.appendModel(
        Seq((2L, ("alpha beta " * 40) + "delta epsilon"))
          .toDF("doc_id", "text"),
        "text", modelDir, tag = "mc-append")
      in.addData(Seq((12L, "alpha beta gamma"))); q.processAllAvailable()
      assert(ModelCache.loads === loads0 + 2,
        "append did not move the stamp")
      assert(bitsOf(12L) !== bitsOf(10L),
        "post-append batch scored against the stale model")
      // and the post-append score equals a FRESH read's score — the
      // cache changed when, not what
      val fresh = graft.operators.LmScore.score(
          graft.operators.LmScore.readModel(s, modelDir),
          Seq((12L, "alpha beta gamma")).toDF("doc_id", "text"),
          "doc_id", "text")
        .select("bits").as[Long].head()
      assert(bitsOf(12L) === fresh)
    } finally q.stop()
  }

  test("ivf serve handle: quiet store loads once; tagged ingest AND plain append both move the extraFiles stamp") {
    ModelCache.clear()
    val s = spark
    import s.implicits._
    val dir = tmp("ivfserve") + "/idx"
    val emb = graft.sources.Tables.load(s, sf0001, "embeddings")
    graft.operators.Similarity
      .ivfIndex(emb, "vec_id", "embedding", nlist = 4).write(dir)
    var loads = 0
    def handle(): graft.operators.Similarity.IvfReady =
      ModelCache.getOrLoad(s, dir, Seq("assigned.parquet"),
          key = s"$dir#ivf",
          extraFiles = Seq("assigned.parquet/_SUCCESS",
            "codebook.parquet/_SUCCESS")) {
        loads += 1
        graft.operators.Similarity.ivfReady(
          graft.operators.Similarity.readIvfIndex(s, dir, "vec_id",
            "embedding"))
      } (_ => ())
    handle(); handle()
    assert(loads === 1, "quiet store must stamp-hit, not reload")
    // the IVF store writes no params.json — freshness rides the
    // assigned manifest (tagged ingest) and _SUCCESS (plain append)
    val batch1 = emb.limit(3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    graft.operators.Similarity.ivfIngestBatch(batch1, dir, "vec_id",
      "embedding", tag = "mc-ivf-0")
    handle()
    assert(loads === 2, "tagged ingest did not move the stamp")
    val batch2 = emb.limit(3)
      .select(($"vec_id" + 2000000L).as("vec_id"), $"embedding")
    graft.operators.Similarity.ivfAppendToStored(
      graft.operators.Similarity.readIvfIndex(s, dir, "vec_id",
        "embedding"), batch2, dir)
    handle()
    assert(loads === 3, "plain append did not move the _SUCCESS stamp")
    // and the reloaded handle actually SEES the appended rows
    assert(handle().index.assigned
      .filter($"nn_id" >= 1000000L).count() === 6)
    ModelCache.invalidate(dir)
  }
}
