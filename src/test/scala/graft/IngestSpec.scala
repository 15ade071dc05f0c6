package graft

import org.apache.spark.sql.functions._

import graft.operators.{Maintenance, Similarity, TextProfile}
import graft.sources.{Sinks, Tables}

/** The replay-idempotent streaming ingest contract
  * (`Sinks.appendTagged` + `TextProfile.bm25IngestBatch` /
  * `Similarity.ivfIngestBatch`): a foreachBatch micro-batch re-run
  * with the same tag — from ANY crash point, however torn — must
  * converge the stored index to exactly the single-apply state, and
  * the ingested store must probe bit-identically to a fresh full
  * build. The gate rows (q_stream_bm25_ingest / q_stream_ann_ingest)
  * pin the happy path end-to-end against the DuckDB oracle; this
  * spec pins the failure-path algebra the gate cannot reach. */
class IngestSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ingest-$name")
      .toString + "/store"

  private def dataFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).sorted.toSeq

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  test("appendTagged: committed replay no-ops, uncommitted replay replaces, neighbors survive, prefix tags do not collide") {
    val s = spark
    import s.implicits._
    val dir = tmp("tagged") + "/table"
    val table = new org.apache.hadoop.fs.Path(dir)
    Sinks.appendTagged(Seq(1L, 2L).toDF("v"), dir, "r0-0")
    Sinks.appendTagged(Seq(3L).toDF("v"), dir, "r0-1")
    // r0-1 is a '-'-joined prefix of r0-1x and r0-1-b: neither may be
    // disturbed by an r0-1 replay
    Sinks.appendTagged(Seq(4L).toDF("v"), dir, "r0-1x")
    Sinks.appendTagged(Seq(5L).toDF("v"), dir, "r0-1-b")
    val fs = fsOf(dir)
    val before = dataFiles(dir)
    // a COMMITTED tag replays as a no-op: the manifest is the commit
    // point, so the batch's original content wins and the replay
    // returns 0 files
    assert(Sinks.appendTagged(Seq(30L).toDF("v"), dir, "r0-1") === 0)
    assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(dataFiles(dir) === before, "committed replay touched files")

    // an UNCOMMITTED attempt (crashed before its manifest commit)
    // leaves orphans that readers never see and a replay replaces
    val committed = Sinks.readManifest(fs, table).get
    val r01files = committed.filter(_.startsWith("ingest-r0-1-part"))
    Sinks.writeManifestNames(fs, table,
      (committed -- r01files).toSeq) // simulate: commit never happened
    assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 4L, 5L), "orphans visible to readTagged")
    Sinks.appendTagged(Seq(30L).toDF("v"), dir, "r0-1")
    assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 4L, 5L, 30L), "uncommitted replay did not replace")
    assert(!r01files.exists(dataFiles(dir).contains(_)),
      "replay left the crashed attempt's orphan files")
    // other tags' files untouched through both replays
    assert(before.filterNot(_.contains("ingest-r0-1-part")).toSet
      .subsetOf(dataFiles(dir).toSet))

    // the purge anchor is \d{5,}: Spark zero-pads to five digits but
    // counts past part-99999 at high task counts — a six-digit part
    // file must still purge; purgeTagged also un-commits the tag
    val six = new org.apache.hadoop.fs.Path(dir,
      "ingest-r0-1-part-123456-deadbeef.snappy.parquet")
    fs.create(six, true).close()
    Sinks.purgeTagged(fs, table, "r0-1")
    assert(!fs.exists(six), "six-digit part index escaped the purge")
    assert(!Sinks.readManifest(fs, table).get
      .exists(_.startsWith("ingest-r0-1-part")),
      "purgeTagged left the tag committed")
  }

  test("manifest protocol property: readTagged ≡ union of committed batches, exactly once, under 100+ generated crash interleavings") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.hadoop.fs.Path

    // Abstract op stream interpreted against BOTH the real store and
    // a trivially-correct model (base rows + committed-batch map).
    // Crash(keep) lands a torn attempt: keep ∈ {0,1,2} data files
    // renamed in, manifest never updated — exactly the states a kill
    // between appendTagged's rename loop and its commit produces.
    // Replay/Purge pick from live tags; Compact folds the committed
    // rows into a plain base table (manifest gone — the documented
    // quiesced-compaction shape; no retired tag is ever replayed
    // afterwards, per the scaladoc precondition). The invariant at
    // every Read and at sequence end: readTagged sees base rows plus
    // every committed batch EXACTLY once and nothing else — the
    // class-level claim the enumerated crash-point tests instantiate.
    sealed trait Op
    case object Append extends Op
    final case class Crash(keep: Int) extends Op
    final case class Replay(pick: Int) extends Op
    final case class PurgeOp(pick: Int) extends Op
    case object Read extends Op
    case object Compact extends Op

    val opGen: Gen[Op] = Gen.frequency(
      4 -> Gen.const(Append),
      3 -> Gen.choose(0, 2).map(Crash(_)),
      3 -> Gen.choose(0, 99).map(Replay(_)),
      1 -> Gen.choose(0, 99).map(PurgeOp(_)),
      2 -> Gen.const(Read),
      1 -> Gen.const(Compact))
    val seqGen = Gen.listOfN(7, opGen)

    def valuesOf(tag: Int): Seq[Long] = (0 until 3).map(i => tag * 100L + i)

    var interleavings = 0
    (0 until 110).foreach { caseIdx =>
      val ops = seqGen(Gen.Parameters.default, Seed(4242L + caseIdx))
        .getOrElse(fail(s"case $caseIdx: generator produced nothing"))
      val dir = tmp(s"prop$caseIdx") + "/table"
      val table = new Path(dir)
      val fs = fsOf(dir)
      var nextTag = 0
      var base = Vector.empty[Long]
      val committed = scala.collection.mutable.LinkedHashMap.empty[Int, Seq[Long]]
      val crashed = scala.collection.mutable.LinkedHashMap.empty[Int, Seq[Long]]
      def expect: Seq[Long] = (base ++ committed.values.flatten).sorted
      def check(where: String): Unit =
        if (fs.exists(table)) {
          // a store with ZERO parquet files (every attempt crashed at
          // keep=0 / everything purged) has no schema to read — the
          // model must agree it holds nothing
          if (dataFiles(dir).isEmpty)
            assert(expect.isEmpty,
              s"case $caseIdx ($where): model expects rows, store has no files")
          else
            assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq
              === expect, s"case $caseIdx ($where): store diverged from model")
        }
      ops.foreach {
        case Append =>
          val tag = nextTag; nextTag += 1
          Sinks.appendTagged(valuesOf(tag).toDF("v").coalesce(1), dir,
            s"t$tag")
          committed(tag) = valuesOf(tag)
        case Crash(keep) =>
          val tag = nextTag; nextTag += 1
          Sinks.appendTagged(valuesOf(tag).toDF("v").repartition(2), dir,
            s"t$tag")
          // doctor to the torn state: strip the commit, keep only the
          // first `keep` renamed files (deterministic by name sort)
          val m = Sinks.readManifest(fs, table).get
          val mine = m.filter(_.startsWith(s"ingest-t$tag-part"))
          Sinks.writeManifestNames(fs, table, (m -- mine).toSeq)
          mine.toSeq.sorted.drop(keep)
            .foreach(n => fs.delete(new Path(table, n), false))
          crashed(tag) = valuesOf(tag)
        case Replay(p) =>
          val pool = (crashed.keys ++ committed.keys).toVector.sorted
          if (pool.nonEmpty) {
            val tag = pool(p % pool.size)
            val ret = Sinks.appendTagged(
              valuesOf(tag).toDF("v").coalesce(1), dir, s"t$tag")
            if (committed.contains(tag))
              assert(ret === 0,
                s"case $caseIdx: committed replay of t$tag not a no-op")
            else { committed(tag) = valuesOf(tag); crashed.remove(tag) }
          }
        case PurgeOp(p) =>
          val pool = (crashed.keys ++ committed.keys).toVector.sorted
          if (pool.nonEmpty) {
            val tag = pool(p % pool.size)
            Sinks.purgeTagged(fs, table, s"t$tag")
            committed.remove(tag); crashed.remove(tag)
          }
        case Read => check("mid-sequence")
        case Compact =>
          if (fs.exists(table)) {
            val rows = expect
            rows.toDF("v").coalesce(1).write
              .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
            base = rows.toVector
            committed.clear(); crashed.clear()
          }
      }
      check("final")
      interleavings += 1
    }
    assert(interleavings >= 100)
  }

  test("pre-manifest upgrade path: a torn legacy append purges-and-redoes; other legacy tags adopt as committed") {
    val s = spark
    import s.implicits._
    val dir = tmp("legacy") + "/table"
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    // build a legacy store: two committed tags, then strip the
    // manifest entirely (the pre-manifest on-disk state) and tear
    // half of r0-1's files — the mid-append crash the OLD protocol
    // repaired by unconditional purge-then-redo
    Sinks.appendTagged(Seq(1L, 2L).toDF("v"), dir, "r0-0")
    Sinks.appendTagged((10L until 20L).toDF("v").repartition(4), dir,
      "r0-1")
    fs.delete(new org.apache.hadoop.fs.Path(table, Sinks.ManifestFile),
      false)
    val r01 = dataFiles(dir).filter(_.startsWith("ingest-r0-1-part"))
    assert(r01.size >= 2, s"need >= 2 files to tear: $r01")
    fs.delete(new org.apache.hadoop.fs.Path(table, r01.head), false)
    // the replay must NOT adopt the torn subset as committed (that
    // would no-op and lose the deleted file's rows forever) — it
    // purges the leftovers and redoes the batch; r0-0 adopts
    Sinks.appendTagged((10L until 20L).toDF("v").repartition(4), dir,
      "r0-1")
    assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq ===
      (Seq(1L, 2L) ++ (10L until 20L)), "torn legacy replay lost rows")
    assert(Sinks.readManifest(fs, table).get
      .exists(_.startsWith("ingest-r0-0-part")),
      "legacy committed tag not adopted")
  }

  test("readTagged on a store whose only files are uncommitted orphans returns zero rows, never the orphans") {
    val s = spark
    import s.implicits._
    val dir = tmp("orphans") + "/table"
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    // first-ever batch crashed before its manifest commit: manifest
    // holds an empty committed set, orphan files sit on disk
    Sinks.appendTagged(Seq(1L, 2L, 3L).toDF("v"), dir, "r0-0")
    Sinks.writeManifestNames(fs, table, Nil)
    assert(Sinks.readTagged(s, dir).count() === 0L,
      "uncommitted orphans leaked through readTagged")
    // the replay then commits them and they become visible
    Sinks.appendTagged(Seq(1L, 2L, 3L).toDF("v"), dir, "r0-0")
    assert(Sinks.readTagged(s, dir).as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("a serve loop concurrent with crash-replayed appends observes zero failed reads and only committed states") {
    val s = spark
    import s.implicits._
    val dir = tmp("concurrent") + "/table"
    val table = new org.apache.hadoop.fs.Path(dir)
    // base store + one committed batch, then FIVE stranded attempts:
    // files renamed in but the manifest commit "crashed" (stripped) —
    // the only torn state the commit protocol can reach. Readers must
    // never see the stranded files, and the concurrent replays below
    // purge + redo them while the serve loop hammers the table.
    Sinks.writeSizedParquet((0L until 1000L).toDF("v"), dir)
    Sinks.appendTagged((1000L until 1100L).toDF("v"), dir, "r0-0")
    val fs = fsOf(dir)
    val tags = (1 to 5).map(i => s"r0-$i")
    tags.zipWithIndex.foreach { case (tag, i) =>
      val lo = 1100L + i * 100L
      Sinks.appendTagged((lo until lo + 100L).toDF("v"), dir, tag)
    }
    val m = Sinks.readManifest(fs, table).get
    Sinks.writeManifestNames(fs, table, m.filter(n =>
      !tags.exists(t => n.startsWith(s"ingest-$t-part"))).toSeq)
    assert(Sinks.readTagged(s, dir).count() === 1100L,
      "stranded attempts visible before replay")

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val serve = new Thread(() => {
      while (!stop.get()) {
        try { seen.add(Sinks.readTagged(s, dir).count()); reads
          .incrementAndGet() }
        catch { case e: Throwable => failures.add(e) }
      }
    }, "graft-serve-loop")
    serve.start()
    try tags.zipWithIndex.foreach { case (tag, i) =>
      val lo = 1100L + i * 100L
      Sinks.appendTagged((lo until lo + 100L).toDF("v"), dir, tag)
    } finally { stop.set(true); serve.join() }
    assert(failures.isEmpty,
      s"concurrent serve failed: ${failures.peek()}")
    // >= 1, not a throughput bar: under full-suite box load a read
    // can take seconds and a tighter count flakes — the property
    // under test is zero FAILED reads and only committed states, not
    // how many reads the loop managed
    assert(reads.get() >= 1, s"serve loop never completed a read")
    val legal = (0 to 5).map(i => 1100L + i * 100L).toSet
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.subsetOf(legal),
      s"serve observed a non-committed state: ${seen.asScala}")
    assert(Sinks.readTagged(s, dir).count() === 1600L)
  }

  test("bm25IngestBatch: replay of a clean batch and of every torn prefix converges to single-apply") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf0001, "documents")
    val dir = tmp("bm25")
    TextProfile.bm25Index(docs.filter($"doc_id" % 3 === 0), "doc_id",
      "text").write(dir)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    val fs = fsOf(dir)
    def sidecar(n: String) = graft.core.FsUtil.readSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, n)).get
    TextProfile.bm25IngestBatch(b1, "text", dir, "r0-0")
    // snapshot the pre-r0-1 sidecars: the state a crash between
    // r0-1's data-file renames and its log/params rewrite leaves
    val midParams = sidecar("params.json")
    val midLog = sidecar("ingest.json")
    TextProfile.bm25IngestBatch(b2, "text", dir, "r0-1")
    val cleanParams = sidecar("params.json")
    val cleanLog = sidecar("ingest.json")
    val queries = docs.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("q_id"),
        concat_ws(" ", slice(graft.functions.TextFunctions
          .tokens($"text"), 1, 6)).as("qtext"))
    def probe() = TextProfile.bm25TopKWithIndex(queries, "q_id",
      "qtext", TextProfile.readBm25Index(s, dir, "doc_id"), k = 5,
      stopwordCut = false).orderBy("q_id", "rank").collect().toSeq
    val want = probe()
    // fresh-build parity: the ingested store IS the full corpus index
    val freshDir = tmp("bm25-fresh")
    TextProfile.bm25Index(docs, "doc_id", "text").write(freshDir)
    assert(want === TextProfile.bm25TopKWithIndex(queries, "q_id",
      "qtext", TextProfile.readBm25Index(s, freshDir, "doc_id"), k = 5,
      stopwordCut = false).orderBy("q_id", "rank").collect().toSeq)

    // clean replay: full batch re-run with the same tag
    TextProfile.bm25IngestBatch(b2, "text", dir, "r0-1")
    assert(sidecar("params.json") === cleanParams)
    assert(sidecar("ingest.json") === cleanLog)
    assert(probe() === want)

    // torn prefixes of batch r0-1, in the write order df -> postings
    // -> log -> params. Simulate each crash point by damaging the
    // store accordingly, then assert the replay repairs it exactly.
    val post = new org.apache.hadoop.fs.Path(s"$dir/postings.parquet")
    val dfp = new org.apache.hadoop.fs.Path(s"$dir/df.parquet")
    // (a) died after df landed, before postings (sidecars still
    // pre-batch — the log/params rewrite comes after both tables)
    Sinks.purgeTagged(fs, post, "r0-1")
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "ingest.json"), midLog)
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), midParams)
    TextProfile.bm25IngestBatch(b2, "text", dir, "r0-1")
    assert(probe() === want, "repair after postings-missing failed")
    assert(sidecar("params.json") === cleanParams)
    assert(sidecar("ingest.json") === cleanLog)
    // (b) died mid-append: the tag never committed (manifest without
    // its names — the only reachable torn state under the manifest
    // protocol; committed files cannot vanish), half its renamed
    // files stranded as orphans, sidecars pre-batch
    Seq(post, dfp).foreach { t =>
      val m = Sinks.readManifest(fs, t).get
      Sinks.writeManifestNames(fs, t,
        m.filterNot(_.startsWith("ingest-r0-1-part")).toSeq)
      val tagged = fs.listStatus(t)
        .filter(_.getPath.getName.startsWith("ingest-r0-1-"))
      tagged.take(math.max(1, tagged.length / 2))
        .foreach(f => fs.delete(f.getPath, false))
    }
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "ingest.json"), midLog)
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), midParams)
    TextProfile.bm25IngestBatch(b2, "text", dir, "r0-1")
    assert(probe() === want, "repair after half-append failed")
    // (c) died after both tables landed, before the log/params
    // rewrite: data complete, sidecars stale
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "ingest.json"), midLog)
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), midParams)
    TextProfile.bm25IngestBatch(b2, "text", dir, "r0-1")
    assert(sidecar("params.json") === cleanParams)
    assert(probe() === want, "repair after sidecar-stale failed")

    // batch appends are rejected on a mid-stream store: a live ingest
    // log recomputes totals as base + Σ(logged entries), which would
    // silently wipe an unlogged batch's contribution
    intercept[IllegalArgumentException] {
      TextProfile.bm25IndexAppend(
        TextProfile.readBm25Index(s, dir, "doc_id"), b1, "text", dir)
    }

    // the ABANDONED-stream crash (died between its log write and its
    // params write, never replayed): params stale, log authoritative.
    // Compaction must fold the log's totals instead of baking the
    // stale undercount in permanently.
    graft.core.FsUtil.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "params.json"), midParams)
    assert(TextProfile.bm25SortDrifted(s, dir), "ingest left no drift?")
    val rep = Maintenance.compactAll(s, Seq(dir))
    assert(rep(dir).kind === "bm25-index")
    assert(probe() === want, "probe moved across compaction")
    val cleanIdx = TextProfile.readBm25Index(s, dir, "doc_id")
    val freshIdx = TextProfile.readBm25Index(s, freshDir, "doc_id")
    assert((cleanIdx.nDocs, cleanIdx.totTokens) ===
      ((freshIdx.nDocs, freshIdx.totTokens)),
      "compaction kept the stale params instead of folding the log")
    assert(!graft.core.FsUtil.readSidecar(fs,
      new org.apache.hadoop.fs.Path(dir, "ingest.json")).isDefined,
      "compaction must drop the ingest log (fresh-run baseline)")
  }

  test("ingest and serve streams compose on one store: a doc ingested in batch N is retrievable in the serve's batch N+1") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(s, sf0001, "documents")
    val root = tmp("live")
    val idxDir = s"$root/idx"
    // seed WITHOUT the target doc; the serve must not find it yet
    val target = docs.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text").as[(Long, String)].head()
    TextProfile.bm25Index(docs.filter($"doc_id" =!= target._1),
      "doc_id", "text").write(idxDir)
    implicit val sqlCtx = s.sqlContext
    val docsIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val qIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val outDir = s"$root/out"
    val ingest = graft.streaming.StreamJobs.bm25IngestStream(
        docsIn.toDS().toDF("doc_id", "text"), idxDir, "text", "live")
      .option("checkpointLocation", s"$root/ckpt_i").start()
    // k deep enough to hold EVERY doc sharing a query term: the
    // synthetic vocabulary is near-universal, so a top-5 assertion
    // would hinge on the target out-scoring its neighbors — the claim
    // here is VISIBILITY (index re-read per batch), not ranking
    val serve = graft.streaming.StreamJobs.bm25LookupStream(
        qIn.toDS().toDF("q_id", "qtext"), idxDir, outDir,
        "q_id", "qtext", "doc_id", k = 1000, stopwordCut = false)
      .option("checkpointLocation", s"$root/ckpt_s").start()
    // the query = the target doc's first tokens; its own doc_id must
    // surface as a hit once (and only once) the doc is ingested
    val qtext = target._2.split("\\s+").take(6).mkString(" ")
    def hits(): Long =
      s.read.parquet(outDir).filter($"doc_id" === target._1).count()
    try {
      qIn.addData(Seq((1L, qtext))); serve.processAllAvailable()
      assert(hits() === 0L, "target retrievable before its ingest?")
      docsIn.addData(Seq(target)); ingest.processAllAvailable()
      qIn.addData(Seq((2L, qtext))); serve.processAllAvailable()
      assert(hits() === 1L,
        "ingested doc not retrievable by the serve's next batch")
    } finally { ingest.stop(); serve.stop() }
  }

  test("ivfPqIngestBatch: replay converges; streamed encode matches full-build codes") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sf0001, "embeddings")
    val dir = tmp("ivfpq")
    val full = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 8, m = 4, ksub = 16, residual = true)
    full.copy(codes = full.codes.filter($"vec_id" % 2 === 0))
      .write(dir)
    full.release()
    val b1 = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding")
    Similarity.ivfPqIngestBatch(b1, dir, "vec_id", "embedding", "r0-0")
    def probe() = Similarity.ivfPqTopKWithIndex(
      emb.filter($"vec_id" % 100 === 0),
      Similarity.readIvfPqIndex(s, dir, "vec_id", "embedding"),
      k = 5, nprobe = 3).orderBy("q_id", "rank").collect().toSeq
    val want = probe()
    // the ingested store's probe equals an all-batch-built store's
    val fullDir = tmp("ivfpq-full")
    val again = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 8, m = 4, ksub = 16, residual = true)
    again.write(fullDir)
    again.release()
    assert(want === Similarity.ivfPqTopKWithIndex(
      emb.filter($"vec_id" % 100 === 0),
      Similarity.readIvfPqIndex(s, fullDir, "vec_id", "embedding"),
      k = 5, nprobe = 3).orderBy("q_id", "rank").collect().toSeq,
      "ingested store diverged from the full build")
    val rows = s.read.parquet(s"$dir/codes.parquet").count()
    Similarity.ivfPqIngestBatch(b1, dir, "vec_id", "embedding", "r0-0")
    assert(s.read.parquet(s"$dir/codes.parquet").count() === rows)
    assert(probe() === want)
  }

  test("minhashIngestBatch: stored-scheme signing, replay converges, pairs match the fresh path") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf0001, "documents")
    val dir = tmp("minhash")
    graft.operators.Dedup.writeMinhashIndex(
      graft.operators.Dedup.minhashIndex(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
        n = 3, numHashes = 16, rowsPerBand = 4), dir)
    val b1 = docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text")
    graft.operators.Dedup.minhashIngestBatch(b1, dir, "doc_id",
      "text", "r0-0")
    def pairs() = graft.operators.Dedup.minhashLshPairsFromIndex(
      graft.operators.Dedup.readMinhashIndex(s, dir, "doc_id", "text",
        n = 3, numHashes = 16, rowsPerBand = 4), threshold = 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    val want = pairs()
    assert(want === graft.operators.Dedup.minhashLshPairs(docs,
      "doc_id", "text", n = 3, numHashes = 16, rowsPerBand = 4,
      threshold = 0.5).orderBy("id_a", "id_b").collect().toSeq,
      "index-derived pairs diverged from the fresh path")
    val rows = s.read.parquet(s"$dir/signed.parquet").count()
    graft.operators.Dedup.minhashIngestBatch(b1, dir, "doc_id",
      "text", "r0-0")
    assert(s.read.parquet(s"$dir/signed.parquet").count() === rows)
    assert(pairs() === want)
    // an index without a params sidecar cannot take streaming ingest
    val fs = fsOf(dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir,
      graft.operators.Dedup.ParamsSidecar), false)
    intercept[java.io.IOException] {
      graft.operators.Dedup.minhashIngestBatch(b1, dir, "doc_id",
        "text", "r0-1")
    }
  }

  test("CorpusProfile.ingestBatch: replay repairs the torn tokens-without-strata state appendOnce documents") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf0001, "documents")
    val dir = tmp("profile")
    graft.operators.CorpusProfile.write(
      graft.operators.CorpusProfile.build(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "lang", "text"),
      dir)
    val b1 = graft.operators.CorpusProfile.build(
      docs.filter($"doc_id" % 2 === 1), "doc_id", "lang", "text")
    graft.operators.CorpusProfile.ingestBatch(b1, dir, "r0-0")
    def stats() = graft.operators.CorpusProfile.stats(
      graft.operators.CorpusProfile.read(s, dir, "lang", "text"))
      .orderBy("lang").collect().toSeq
    val want = stats()
    assert(want === graft.operators.CorpusProfile.stats(
      graft.operators.CorpusProfile.build(docs, "doc_id", "lang",
        "text")).orderBy("lang").collect().toSeq,
      "streamed partials diverged from the direct build")
    // clean replay
    graft.operators.CorpusProfile.ingestBatch(b1, dir, "r0-0")
    assert(stats() === want)
    // the torn state append()'s write order makes detectable — tokens
    // landed, strata did not (crash between the two appends): with
    // plain append a retry double-counts (appendOnce's documented
    // window); the tagged replay purges and converges instead
    val fs = fsOf(dir)
    graft.sources.Sinks.purgeTagged(fs,
      new org.apache.hadoop.fs.Path(s"$dir/strata.parquet"), "r0-0")
    graft.operators.CorpusProfile.ingestBatch(b1, dir, "r0-0")
    assert(stats() === want, "torn-state replay did not converge")
  }

  test("ivfIngestBatch: replay converges; ingested store probes identically to full build") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sf0001, "embeddings")
    val dir = tmp("ivf")
    val full = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nlist = 8)
    full.copy(assigned = full.assigned.filter($"nn_id" % 3 === 0))
      .write(dir)
    val b1 = emb.filter($"vec_id" % 3 === 1)
      .select($"vec_id", $"embedding")
    val b2 = emb.filter($"vec_id" % 3 === 2)
      .select($"vec_id", $"embedding")
    Similarity.ivfIngestBatch(b1, dir, "vec_id", "embedding", "r0-0")
    Similarity.ivfIngestBatch(b2, dir, "vec_id", "embedding", "r0-1")
    def probe() = Similarity.ivfTopKWithIndex(
      emb.filter($"vec_id" % 100 === 0),
      Similarity.readIvfIndex(s, dir, "vec_id", "embedding"),
      k = 5, nprobe = 3).orderBy("q_id", "rank").collect().toSeq
    val want = probe()
    assert(want === Similarity.ivfTopKWithIndex(
      emb.filter($"vec_id" % 100 === 0), full, k = 5, nprobe = 3)
      .orderBy("q_id", "rank").collect().toSeq,
      "ingested store diverged from the full build")
    val rows = s.read.parquet(s"$dir/assigned.parquet").count()
    // replay both batches; row count and probe must not move
    Similarity.ivfIngestBatch(b1, dir, "vec_id", "embedding", "r0-0")
    Similarity.ivfIngestBatch(b2, dir, "vec_id", "embedding", "r0-1")
    assert(s.read.parquet(s"$dir/assigned.parquet").count() === rows)
    assert(probe() === want)
  }
}
