package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Classify, CorpusProfile, LmScore}
import graft.sources.Sinks

/** Crash-interleaving property for the three PARTIALS-DISCIPLINE
  * model stores — the NB classifier model (`Classify.writeNbModel` /
  * `appendNbModel`), the bigram LM model (`LmScore.writeModel` /
  * `appendModel`), and the corpus profile (`CorpusProfile.write` /
  * `ingestBatch`). IngestSpec's generated property pins the
  * appendTagged MANIFEST protocol on a single flat table; these
  * stores layer MULTI-TABLE appends (vocab before counts before
  * classes, unigrams before bigrams, tokens before strata) on top of
  * it, and their enumerated-case specs only reach hand-picked crash
  * points. The property here generates
  * {append, crash-at-(table, k files), replay, read, compact}
  * sequences and asserts the store-level claim the scaladocs make:
  * once every crashed tag has replayed (foreachBatch's at-least-once
  * convergence), read-time aggregation over the store is EXACTLY the
  * fresh-trained model over the union of applied batches — partials
  * collapse once, orphans never leak, compaction changes nothing.
  * Mid-crash the store must still READ without error (the documented
  * well-defined between-state), but equality is only claimed at
  * converged points — a torn multi-table append is mid-write state
  * by design (e.g. vocab committed, counts not).
  */
class ModelStoreCrashSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-msc-$name")
      .toString + "/store"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Deterministic tiny labeled batches. Vocab overlaps across
    * batches on purpose — colliding (label, token) / (w1, w2) /
    * (stratum, token) keys are what make partial-collapse correctness
    * non-trivial. Doc ids are tag-disjoint (the profile's df
    * additivity contract). */
  private def docsOf(tag: Int): Seq[(Long, String, String)] =
    (0 until 3).map { i =>
      val id = tag * 10L + i
      (id, s"l${(tag + i) % 2}",
        s"common w${tag % 3} shared t$i w${(tag + i) % 4} common")
    }

  private def df(tags: Seq[Int]): DataFrame = {
    val s = spark
    import s.implicits._
    tags.flatMap(docsOf).toDF("doc_id", "label", "text")
  }

  /** Adapter over one store. `tables` lists the sub-tables in APPEND
    * COMMIT ORDER (the crash doctor tears at a table boundary:
    * earlier tables committed, the crash table torn, later tables
    * never attempted). */
  private trait StoreOps {
    def name: String
    def tables: Seq[String]
    def create(dir: String, tags: Seq[Int]): Unit
    def append(dir: String, tag: Int): Unit
    def compact(dir: String): Unit
    def canonical(dir: String): Seq[String]
    def fresh(tags: Seq[Int]): Seq[String]
  }

  private object NbStore extends StoreOps {
    val name = "nb"
    val tables =
      Seq("vocabulary.parquet", "counts.parquet", "classes.parquet")
    def create(dir: String, tags: Seq[Int]): Unit =
      Classify.writeNbModel(df(tags), "label", "text", dir)
    def append(dir: String, tag: Int): Unit =
      Classify.appendNbModel(df(Seq(tag)), "label", "text", dir,
        s"t$tag")
    def compact(dir: String): Unit = Classify.nbCompact(spark, dir)
    def canonical(dir: String): Seq[String] =
      canon(Classify.readNbModel(spark, dir))
    def fresh(tags: Seq[Int]): Seq[String] =
      canon(Classify.trainNb(df(tags), "label", "text"))
    private def canon(m: Classify.NbModel): Seq[String] =
      (m.counts.select("label", "token", "c").collect()
          .map(r => s"c|${r.get(0)}|${r.get(1)}|${r.get(2)}").sorted ++
        m.classes.select("label", "d").collect()
          .map(r => s"d|${r.get(0)}|${r.get(1)}").sorted :+
        s"V|${m.vocab}").toSeq
  }

  private object LmStore extends StoreOps {
    val name = "lm"
    val tables = Seq("unigrams.parquet", "bigrams.parquet")
    def create(dir: String, tags: Seq[Int]): Unit =
      LmScore.writeModel(df(tags), "text", dir)
    def append(dir: String, tag: Int): Unit =
      LmScore.appendModel(df(Seq(tag)), "text", dir, s"t$tag")
    def compact(dir: String): Unit = LmScore.modelCompact(spark, dir)
    def canonical(dir: String): Seq[String] =
      canon(LmScore.readModel(spark, dir))
    def fresh(tags: Seq[Int]): Seq[String] =
      canon(LmScore.train(df(tags), "text"))
    private def canon(m: LmScore.Model): Seq[String] =
      (m.bigrams.select("w1", "w2", "c12").collect()
          .map(r => s"b|${r.get(0)}|${r.get(1)}|${r.get(2)}").sorted ++
        m.firsts.select("w1", "c1").collect()
          .map(r => s"f|${r.get(0)}|${r.get(1)}").sorted :+
        s"V|${m.vocab}").toSeq
  }

  private object ProfileStore extends StoreOps {
    val name = "profile"
    val tables = Seq("tokens.parquet", "strata.parquet")
    def create(dir: String, tags: Seq[Int]): Unit =
      CorpusProfile.write(
        CorpusProfile.build(df(tags), "doc_id", "label", "text"), dir)
    def append(dir: String, tag: Int): Unit =
      CorpusProfile.ingestBatch(
        CorpusProfile.build(df(Seq(tag)), "doc_id", "label", "text"),
        dir, s"t$tag")
    def compact(dir: String): Unit = CorpusProfile.compact(spark, dir)
    def canonical(dir: String): Seq[String] =
      canon(CorpusProfile.read(spark, dir, "label", "text"))
    def fresh(tags: Seq[Int]): Seq[String] =
      canon(CorpusProfile.build(df(tags), "doc_id", "label", "text"))
    private def canon(p: CorpusProfile.Profile): Seq[String] = {
      val a = CorpusProfile.aggregated(p)
      (a.strata.select("stratum", "docs", "tokens", "chars").collect()
          .map(r => s"s|${r.get(0)}|${r.get(1)}|${r.get(2)}|${r.get(3)}")
          .sorted ++
        a.tokens.select("stratum", "token", "df", "tf").collect()
          .map(r => s"t|${r.get(0)}|${r.get(1)}|${r.get(2)}|${r.get(3)}")
          .sorted).toSeq
    }
  }

  /** Doctor a fully-applied tag into the crash-at-(table, keep)
    * state: tables after the crash point are purged (the crash
    * happened before their append started), the crash table loses its
    * manifest commit and all but the first `keep` data files —
    * exactly the torn states a kill inside the multi-table append
    * sequence produces. The fast-path stamp is already gone: the real
    * append (which ran first) drops it before any partial lands. */
  private def doctorCrash(store: StoreOps, dir: String, tag: Int,
      table: Int, keep: Int): Unit = {
    val fs = fsOf(dir)
    store.tables.drop(table + 1).foreach { t =>
      Sinks.purgeTagged(fs, new Path(s"$dir/$t"), s"t$tag")
    }
    val tPath = new Path(s"$dir/${store.tables(table)}")
    val m = Sinks.readManifest(fs, tPath).get
    val mine = m.filter(_.startsWith(s"ingest-t$tag-part"))
    Sinks.writeManifestNames(fs, tPath, (m -- mine).toSeq)
    mine.toSeq.sorted.drop(keep)
      .foreach(n => fs.delete(new Path(tPath, n), false))
  }

  private def runProperty(store: StoreOps, cases: Int): Unit = {
    // fresh ground truth memoized by tag set: many generated cases
    // converge to the same applied set, and the fresh train is the
    // expensive half of every check
    val truthMemo =
      scala.collection.mutable.Map.empty[Vector[Int], Seq[String]]
    def truth(tags: Vector[Int]): Seq[String] = {
      val k = tags.sorted
      truthMemo.getOrElseUpdate(k, store.fresh(k))
    }

    sealed trait Op
    case object Append extends Op
    final case class Crash(table: Int, keep: Int) extends Op
    final case class Replay(pick: Int) extends Op
    case object Read extends Op
    case object Compact extends Op

    val opGen: Gen[Op] = Gen.frequency(
      4 -> Gen.const(Append),
      4 -> (for {
        t <- Gen.choose(0, store.tables.size - 1)
        k <- Gen.choose(0, 2)
      } yield Crash(t, k)),
      3 -> Gen.choose(0, 99).map(Replay(_)),
      2 -> Gen.const(Read),
      1 -> Gen.const(Compact))
    val seqGen = Gen.listOfN(5, opGen)

    var interleavings = 0
    (0 until cases).foreach { caseIdx =>
      val ops = seqGen(Gen.Parameters.default, Seed(1717L + caseIdx))
        .getOrElse(fail(s"case $caseIdx: generator produced nothing"))
      val dir = tmp(s"${store.name}$caseIdx")
      var nextTag = 0
      var applied = Vector.empty[Int]
      var crashed = Vector.empty[Int]
      store.create(dir, Seq(nextTag))
      applied :+= nextTag; nextTag += 1

      def replayAll(): Unit = {
        crashed.foreach { t => store.append(dir, t); applied :+= t }
        crashed = Vector.empty
      }
      def check(where: String): Unit =
        assert(store.canonical(dir) === truth(applied),
          s"case $caseIdx ($where): ${store.name} store diverged " +
            "from the fresh-train ground truth")

      ops.foreach {
        case Append =>
          val t = nextTag; nextTag += 1
          store.append(dir, t); applied :+= t
        case Crash(table, keep) =>
          val t = nextTag; nextTag += 1
          store.append(dir, t)
          doctorCrash(store, dir, t, table, keep)
          crashed :+= t
          // mid-crash smoke: the torn store must still read — a
          // well-defined between-state, not necessarily the truth.
          // Sampled (every 4th case): the read is a full collect and
          // would otherwise dominate the property's wall-clock
          if (caseIdx % 4 == 0) { store.canonical(dir); () }
        case Replay(p) =>
          if (crashed.nonEmpty) {
            val t = crashed(p % crashed.size)
            store.append(dir, t)
            crashed = crashed.filterNot(_ == t); applied :+= t
          }
        case Read =>
          // the exactly-once claim is about the CONVERGED store:
          // every crashed tag eventually replays (foreachBatch
          // restart semantics), so converge before comparing
          replayAll(); check("mid-sequence")
        case Compact =>
          // quiesced compaction precondition (the protocol scaladoc):
          // no tag can still replay when the manifests fold away
          replayAll()
          store.compact(dir)
          check("post-compact")
      }
      replayAll(); check("final")
      interleavings += 1
    }
    assert(interleavings >= cases)
  }

  /** Per-store interleaving budget. The FULL 330-case property
    * (3 stores × 110) was the suite's long pole — the round-19
    * driver's `sbt test` hit its time budget mid-ModelStoreCrashSpec
    * and reported a truncated (never-failing) run, so the default is
    * a deterministic PREFIX sample: cases are seeded `1717L +
    * caseIdx`, so the first N are byte-identical to the first N of
    * the full set (all previously proven green), and the full set
    * runs on demand via GRAFT_CRASH_CASES=110 (the nightly arm). */
  private val cases: Int =
    sys.env.getOrElse("GRAFT_CRASH_CASES", "30").toInt

  test("NB model store: generated crash interleavings — converged read ≡ fresh train, exactly once") {
    runProperty(NbStore, cases)
  }

  test("LM model store: generated crash interleavings — converged read ≡ fresh train, exactly once") {
    runProperty(LmStore, cases)
  }

  test("corpus profile store: generated crash interleavings — converged read ≡ fresh build, exactly once") {
    runProperty(ProfileStore, cases)
  }
}
