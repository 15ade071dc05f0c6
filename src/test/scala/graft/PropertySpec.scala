package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.tables.TableOps

/** Property-style invariants (ScalaCheck generators, fixed seed for
  * reproducibility; small sample counts because each property evaluates
  * through a Spark plan). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("polyHash stays in range and is deterministic") {
    val s = spark
    import s.implicits._
    val words = samples(wordGen, 40).distinct
    val df = words.toDF("w")
      .select(TextFunctions.polyHash(col("w"), 7, 20).as("h"))
    val hs = df.as[Int].collect()
    assert(hs.forall(h => h >= 0 && h < (1 << 20)))
    val hs2 = words.toDF("w")
      .select(TextFunctions.polyHash(col("w"), 7, 20).as("h")).as[Int].collect()
    assert(hs.toSeq == hs2.toSeq)
  }

  test("exact dedup partitions the corpus: sum(copies) == rows, ids unique") {
    val s = spark
    import s.implicits._
    // force duplicates by sampling texts WITH replacement
    val texts = samples(Gen.oneOf(samples(textGen, 8)), 50)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
    val copies = out.agg(sum("copies")).as[Long].collect().head
    assert(copies == 50)
    assert(out.select("doc_id").distinct().count() == out.count())
    // every kept id is the minimum of its digest group
    val kept = out.select(col("doc_id").as("kept_id"), col("digest"))
    val all = df.select(col("doc_id").as("orig_id"),
      md5(col("text")).as("d"))
    val joined = kept.join(all, col("digest") === col("d"))
      .filter(col("orig_id") < col("kept_id"))
    assert(joined.count() == 0)
  }

  test("upsert is idempotent and keeps keys unique") {
    val s = spark
    import s.implicits._
    val baseRows = samples(Gen.zip(Gen.choose(0L, 20L), wordGen), 30)
      .distinctBy(_._1).map { case (k, v) => (k, v, 0L) }
    val updRows = samples(Gen.zip(Gen.choose(0L, 25L), wordGen), 20)
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong + 1) }
    val base = baseRows.toDF("k", "v", "seq")
    val upd = updRows.toDF("k", "v", "seq")

    val once = TableOps.upsert(base, upd, Seq("k"), "seq")
    val twice = TableOps.upsert(once, upd, Seq("k"), "seq")
    assert(once.select("k").distinct().count() == once.count())
    val a = once.as[(Long, String, Long)].collect().toSet
    val b = twice.as[(Long, String, Long)].collect().toSet
    assert(a == b, "upsert must be idempotent")
    // every updated key carries the highest-seq update value
    val latest = updRows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.maxBy(_._3)._2
    }
    val got = a.map(r => r._1 -> r._2).toMap
    latest.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
  }

  test("shingle count is exactly max(0, tokens - n + 1)") {
    val s = spark
    import s.implicits._
    val texts = samples(Gen.listOfN(samples(Gen.choose(1, 6), 1).head,
      wordGen).map(_.mkString(" ")), 1) ++ samples(textGen, 10) ++
      Seq("one", "one two", "one two three")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val counts = df
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("nw"),
        size(TextFunctions.shinglesOfTokens(col("w"), 3)).as("ns"))
      .as[(Long, Int, Int)].collect()
    counts.foreach { case (_, nw, ns) =>
      assert(ns == math.max(0, nw - 2), s"tokens=$nw shingles=$ns")
    }
  }

  private def randomDocs(n: Int) = {
    val s = spark
    import s.implicits._
    samples(textGen, n).zipWithIndex
      .map { case (t, i) => (i.toLong, if (i % 3 == 0) "a" else "b", t) }
      .toDF("doc_id", "lang", "text")
  }

  test("sampleStratified: keep-set is monotone in the rate") {
    val s = spark
    import s.implicits._
    val df = randomDocs(60)
    def keptAt(rate: Double) = graft.operators.Curation
      .sampleStratified(df, "lang", Map("a" -> rate, "b" -> rate),
        defaultRate = 1.0, seedCols = Seq("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    val r25 = keptAt(0.25)
    val r50 = keptAt(0.50)
    val r100 = keptAt(1.0)
    // a row kept at a lower rate is kept at every higher rate (hash
    // thresholding), and rate 1.0 keeps everything
    assert(r25.subsetOf(r50) && r50.subsetOf(r100))
    assert(r100.size == 60)
  }

  test("packSequences: per-bin token sums stay within budget") {
    val s = spark
    import s.implicits._
    val packed = graft.operators.Curation
      .packSequences(randomDocs(80), "doc_id", "text", "lang",
        budget = 40, numShards = 4)
      .select($"lang", $"shard", $"seq_id", $"n_tok", $"doc_id")
      .as[(String, Long, Long, Long, Long)].collect()
    // a bin's CLOSED token mass (docs that START in it, minus the last
    // doc's overhang) never exceeds budget + one doc: equivalently,
    // each doc starts exactly at its predecessor-cumsum bin
    packed.groupBy(r => (r._1, r._2)).foreach { case (_, grp) =>
      var cum = 0L
      grp.sortBy(_._5).foreach { case (_, _, seq, n, _) =>
        assert(seq == cum / 40)
        cum += n
      }
    }
    // every doc is packed exactly once
    assert(packed.map(_._5).distinct.length == 80)
  }

  test("capPerGroup: never exceeds k, keeps exactly the k smallest") {
    val s = spark
    import s.implicits._
    val df = randomDocs(70)
    val capped = graft.operators.Curation
      .capPerGroup(df, "lang", "doc_id", k = 7)
      .as[(String, Long)].collect()
    val byLang = capped.groupBy(_._1)
    byLang.foreach { case (lang, g) =>
      val wantIds = df.filter($"lang" === lang).select("doc_id")
        .as[Long].collect().sorted.take(7).toSet
      assert(g.map(_._2).toSet == wantIds, lang)
      assert(g.length <= 7)
    }
  }
}
