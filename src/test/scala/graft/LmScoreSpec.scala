package graft

import graft.operators.LmScore

/** Hand-computed bigram-LM scoring: Laplace counts, the bit-length
  * log2 quantization, unseen-bigram and unseen-first-word smoothing,
  * and the <2-token exclusion. */
class LmScoreSpec extends SparkSpec {

  test("train: counts, firsts, vocab from a tiny reference") {
    val s = spark
    import s.implicits._
    val ref = Seq((1L, "a b a c")).toDF("id", "text")
    val m = LmScore.train(ref, "text")
    assert(m.vocab == 3L)
    val c12 = m.bigrams.as[(String, String, Long)].collect().toSet
    assert(c12 == Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 1L)))
    val c1 = m.firsts.as[(String, Long)].collect().toSet
    assert(c1 == Set(("a", 2L), ("b", 1L)))
  }

  test("score: exact bit costs incl. unseen bigram / unseen first word") {
    val s = spark
    import s.implicits._
    val m = LmScore.train(Seq((1L, "a b a c")).toDF("id", "text"), "text")
    val docs = Seq(
      (10L, "a b z"), // (a,b): bitlen(2+3)-bitlen(1+1)=3-2=1
                      // (b,z): bitlen(1+3)-bitlen(0+1)=3-1=2
      (20L, "z q"),   // (z,q): bitlen(0+3)-bitlen(0+1)=2-1=1
      (30L, "solo"))  // 1 token: excluded
      .toDF("doc_id", "text")
    val got = LmScore.score(m, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (10L, 2L, 3L, 1500L),
      (20L, 1L, 1L, 1000L)), got.mkString(", "))
  }

  test("stored model: score bit-identical to fresh train; appends fold exactly; drift flagged") {
    val s = spark
    import s.implicits._
    val refA = Seq((1L, "a b a c"), (2L, "b c a b")).toDF("id", "text")
    val refB = Seq((3L, "a b d a")).toDF("id", "text")
    val docs = Seq((10L, "a b z"), (20L, "c a b d"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-model").toString + "/model"
    def scored(m: LmScore.Model) = LmScore.score(m, docs, "doc_id",
      "text").as[(Long, Long, Long, Long)].collect().toSet

    LmScore.writeModel(refA, "text", dir)
    assert(!LmScore.modelDrifted(s, dir), "fresh store drifted?")
    assert(scored(LmScore.readModel(s, dir)) ==
      scored(LmScore.train(refA, "text")),
      "stored model diverged from fresh train")
    // compacted store = the zero-aggregation fast path: both count
    // frames are plain reads (firsts materialized, vocab stamped)
    val fast = LmScore.readModel(s, dir)
    assert(!fast.bigrams.queryExecution.analyzed.toString
      .contains("Aggregate"), "fast path re-aggregated bigrams")
    assert(!fast.firsts.queryExecution.analyzed.toString
      .contains("Aggregate"), "fast path re-aggregated firsts")

    // append refB: stored scoring must equal a fresh train over the
    // UNION — count partials summed, vocab as distinct over both
    // (vocab sizes do NOT add: 'a','b' repeat across batches)
    LmScore.appendModel(refB, "text", dir, tag = "b1")
    assert(LmScore.modelDrifted(s, dir), "append left no drift")
    assert(scored(LmScore.readModel(s, dir)) ==
      scored(LmScore.train(refA.unionByName(refB), "text")),
      "appended model diverged from union train")

    // replayed append of the SAME tag (foreachBatch at-least-once):
    // the purge-first contract makes it converge, not double-count
    LmScore.appendModel(refB, "text", dir, tag = "b1")
    assert(scored(LmScore.readModel(s, dir)) ==
      scored(LmScore.train(refA.unionByName(refB), "text")),
      "replayed append double-counted")

    // compact: same scores, drift cleared
    LmScore.modelCompact(s, dir)
    assert(!LmScore.modelDrifted(s, dir), "compact did not clear drift")
    assert(scored(LmScore.readModel(s, dir)) ==
      scored(LmScore.train(refA.unionByName(refB), "text")),
      "compaction changed the stored model's scores")
  }

  test("reference-like text scores lower than shuffled/junk text") {
    val s = spark
    import s.implicits._
    val ref = (1L to 50L).map(i => (i, "the quick brown fox jumps " +
      "over the lazy dog and the quick red fox runs")).toDF("id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog brown the jumps jumps zzz qqq lazy fox aaa"))
      .toDF("doc_id", "text")
    val sc = LmScore.bitsPerBigram(ref, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(sc(0)._4 < sc(1)._4,
      s"in-domain doc not cheaper: ${sc.mkString(", ")}")
  }

  test("scoreBackoff: OOV garbage ranks worse than a rare known continuation; bigram-only cannot tell them apart; stored model needs no retrain") {
    val s = spark
    import s.implicits._
    // 'the' is a very common FIRST word (c1 large), 'r' a word the
    // reference knows well — but only ever after 'of', never after
    // 'the'. So (the, r) and (the, qx) are BOTH unseen bigrams with
    // the same w1: bigram-only smoothing prices them identically,
    // while backoff's unigram arm sees c2(r) = 150 vs c2(qx) = 0.
    val ref = ((1L to 50L).map(i =>
        (i, "the a the b the c the d the e the f")) ++
      Seq((99L, Seq.fill(150)("of r").mkString(" "))))
      .toDF("id", "text")
    val docs = Seq((1L, "the r"), (2L, "the qx")).toDF("doc_id", "text")
    val m = LmScore.train(ref, "text")

    val plain = LmScore.score(m, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plain(0)._3 == plain(1)._3,
      s"bigram-only should tie these: ${plain.mkString(", ")}")

    val bo = LmScore.scoreBackoff(m, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bo(0)._3 < bo(1)._3,
      s"backoff did not separate OOV from rare: ${bo.mkString(", ")}")
    // least() can only reduce the bigram-only cost, never raise it
    assert(bo(0)._3 <= plain(0)._3 && bo(1)._3 <= plain(1)._3,
      s"backoff raised a cost: ${bo.mkString(", ")} vs ${plain.mkString(", ")}")

    // the unigram arm derives from the stored bigram table — a model
    // written BEFORE backoff existed serves it with no retrain
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-backoff").toString + "/model"
    LmScore.writeModel(ref, "text", dir)
    val stored = LmScore.scoreBackoff(LmScore.readModel(s, dir), docs,
      "doc_id", "text").as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stored.toSeq == bo.toSeq,
      "stored-model backoff diverged from fresh train")
  }

  test("scoreTrigram: exact three-arm costs incl. unseen continuation / unseen context; <3-token exclusion") {
    val s = spark
    import s.implicits._
    // ref "a b c": c123(a,b,c)=1; V=3; N=1; cc12(a,b)=1; b23(b,c)=1;
    // c2x(b)=1; u3(c)=1
    val m = LmScore.trainTrigram(Seq((1L, "a b c")).toDF("id", "text"),
      "text")
    assert(m.vocab == 3L)
    val docs = Seq(
      (10L, "a b c"), // tri arm: bitlen(1+3)-bitlen(1+1) = 3-2 = 1
                      // (bi 1+4, uni 1+8 lose)
      (20L, "a b z"), // tri: bitlen(4)-bitlen(0+1) = 2; bi: b23=0,
                      // c2x(b)=1 -> 3-1+4 = 6; uni: u3=0 -> 10
      (30L, "x y z"), // all-unseen: tri bitlen(0+3)-bitlen(1) = 1
      (40L, "a b"))   // 2 tokens: excluded
      .toDF("doc_id", "text")
    val got = LmScore.scoreTrigram(m, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (10L, 1L, 1L, 1000L),
      (20L, 1L, 2L, 2000L),
      (30L, 1L, 1L, 1000L)), got.mkString(", "))
    LmScore.releaseTrigramCache(m)
  }

  test("scoreTrigram: a distance-2 scramble ties under bigram scoring but ranks worse under trigram context") {
    val s = spark
    import s.implicits._
    // doc2 is doc1 with words at distance 2 exchanged: both carry the
    // bigram MULTISET {aa, ab, ab, ba, bb}, so the bigram scorers
    // CANNOT separate them — but doc2's triple 'b a a' never occurs
    // in the reference.
    val ref = (1L to 50L).map(i => (i, "a a b a b b")).toDF("id", "text")
    val docs = Seq(
      (1L, "a a b a b b"),  // the reference sentence itself
      (2L, "a b a a b b"))  // same bigrams, novel trigram 'b a a'
      .toDF("doc_id", "text")
    val bm = LmScore.train(ref, "text")
    val bi = LmScore.score(bm, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bi(0)._3 == bi(1)._3,
      s"bigram scoring should tie a distance-2 scramble: ${bi.mkString(", ")}")
    val bo = LmScore.scoreBackoff(bm, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bo(0)._3 == bo(1)._3,
      s"bigram backoff should tie a distance-2 scramble: ${bo.mkString(", ")}")
    LmScore.releaseBackoffCache(bm)
    val tm = LmScore.trainTrigram(ref, "text")
    val tri = LmScore.scoreTrigram(tm, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(tri(0)._3 < tri(1)._3,
      s"trigram context did not separate the scramble: ${tri.mkString(", ")}")
    LmScore.releaseTrigramCache(tm)
  }

  test("scoreBackoff: repeated calls on one model pin ONE cache; releaseBackoffCache returns storage to baseline") {
    val s = spark
    import s.implicits._
    val ref = Seq((1L, "a b a c b a")).toDF("id", "text")
    val docs = Seq((10L, "a b"), (20L, "b a c")).toDF("doc_id", "text")
    s.sharedState.cacheManager.clearCache()
    val baseline = s.sparkContext.getPersistentRDDs.size
    val m = LmScore.train(ref, "text")
    LmScore.scoreBackoff(m, docs, "doc_id", "text").collect()
    val afterOne = s.sparkContext.getPersistentRDDs.size
    assert(afterOne >= baseline, "persist did not register")
    // re-scoring against the SAME model must not stack cache entries
    (1 to 3).foreach { _ =>
      LmScore.scoreBackoff(m, docs, "doc_id", "text").collect()
    }
    assert(s.sparkContext.getPersistentRDDs.size == afterOne,
      "repeated scoreBackoff calls grew the persisted-RDD set")
    LmScore.releaseBackoffCache(m)
    assert(s.sparkContext.getPersistentRDDs.size == baseline,
      "releaseBackoffCache did not return storage to baseline")
    // idempotent
    LmScore.releaseBackoffCache(m)
  }

  test("importanceBits pins both models' bigram caches once; releaseDsirCache returns storage to baseline") {
    val s = spark
    import s.implicits._
    val pool = Seq((1L, "a b a c"), (2L, "b a b")).toDF("id", "text")
    val clean = Seq((1L, "a b a b")).toDF("id", "text")
    val docs = Seq((10L, "a b"), (20L, "b a c")).toDF("doc_id", "text")
    s.sharedState.cacheManager.clearCache()
    val baseline = s.sparkContext.getPersistentRDDs.size
    val target = LmScore.train(clean, "text")
    val source = LmScore.train(pool, "text")
    LmScore.importanceBits(target, source, docs, "doc_id", "text")
      .collect()
    val afterOne = s.sparkContext.getPersistentRDDs.size
    assert(afterOne >= baseline, "persist did not register")
    // re-weighting against the SAME model pair must not stack entries
    (1 to 3).foreach { _ =>
      LmScore.importanceBits(target, source, docs, "doc_id", "text")
        .collect()
    }
    assert(s.sparkContext.getPersistentRDDs.size == afterOne,
      "repeated importanceBits calls grew the persisted-RDD set")
    LmScore.releaseDsirCache(target, source)
    assert(s.sparkContext.getPersistentRDDs.size == baseline,
      "releaseDsirCache did not return storage to baseline")
    // idempotent
    LmScore.releaseDsirCache(target, source)
  }

  test("train minCount: hapax bigrams pruned, c1 re-derived from survivors, vocab stays full") {
    val s = spark
    import s.implicits._
    // doc1 "a b a b a c" → (a,b),(b,a),(a,b),(b,a),(a,c); doc2
    // "b a b a b" → (b,a),(a,b),(b,a),(a,b). Totals: (a,b)=4,
    // (b,a)=4, (a,c)=1 (hapax). minCount=2 drops (a,c), so
    // c1(a) = 4 (surviving (a,b) only — NOT 5, the pre-prune mass);
    // V = 3 (a,b,c — pruning must not shrink the denominator)
    val ref = Seq((1L, "a b a b a c"), (2L, "b a b a b")).toDF("id", "text")
    val m = LmScore.train(ref, "text", minCount = 2L)
    val c12 = m.bigrams.as[(String, String, Long)].collect().toSet
    assert(c12 === Set(("a", "b", 4L), ("b", "a", 4L)), c12)
    val c1 = m.firsts.as[(String, Long)].collect().toSet
    assert(c1 === Set(("a", 4L), ("b", 4L)), c1)
    assert(m.vocab === 3L, "pruning must not shrink V")
    // a pruned gram scores exactly as unseen: (a,c) cost =
    // bitlen(c1(a)+V) - bitlen(0+1) = bitlen(7) - 1 = 2
    val sc = LmScore.score(m, Seq((9L, "a c")).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Long, Long)].collect()
    assert(sc.toSeq === Seq((9L, 1L, 2L, 2000L)), sc.mkString(", "))
  }

  test("importanceBits: exact DSIR log2 ratio, both signs; select orders by normalized delta with id tie-break") {
    val s = spark
    import s.implicits._
    // target "a b a c": V=3, c12 ab=ba=ac=1, c1 a=2 b=1
    // source "a b a b": V=2, c12 ab=2 ba=1,   c1 a=2 b=1
    val target = LmScore.train(Seq((1L, "a b a c")).toDF("id", "text"),
      "text")
    val source = LmScore.train(Seq((2L, "a b a b")).toDF("id", "text"),
      "text")
    val docs = Seq(
      (10L, "a b"), // T: bl(5)-bl(2)=1; S: bl(4)-bl(3)=1  -> delta 0
      (20L, "a c"), // T: bl(5)-bl(2)=1; S unseen: bl(4)-1=2 -> +1
      (30L, "z q"), // both unseen first: bl(3)-1=1 / bl(2)-1=1 -> 0
      (40L, "b a")) // T: bl(4)-bl(2)=1; S: bl(3)-bl(2)=0 -> -1
      .toDF("doc_id", "text")
    val got = LmScore.importanceBits(target, source, docs,
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 1L, 1L, 1L, 0L, 0L),
      (20L, 1L, 1L, 2L, 1L, 1000L),
      (30L, 1L, 1L, 1L, 0L, 0L),
      (40L, 1L, 1L, 0L, -1L, -1000L)),
      got.toSeq.sortBy(_._1).mkString(", "))
    // top-2: doc 20 (milli 1000) first, then the 0-milli tie broken
    // by doc_id ascending -> 10, never 30
    val sel = LmScore.dsirSelect(target, source, docs,
        "doc_id", "text", k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(_._1)
    assert(sel.toSeq == Seq(20L, 10L), sel.mkString(", "))
    LmScore.releaseBackoffCache(target)
    LmScore.releaseBackoffCache(source)
  }
}
