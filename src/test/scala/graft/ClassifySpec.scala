package graft

import graft.operators.Classify

/** Hand-computed Naive Bayes classification: Laplace counts, the
  * bit-length log2 quantization, unseen-token smoothing, the
  * label-ascending tie rule, count-cutoff pruning, the persisted
  * model's stored ≡ fresh-over-union invariant, and the cache release
  * contract. */
class ClassifySpec extends SparkSpec {

  // training fixture: class x = "a b a" (1 doc), class y = "c c"
  // (1 doc). V = 3 (a, b, c), D = 2, L = 2.
  //   prior(x) = prior(y) = bitlen(2+2) − bitlen(1+1) = 3 − 2 = 1
  //   n_x = 3 → B_x = bitlen(3+3) = 3;  n_y = 2 → B_y = bitlen(2+3) = 3
  private def fixture(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(("x", "a b a"), ("y", "c c")).toDF("label_in", "text")
  }

  test("trainNb: counts, class priors, vocab from a tiny corpus") {
    val s = spark
    import s.implicits._
    val m = Classify.trainNb(fixture(s), "label_in", "text")
    assert(m.vocab == 3L)
    val c = m.counts.as[(String, String, Long)].collect().toSet
    assert(c == Set(("x", "a", 2L), ("x", "b", 1L), ("y", "c", 2L)))
    val d = m.classes.as[(String, Long)].collect().toSet
    assert(d == Set(("x", 1L), ("y", 1L)))
  }

  test("scoreNb: exact bit costs incl. unseen tokens and priors") {
    val s = spark
    import s.implicits._
    val m = Classify.trainNb(fixture(s), "label_in", "text")
    val docs = Seq(
      (10L, "a c z"), // x: 1 + (3−bitlen 3) + 2 + 2 = 6; y: 1+2+1+2 = 6
      (20L, "c c"))   // x: 1 + 2 + 2 = 5;       y: 1 + 1 + 1 = 3
      .toDF("doc_id", "text")
    val got = Classify.scoreNb(m, docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "x", 3L, 6L, 2000L), (10L, "y", 3L, 6L, 2000L),
      (20L, "x", 2L, 5L, 2500L), (20L, "y", 2L, 3L, 1500L)),
      got.toSeq.sortBy(r => (r._1, r._2)).mkString(", "))
    Classify.releaseNbCache(m)
  }

  test("classifyNb: argmin bits, exact ties broken by label ascending") {
    val s = spark
    import s.implicits._
    val m = Classify.trainNb(fixture(s), "label_in", "text")
    val docs = Seq(
      (10L, "a c z"), // exact 6 = 6 tie → label min = "x"
      (20L, "c c"),   // y wins 3 < 5
      (30L, "a b"))   // x: 1+1+1 = 3; y: 1+2+2 = 5 → x
      .toDF("doc_id", "text")
    val got = Classify.classifyNb(m, docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "x", 3L, 6L, 2000L),
      (20L, "y", 2L, 3L, 1500L),
      (30L, "x", 2L, 3L, 1500L)),
      got.toSeq.sortBy(_._1).mkString(", "))
    Classify.releaseNbCache(m)
  }

  test("trainNb minCount: hapax (label, token) pairs pruned, n re-derived from survivors, vocab and priors stay full") {
    val s = spark
    import s.implicits._
    val m = Classify.trainNb(fixture(s), "label_in", "text",
      minCount = 2L)
    // (x, b, 1) is hapax → pruned; survivors (x, a, 2), (y, c, 2)
    val c = m.counts.as[(String, String, Long)].collect().toSet
    assert(c == Set(("x", "a", 2L), ("y", "c", 2L)))
    assert(m.vocab == 3L, "pruning must not shrink V")
    val d = m.classes.as[(String, Long)].collect().toSet
    assert(d == Set(("x", 1L), ("y", 1L)), "pruning must not touch priors")
    // scoring: n_x is now 2 (re-derived), so B_x = bitlen(2+3) = 3;
    // "b" scores as unseen in x: doc "b" → x: 1 + (3−1) = 3
    val got = Classify.scoreNb(m, Seq((1L, "b")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, "x", 1L, 3L, 3000L), (1L, "y", 1L, 3L, 3000L)))
    Classify.releaseNbCache(m)
  }

  test("stored model: classify bit-identical to fresh train; appends fold exactly; new label visible after its commit; drift flagged; compactAll dispatches") {
    val s = spark
    import s.implicits._
    val batchA = Seq(("x", "a b a"), ("y", "c c")).toDF("label_in", "text")
    val batchB = Seq(("x", "b b d"), ("z", "d d a")).toDF("label_in", "text")
    val docs = Seq((10L, "a c z"), (20L, "c c"), (30L, "d d"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nb-model").toString + "/model"
    // release EVERY model's cache after consuming — the documented
    // caller contract. Skipping it is not just a leak: scoreNb's
    // persist pins a path-keyed plan, so a LATER read of the SAME
    // store dir (post-append, post-compact) would silently substitute
    // the stale InMemoryRelation for the fresh file listing.
    def classified(m: Classify.NbModel) =
      try Classify.classifyNb(m, docs, "doc_id", "text")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      finally Classify.releaseNbCache(m)

    Classify.writeNbModel(batchA, "label_in", "text", dir)
    assert(!Classify.nbDrifted(s, dir), "fresh store drifted?")
    val fresh = Classify.trainNb(batchA, "label_in", "text")
    assert(classified(Classify.readNbModel(s, dir)) == classified(fresh),
      "stored model diverged from fresh train")
    // compacted store = the zero-aggregation fast path
    val fast = Classify.readNbModel(s, dir)
    assert(!fast.counts.queryExecution.analyzed.toString
      .contains("Aggregate"), "fast path re-aggregated counts")

    // O(batch) append with a NEW label z: must equal fresh train on
    // the union, and the new label must be classifiable
    Classify.appendNbModel(batchB, "label_in", "text", dir, "t1")
    assert(Classify.nbDrifted(s, dir), "append left no drift signal")
    val freshU = Classify.trainNb(batchA.union(batchB), "label_in", "text")
    val gotU = classified(Classify.readNbModel(s, dir))
    assert(gotU == classified(freshU),
      "appended store diverged from fresh train over the union")
    assert(gotU.exists(_._2 == "z"),
      "doc 'd d' should classify as the appended label z")
    // replay of a committed tag is a no-op
    Classify.appendNbModel(batchB, "label_in", "text", dir, "t1")
    assert(classified(Classify.readNbModel(s, dir)) == classified(freshU),
      "replayed committed tag changed the model")

    // maintenance: detect the unit, compact, restore the fast path
    val rep = graft.operators.Maintenance.compactAll(s, Seq(dir))
    assert(rep(dir).kind == "nb-model", rep.toString)
    assert(!Classify.nbDrifted(s, dir), "compaction left drift")
    val freshU2 = Classify.trainNb(batchA.union(batchB), "label_in", "text")
    assert(classified(Classify.readNbModel(s, dir)) == classified(freshU2),
      "compacted store diverged from fresh train over the union")
  }

  test("classifyNbWithMargin: winner matches classifyNb; margin = runner-up minus best, 0 on exact ties") {
    val s = spark
    import s.implicits._
    val m = Classify.trainNb(fixture(s), "label_in", "text")
    val docs = Seq(
      (10L, "a c z"), // x = y = 6: tie -> x, margin 0
      (20L, "c c"))   // y 3 vs x 5 -> margin 2
      .toDF("doc_id", "text")
    val got = Classify.classifyNbWithMargin(m, docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "x", 3L, 6L, 2000L, 0L),
      (20L, "y", 2L, 3L, 1500L, 2L)),
      got.toSeq.sortBy(_._1).mkString(", "))
    Classify.releaseNbCache(m)
  }

  test("knnVote: majority label, label-ascending ties, best_rank payload, unlabeled neighbors dropped") {
    val s = spark
    import s.implicits._
    val neighbors = Seq(
      (10L, 1L, 1), (10L, 2L, 2), (10L, 3L, 3), // labels B, A, A -> A
      (20L, 1L, 1), (20L, 4L, 2),               // B vs A tie -> A (asc)
      (30L, 9L, 1))                             // only unlabeled nn
      .toDF("q_id", "nn_id", "rank")
    val labeled = Seq((1L, "B"), (2L, "A"), (3L, "A"), (4L, "A"))
      .toDF("vec_id", "label")
    val got = graft.operators.Classify.knnVote(neighbors, labeled,
        "q_id", "nn_id", "rank", "vec_id", "label")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "A", 2L, 2L), // A wins 2-1; its nearest voter is rank 2
      (20L, "A", 1L, 2L)),// 1-1 tie breaks to label asc; B's rank-1
                          // proximity is visible only via best_rank
      got.toSeq.sortBy(_._1).mkString(", "))
    // query 30 has no labeled neighbor: absent, never a null label
    assert(!got.exists(_._1 == 30L))
  }

  test("cache contract: repeated scoring does not stack entries; releaseNbCache returns storage to baseline") {
    val s = spark
    import s.implicits._
    val docs = Seq((10L, "a b"), (20L, "c a")).toDF("doc_id", "text")
    s.sharedState.cacheManager.clearCache()
    val baseline = s.sparkContext.getPersistentRDDs.size
    val m = Classify.trainNb(fixture(s), "label_in", "text")
    Classify.classifyNb(m, docs, "doc_id", "text").collect()
    val afterOne = s.sparkContext.getPersistentRDDs.size
    assert(afterOne >= baseline, "persist did not register")
    (1 to 3).foreach { _ =>
      Classify.classifyNb(m, docs, "doc_id", "text").collect()
    }
    assert(s.sparkContext.getPersistentRDDs.size == afterOne,
      "repeated classifyNb calls grew the persisted-RDD set")
    Classify.releaseNbCache(m)
    assert(s.sparkContext.getPersistentRDDs.size == baseline,
      "releaseNbCache did not return storage to baseline")
    Classify.releaseNbCache(m) // idempotent
  }
}
