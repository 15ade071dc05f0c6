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
}
