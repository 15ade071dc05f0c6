package graft

import graft.operators.Retrieval

/** Integer-exact RRF fusion: hand-computed fusion of two small
  * ranked lists, determinism of the tie-break, and the bounded-heap
  * (no window) plan shape. */
class RetrievalSpec extends SparkSpec {

  test("rrfFuse: both-list members outrank single-list members; exact integer scores") {
    val s = spark
    import s.implicits._
    // query 1: doc 10 is rank 1 lexically AND rank 2 semantically;
    // doc 20 only lexical rank 2; doc 30 only semantic rank 1
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("q", "id", "rank")
    val sem = Seq((1L, 30L, 1L), (1L, 10L, 2L)).toDF("q", "id", "rank")
    val fused = Retrieval.rrfFuse(Seq(lex, sem), "q", "id", "rank",
        k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    // contributions: r1 = 1000000/61 = 16393, r2 = 1000000/62 = 16129
    val r1 = 1000000L / 61; val r2 = 1000000L / 62
    assert(fused === Array(
      (1L, 1L, 10L, r1 + r2), // both lists
      (1L, 2L, 30L, r1),      // single rank-1 beats single rank-2
      (1L, 3L, 20L, r2)), fused.mkString(", "))
  }

  test("rrfFuse: score ties break by ascending id, deterministically") {
    val s = spark
    import s.implicits._
    // two docs each rank-1 in exactly one list → identical scores
    val a = Seq((7L, 100L, 1L)).toDF("q", "id", "rank")
    val b = Seq((7L, 50L, 1L)).toDF("q", "id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "q", "id", "rank", k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(fused.map(_._3).toSeq == Seq(50L, 100L), fused.mkString(", "))
    assert(fused.map(_._4).distinct.length == 1)
  }

  test("recallAtK: hand-computed hits, zero-hit queries retained, short reference lists scored at their depth") {
    val s = spark
    import s.implicits._
    // q1: reference {10,20,30}, candidate finds {10,30,99} -> 2/3
    // q2: reference {40,50}, candidate finds {60,70} -> 0/2 (retained)
    // q3: reference {80}, candidate finds {80} -> 1/1
    // rank > k rows on either side must be ignored
    val ref = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 40L, 1L), (2L, 50L, 2L), (3L, 80L, 1L), (3L, 99L, 4L))
      .toDF("q", "id", "rank")
    val cand = Seq((1L, 10L, 1L), (1L, 99L, 2L), (1L, 30L, 3L),
      (2L, 60L, 1L), (2L, 70L, 2L), (3L, 80L, 1L), (1L, 20L, 4L))
      .toDF("q", "id", "rank")
    val got = Retrieval.recallAtK(cand, ref, "q", "id", "rank", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 3L, 2L, 6666L),
      (2L, 2L, 0L, 0L),
      (3L, 1L, 1L, 10000L)), got.mkString(", "))
  }

  test("rankMetricsAtK: hand-computed MRR and NDCG, zero-hit queries retained, weights are the milli-integer table") {
    val s = spark
    import s.implicits._
    // the committed contract: w(i) = round(1000/log2(i+1))
    val w = Retrieval.ndcgWeights(5)
    assert(w === IndexedSeq(1000L, 631L, 500L, 431L, 387L), w)
    // q1: reference {10,20,30}; candidate ranks: 99@1, 10@2, 30@3
    //   first_rank 2, mrr = 1000 DIV 2 = 500
    //   dcg = w(2)+w(3) = 631+500 = 1131; idcg(3) = 1000+631+500 = 2131
    //   ndcg = 1131*1000 DIV 2131 = 530
    // q2: reference {40,50}; candidate misses -> 0/0/0, retained
    // q3: reference {80}; candidate 80@1 -> mrr 1000, ndcg 1000
    // rank > k rows ignored on both sides
    val ref = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 40L, 1L), (2L, 50L, 2L), (3L, 80L, 1L), (3L, 99L, 6L))
      .toDF("q", "id", "rank")
    val cand = Seq((1L, 99L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (2L, 60L, 1L), (3L, 80L, 1L), (1L, 20L, 6L))
      .toDF("q", "id", "rank")
    val got = Retrieval.rankMetricsAtK(cand, ref, "q", "id", "rank",
        k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 3L, 2L, 500L, 530L),
      (2L, 2L, 0L, 0L, 0L),
      (3L, 1L, 1L, 1000L, 1000L)), got.mkString(", "))
  }

  test("rrfFuse carries non-numeric ids natively (no silent long cast)") {
    val s = spark
    import s.implicits._
    // string/UUID-style doc ids: under the old cast-to-long shaping
    // these all became null and every doc collapsed into one group
    val lex = Seq((1L, "doc-a", 1L), (1L, "doc-b", 2L))
      .toDF("q", "id", "rank")
    val sem = Seq((1L, "doc-c", 1L), (1L, "doc-a", 2L))
      .toDF("q", "id", "rank")
    val fused = Retrieval.rrfFuse(Seq(lex, sem), "q", "id", "rank",
      k = 3)
    assert(fused.schema("id").dataType ==
      org.apache.spark.sql.types.StringType, fused.schema.treeString)
    val rows = fused.as[(Long, Long, String, Long)].collect()
      .sortBy(_._2)
    val r1 = 1000000L / 61; val r2 = 1000000L / 62
    assert(rows === Array(
      (1L, 1L, "doc-a", r1 + r2),
      (1L, 2L, "doc-c", r1),
      (1L, 3L, "doc-b", r2)), rows.mkString(", "))
  }

  test("hybridLookupStream excludeSelf drops the lexical self-match and keeps ranks dense") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-hybrid-self").toString
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"),
      (3L, "alpha epsilon zeta"), (4L, "beta gamma eta"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)),
      (3L, Array(0.1f, 1.0f)), (4L, Array(0.8f, 0.3f)))
      .toDF("vec_id", "embedding")
    graft.operators.TextProfile.bm25Index(docs, "doc_id", "text")
      .write(s"$root/bm25")
    graft.operators.Similarity
      .ivfIndex(emb, "vec_id", "embedding", nlist = 2)
      .write(s"$root/ivf")

    def serve(excludeSelf: Boolean, tag: String) = {
      implicit val sqlCtx = s.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Array[Float])]
      val out = s"$root/out-$tag"
      val q = graft.streaming.StreamJobs.hybridLookupStream(
          input.toDS().toDF("q_id", "qtext", "embedding"),
          s"$root/bm25", s"$root/ivf", out, "q_id", "qtext",
          "embedding", docIdCol = "doc_id", vecIdCol = "vec_id",
          k = 3, stopwordCut = false, nprobe = 2,
          excludeSelf = excludeSelf)
        .option("checkpointLocation", s"$root/ckpt-$tag").start()
      try {
        input.addData(Seq((1L, "alpha beta gamma", Array(1.0f, 0.1f))))
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(out).select("q_id", "rank", "doc_id").collect()
    }

    // default: the lexical arm retains the query's own document
    val kept = serve(excludeSelf = false, "keep")
    assert(kept.exists(_.getLong(2) == 1L),
      s"default serve lost the self doc: ${kept.mkString(", ")}")
    // excludeSelf: gone from BOTH arms, and the fused ranks stay
    // dense 1..n (the lexical gap closed before fusion)
    val excl = serve(excludeSelf = true, "excl")
    assert(excl.nonEmpty && !excl.exists(_.getLong(2) == 1L),
      s"self doc survived excludeSelf: ${excl.mkString(", ")}")
    assert(excl.map(_.getLong(1)).sorted.toSeq ==
      (1L to excl.length).toSeq, excl.mkString(", "))
  }

  test("rrfFuse plans the bounded-heap aggregate, not a rank window") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 2L, 1L)).toDF("q", "id", "rank")
    val plan = Retrieval.rrfFuse(Seq(l, l), "q", "id", "rank", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("boundedtopk") || plan.contains("BoundedTopK")
      || plan.contains("graft_topk"), plan)
  }
}
