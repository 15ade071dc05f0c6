package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** Curation operators: correctness on real tables plus the plan-shape
  * guarantees the 100 TB story rests on (broadcast decontamination,
  * bounded-heap caps, shuffle-free sampling). */
class CurationSpec extends SparkSpec {

  test("decontaminate: broadcast bench side, self-decontamination is total") {
    val s = spark
    val docs = Tables.load(s, sf001, "documents")
    // a corpus decontaminated against itself: every doc with >= 1
    // 4-gram is contaminated (it shares all its grams with itself)
    val self = Curation.decontaminate(docs, docs, "doc_id", "text", n = 4)
    val withGrams = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 4).count()
    assert(self.count() == withGrams)

    val plan = self.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("decontaminate: hit counts are distinct shared grams") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c d e"), (2L, "x y z w q"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "a b c d" and "b c d e"; doc 2 shares nothing
    assert(out == Map(1L -> 2L))
  }

  test("decontaminateBloom: no false negatives, join-free probe plan") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf001, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    val bloom = Curation
      .decontaminateBloom(corpus, bench, "doc_id", "text", 4, fpp = 0.01)
      .as[(Long, Long)].collect().toMap
    // superset, and every exact hit count is fully preserved (bloom
    // can only ADD probable hits, never drop a true gram match)
    exact.foreach { case (id, hits) =>
      assert(bloom.getOrElse(id, 0L) >= hits, s"doc $id lost hits")
    }
    // false-positive mass is gram-level: extra hits across the corpus
    // stay within a small multiple of fpp × probes (docs average ~80
    // grams, so DOC-level inflation is expectedly large at 1% fpp —
    // the operator is a pre-filter whose survivors get the exact pass)
    val probes = corpus
      .select(explode(array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 4))))
      .count()
    val extraHits = bloom.values.sum - exact.values.sum
    assert(extraHits <= (3 * 0.01 * probes).toLong + 10,
      s"extra $extraHits vs probes $probes")
    // the probe is a narrow Filter: no join or broadcast anywhere
    val plan = Curation
      .decontaminateBloom(corpus, bench, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("graft_bloom_contains"), plan)
  }

  test("sampleExactK: exact stratum quota, window-equivalent, deterministic") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf001, "documents")
    val got = Curation.sampleExactK(docs, "lang", "doc_id", k = 20,
      seedCols = Seq("doc_id", "text"))
    val rows = got.as[(String, Long)].collect()
    // every stratum at its quota (all sf0.01 langs have >= 20 docs)
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.length == 20, s"$lang quota ${g.length}")
    }
    // identical to the window form: top-20 by hash desc per lang
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang")
      .orderBy(md5(concat_ws(":", $"doc_id".cast("string"), $"text")).desc)
    val want = docs.select($"lang", $"doc_id",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 20).select($"lang", $"doc_id")
      .as[(String, Long)].collect().toSet
    assert(rows.toSet == want)
  }

  test("sampleStratified: deterministic, rate-bounded, shuffle-free") {
    val s = spark
    val docs = Tables.load(s, sf001, "documents")
    val sampled = Curation.sampleStratified(docs, "lang",
      Map("en" -> 0.25), defaultRate = 1.0, seedCols = Seq("doc_id", "text"))
    // reruns agree row-for-row (hash-based, not rand()-based)
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = sampled.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    // non-en strata pass through untouched; en lands near 25%
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      if (lang == "en") {
        val rate = kept.getOrElse("en", 0L).toDouble / n
        assert(rate > 0.10 && rate < 0.40, s"en rate $rate")
      } else assert(kept.getOrElse(lang, 0L) == n, lang)
    }
    // narrow plan: no exchange anywhere
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("capPerGroup: matches window semantics, runs as ObjectHashAggregate") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf001, "documents")
    val capped = Curation.capPerGroup(docs, "source", "doc_id", k = 10)
    val got = capped.as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val want = docs.select($"source", $"doc_id",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 10).select($"source", $"doc_id")
      .as[(String, Long)].collect().toSet
    assert(got == want)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("packSequences: bins respect budget, shards pack independently") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf001, "documents")
    val packed = Curation.packSequences(docs, "doc_id", "text", "lang",
      budget = 256, numShards = 8)
    val rows = packed
      .select($"lang", $"shard", $"seq_id", $"n_tok", $"doc_id")
      .as[(String, Long, Long, Long, Long)].collect()
    // a doc STARTS in its bin: preceding cumsum within (lang, shard)
    // < (seq_id+1)*budget, and bins are monotone in doc_id order
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._5)
      var cum = 0L
      var lastSeq = -1L
      sorted.foreach { case (_, _, seq, n, _) =>
        assert(seq == cum / 256, s"seq $seq vs cum $cum")
        assert(seq >= lastSeq)
        lastSeq = seq
        cum += n
      }
    }
    // every shard in [0, 8)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
  }

  test("survivors: canonical members kept, non-canonical dropped, disjoint union") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf001, "documents")
    val clusters = graft.operators.Dedup.dupClusters(
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5))
    val surv = Curation.survivors(docs.select("doc_id"), "doc_id", clusters)
      .as[Long].collect().toSet
    val cl = clusters.as[(Long, Long)].collect()
    val dropped = cl.filter { case (d, c) => d != c }.map(_._1).toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(surv == all -- dropped)
    assert(cl.filter { case (d, c) => d == c }.map(_._1).toSet.subsetOf(surv))
  }
}
