package graft

import graft.queries.Registry

/** Physical-plan discipline: the properties that decide whether a plan
  * survives a 100× scale-up — predicate pushdown into the parquet scan,
  * column pruning, broadcast joins for dims, whole-stage codegen. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = Registry.all(name).run(spark, sf0001)
    df.queryExecution.executedPlan.toString()
  }

  test("scan+filter pushes predicates into the parquet scan") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), "quantity filter not pushed")
  }

  test("scan+filter prunes columns (no full-width read)") {
    val p = plan("q_scan_filter_project")
    // ReadSchema should not include uninvolved columns like l_comment-ish
    assert(!p.contains("l_returnflag"), "unpruned column in scan")
  }

  test("star join broadcasts dimension tables") {
    val p = plan("q_join_star_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("scalar queries stay in whole-stage codegen") {
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    val p = plan("q_scalar_arith")
    assert(p.contains("*(1)"), p)
  }

  test("partition_by produces a single exchange, not more") {
    val p = plan("q_partition_by")
    assert("Exchange".r.findAllIn(p).length <= 1, p)
  }

  test("multimodal decode reads only the payload columns it needs") {
    // the partition-batched decode stage must not drag the full
    // documents schema through the scan: only doc_id + text feed the
    // asset wrapper
    val p = plan("q_multimodal_decode_meta")
    assert(!p.contains("source"), "unpruned column in multimodal scan")
    assert(!p.contains("lang"), "unpruned column in multimodal scan")
  }

  test("composite-key join is sort-merge: spillable at any scale") {
    // the aggregated side's cardinality scales with the fact table, so
    // broadcast would build a fact-sized driver hash table and a
    // shuffled hash join must fit its build partition in executor
    // memory (measured OOM wall at sf10: 59M groups / 32 partitions,
    // ProfileJoin). Sort-merge is the only shape that spills.
    val p = plan("q_join_composite_key")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("exact jaccard never plans a cartesian product or a window") {
    val p = plan("q_dedup_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("IVF probe stage: no window and no corpus-sized nested loop") {
    // centroid assignment and probe selection are NARROW (array
    // argmax over a literal codebook); the only joins are the probe
    // equi-join on cell id and the top-k's aggregation — never a
    // row_number window or a nested-loop corpus scan
    val p = plan("q_ann_ivf_topk")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ObjectHashAggregate"),
      "bounded-heap top-k should run as ObjectHashAggregate\n" + p)
  }

  test("per-group top-k queries aggregate, never window-sort") {
    for (q <- Seq("q_text_top_terms", "q_source_cap", "q_sample_exact_k")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a window\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q lost the heap agg\n$p")
    }
  }

  test("latest-row queries aggregate, never window-sort") {
    // last-write-wins selection runs as the bounded-heap k=1 aggregate
    // (operators/Latest.scala), so no per-key shuffle+sort survives in
    // the plan
    for (q <- Seq("q_table_upsert", "q_join_stream_stream_ttl",
        "q_pipeline_corpus_clean")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a window\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q lost the heap agg\n$p")
    }
  }

  test("kNN vote broadcasts the labeled seed only when the caller vouches for it") {
    // the hint is OPT-IN (round-17 ADVICE): a caller passing the
    // hand-labeled seed — small by construction but usually
    // stats-less — sets broadcastSeed=true and never shuffles the
    // queries×k neighbor frame; the default adds NO hint, so a
    // corpus-cardinality label frame stays under AQE's sizing
    // instead of bypassing autoBroadcastJoinThreshold
    val s = spark
    import s.implicits._
    val neighbors = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1))
      .toDF("q_id", "nn_id", "rank")
    val labeled = Seq((10L, "a"), (11L, "b")).toDF("vec_id", "label")
    val hinted = graft.operators.Classify.knnVote(neighbors, labeled,
      "q_id", "nn_id", "rank", "vec_id", "label", broadcastSeed = true)
    val hp = hinted.queryExecution.executedPlan.toString()
    assert(hp.contains("BroadcastHashJoin"), hp)
    assert(!hp.contains("SortMergeJoin"), hp)
    // default: the logical plan carries no broadcast hint at all —
    // the planner, not the operator, owns the join strategy
    val unhinted = graft.operators.Classify.knnVote(neighbors, labeled,
      "q_id", "nn_id", "rank", "vec_id", "label")
    val hints = unhinted.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, unhinted.queryExecution.analyzed.toString())
  }
}
