package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{DenseRank, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, LogicalPlan, Sort, Window}
import org.apache.spark.sql.execution.{FileSourceScanLike, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan linter for the properties that decide whether a query survives
  * a 100× scale-up. The repo's PlanSpec asserts these per-query by
  * hand; `lint` automates the same audit for ANY DataFrame so a
  * pipeline author can gate on it before pointing a job at a 100 TB
  * table — the anti-patterns it flags are precisely the ones this
  * codebase measured walls for (cartesian candidate generation,
  * row_number-latest shuffling+sorting every row of a key, a global
  * window or an unbounded global sort single-tasking the dataset,
  * filters that never reach the parquet scan).
  *
  * Heuristic by design: findings are evidence to read, not proofs.
  * `errors` (the CI-gate subset) carries only the patterns that are
  * wrong at scale in every known use — each `warn`/`info` documents
  * the legitimate uses it can't see.
  */
object ScaleLint {

  /** One finding. `severity` ∈ error | warn | info. */
  case class Finding(code: String, severity: String, detail: String)

  /** Lint a DataFrame's plans. Safe on any analyzable frame; does not
    * execute the query (reads the optimized logical plan and the
    * pre-execution physical plan only). */
  def lint(df: DataFrame): Seq[Finding] = lintExecution(df.queryExecution)

  /** Same checks over an existing QueryExecution — the listener path
    * ([[attach]]) lints the very execution that ran, not a re-planned
    * copy. ScaleLintSpec pins that findings are identical before and
    * after AQE materializes query stages. */
  def lintExecution(
      qe: org.apache.spark.sql.execution.QueryExecution): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    val optimized = qe.optimizedPlan
    // logical checks must also see plans nested inside subquery
    // expressions (a cartesian inside a scalar/IN subquery is just as
    // quadratic, and the physical plan hides it behind an opaque
    // `scalar-subquery#N`)
    val logicalPlans = optimized +: optimized.subqueriesAll
    // physical checks match NODE TYPES, not plan-string markers (which
    // shift across Spark versions and go quiet silently — round-8
    // hardening; ScaleLintSpec's positive-detection tests stay the
    // canaries). The walk descends through the AQE wrapper and any
    // materialized query stages, and into physical subquery plans.
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case other => other.children.flatMap(allNodes)
      }
      (p +: below) ++ p.subqueries.flatMap(allNodes)
    }
    val physNodes = allNodes(qe.executedPlan)

    // --- joins that degenerate to all-pairs -------------------------
    logicalPlans.foreach(_.foreach {
      case j: Join if j.condition.isEmpty || j.joinType == Cross =>
        out += Finding("CARTESIAN", "error",
          "join with no condition (all-pairs): at N rows this is N² — " +
            "block/bucket the candidate space (LSH bands, prefix index, " +
            "range buckets) before pairing")
      case _ => ()
    })
    // AQE/codegen can hide the logical shape; catch the physical
    // operators too (BroadcastNestedLoopJoin is how a conditionless or
    // non-equi join actually executes)
    if (physNodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
      out += Finding("CARTESIAN_PHYSICAL", "error",
        "physical plan contains CartesianProduct")
    if (physNodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]))
      out += Finding("NESTED_LOOP_JOIN", "warn",
        "BroadcastNestedLoopJoin: every task scans the broadcast side " +
          "per row — fine for a tiny constant side, quadratic otherwise")
    // the measured sf10 wall: a ShuffledHashJoin BUILDS a hash map of
    // one partition of the build side in executor memory — unlike
    // sort-merge it cannot spill the build, so data growth turns it
    // into an OOM, not a slowdown (q_join_composite_key died exactly
    // this way at 59M groups and is pinned to merge since). Info, not
    // error: legitimate when the build side is config-bounded (the
    // jaccard verify join's docs×partitions build — documented at its
    // hint site).
    if (physNodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]))
      out += Finding("SHUFFLE_HASH_JOIN", "info",
        "ShuffledHashJoin: the build side's partition must FIT executor " +
          "memory (no spill, unlike sort-merge) — at 100× keys this is " +
          "an OOM, not a slowdown; keep only if the build side is " +
          "provably bounded, else hint merge")

    // --- windows ----------------------------------------------------
    logicalPlans.foreach(_.foreach {
      case w: Window =>
        if (w.partitionSpec.isEmpty)
          out += Finding("GLOBAL_WINDOW", "error",
            "window with no PARTITION BY: every row shuffles into ONE " +
              "task — partition the window or use an aggregate")
        else {
          val ranking = w.windowExpressions.exists(_.exists {
            case we: WindowExpression => we.windowFunction match {
              case _: RowNumber | _: Rank | _: DenseRank => true
              case _ => false
            }
            case _ => false
          })
          if (ranking)
            out += Finding("WINDOW_TOPK", "info",
              "row_number/rank window: if this feeds a rank<=k filter, " +
                "a bounded-heap aggregate (graft_topk / max_by) keeps " +
                "k rows per key through map-side partials instead of " +
                "shuffling and sorting every row of the key " +
                "(operators/Latest.scala; measured 2× at sf10, worse " +
                "with skew)")
        }
      case _ => ()
    })

    // --- global sorts -----------------------------------------------
    // Sort(global=true) without a limit above it sorts the entire
    // dataset through a range exchange. With a limit, Spark plans
    // TakeOrderedAndProject (bounded); without, the full sort runs.
    // Legitimate when producing globally-ordered output files — the
    // warn severity says "check", not "wrong".
    def underLimit(p: LogicalPlan, inLimit: Boolean): Unit = p match {
      case s: Sort if s.global && !inLimit =>
        out += Finding("GLOBAL_SORT", "warn",
          "global ORDER BY with no LIMIT: full-dataset range-partition " +
            "sort; at 100 TB prefer sortWithinPartitions, a bounded " +
            "top-k, or accept the cost knowingly")
        s.children.foreach(underLimit(_, inLimit = false))
      case l: GlobalLimit => l.children.foreach(underLimit(_, inLimit = true))
      case other =>
        // a limit bounds only the sort it directly tops. ALLOWLIST,
        // not denylist: TakeOrderedAndProject matches only
        // Limit(Sort), Limit(Project(Sort)) (with LocalLimit in
        // between) — any other node (Generate, a non-pushable Filter,
        // a join/aggregate/window) keeps the full sort executing
        // below the limit, so the guard resets.
        val keepsGuard =
          other.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project] ||
          other.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalLimit]
        other.children.foreach(underLimit(_, inLimit = inLimit && keepsGuard))
    }
    logicalPlans.foreach(underLimit(_, inLimit = false))

    // --- repeated scans of one relation -----------------------------
    // A DataFrame referenced by several downstream stages recomputes
    // its whole prefix per reference (Spark reuses only IDENTICAL
    // exchanges) — visible as the same file relation scanned many
    // times in one plan. Measured on the composed pretrain chain at
    // sf10: staged boundaries 79.4 s vs the one-plan form's 98.7 s
    // (BASELINE.md round-10 audit). Info, not error: re-scanning a
    // cheap relation is often the RIGHT call — the flag says "check
    // whether the repeated prefix is expensive", and composed
    // pipeline queries in this repo's own registry trip it by design.
    val scanCounts = physNodes
      .collect { case f: FileSourceScanLike =>
        f.relation.location.rootPaths.headOption
          .map(_.toString).getOrElse("<unknown>")
      }
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3)
    scanCounts.foreach { case (path, k) =>
      out += Finding("MULTI_SCAN", "info",
        s"$path scanned $k times in one plan — repeated references " +
          "recompute their prefix per reference; if the shared prefix " +
          "is expensive, persist()/checkpoint the stage boundary " +
          "(measured 1.24x end-to-end on the sf10 pretrain chain)")
    }

    // --- filters that never reach the scan --------------------------
    // Per-scan, per-predicate attribution via the physical tree: each
    // FileSourceScanLike carries ITS OWN dataFilters (the deterministic
    // predicates FileSourceStrategy attributed to that scan); running
    // each through DataSourceStrategy.translateFilter — the exact
    // function the scan itself uses to build PushedFilters — says
    // which predicates execute post-read (UDF or non-convertible).
    // This attributes correctly in multi-scan join plans, which the
    // pre-round-8 plan-string heuristic could not (an empty
    // `PushedFilters: []` in the string doesn't say which scan it
    // belongs to — and a join side never even shows one, because the
    // join's derived IsNotNull(key) always pushes). A non-deterministic
    // filter never enters dataFilters and is invisible here; DSv2
    // BatchScanExec is out of scope (parquet reads plan v1 scans under
    // the default useV1SourceList).
    physNodes.collect { case s: FileSourceScanLike => s }.foreach { s =>
      // metadata can evaluate scalar subqueries pre-execution; a
      // throwing scan is skipped rather than failing the lint
      scala.util.Try {
        val unpushed = s.dataFilters.filter(e =>
          org.apache.spark.sql.graftbridge.PlanBridge
            .translateFilter(e).isEmpty)
        if (unpushed.nonEmpty) {
          val loc = s.metadata.getOrElse("Location", "?").take(120)
          out += Finding("FILTER_NOT_PUSHED", "info",
            s"scan of $loc evaluates ${unpushed.size} of " +
              s"${s.dataFilters.size} filter(s) post-read (UDF or " +
              "non-convertible predicate: " +
              unpushed.map(_.sql).mkString("; ").take(160) + ") — the " +
              "scan reads every row for them; rewrite on raw columns " +
              "or accept the full read")
        }
      }
    }

    // --- shuffle inventory ------------------------------------------
    // node-typed: every ShuffleExchangeExec (hash / range / single /
    // round-robin partitioning) is a real shuffle; a ReusedExchangeExec
    // is a LEAF pointing at an exchange counted where it really runs,
    // so the walk never double-counts it
    val shuffles = physNodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    if (shuffles > 0)
      out += Finding("SHUFFLES", "info",
        s"$shuffles exchange(s) in the physical plan — each is a full " +
          "materialize+transfer of its input; verify none is avoidable " +
          "(broadcast a small side, reuse a partitioning, bucket the table)")

    out.result()
  }

  /** Lint a STARTED streaming query's latest micro-batch plan — the
    * IncrementalExecution with the state-store operators and
    * stream-side exchanges that a batch-expressed analog of the same
    * pipeline cannot show (lint of the analog reads 0 shuffles while
    * the real micro-batch shuffles into its state stores every
    * batch). Run a few batches first (e.g. processAllAvailable on a
    * test feed); returns None before the first batch executes.
    *
    * On top of the shared batch checks, stateful operators get their
    * own inventory finding: state SIZE is streaming's scale axis —
    * every key's state lives in the store across batches, so an
    * unbounded key domain without a watermark/TTL/timeout grows
    * without limit (the streaming analog of the batch cartesian). */
  def lintStreamingQuery(
      q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[Seq[Finding]] =
    org.apache.spark.sql.graftbridge.PlanBridge
      .lastStreamingExecution(q).map { qe =>
        lintExecution(qe) ++ statefulFindings(qe)
      }

  private def statefulFindings(
      qe: org.apache.spark.sql.execution.QueryExecution): Seq[Finding] = {
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    val stateful = allNodes(qe.executedPlan).collect {
      case s: org.apache.spark.sql.execution.streaming.operators.stateful.StatefulOperator =>
        s.getClass.getSimpleName
    }
    val inventory =
      if (stateful.isEmpty) Nil
      else Seq(Finding("STATEFUL_OPS", "info",
        s"${stateful.size} stateful operator(s) in the micro-batch " +
          s"plan (${stateful.distinct.mkString(", ")}) — per-key state " +
          "persists across batches; verify every one is bounded by a " +
          "watermark, TTL, or timeout, or state grows with the key " +
          "domain forever"))
    // the streaming cartesian, mechanically detected: a
    // (flat)mapGroupsWithState operator running NoTimeout has no
    // ENGINE-side expiry path at all — watermarks evict aggregation /
    // dedup / stream-join state, but never (flat)mapGroupsWithState
    // state (only timeouts or the user function's own state.remove
    // do), so a watermark upstream must NOT suppress the flag. A
    // data-path-only eviction design (state.remove on arrival) still
    // flags: its idle keys stay resident forever, which is exactly
    // the growth mode this finding names — such designs carry a
    // documented allowance (tools.LintReport) rather than silence.
    val unbounded = allNodes(qe.executedPlan).collect {
      case f: org.apache.spark.sql.execution.streaming.operators.stateful.flatmapgroupswithstate.FlatMapGroupsWithStateExec
          if f.timeoutConf ==
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout =>
        f.getClass.getSimpleName
    }
    val unboundedFindings =
      if (unbounded.isEmpty) Nil
      else Seq(Finding("STATEFUL_UNBOUNDED", "error",
        s"${unbounded.distinct.mkString(", ")}: state never expires " +
          "engine-side — NoTimeout (flat)mapGroupsWithState state is " +
          "not evicted by watermarks; per-key state grows with the " +
          "key domain forever (the streaming cartesian) unless task " +
          "code removes it, and idle keys persist even then; arm a " +
          "GroupStateTimeout (TTL)"))
    inventory ++ unboundedFindings
  }

  /** The findings a CI gate should fail on. */
  def errors(df: DataFrame): Seq[Finding] =
    lint(df).filter(_.severity == "error")

  /** Human-readable report. */
  def report(df: DataFrame): String = {
    val fs = lint(df)
    if (fs.isEmpty) "clean: no scale findings"
    else fs.map(f => s"[${f.severity}] ${f.code}: ${f.detail}")
      .mkString("\n")
  }

  /** Lint findings from already-executed plans, as a
    * QueryExecutionListener would hand them over ([[attach]]). */
  private final class Listener(onFindings: (String, Seq[Finding]) => Unit)
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private def run(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution): Unit =
      // a throwing lint must never fail the user's action — the
      // listener manager swallows exceptions but logs them noisily
      try {
        val fs = lintExecution(qe)
        if (fs.nonEmpty) onFindings(funcName, fs)
      } catch { case scala.util.control.NonFatal(_) => () }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = run(funcName, qe)
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = run(funcName, qe)
  }

  /** Opt-in runtime audit: every action on `spark` runs the linter
    * over its executed plan and hands non-empty findings to
    * `onFindings(actionName, findings)` (default: one WARN-style line
    * per finding on stderr). This is the production form of the CI
    * gate — a pipeline author sees CARTESIAN/GLOBAL_WINDOW/
    * FILTER_NOT_PUSHED findings the first time a job runs, not after
    * it has burned a cluster-day at 100 TB. Returns the registered
    * listener; pass it to [[detach]] to stop auditing. NOT registered
    * by default — Verify/Bench gates run listener-free. */
  def attach(spark: org.apache.spark.sql.SparkSession,
      onFindings: (String, Seq[Finding]) => Unit = (name, fs) =>
        fs.foreach(f => System.err.println(
          s"[scalelint] $name [${f.severity}] ${f.code}: ${f.detail}")))
      : AnyRef = {
    val l = new Listener(onFindings)
    spark.listenerManager.register(l)
    l
  }

  /** Unregister a listener returned by [[attach]]. */
  def detach(spark: org.apache.spark.sql.SparkSession,
      listener: AnyRef): Unit = listener match {
    case l: Listener => spark.listenerManager.unregister(l)
    case _ => ()
  }
}
