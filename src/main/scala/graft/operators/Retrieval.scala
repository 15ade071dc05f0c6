package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse independently-produced ranked
  * lists (lexical BM25, semantic ANN, any other ranker) into one
  * ranking — the production retrieval pattern for RAG serving and
  * training-data curation, where neither signal alone is enough
  * (BM25 misses paraphrase, embeddings miss rare exact terms).
  *
  * Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * score(d) = Σ_lists 1/(k₀ + rank_list(d)). Rank-based, so the
  * lists' raw scores need no calibration against each other — the
  * property that makes RRF the default fusion everywhere. Here the
  * contribution is quantized to exact integers
  * (`scale DIV (k₀ + rank)`, default 10⁶/(60+r)) so the fused
  * ranking replays bit-for-bit in any engine — the same no-float
  * cross-engine discipline as BM25's quantized idf·tf-norm.
  *
  * Scale shape: each input list is already top-k-per-query (≤ k·|Q|
  * rows — query-batch-sized, corpus never touched here); the union
  * and the (q, id) partial-sum aggregation shuffle only those rows,
  * and the final per-query top-k runs on the bounded-heap aggregate
  * (map-side combine, ≤ k rows per query per task, never a window).
  * Fusing over a 100 TB corpus costs exactly what its per-list
  * retrievals cost; the fusion itself is query-batch-sized. */
object Retrieval {

  /** Recall@k of one ranked list against a reference list — the
    * evaluation operator that turns "the ANN config is good" into a
    * measured number: run the approximate retrieval and the exact
    * baseline over the SAME query sample, then count per query how
    * many of the reference's top-k the candidate found. Returns one
    * row per reference query: (qCol, n_exact, hits, recall_bp) with
    * `recall_bp` = hits·10⁴ / n_exact in integer basis points (exact
    * on every engine — the no-float cross-engine discipline), and
    * `n_exact` the reference's actual list depth (≤ k: a query with
    * fewer than k true neighbors is scored against what exists, not
    * against a padded k). Queries the candidate missed entirely still
    * appear, at hits = 0.
    *
    * Scale shape: both inputs arrive top-k-per-query (query-sample-
    * sized, ≤ k·|Q| rows — at 100 TB the sample is the knob, the
    * corpus is only touched by the retrievals themselves); the semi
    * join and both aggregations shuffle only those rows. */
  def recallAtK(candidate: DataFrame, reference: DataFrame,
      qCol: String, idCol: String, rankCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, "recallAtK: k must be >= 1")
    val a = candidate.filter(col(rankCol) <= k)
      .select(col(qCol).as("q_id"), col(idCol).as("__id"))
    val e = reference.filter(col(rankCol) <= k)
      .select(col(qCol).as("q_id"), col(idCol).as("__id"))
    val base = e.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"))
    val hits = e.join(a, Seq("q_id", "__id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    base.join(hits, Seq("q_id"), "left")
      .select(col("q_id").as(qCol), col("n_exact"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        // integer div, not float /: bit-exact on every engine
        expr("coalesce(hits, 0L) * 10000L div n_exact")
          .as("recall_bp"))
  }

  /** SET recall of one id set against a reference id set — the
    * decon-family analog of [[recallAtK]]: how many of the reference
    * arm's contaminated ids the probe caught, as one row
    * (n_true, n_hit, recall_bp). `recall_bp` is integer basis points
    * (bit-exact on every engine); an empty reference yields 10000 —
    * a probe misses nothing when there is nothing to catch. This is
    * the measurement that turns "the banded SRP probe is good" into
    * a number — the q_ann_recall discipline for unranked sets.
    *
    * Scale shape: both inputs are the HIT sets (contamination is
    * rare by construction — benchmark-sized × threshold-bounded, not
    * corpus-sized); one distinct + one left join + a global agg over
    * those rows. The expensive part is the exact reference arm,
    * which is the measurement's point and runs on a bounded bench
    * ([[graft.operators.Similarity.decontaminateSemanticExact]]). */
  def setRecall(candidate: DataFrame, reference: DataFrame,
      idCol: String): DataFrame = {
    val ref = reference.select(col(idCol)).distinct()
    val cand = candidate.select(col(idCol)).distinct()
      .withColumn("__hit", lit(1L))
    ref.join(cand, Seq(idCol), "left")
      .agg(count(lit(1)).as("n_true"),
        // outer coalesce: a zero-row reference aggregates sum to
        // NULL, and the oracle must read n_hit = 0 there too
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L))
          .cast("long").as("n_hit"))
      .select(col("n_true"), col("n_hit"),
        when(col("n_true") === 0, lit(10000L))
          .otherwise(expr("n_hit * 10000L div n_true"))
          .as("recall_bp"))
  }

  /** The NDCG position weights as milli-integers — round(1000 /
    * log2(i+1)) for positions 1..k — and their prefix sums (the ideal
    * DCG for a query with n relevant results). Computed ONCE in Scala
    * and interpolated as literals into BOTH the Spark plan and the
    * generated oracle SQL, so cross-engine parity never depends on
    * two log() implementations agreeing: the integers ARE the
    * contract (the BM25-idf discipline applied to rank discounting). */
  def ndcgWeights(k: Int): IndexedSeq[Long] =
    (1 to k).map(i =>
      math.round(1000.0 * math.log(2) / math.log(i + 1.0))).toIndexedSeq

  /** Rank-aware retrieval metrics of one ranked list against a
    * reference — [[recallAtK]]'s order-sensitive siblings, per
    * reference query: `first_rank` (candidate rank of the first
    * relevant result; 0 = none found), `mrr_milli` = 1000 DIV
    * first_rank (integer reciprocal rank), and `ndcg_milli` =
    * DCG·1000 DIV idealDCG with the [[ndcgWeights]] milli-integer
    * discount table (relevance is binary: membership in the
    * reference's top-k). Everything integer — the DuckDB oracle
    * replays the weight table verbatim.
    *
    * Scale shape: identical to [[recallAtK]] — both inputs arrive
    * top-k-per-query (≤ k·|Q| rows), the relevance semi join and both
    * aggregations shuffle only those rows; the corpus is touched only
    * by the retrievals themselves. */
  def rankMetricsAtK(candidate: DataFrame, reference: DataFrame,
      qCol: String, idCol: String, rankCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, "rankMetricsAtK: k must be >= 1")
    val w = ndcgWeights(k)
    val cum = w.scanLeft(0L)(_ + _).tail
    // between(1, k), not <= k: ranks are 1-based array indices into
    // the weight table — a malformed rank 0 would throw at runtime
    // and a negative rank would silently index the array from the
    // end, corrupting the DCG. Out-of-domain ranks are dropped on
    // BOTH arms.
    val a = candidate.filter(col(rankCol).between(1, k))
      .select(col(qCol).as("q_id"), col(idCol).as("__id"),
        col(rankCol).cast("long").as("__rank"))
    val e = reference.filter(col(rankCol).between(1, k))
      .select(col(qCol).as("q_id"), col(idCol).as("__id"))
    val base = e.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    val rel = a.join(e, Seq("q_id", "__id"), "left_semi")
    val agg = rel.groupBy(col("q_id")).agg(
      min(col("__rank")).as("__fr"),
      sum(element_at(array(w.map(lit): _*), col("__rank").cast("int")))
        .as("__dcg"))
    base.join(agg, Seq("q_id"), "left")
      // least() clamps a reference list carrying MORE than k rows at
      // rank <= k (duplicate/tied ranks from a sloppy ranker):
      // element_at past the array end would return NULL in non-ANSI
      // Spark and silently null the whole ndcg column
      .withColumn("__idcg", element_at(array(cum.map(lit): _*),
        least(col("n_exact"), lit(k.toLong)).cast("int")))
      .select(col("q_id").as(qCol), col("n_exact"),
        coalesce(col("__fr"), lit(0L)).as("first_rank"),
        expr("CASE WHEN __fr IS NULL THEN 0L ELSE 1000L DIV __fr END")
          .as("mrr_milli"),
        expr("coalesce(__dcg, 0L) * 1000L DIV __idcg").as("ndcg_milli"))
  }

  /** Fuse ranked lists by integer-exact RRF. Each input must carry
    * `qCol`, `idCol`, `rankCol` (rank 1-based within its list; pass
    * each list already truncated to its own top-k — the caller owns
    * per-list depth). Returns (qCol, rank, idCol, rrf_score) with
    * rank 1..k per query, ordered by fused score desc, id asc —
    * deterministic under ties by construction. The id column keeps
    * its native type end-to-end (it rides as the BoundedTopK
    * tie-break field, which accepts any orderable type) — string /
    * UUID doc ids fuse correctly; lists whose id types disagree fail
    * the union's type check instead of silently collapsing. */
  def rrfFuse(lists: Seq[DataFrame], qCol: String, idCol: String,
      rankCol: String, k: Int, k0: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no input lists")
    require(k >= 1 && k0 >= 0 && scale >= 1, "rrfFuse: bad parameters")
    val shaped = lists.map(_.select(
      col(qCol).as("q_id"),
      col(idCol).as("__rid"),
      col(rankCol).cast("long").as("__rank")))
    val union = shaped.reduce(_ unionByName _)
    // integer-quantized reciprocal rank: exact on every engine
    // (DuckDB `scale // (k0 + rank)`), monotone in rank, and at
    // scale=10⁶ distinct through rank ~999 — far past any list depth
    val contrib: Column = expr(s"${scale}L DIV (${k0}L + __rank)")
    val fused = union
      .groupBy(col("q_id"), col("__rid"))
      .agg(sum(contrib).cast("long").as("rrf_score"))
    fused.groupBy(col("q_id"))
      .agg(graft.plans.GraftCall(graft.plans.VectorExpressions.TopKName,
        struct(col("rrf_score"), col("__rid").as("tb")), lit(k))
        .as("__top"))
      .select(col("q_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("q_id").as(qCol),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__e.tb").as(idCol), col("__e.rrf_score").as("rrf_score"))
  }
}
