package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key latest-row selection — the last-write-wins primitive behind
  * table upserts (SendToTableOperatorImpl.java: last write per key wins)
  * and latest-event joins.
  *
  * This is the repo-convention replacement for
  * `row_number().over(Window.partitionBy(keys).orderBy(ord.desc))`:
  * the window form shuffles EVERY row of a key into one task and sorts
  * it before discarding all but one — avoidable sort work on a 100 TB
  * event table, and a straggler on a skewed key. As a BoundedTopK k=1
  * aggregate (plans/TopKAggregate.scala) it runs with map-side partial
  * aggregation (ObjectHashAggregate): each map task retains ONE row per
  * key, the shuffle carries ≤ partitions rows per key, and nothing is
  * ever sorted.
  *
  * The winner is the row with the lexicographically LARGEST `ordCols`
  * tuple (all-desc — matching `orderBy(o1.desc, o2.desc, …)`).
  * Determinism matches the window form: unique `ordCols` tuples per
  * key give a deterministic winner; on exact ties both forms are
  * partition-order dependent. For earliest-wins, negate a numeric
  * order column at the call site.
  */
object Latest {

  /** Returns one row per `keyCols` group: the key columns plus the
    * winning row's `valueCols`, in that order. */
  def latestBy(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    val score = struct(ordCols: _*)
    // tie-break is a constant: the full ordering already lives in the
    // score struct, and duplicating it as the tie field would carry
    // the ordering payload twice through every map-side heap and the
    // shuffle. Exact score ties stay partition-order dependent — same
    // as the row_number window form this replaces.
    df.groupBy(keyCols.map(col): _*)
      .agg(graft.plans.GraftCall(graft.plans.VectorExpressions.TopKName,
        struct(score.as("__ord"), lit(0).as("__tie"),
          struct(valueCols.map(col): _*).as("__v")),
        lit(1)).as("__top"))
      .select(keyCols.map(col) :+ col("__top").getItem(0)
        .getField("__v").as("__v"): _*)
      .select(keyCols.map(col) ++
        valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
