package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys.
  *
  * AQE's skew-join split handles most runtime skew; salting is the
  * structural fix when one key dominates so heavily that even split
  * partitions overwhelm a task (the "null key" / "power user" shape at
  * 100 TB). Strategy: explode the SMALL side `factor`× (one copy per
  * salt), salt the large side uniformly, join on (key, salt) — each hot
  * key's rows spread over `factor` tasks.
  */
object Salting {

  /** Deterministic uniform salt in [0, factor) derived from the whole
    * row of stable columns — NOT rand(), so retries/replays keep rows in
    * the same partition (at-least-once sinks stay idempotent). */
  def salt(factor: Int, stableCols: Column*): Column =
    pmod(hash(stableCols: _*), lit(factor))

  /** Salted equi-join: `large` ⋈ `small` on `key`, with the large side
    * salted by `saltOf` and the small side replicated once per salt.
    * Output columns = large ++ small (join key deduplicated). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int, saltOf: Column): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(saltOf, lit(factor)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group
    * keys: aggregate per (key, salt) first, then merge the partials.
    * `partialAggs` must be merge-able (sum/count/min/max style). */
  def saltedAgg(df: DataFrame, key: String, factor: Int, saltOf: Column,
      partialAggs: Seq[(String, Column)],
      mergeAggs: Seq[(String, Column)]): DataFrame = {
    val partial = df.withColumn("__salt", pmod(saltOf, lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head._2.as(partialAggs.head._1),
        partialAggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(col(key))
      .agg(mergeAggs.head._2.as(mergeAggs.head._1),
        mergeAggs.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
