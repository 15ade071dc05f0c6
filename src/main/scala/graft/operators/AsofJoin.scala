package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Horizon-bounded as-of join: for each left row, the single most
  * recent right row with the same key whose timestamp is at or before
  * the left row's, no older than `lookbackMs`. The feature-store /
  * attribution shape ("the last click before this purchase, within an
  * hour").
  *
  * Spark-first design, no window over the full key partition: both
  * sides bucket by floor(ts / lookback); a right row can only serve
  * left rows in its own bucket or the next one, so the right side
  * replicates to exactly TWO buckets and the join key is
  * (key, bucket). A plain per-key window sort would shuffle every row
  * of a hot key into one task — the bucketed form bounds candidates
  * per left row by the key's traffic inside 2·lookback, and skewed
  * keys split across time buckets instead of landing on one task.
  * After the range filter, max(struct(ts, id)) picks the latest match
  * (id as the deterministic tie-break at equal ts) with map-side
  * partial aggregation; unmatched left rows null-extend via the final
  * left join on the left id.
  *
  * Returns left.* plus `asof_id`/`asof_ts` (right id and timestamp of
  * the match, null when none). Ids must be unique per side; `tsCol`
  * must be a timestamp column on both sides.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, leftIdCol: String, right: DataFrame,
      rightIdCol: String, keyCol: String, tsCol: String,
      lookbackMs: Long): DataFrame = {
    require(lookbackMs > 0, "lookbackMs must be positive")
    val lookbackUs = lookbackMs * 1000L

    val l = left.select(col(leftIdCol).as("__lid"), col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__lus"))
    val r = right.select(col(rightIdCol).as("__rid"), col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__rus"))

    val lb = l.withColumn("__b", floor(col("__lus") / lookbackUs))
    // a right row in bucket b serves left rows in buckets b and b+1
    val rb = r.withColumn("__b",
      explode(array(floor(col("__rus") / lookbackUs),
        floor(col("__rus") / lookbackUs) + 1)))

    val best = lb.join(rb, Seq("__k", "__b"))
      .filter(col("__lus") >= col("__rus") &&
        col("__lus") - col("__rus") <= lookbackUs)
      .groupBy(col("__lid"))
      .agg(max(struct(col("__rus"), col("__rid"))).as("__best"))
      .select(col("__lid"), col("__best.__rid").as("asof_id"),
        timestamp_micros(col("__best.__rus")).as("asof_ts"))

    left.join(best.withColumnRenamed("__lid", leftIdCol),
      Seq(leftIdCol), "left_outer")
  }
}
