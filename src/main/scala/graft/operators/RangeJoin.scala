package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: left points against right closed intervals
  * [lo, hi] — the IP-range / score-band / histogram-bin lookup shape.
  *
  * A naive inequality join has no equi-key, so Spark plans a
  * broadcast-nested-loop (or cartesian) — |L|·|R| comparisons, the
  * classic scale-killer the moment the interval table outgrows a
  * broadcast. This operator turns it into an EQUI-join: the number
  * line is cut into `bucketWidth` buckets, each interval replicates
  * to every bucket it touches (ceil(width / bucketWidth) + 1 copies —
  * bounded as long as interval width is), each point hashes to
  * exactly one bucket, and the join key is the bucket; the exact
  * [lo, hi] containment filters after the match. Overlapping
  * intervals yield one output row per containing interval, exactly
  * like the inequality join it replaces.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, valueCol: String, right: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__b",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val rb = right
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__b")
  }
}
