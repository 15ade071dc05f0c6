package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** File sink family mirroring the reference's HDFS writers
  * (samza-hdfs/src/main/scala/.../writer/AvroDataFileHdfsWriter.scala,
  * Bucketer.scala, JobNameDateTimeBucketer.scala): job-named output
  * directories with date-time bucketing.
  *
  * Spark-first mapping: a bucket is a partition directory
  * (`bucket_date=<yyyy-MM-dd-HH>`), so downstream scans with a
  * bucket_date predicate read only the matching directories (partition
  * pruning — asserted in SinksSpec). The reference rolls files by
  * size/time inside a bucket (Bucketer.shouldReBucket); Spark's
  * maxRecordsPerFile plays that role declaratively. */
object Sinks {

  val BucketCol = "bucket_date"

  /** Write `df` under `<outDir>/<jobName>/bucket_date=…/` partitioned
    * by the formatted event time of `tsCol`. Append mode — successive
    * job runs add files to existing buckets, as the reference's
    * append-only HDFS writers do. */
  def writeDateTimeBucketed(df: DataFrame, tsCol: String, outDir: String,
      jobName: String, pattern: String = "yyyy-MM-dd-HH",
      maxRecordsPerFile: Long = 0L): Unit =
    df.withColumn(BucketCol, date_format(col(tsCol), pattern))
      .write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(BucketCol)
      .parquet(s"$outDir/$jobName")

  /** Write `df` as a HASH-BUCKETED catalog table: rows land in
    * `numBuckets` files per partition by `hash(keys) % numBuckets`,
    * sorted by the keys within each bucket. This is the CO-LOCATED
    * JOIN route at real scale — two tables bucketed the same way join
    * WITHOUT a shuffle on either side (SortMergeJoin with zero
    * Exchange; SinksSpec pins the plan), which is how a 100 TB fact
    * table joins a 10 TB fact table without moving either: the
    * "shuffle" was paid once at write time and amortizes over every
    * subsequent join. The reference's analog is Kafka's key
    * partitioning, which Samza relies on for co-partitioned
    * stream-stream joins (same contract: producer-side partitioning
    * buys consumer-side join locality). */
  def writeBucketedTable(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
