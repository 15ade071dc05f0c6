package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded table catalog over the driver-provided parquet datasets.
  *
  * Plays the role of Samza's source/table descriptors
  * (reference: samza-api/.../system/SystemStream*, table/Table.java):
  * a named, partitioned, replayable input. In the Spark frame each
  * table is a parquet scan — column pruning and predicate pushdown are
  * delegated to Catalyst, so callers should NOT pre-select/cache here;
  * the scan must stay lazy for pushdown to reach the file source.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables, safe to broadcast at any scale factor
    * (region/nation are fixed-size; supplier/part/customer grow with SF
    * but stay far below fact tables — at 100 TB lineitem, customer is
    * ~1.5 TB so only region/nation/supplier stay in this set there;
    * the broadcast() hints in queries are applied only to these). */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read the raw int64 and convert ns→µs with
      // integer division (ns-since-epoch ≈ 1.7e18 exceeds double's 2^53
      // exact range, so a floating-point path would corrupt timestamps).
      // DuckDB (the oracle) truncates ns→µs the same way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Weak session keys (like sql.RemoteSql's registry): a stopped /
    * collected session must release its entry instead of being pinned
    * for the life of the JVM. WeakHashMap requires external sync. */
  private val registeredDir: java.util.Map[SparkSession, String] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view for the SQL surface.
    * Memoized on the session's CURRENT dir (re-registering re-reads ten
    * parquet footers, which dominates short SQL statements); switching
    * dirs within a session re-registers so views never point at stale
    * data. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
