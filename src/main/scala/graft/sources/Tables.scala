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
      // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects — read as raw int64 nanos
      // via the legacy flag and divide; integer division because
      // ns-since-epoch ≈ 1.7e18 exceeds double's 2^53 exact range)
      // AND as TIMESTAMP(MICROS) without UTC adjustment (reads as
      // TIMESTAMP_NTZ). Branch on the type actually read: the round-9
      // regeneration switched the writer to micros and every
      // events-reading query died at analysis on the nanos-only
      // conversion (21 of 75 correctness entries vanished). The
      // session timezone is pinned to UTC (GraftSession), so casting
      // NTZ→TIMESTAMP yields the same instants DuckDB computes with
      // epoch_ms(ts) over the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw // already TIMESTAMP — nothing to normalize
      }
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
    // synchronized on the map, and the memo entry lands only AFTER the
    // views exist: with concurrent callers (Verify's parallel phase) a
    // bare put-then-register let a second thread see the memo hit and
    // run its SQL before the first thread had registered the views
    registeredDir.synchronized {
      if (registeredDir.get(spark) != sfDir) {
        all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, sfDir)
      }
    }
}
