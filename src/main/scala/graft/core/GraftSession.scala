package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Mirrors the role of Samza's container/config bootstrap
  * (reference: samza-core/.../container/SamzaContainer — config-driven
  * runtime wiring), re-expressed as Spark session conf. Tuned for
  * local[N] testing but with settings that carry to a real cluster:
  * AQE on (runtime re-planning, skew-join handling), shuffle
  * partitions sized to the env, UTC session time.
  */
object GraftSession {
  def apply(appName: String = "graft",
            master: Option[String] = None,
            shufflePartitions: Option[Int] = None): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.map(_.toString).getOrElse(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    master.orElse(sys.env.get("SPARK_GRAFT_MASTER")).foreach(b.master)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
