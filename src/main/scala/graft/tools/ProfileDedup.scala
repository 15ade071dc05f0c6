package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Dev tool: end-to-end single-action timings of the production dedup
  * operators (no re-implemented pipeline stages — those drift out of
  * sync with the operator and misattribute cost; for stage-level
  * attribution, comment stages out of the operator itself). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.sources.Tables.load(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm codegen/classloading, then measure fresh
    Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).count()
    Dedup.minhashLshPairs(df, "doc_id", "text", 3, 16, 4, 0.5).count()
    spark.catalog.clearCache()

    time("shingleSets materialize") {
      println("  n=" + Dedup.shingleSets(df, "doc_id", "text", 3).count())
    }
    spark.catalog.clearCache()
    time("e2e jaccardPairs single action") {
      println("  n=" + Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).count())
    }
    spark.catalog.clearCache()
    time("e2e jaccardPairs maxPostings=256") {
      println("  n=" + Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5,
        maxPostings = 256).count())
    }
    spark.catalog.clearCache()
    time("e2e minhashLshPairs single action") {
      println("  n=" + Dedup.minhashLshPairs(df, "doc_id", "text", 3,
        16, 4, 0.5).count())
    }
    spark.stop()
  }
}
