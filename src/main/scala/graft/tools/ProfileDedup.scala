package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev tool: stage-by-stage timing of the jaccard dedup pipeline. */
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

    // warm
    Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).count()
    spark.catalog.clearCache()

    val t = 0.5
    val docs = Dedup.shingleSets(df, "doc_id", "text", 3)
      .withColumn("prefix", slice(col("sh_set"), lit(1),
        (col("sz") - ceil(col("sz") * lit(t)) + lit(1)).cast("int")))
      .persist()
    time("docs materialize")(docs.count())
    val pa = docs.select(col("doc_id").as("id_a"), col("sz").as("psz_a"),
      explode(col("prefix")).as("shingle"))
    val pb = docs.select(col("doc_id").as("id_b"), col("sz").as("psz_b"),
      explode(col("prefix")).as("shingle"))
    val cand = pa.join(pb, "shingle")
      .filter(col("id_a") < col("id_b") &&
        greatest(col("psz_a"), col("psz_b")) * lit(t) <=
          least(col("psz_a"), col("psz_b")))
      .select("id_a", "id_b").distinct().persist()
    time("candidates")(println("  n_cand=" + cand.count()))
    val aSide = docs.select(col("doc_id").as("id_a"),
      col("sh_set").as("set_a"), col("sz").as("sz_a"))
    val bSide = docs.select(col("doc_id").as("id_b"),
      col("sh_set").as("set_b"), col("sz").as("sz_b"))
    val joined = cand.join(aSide, "id_a").join(bSide, "id_b")
    time("join only")(println("  n_join=" + joined.count()))
    val withShared = joined.withColumn("shared", call_function(
      graft.plans.TextExpressions.IntersectCountName,
      col("set_a"), col("set_b")))
    time("join+intersect")(println("  agg=" +
      withShared.agg(sum(col("shared"))).collect()(0)))
    val verified = withShared
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("shared")), 4))
      .filter(col("jaccard") >= t)
    time("verify full")(println("  n_pairs=" + verified.count()))

    spark.catalog.clearCache()
    time("e2e jaccardPairs single action") {
      println("  n=" + Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).count())
    }
    spark.catalog.clearCache()
    time("e2e minhashLshPairs single action") {
      println("  n=" + Dedup.minhashLshPairs(df, "doc_id", "text", 3,
        16, 4, 0.5).count())
    }
    spark.stop()
  }
}
