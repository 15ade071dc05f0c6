package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: plan + timing comparison for the composite-key join. */
object ProfileJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def current = {
      val ps = li.groupBy($"l_partkey".as("ps_partkey"),
          $"l_suppkey".as("ps_suppkey"))
        .agg(count(lit(1)).as("ps_lines"))
      li.join(ps, $"l_partkey" === $"ps_partkey" &&
          $"l_suppkey" === $"ps_suppkey")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"ps_lines")
    }

    def repartitioned = {
      val liP = li.select($"l_orderkey", $"l_partkey", $"l_suppkey")
        .repartition($"l_partkey", $"l_suppkey")
      val ps = liP.groupBy($"l_partkey".as("ps_partkey"),
          $"l_suppkey".as("ps_suppkey"))
        .agg(count(lit(1)).as("ps_lines"))
      liP.join(ps, $"l_partkey" === $"ps_partkey" &&
          $"l_suppkey" === $"ps_suppkey")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"ps_lines")
    }

    def hinted(h: String) = {
      val ps = li.groupBy($"l_partkey".as("ps_partkey"),
          $"l_suppkey".as("ps_suppkey"))
        .agg(count(lit(1)).as("ps_lines")).hint(h)
      li.join(ps, $"l_partkey" === $"ps_partkey" &&
          $"l_suppkey" === $"ps_suppkey")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"ps_lines")
    }
    def shj = hinted("shuffle_hash")
    def smj = hinted("merge")

    println("  n_groups=" + li.select($"l_partkey", $"l_suppkey")
      .distinct().count())
    current.count() // warm
    time("current broadcast")(println("  n=" + current.count()))
    time("current broadcast 2")(println("  n=" + current.count()))
    time("merge")(println("  n=" + smj.count()))
    time("merge 2")(println("  n=" + smj.count()))
    try {
      time("shuffle_hash")(println("  n=" + shj.count()))
      time("shuffle_hash 2")(println("  n=" + shj.count()))
    } catch {
      case e: Exception =>
        println("[profile] shuffle_hash FAILED: " +
          Option(e.getMessage).getOrElse(e.toString).linesIterator
            .nextOption().getOrElse(e.getClass.getName))
    }
    time("repartitioned")(println("  n=" + repartitioned.count()))
    spark.stop()
  }
}
