package graft.tools

/** Dev tool: print the formatted physical plan of one registry query
  * — the `.explain("formatted")` audit loop (PushedFilters, ReadSchema,
  * WholeStageCodegen spans, exchange count) without editing code.
  * Usage: runMain graft.tools.ExplainOne <sfDir> <name> [name...] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainOne <sfDir> <name> [name...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession("graft-explain",
      master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
