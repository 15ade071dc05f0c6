package graft.queries

/** Single source of truth for the engine's verifiable query inventory.
  * SparkEntry derives both `queries` and `oracleSql` from here. */
object Registry {
  def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    JoinQueries,
    WindowQueries,
    StreamParityQueries,
    SqlSurfaceQueries,
    TextQueries,
    ClassifyQueries,
    DedupQueries,
    CurationQueries,
    SimilarityQueries,
    MultimodalQueries,
    LayoutQueries)

  lazy val all: Map[String, Q] = {
    val entries = packs.flatMap(_.queries)
    val dups = entries.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names across packs: ${dups.mkString(", ")} — " +
        "toMap would silently drop the shadowed query from the inventory")
    entries.toMap
  }
}
