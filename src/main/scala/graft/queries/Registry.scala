package graft.queries

/** Single source of truth for the engine's verifiable query inventory.
  * SparkEntry derives both `queries` and `oracleSql` from here. */
object Registry {
  def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    JoinQueries,
    WindowQueries,
    SqlSurfaceQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries)

  lazy val all: Map[String, Q] =
    packs.flatMap(_.queries).toMap
}
