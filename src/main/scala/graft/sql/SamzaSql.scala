package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Udfs
import graft.sources.Tables

/** The reference's SQL entry point re-expressed on Spark SQL.
  *
  * Samza SQL accepts only `INSERT INTO <sink> SELECT …` statements
  * (samza-sql/.../util/SamzaSqlQueryParser.java:100-139; non-INSERT
  * rejected at :131-135), possibly several per job. We parse the same
  * shape, delegate the SELECT to Spark SQL (Catalyst subsumes the
  * reference's 3-rule HEP optimizer — SURVEY §4.1), and register the
  * result under the sink name so later statements of the same job can
  * read it — which is how multi-statement Samza SQL jobs compose.
  */
object SamzaSql {

  final case class Statement(sink: String, select: String)

  private val InsertInto =
    """(?is)\s*insert\s+into\s+([A-Za-z_][A-Za-z0-9_.]*)\s+(select\s.+)""".r

  /** Parse one statement; rejects anything that is not INSERT INTO…SELECT
    * (same contract as SamzaSqlQueryParser). */
  def parse(sql: String): Statement = sql match {
    case InsertInto(sink, select) => Statement(sink.trim, select.trim)
    case _ => throw new IllegalArgumentException(
      s"Only INSERT INTO <sink> SELECT … statements are supported, got: $sql")
  }

  /** Run one statement against the sf tables: registers sources + UDFs,
    * executes the SELECT (remote-table joins, if any are registered via
    * RemoteSql.registerRemote, plan through the per-message lookup
    * stage), registers the result as the sink view, and returns it. */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    Udfs.register(spark)
    val stmt = parse(sql)
    val out = RemoteSql.select(spark, stmt.select)
    out.createOrReplaceTempView(stmt.sink)
    out
  }

  /** Run a multi-statement job in order; returns sink → result. Later
    * statements can reference earlier sinks (intermediate streams). */
  def runAll(spark: SparkSession, sfDir: String,
      sqls: Seq[String]): Map[String, DataFrame] =
    sqls.map { s => val st = parse(s); st.sink -> run(spark, sfDir, s) }.toMap
}
