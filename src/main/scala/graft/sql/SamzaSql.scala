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

  /** The reference's GROUP BY window knob, same key
    * (SamzaSqlApplicationConfig.java:91; default 300 000 ms at :99):
    * Samza SQL turns every GROUP BY into a tumbling window of this
    * duration, because an unbounded stream can never finish a global
    * aggregate. When the key is present in `config`, graft does the
    * same — the statement's GROUP BY additionally buckets by
    * window(<tsCol>, duration) and the window start is surfaced as
    * `window_start` (the reference leaves the window implicit in
    * emission time; surfacing it is what makes the result a checkable
    * relation). Absent the key, GROUP BY is a plain bounded aggregate
    * — equivalent to the reference at EOS-drain. */
  val CfgGroupByWindowMs = "samza.sql.groupby.window.ms"

  /** Default duration when [[CfgGroupByWindowMs]] is present with no
    * value — the reference's DEFAULT_GROUPBY_WINDOW_DURATION_MS. */
  val DefaultGroupByWindowMs = 300000L

  /** graft extension: which event-time column the GROUP BY window
    * buckets (the reference windows on arrival time, which no oracle
    * can replay; event time is the deterministic analog). */
  val CfgGroupByWindowTsCol = "graft.sql.groupby.window.tscol"

  private val InsertInto =
    """(?is)\s*insert\s+into\s+([A-Za-z_][A-Za-z0-9_.]*)\s+(select\s.+)""".r

  /** Parse one statement; rejects anything that is not INSERT INTO…SELECT
    * (same contract as SamzaSqlQueryParser). */
  def parse(sql: String): Statement = sql match {
    case InsertInto(sink, select) => Statement(sink.trim, select.trim)
    case _ => throw new IllegalArgumentException(
      s"Only INSERT INTO <sink> SELECT … statements are supported, got: $sql")
  }

  private val GroupByClause = "(?is)\\bgroup\\s+by\\b".r
  private val SelectKeyword = "(?is)\\bselect\\b".r

  /** Character positions that sit at parenthesis depth 0, outside
    * single-quoted string literals and outside `--` line comments —
    * the only places the statement's OUTER clause keywords can live.
    * ('' quote-escaping falls out of the close-then-reopen state
    * machine; Spark's default `\'` escape is consumed explicitly so
    * an escaped quote can't desynchronize the literal state; an
    * apostrophe inside a comment can't open a phantom literal.)
    *
    * DIALECT NOTE: the backslash branch matches the parser that
    * EXECUTES these statements — Spark's default (escapedStringLiterals
    * off). The reference's Calcite dialect escapes quotes only by
    * doubling and treats backslash literally
    * (samza-sql/src/main/java/org/apache/samza/sql/translator/
    * QueryTranslator.java parses via Calcite), so a literal ending in
    * a lone backslash ('C:\') would tokenize differently there; since
    * the rewritten text is always handed to Spark, Spark's rules are
    * the correct ones here. If a deployment enables
    * spark.sql.parser.escapedStringLiterals=true (the legacy mode in
    * which backslash IS literal, like Calcite), this branch would
    * need gating on that setting — the default (false) is the
    * escape-interpreting mode this code matches. */
  private def topLevelMask(sql: String): Array[Boolean] = {
    val mask = new Array[Boolean](sql.length)
    var depth = 0
    var inStr = false
    var inComment = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inComment) { if (c == '\n') inComment = false; mask(i) = false }
      else if (inStr) {
        if (c == '\\' && i + 1 < sql.length) { mask(i + 1) = false; i += 1 }
        else if (c == '\'') inStr = false
        mask(i) = false
      } else {
        c match {
          case '\'' => inStr = true
          case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
            inComment = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
        mask(i) = depth == 0 && !inStr && !inComment
      }
      i += 1
    }
    mask
  }

  /** Rewrite the statement's outermost GROUP BY into a tumbling-window
    * GROUP BY: `SELECT p FROM … GROUP BY k` becomes
    * `SELECT window.start AS window_start, p FROM … GROUP BY
    * window(ts, 'D milliseconds'), k`. A statement with NO outer
    * GROUP BY is returned unchanged — the reference's knob windows
    * aggregates only; passthrough statements (including ones whose
    * only GROUP BY is inside a subquery or a string literal) are
    * untouched. The outer clause is found at PARENTHESIS DEPTH 0
    * outside string literals, so a trailing subquery's GROUP BY (in
    * HAVING, or a scalar subquery after the outer clause) is never
    * mistaken for the outer one. More than one depth-0 GROUP BY
    * (set-operation branches) is outside the Samza SQL surface
    * (SamzaSqlQueryParser accepts a single SELECT) and is rejected.
    * Keyword matching is whitespace-insensitive (`GROUP   BY` /
    * newlines between the words are valid SQL). */
  private[graft] def windowedGroupBy(select: String, ms: Long,
      tsCol: String): String = {
    val mask = topLevelMask(select)
    val gbs = GroupByClause.findAllMatchIn(select).toSeq
      .filter(m => mask(m.start))
    if (gbs.isEmpty) return select
    if (gbs.length > 1) throw new IllegalArgumentException(
      "more than one top-level GROUP BY (set operations are outside " +
        s"the Samza SQL surface): $select")
    val gb = gbs.head
    val sel = SelectKeyword.findAllMatchIn(select)
      .find(m => mask(m.start)).getOrElse(
        throw new IllegalArgumentException(s"no SELECT in: $select"))
    val body = select.substring(sel.end, gb.start)
    val keys = select.substring(gb.end)
    select.substring(0, sel.start) +
      s"SELECT window.start AS window_start, " + body.trim + " " +
      s"GROUP BY window($tsCol, '$ms milliseconds'), " + keys.trim
  }

  /** Run one statement against the sf tables: registers sources + UDFs,
    * applies the GROUP BY window rewrite when configured, executes the
    * SELECT (remote-table joins, if any are registered via
    * RemoteSql.registerRemote, plan through the per-message lookup
    * stage), registers the result as the sink view, and returns it. */
  def run(spark: SparkSession, sfDir: String, sql: String,
      config: Map[String, String] = Map.empty): DataFrame = {
    Tables.registerAll(spark, sfDir)
    Udfs.register(spark)
    val stmt = parse(sql)
    val select = config.get(CfgGroupByWindowMs) match {
      case Some(ms) =>
        val dur =
          if (ms.trim.isEmpty) DefaultGroupByWindowMs else ms.trim.toLong
        windowedGroupBy(stmt.select, dur,
          config.getOrElse(CfgGroupByWindowTsCol, "ts"))
      case None => stmt.select
    }
    val out = RemoteSql.select(spark, select)
    out.createOrReplaceTempView(stmt.sink)
    out
  }

  /** Run a multi-statement job in order; returns sink → result. Later
    * statements can reference earlier sinks (intermediate streams). */
  def runAll(spark: SparkSession, sfDir: String, sqls: Seq[String],
      config: Map[String, String] = Map.empty): Map[String, DataFrame] =
    sqls.map { s =>
      val st = parse(s); st.sink -> run(spark, sfDir, s, config)
    }.toMap
}
