package graft.queries

import org.apache.spark.sql.functions._

import graft.sql.SamzaSql
import QHelp._

/** Queries driven through the Samza-SQL surface (INSERT INTO … SELECT
  * parsed by SamzaSql, executed by Spark SQL with the reference UDF set
  * registered), plus collection-operator coverage (ITEM / DOT /
  * CARDINALITY / constructors — SamzaSqlOperatorTable.java:71-108).
  */
object SqlSurfaceQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    // the reference's canonical statement shape, end-to-end through the
    // parser shim (INSERT INTO <sink> SELECT …)
    "q_sql_insert_select" -> Q(
      (s, d) => SamzaSql.run(s, d,
        """INSERT INTO open_orders
          |SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders WHERE o_orderstatus = 'O'""".stripMargin),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_orderstatus = 'O'
             |""".stripMargin)),

    // remote table joined FROM SQL (JoinTranslator.java:279-291): the
    // lookup table is a deterministic pure function of the key, so the
    // oracle replays it as an expression. The WHERE lands below the
    // lookup stage (filter-before-lookup,
    // SamzaSqlFilterRemoteJoinRule.java:51) — asserted by SqlSurfaceSpec
    // with a counting reader.
    "q_sql_remote_join" -> Q(
      (s, d) => {
        graft.sql.RemoteSql.registerRemote(s, "remote_tiers",
          graft.sql.RemoteSql.RemoteTableDef(
            keyCol = "user_id",
            schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("user_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("tier",
                org.apache.spark.sql.types.StringType))),
            reader = new graft.tables.RemoteTable.AsyncReader[Any,
                org.apache.spark.sql.Row] {
              def getAsync(key: Any)(
                  implicit ec: scala.concurrent.ExecutionContext) =
                scala.concurrent.Future.successful(Some(
                  org.apache.spark.sql.Row(
                    "T" + (key.asInstanceOf[Long] % 5))))
            }))
        SamzaSql.run(s, d,
          """INSERT INTO click_tiers
            |SELECT e.user_id, e.event_id, r.tier
            |FROM events e
            |JOIN remote_tiers r ON e.user_id = r.user_id
            |WHERE e.event_type = 'click'""".stripMargin)
      },
      Some("""SELECT user_id, event_id,
             |  'T' || CAST(user_id % 5 AS VARCHAR) AS tier
             |FROM events WHERE event_type = 'click'
             |""".stripMargin)),

    // subquery in FROM (supported by the reference —
    // TestSamzaSqlEndToEnd.java:587)
    "q_sql_subquery" -> Q(
      (s, d) => SamzaSql.run(s, d,
        """INSERT INTO big_spenders
          |SELECT c_custkey, total FROM
          |  (SELECT o_custkey AS c_custkey,
          |          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))),2)
          |               AS DOUBLE) AS total
          |   FROM orders GROUP BY o_custkey)
          |WHERE total > 1000000""".stripMargin),
      Some("""SELECT c_custkey, total FROM
             |  (SELECT o_custkey AS c_custkey,
             |          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))),2)
             |               AS DOUBLE) AS total
             |   FROM orders GROUP BY o_custkey) t
             |WHERE total > 1000000
             |""".stripMargin)),

    // reference UDFs through SQL: RegexMatch (regex-first arg order),
    // ConvertToString, BuildOutputRecord + nested access
    "q_sql_udfs" -> Q(
      (s, d) => SamzaSql.run(s, d,
        """INSERT INTO tagged
          |SELECT doc_id,
          |  RegexMatch('.*stream.*', text) AS has_stream,
          |  ConvertToString(doc_id) AS id_str,
          |  BuildOutputRecord('lang', lang, 'src', source).lang AS rec_lang
          |FROM documents""".stripMargin),
      Some("""SELECT doc_id,
             |  regexp_matches(text, '.*stream.*') AS has_stream,
             |  CAST(doc_id AS VARCHAR) AS id_str,
             |  lang AS rec_lang
             |FROM documents
             |""".stripMargin)),

    // multi-statement job: statement 2 reads statement 1's sink
    // (intermediate stream composition)
    "q_sql_multi_statement" -> Q(
      (s, d) => {
        SamzaSql.runAll(s, d, Seq(
          """INSERT INTO click_events
            |SELECT user_id, value FROM events
            |WHERE event_type = 'click'""".stripMargin,
          """INSERT INTO click_totals
            |SELECT user_id,
            |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))),2) AS DOUBLE)
            |    AS total_value,
            |  COUNT(*) AS n_clicks
            |FROM click_events GROUP BY user_id""".stripMargin
        ))("click_totals")
      },
      Some("""SELECT user_id,
             |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))),2) AS DOUBLE)
             |    AS total_value,
             |  count(*) AS n_clicks
             |FROM events WHERE event_type = 'click'
             |GROUP BY user_id
             |""".stripMargin)),

    // the reference's GROUP BY window knob
    // (samza.sql.groupby.window.ms, SamzaSqlApplicationConfig.java:91;
    // default 300 000 at :99): with the knob set, SQL GROUP BY buckets
    // into tumbling windows of the configured duration — here the
    // 5-minute default, making this the SQL-surface twin of
    // q_tumbling_count_5m's DSL plan
    "q_sql_groupby_windowed" -> Q(
      (s, d) => SamzaSql.run(s, d,
        """INSERT INTO windowed_counts
          |SELECT event_type, COUNT(*) AS cnt
          |FROM events GROUP BY event_type""".stripMargin,
        config = Map(SamzaSql.CfgGroupByWindowMs -> "300000")),
      Some("""SELECT make_timestamp(CAST(floor(epoch(ts)/300)*300*1000000
             |                           AS BIGINT)) AS window_start,
             |  event_type, count(*) AS cnt
             |FROM events GROUP BY 1, 2
             |""".stripMargin)),

    // collection ops: ITEM (a[i]), DOT (record.field), CARDINALITY,
    // ARRAY/ROW constructors
    "q_collections" -> Q(
      (s, d) => {
        import s.implicits._
        val arr = array($"doc_id", $"n_chars")
        val rec = struct($"lang".as("l"), $"source".as("s"))
        t(s, d, "documents").select(
          $"doc_id",
          element_at(arr, 1).as("arr_item"),
          size(arr).cast("long").as("card"),
          rec.getField("l").as("rec_lang"),
          element_at(split($"text", " "), 1).as("first_word"))
      },
      Some("""SELECT doc_id,
             |  [doc_id, n_chars][1] AS arr_item,
             |  len([doc_id, n_chars]) AS card,
             |  struct_pack(l := lang, s := source).l AS rec_lang,
             |  string_split(text, ' ')[1] AS first_word
             |FROM documents
             |""".stripMargin))
  )
}
