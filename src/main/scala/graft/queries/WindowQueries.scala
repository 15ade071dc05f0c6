package graft.queries

import org.apache.spark.sql.functions._

import QHelp._

/** Aggregations and windows (SURVEY §2.4).
  *
  * The reference's SQL GROUP BY is a processing-time tumbling-window
  * COUNT (samza-sql/.../translator/LogicalAggregateTranslator.java:70-78,
  * default 5-minute window). Samza is processing-time-only; on bounded
  * data with end-of-stream flush (WindowOperatorImpl.handleEndOfStream:208)
  * the result is equivalent to an event-time bucket over the full input,
  * which is what we compute — and what the oracle can check.
  *
  * DSL windows (samza-api/.../operators/windows/Windows.java): tumbling
  * and session, fold or collect. Fold → built-in aggregates; session →
  * `session_window` (Spark's gap-merge semantics match: a new session
  * starts when gap ≥ the configured interval).
  */
object WindowQueries extends QueryPack {

  /** 5-min bucket as the oracle computes it (timezone-free). */
  private def oBucket(col: String, secs: Long, alias: String): String =
    s"make_timestamp(CAST(floor(epoch($col)/$secs)*$secs*1000000 AS BIGINT)) AS $alias"

  override def queries: Map[String, Q] = Map(

    // SQL GROUP BY → COUNT, the reference's single SQL aggregate
    // (validateAggregateFunctions:96-107)
    "q_groupby_count" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events").groupBy($"event_type")
          .agg(count(lit(1)).as("cnt"))
      },
      Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type\n")),

    // plan-level SUM/SUM0 (SamzaSqlOperatorTable.java:139-141) — admitted
    // by the operator table; we support it outright.
    "q_groupby_sum" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem").groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sumDec($"l_quantity").as("sum_qty"),
            sumDec($"l_extendedprice").as("sum_price"),
            sumDec($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${oSumDec("l_quantity", "sum_qty")},
              |  ${oSumDec("l_extendedprice", "sum_price")},
              |  ${oSumDec("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")},
              |  count(*) AS count_order
              |FROM lineitem
              |GROUP BY l_returnflag, l_linestatus
              |""".stripMargin)),

    // skew-safe two-phase aggregation (operators.Salting): the group
    // key has only 3 values — the "hot key" shape where one reducer
    // would take the whole table. Salting spreads each key over
    // `factor` partial tasks; exact-decimal partials keep the merged
    // result bit-identical to the plain GROUP BY the oracle runs.
    "q_salted_agg" -> Q(
      (s, d) => {
        import s.implicits._
        graft.operators.Salting.saltedAgg(
          t(s, d, "lineitem"), key = "l_returnflag", factor = 8,
          saltOf = hash($"l_orderkey", $"l_linenumber"),
          partialAggs = Seq(
            "cnt" -> count(lit(1)),
            "qty" -> sum($"l_quantity".cast(
              org.apache.spark.sql.types.DecimalType(30, 6)))),
          mergeAggs = Seq(
            "n_items" -> sum($"cnt"),
            "sum_qty" -> round(sum($"qty"), 2).cast("double")))
      },
      Some(s"""SELECT l_returnflag,
              |  count(*) AS n_items,
              |  ${oSumDec("l_quantity", "sum_qty")}
              |FROM lineitem
              |GROUP BY l_returnflag
              |""".stripMargin)),

    // the faithful SQL-GROUP-BY shape: 5-minute tumbling COUNT keyed by
    // the projected row (LogicalAggregateTranslator.java:70 — window
    // duration samza.sql.groupby.window.ms default 300000)
    "q_tumbling_count_5m" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(window($"ts", "5 minutes"), $"event_type")
          .agg(count(lit(1)).as("cnt"))
          .select($"window.start".as("window_start"), $"event_type", $"cnt")
      },
      Some(s"""SELECT ${oBucket("ts", 300, "window_start")},
              |  event_type, count(*) AS cnt
              |FROM events GROUP BY 1, 2
              |""".stripMargin)),

    // DSL keyedTumblingWindow with fold (Windows.keyedTumblingWindow:128)
    // — 1-hour per-user fold (sum + count)
    "q_tumbling_fold_1h" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(window($"ts", "1 hour"), $"user_id")
          .agg(count(lit(1)).as("n"), sumDec($"value").as("total"))
          .select($"window.start".as("window_start"), $"user_id",
            $"n", $"total")
      },
      Some(s"""SELECT ${oBucket("ts", 3600, "window_start")},
              |  user_id, count(*) AS n, ${oSumDec("value", "total")}
              |FROM events GROUP BY 1, 2
              |""".stripMargin)),

    // DSL keyedSessionWindow (Windows.keyedSessionWindow:259) — 30-min
    // gap sessions per user. Oracle = gaps-and-islands; a new session
    // starts when the gap to the previous event is >= 30 minutes, which
    // matches Spark's session_window merge rule (event extends a session
    // iff it starts before prev_ts + gap).
    "q_session_window_30m" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n"), sumDec($"value").as("total"))
          .select($"session_window.start".as("session_start"),
            $"session_window.end".as("session_end"),
            $"user_id", $"n", $"total")
      },
      Some(s"""WITH flagged AS (
              |  SELECT user_id, ts, value, event_id,
              |    CASE WHEN lag(ts) OVER w IS NULL
              |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              |         THEN 1 ELSE 0 END AS new_s
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |islands AS (
              |  SELECT user_id, ts, value,
              |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                     ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM flagged)
              |SELECT min(ts) AS session_start,
              |       max(ts) + INTERVAL 30 MINUTE AS session_end,
              |       user_id, count(*) AS n, ${oSumDec("value", "total")}
              |FROM islands GROUP BY user_id, sid
              |""".stripMargin))
  )
}
