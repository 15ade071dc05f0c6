package graft.queries

import org.apache.spark.sql.functions._

import QHelp._

/** Stream-table joins (SURVEY §2.3) and the DSL stream-stream TTL join
  * (§2.1), re-expressed over bounded tables.
  *
  * Reference envelope (samza-sql/.../translator/JoinTranslator.java:198-245):
  * INNER / LEFT OUTER / RIGHT OUTER, equi-conjunction conditions only,
  * one stream side + one table side. LEFT requires table on the right,
  * RIGHT requires table on the left — mirrored in the shapes below.
  *
  * Scale notes:
  *  - dimension sides (nation/region/supplier/part) are broadcast — no
  *    shuffle of the fact table for those joins;
  *  - fact⋈fact joins (lineitem⋈orders) shuffle on the join key, which
  *    is the partitioning a real deployment would bucket on;
  *  - the TTL join reduces each side to last-value-per-key *before* the
  *    join (PartialJoinOperatorImpl keeps one TimestampedValue per key —
  *    samza-core/.../operators/impl/PartialJoinOperatorImpl.java:84-86),
  *    so the join input is pre-shrunk, never row-multiplying.
  */
object JoinQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    // stream ⋈ table INNER (orders stream, customer table)
    "q_join_inner" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, c_custkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |""".stripMargin)),

    // stream LEFT OUTER table (table on the right, JoinTranslator.java:220-222)
    "q_join_left" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "customer")
          .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
          .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |""".stripMargin)),

    // table RIGHT OUTER stream (table on the left, JoinTranslator.java:225-227)
    "q_join_right" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey", "right_outer")
          .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |""".stripMargin)),

    // multi-way star join with aggregation (TPC-H Q5 shape). Join order
    // is selectivity-first: the region filter cuts customers ~5× before
    // they meet orders, and filtered orders before they meet lineitem —
    // so AQE can broadcast the shrinking side at each step and the fact
    // table is never shuffled. (Catalyst has no CBO join reorder here;
    // writing the order explicitly IS the optimization.)
    "q_join_star_revenue" -> Q(
      (s, d) => {
        import s.implicits._
        val asiaCustomers = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .select($"c_custkey", $"n_name")
        val asiaOrders = t(s, d, "orders")
          .join(asiaCustomers, $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"n_name")
        t(s, d, "lineitem")
          .join(asiaOrders, $"l_orderkey" === $"o_orderkey")
          .groupBy($"n_name")
          .agg(sumDec($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name,
              |  ${oSumDec("l_extendedprice * (1.0 - l_discount)", "revenue")},
              |  count(*) AS n_items
              |FROM lineitem
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation   ON c_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name
              |""".stripMargin)),

    // composite (multi-column) equi-join key — the reference builds a
    // composite RocksDB table key (JoinTranslator.java:176-196); here the
    // shuffle key is the column pair. The aggregated side's cardinality
    // scales WITH the fact table (~591k groups per 600k rows at sf0.1,
    // 59M per 60M at sf10), so it must never be broadcast (without a
    // hint, AQE sees a small byte size at low sf and builds a
    // fact-table-sized broadcast hash table on the driver). The hint is
    // MERGE, not shuffle_hash: a shuffled hash join must FIT its build
    // partition in executor memory, and the sf10 sweep measured that
    // wall directly (SparkOutOfMemoryError "not enough memory to build
    // hash map" at 59M groups / 32 partitions, graft.tools.ProfileJoin)
    // — sort-merge spills instead, costs the same warm at sf0.1
    // (0.86 s vs 0.81 s) and 12.3 s at sf10, and is the only hinted
    // shape that survives an arbitrary scale-up.
    "q_join_composite_key" -> Q(
      (s, d) => {
        import s.implicits._
        val li = t(s, d, "lineitem")
        val ps = li.groupBy($"l_partkey".as("ps_partkey"),
            $"l_suppkey".as("ps_suppkey"))
          .agg(count(lit(1)).as("ps_lines")).hint("merge")
        li.join(ps, $"l_partkey" === $"ps_partkey" &&
            $"l_suppkey" === $"ps_suppkey")
          .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"ps_lines")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             |         count(*) AS ps_lines
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_orderkey, l_partkey, l_suppkey, ps_lines
             |FROM lineitem JOIN ps
             |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
             |""".stripMargin)),

    // BROADCAST operator (MessageStream.broadcast:328): the bounded-table
    // analog — every task sees the full small side; expressed as an
    // explicit broadcast join so no shuffle touches the big side.
    "q_broadcast_dim" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
          .select($"s_suppkey", $"s_name", $"n_name", $"r_name")
      },
      Some("""SELECT s_suppkey, s_name, n_name, r_name
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |""".stripMargin)),

    // stream-stream TTL join (MessageStream.join:185): Samza keeps the
    // LAST value per key on each side and emits on match. Batch analog:
    // reduce each side to latest-per-key, then equi-join.
    // banded range join: events scored into overlapping value bands
    // (bands derived from region so the oracle replays the exact same
    // intervals). Bucketed equi-join — never a nested-loop join.
    "q_range_join" -> Q(
      (s, d) => {
        val bands = t(s, d, "region").select(
          col("r_regionkey").cast("long").as("band_id"),
          greatest(lit(0.0), col("r_regionkey") * 100.0 - 25).as("lo"),
          (col("r_regionkey") * 100.0 + 100).as("hi"))
        graft.operators.RangeJoin.rangeJoin(
            t(s, d, "events").select("event_id", "value"), "value",
            bands, "lo", "hi", bucketWidth = 100.0)
          .select("event_id", "value", "band_id")
      },
      Some("""WITH bands AS (
             |  SELECT CAST(r_regionkey AS BIGINT) AS band_id,
             |    CASE WHEN r_regionkey * 100.0 - 25 < 0 THEN 0
             |         ELSE r_regionkey * 100.0 - 25 END AS lo,
             |    r_regionkey * 100.0 + 100 AS hi
             |  FROM region)
             |SELECT e.event_id, e.value, b.band_id
             |FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
             |""".stripMargin)),

    // horizon-bounded as-of join: for each purchase, the most recent
    // click by the same user within 1 hour (attribution shape). The
    // bucketed plan joins on (user, time-bucket) — never a per-key
    // window sort. Oracle: DuckDB's native ASOF JOIN with the right
    // side deduped per (user, ts) so the tie-break is well defined on
    // both engines; matches older than the horizon null out.
    "q_asof_join" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        graft.operators.AsofJoin.asofJoin(
          ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          "event_id",
          ev.filter(col("event_type") === "click"),
          "event_id", keyCol = "user_id", tsCol = "ts",
          lookbackMs = 3600L * 1000)
      },
      Some("""WITH l AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |r AS (
             |  SELECT user_id, ts, max(event_id) AS r_id FROM events
             |  WHERE event_type = 'click' GROUP BY 1, 2),
             |a AS (
             |  SELECT l.event_id, l.user_id, l.ts,
             |         r.r_id AS m_id, r.ts AS m_ts
             |  FROM l ASOF LEFT JOIN r
             |    ON l.user_id = r.user_id AND l.ts >= r.ts)
             |SELECT event_id, user_id, ts,
             |  CASE WHEN m_ts IS NOT NULL AND ts - m_ts <= INTERVAL 1 HOUR
             |       THEN m_id END AS asof_id,
             |  CASE WHEN m_ts IS NOT NULL AND ts - m_ts <= INTERVAL 1 HOUR
             |       THEN m_ts END AS asof_ts
             |FROM a
             |""".stripMargin)),

    "q_join_stream_stream_ttl" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
        // latest row per key via the bounded-heap aggregate, not a
        // row_number window (repo convention, operators/Latest.scala)
        def latest(tpe: String, idCol: String, valCol: String) =
          graft.operators.Latest.latestBy(
            e.filter($"event_type" === tpe),
            Seq("user_id"), Seq($"ts", $"event_id"),
            Seq("event_id", "value"))
            .select($"user_id", $"event_id".as(idCol), $"value".as(valCol))
        latest("click", "click_id", "click_value")
          .join(latest("view", "view_id", "view_value"), Seq("user_id"))
          .select($"user_id", $"click_id", $"click_value",
            $"view_id", $"view_value")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id AS click_id, value AS click_value,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT user_id, event_id AS view_id, value AS view_value,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE event_type = 'view')
             |SELECT c.user_id, click_id, click_value, view_id, view_value
             |FROM c JOIN v ON c.user_id = v.user_id
             |WHERE c.rn = 1 AND v.rn = 1
             |""".stripMargin)),

    // sendTo(table) upsert (MessageStream.sendTo:298,
    // SendToTableOperatorImpl): last-write-wins materialization per key.
    "q_table_upsert" -> Q(
      (s, d) => {
        import s.implicits._
        graft.operators.Latest.latestBy(t(s, d, "events"),
          Seq("user_id"), Seq($"ts", $"event_id"),
          Seq("event_id", "event_type", "value"))
          .select($"user_id", $"event_id".as("last_event"),
            $"event_type".as("last_type"), $"value".as("last_value"))
      },
      Some("""SELECT user_id, event_id AS last_event,
             |       event_type AS last_type, value AS last_value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |                ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events)
             |WHERE rn = 1
             |""".stripMargin))
  )
}
