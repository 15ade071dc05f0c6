package graft.queries

import org.apache.spark.sql.functions._

import QHelp._

/** Scan / project / filter / scalar-function / merge surface.
  *
  * Mirrors the reference's SQL relational operators
  * (samza-sql/.../translator/QueryTranslator.java:230-282 — TableScan,
  * LogicalFilter, LogicalProject) and the whitelisted scalar-function
  * set (samza-sql/.../planner/SamzaSqlOperatorTable.java). All scalars
  * map to codegen'd Spark built-ins; filters and projections stay
  * declarative so Catalyst pushes them into the parquet scan
  * (PushedFilters / ReadSchema pruning — verified via explain in the
  * test suite).
  *
  * Cross-engine alignment notes (Spark vs the DuckDB oracle):
  *  - computed integers are cast to BIGINT on the Spark side (DuckDB
  *    scalar fns return BIGINT);
  *  - DuckDB `dayofweek` is Sunday=0, Spark is Sunday=1 → oracle adds 1;
  *  - DuckDB CAST(double AS INT) rounds, Spark truncates → use
  *    floor()+cast on both sides;
  *  - DuckDB floor/ceil return DOUBLE → oracle casts to BIGINT.
  */
object RelationalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    // §2.2 TableScan + LogicalFilter + LogicalProject
    "q_scan_filter_project" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" < to_timestamp(lit("1996-01-01")) &&
            $"l_quantity" > 10)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 10
             |""".stripMargin)),

    // §2.5 string functions: UPPER LOWER SUBSTRING REPLACE TRIM CONCAT
    // CHAR_LENGTH POSITION INITCAP
    "q_scalar_string" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(
          $"doc_id",
          upper($"source").as("src_up"),
          lower(substring($"text", 1, 16)).as("prefix_lo"),
          length($"text").cast("long").as("n_len"),
          concat($"lang", lit("-"), $"source").as("tag"),
          locate("data", $"text").cast("long").as("pos_data"),
          expr("replace(source, 'src', 's#')").as("src_repl"),
          initcap($"lang").as("lang_cap"),
          trim(concat(lit("  "), $"lang", lit("  "))).as("lang_trim"))
      },
      Some("""SELECT doc_id,
             |  upper(source) AS src_up,
             |  lower(substr(text,1,16)) AS prefix_lo,
             |  length(text) AS n_len,
             |  lang || '-' || source AS tag,
             |  position('data' IN text) AS pos_data,
             |  replace(source, 'src', 's#') AS src_repl,
             |  upper(substr(lang,1,1)) || substr(lang,2) AS lang_cap,
             |  trim('  ' || lang || '  ') AS lang_trim
             |FROM documents
             |""".stripMargin)),

    // §2.5 arithmetic: * / + - MOD POWER ROUND SQRT FLOOR CEIL
    "q_scalar_arith" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem").select(
          $"l_orderkey", $"l_linenumber",
          // exact-decimal arithmetic: the source doubles carry 2-decimal
          // values; casting to DECIMAL first makes the product exact so
          // ROUND has no double tie-breaking ambiguity vs the oracle
          round($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")), 2)
            .cast("double").as("disc_price"),
          round($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")) *
            (lit(1).cast("decimal(18,2)") + $"l_tax".cast("decimal(18,2)")), 2)
            .cast("double").as("charge"),
          ($"l_orderkey" % 7).as("ok_mod"),
          round(pow($"l_quantity", 2), 4).as("qty_sq"),
          round(sqrt($"l_quantity"), 6).as("qty_sqrt"),
          floor($"l_extendedprice").as("price_fl"),
          ceil($"l_extendedprice").as("price_ce"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS disc_price,
             |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (1 - CAST(l_discount AS DECIMAL(18,2))) *
             |       (1 + CAST(l_tax AS DECIMAL(18,2))), 2) AS DOUBLE) AS charge,
             |  l_orderkey % 7 AS ok_mod,
             |  round(power(l_quantity, 2), 4) AS qty_sq,
             |  round(sqrt(l_quantity), 6) AS qty_sqrt,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS price_fl,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ce
             |FROM lineitem
             |""".stripMargin)),

    // §2.5 remainder: OVERLAY, SIMILAR TO (→ rlike), EXTRACT, numeric
    // TRUNCATE, IS [NOT] EMPTY analog, hour/minute/second
    "q_scalar_misc" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events").select(
          $"event_id",
          expr("overlay(event_type placing 'XX' from 2)").as("etype_ov"),
          $"event_type".rlike("^(click|view)$").as("is_cv"),
          hour($"ts").cast("long").as("hr"),
          minute($"ts").cast("long").as("mi"),
          second($"ts").cast("long").as("sec"),
          (floor($"value" * 10) / 10.0).as("val_trunc1"),
          (length($"props") === 0).as("props_empty"))
      },
      Some("""SELECT event_id,
             |  substr(event_type, 1, 1) || 'XX' || substr(event_type, 4)
             |    AS etype_ov,
             |  regexp_matches(event_type, '^(click|view)$') AS is_cv,
             |  extract(hour FROM ts) AS hr,
             |  extract(minute FROM ts) AS mi,
             |  extract(second FROM ts) AS sec,
             |  floor(value * 10) / 10.0 AS val_trunc1,
             |  length(props) = 0 AS props_empty
             |FROM events
             |""".stripMargin)),

    // beyond-reference extension: JSON props extraction (the reference
    // has no JSON functions — SURVEY §2.5 — but a training-data pipeline
    // needs them; q_ext_* marks surface beyond Samza's)
    "q_ext_json" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events").select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("prop_k"))
      },
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
             |FROM events
             |""".stripMargin)),

    // §2.5 temporal: EXTRACT YEAR/QUARTER/MONTH/WEEK/DOY/DOM/DOW,
    // epoch seconds, interval arithmetic (TIMESTAMPADD)
    "q_scalar_temporal" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders").select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          quarter($"o_orderdate").cast("long").as("qtr"),
          month($"o_orderdate").cast("long").as("mth"),
          weekofyear($"o_orderdate").cast("long").as("wk"),
          dayofyear($"o_orderdate").cast("long").as("doy"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          dayofweek($"o_orderdate").cast("long").as("dow"),
          unix_timestamp($"o_orderdate").as("epoch_s"),
          ($"o_orderdate" + expr("INTERVAL 3 DAYS")).as("ship_by"))
      },
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  quarter(o_orderdate) AS qtr,
             |  month(o_orderdate) AS mth,
             |  week(o_orderdate) AS wk,
             |  dayofyear(o_orderdate) AS doy,
             |  day(o_orderdate) AS dom,
             |  dayofweek(o_orderdate) + 1 AS dow,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  o_orderdate + INTERVAL 3 DAY AS ship_by
             |FROM orders
             |""".stripMargin)),

    // §2.5 CASE / LIKE / IN / COALESCE / NULLIF / IS NULL
    "q_case_like_in" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders").select(
          $"o_orderkey",
          when($"o_totalprice" > 300000, "big")
            .when($"o_totalprice" > 150000, "mid")
            .otherwise("small").as("bucket"),
          $"o_orderpriority".like("1%").as("is_urgent"),
          $"o_orderstatus".isin("O", "F").as("known_status"),
          coalesce(expr("nullif(o_orderstatus, 'O')"), lit("OPEN"))
            .as("status_or_open"),
          $"o_orderdate".isNull.as("date_missing"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 300000 THEN 'big'
             |       WHEN o_totalprice > 150000 THEN 'mid'
             |       ELSE 'small' END AS bucket,
             |  o_orderpriority LIKE '1%' AS is_urgent,
             |  o_orderstatus IN ('O','F') AS known_status,
             |  coalesce(nullif(o_orderstatus,'O'), 'OPEN') AS status_or_open,
             |  o_orderdate IS NULL AS date_missing
             |FROM orders
             |""".stripMargin)),

    // §2.5 CAST between the SamzaSqlFieldType lattice
    "q_cast" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem").select(
          $"l_orderkey",
          $"l_linenumber",
          $"l_orderkey".cast("string").as("ok_str"),
          floor($"l_quantity").as("qty_int"),
          $"l_linenumber".cast("double").as("ln_d"),
          $"l_shipdate".cast("date").as("ship_d"),
          $"l_shipdate".cast("date").cast("string").as("ship_s"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(l_orderkey AS VARCHAR) AS ok_str,
             |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
             |  CAST(l_linenumber AS DOUBLE) AS ln_d,
             |  CAST(l_shipdate AS DATE) AS ship_d,
             |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_s
             |FROM lineitem
             |""".stripMargin)),

    // Flatten UDF → project-level array unnest
    // (samza-sql/.../fn/Flatten + ProjectTranslator.translateFlatten:147-172;
    // the reference allows max one flatten per query — same here).
    "q_flatten" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "embeddings")
          .select($"vec_id", explode($"embedding").as("component"))
      },
      Some("""SELECT vec_id, UNNEST(embedding) AS component FROM embeddings
             |""".stripMargin)),

    // MERGE operator (MessageStream.merge:227) — bag union, no dedup
    "q_merge" -> Q(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
        val clicks = e.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"value")
        val views = e.filter($"event_type" === "view")
          .select($"event_id", $"user_id", $"value")
        clicks.union(views)
      },
      Some("""SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
             |UNION ALL
             |SELECT event_id, user_id, value FROM events WHERE event_type = 'view'
             |""".stripMargin)),

    // PARTITION_BY operator (MessageStream.partitionBy:280) — a pure
    // repartition-by-key shuffle; content is unchanged, which is exactly
    // what the oracle checks. At scale this is the explicit exchange
    // that co-locates keys before stateful ops.
    "q_partition_by" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .repartition(32, $"user_id")
          .select($"event_id", $"user_id", $"event_type", $"value")
      },
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |""".stripMargin))
  )
}
