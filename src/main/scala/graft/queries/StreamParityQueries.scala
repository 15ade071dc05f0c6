package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{Choosers, StreamHarness, StreamWindows, TaskRunner,
  TtlJoin}
import QHelp._

/** Oracle coverage for the FAITHFUL streaming implementations
  * (SURVEY §2.4/§2.8/§3.3): StreamWindows.keyedTumblingFold,
  * TtlJoin.join and TaskRunner.run executed as REAL streaming queries —
  * MemoryStream micro-batches, flatMapGroupsWithState state crossing
  * batch boundaries, injected clock — with results a DuckDB batch
  * oracle reproduces row-for-row. The batch-mode analogs of these
  * operators were already hash-gated; these entries put the stateful
  * streaming code paths themselves in front of the gate (reference
  * behavior: WindowOperatorImpl.java:129-165 pane lifecycle,
  * PartialJoinOperatorImpl.java:84-90 last-value TTL join,
  * StreamTask.java:49 process loop).
  *
  * Inputs are fed in event-time order, bucketed into several
  * micro-batches, so each query exercises cross-batch state. All
  * folded values are integers (counts, floor(value*100) sums), so
  * results are order-free and exact on both engines.
  */
object StreamParityQueries extends QueryPack {

  /** 7-day tumbling window; batches are half-window buckets so every
    * pane accumulates across two micro-batch invocations. */
  private val WeekMs = 604800000L
  /** 5-day feed buckets for the join/task queries (6 batches over the
    * 30-day events span). */
  private val FeedMs = 432000000L

  override def queries: Map[String, Q] = Map(

    // keyedTumblingFold driven as a stream: per-user 7-day panes,
    // fold = (count, Σ floor(value*100)); panes flush as DEFAULT
    // firings when the injected clock passes window close
    // (WindowOperatorImpl pane close; handleEndOfStream:208 analog is
    // the final flush batch)
    "q_stream_tumbling_fold" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = t(s, d, "events")
          .select($"user_id", unix_millis($"ts").as("tms"), $"value")
          .as[(Long, Long, Double)].collect().sortBy(r => (r._2, r._1))
        val half = WeekMs / 2
        val steps = rows.groupBy(_._2 / half).toSeq.sortBy(_._1)
          .map { case (b, evs) => (b * half, evs.toSeq) }
        // flush: a clock-only step past every window close; the
        // harness's watermark tick delivers event-time timeouts to
        // every user's state and the injected clock expires every open
        // pane (EOS flush analog, WindowOperatorImpl
        // .handleEndOfStream:208) — no dummy data rows involved
        val flushAt = rows.map(_._2).max + 2 * WeekMs
        val flush = (flushAt, Seq.empty[(Long, Long, Double)])
        val cfg = StreamWindows.WindowConfig(intervalMs = WeekMs)
        val out = StreamHarness.runWithTicks(s, steps :+ flush,
          sentinel = (0L, 0L, 0.0)) { ds =>
          StreamWindows.keyedTumblingFold[
            StreamHarness.Ticked[(Long, Long, Double)], Long, (Long, Long)](
            ds, _._1._1, (0L, 0L),
            (a, e) => (a._1 + 1, a._2 + math.floor(e._1._3 * 100).toLong),
            cfg, StreamHarness.clock,
            timeout = org.apache.spark.sql.streaming.GroupStateTimeout
              .EventTimeTimeout)
        }
        out.select(col("windowStartMs").as("window_start_ms"),
          col("key").as("user_id"),
          col("value._1").as("n"), col("value._2").as("isum"))
      },
      Some("""SELECT (epoch_ms(ts) // 604800000) * 604800000 AS window_start_ms,
             |  user_id, count(*) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS isum
             |FROM events GROUP BY 1, 2
             |""".stripMargin)),

    // keyedSessionFold driven as a stream: per-user sessions over
    // QUANTIZED processing time (clock per step = 2-day feed bucket,
    // gap 4 days), fold = (count, Σ floor(value*100)); stale sessions
    // close on the data path when a later arrival finds the gap
    // elapsed, idle users' sessions close via event-time timeouts on
    // the harness's watermark ticks (WindowOperatorImpl session
    // semantics: extend by latest arrival, close on gap)
    "q_stream_session_fold" -> Q(
      (s, d) => {
        import s.implicits._
        val bucket = 172800000L // 2 days
        val gap = 345600000L // 4 days
        val rows = t(s, d, "events")
          .select($"user_id", unix_millis($"ts").as("tms"), $"value")
          .as[(Long, Long, Double)].collect().sortBy(r => (r._2, r._1))
        val steps = rows.groupBy(_._2 / bucket).toSeq.sortBy(_._1)
          .map { case (b, evs) => (b * bucket, evs.toSeq) }
        val flushAt = rows.map(_._2).max + 2 * gap
        val out = StreamHarness.runWithTicks(s,
          steps :+ ((flushAt, Seq.empty[(Long, Long, Double)])),
          sentinel = (0L, 0L, 0.0)) { ds =>
          StreamWindows.keyedSessionFold[
            StreamHarness.Ticked[(Long, Long, Double)], Long, (Long, Long)](
            ds, _._1._1, (0L, 0L),
            (a, e) => (a._1 + 1, a._2 + math.floor(e._1._3 * 100).toLong),
            gap, StreamHarness.clock,
            timeout = org.apache.spark.sql.streaming.GroupStateTimeout
              .EventTimeTimeout)
        }
        out.select(col("windowStartMs").as("session_start_ms"),
          col("key").as("user_id"),
          col("value._1").as("n"), col("value._2").as("isum"))
      },
      Some("""WITH e AS (
             |  SELECT user_id,
             |    (epoch_ms(ts) // 172800000) * 172800000 AS tq, value
             |  FROM events),
             |m AS (
             |  SELECT user_id, tq, value,
             |    CASE WHEN lag(tq) OVER w IS NULL
             |           OR tq - lag(tq) OVER w >= 345600000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY tq)),
             |g AS (
             |  SELECT user_id, tq, value,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY tq
             |                   ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m)
             |SELECT min(tq) AS session_start_ms, user_id,
             |  count(*) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS isum
             |FROM g GROUP BY user_id, sid
             |""".stripMargin)),

    // TtlJoin driven as a stream: click (left) / view (right) arrivals
    // per user, each arrival joining the other side's LAST buffered
    // value within a 2h TTL — the oracle enumerates both join
    // directions with the operator's tie rule (left before right at
    // equal ms; a side's (user, ms) pairs are unique in this dataset)
    "q_stream_ttl_join" -> Q(
      (s, d) => {
        import s.implicits._
        val ttl = 7200000L
        val rows = t(s, d, "events")
          .filter($"event_type".isin("click", "view"))
          .select($"user_id", unix_millis($"ts").as("tms"),
            $"event_id", $"event_type")
          .as[(Long, Long, Long, String)].collect().sortBy(r => (r._2, r._3))
        val steps = rows.groupBy(_._2 / FeedMs).toSeq.sortBy(_._1)
          .map { case (b, evs) =>
            (b * FeedMs, evs.map { r =>
              if (r._4 == "click")
                TtlJoin.Tagged[Long, Long, Long](r._1, Some(r._3), None, r._2)
              else
                TtlJoin.Tagged[Long, Long, Long](r._1, None, Some(r._3), r._2)
            }.toSeq)
          }
        val out = StreamHarness.run(s, steps) { ds =>
          TtlJoin.join(ds, ttlMs = ttl, timers = false) // no timer output
        }
        out.select(col("key").as("user_id"), col("left").as("click_id"),
          col("right").as("view_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_ms(ts) AS t, event_id AS cid
             |  FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT user_id, epoch_ms(ts) AS t, event_id AS vid
             |  FROM events WHERE event_type = 'view'),
             |lj AS ( -- click arrival joins last view STRICTLY before it
             |  SELECT c.user_id, c.cid, v.vid,
             |    row_number() OVER (PARTITION BY c.user_id, c.t
             |                       ORDER BY v.t DESC) AS rn
             |  FROM c JOIN v ON c.user_id = v.user_id
             |              AND v.t < c.t AND c.t - v.t <= 7200000),
             |rj AS ( -- view arrival joins last click at-or-before it
             |  SELECT v.user_id, c.cid, v.vid,
             |    row_number() OVER (PARTITION BY v.user_id, v.t
             |                       ORDER BY c.t DESC) AS rn
             |  FROM v JOIN c ON c.user_id = v.user_id
             |              AND c.t <= v.t AND v.t - c.t <= 7200000)
             |SELECT user_id, cid AS click_id, vid AS view_id
             |FROM lj WHERE rn = 1
             |UNION ALL
             |SELECT user_id, cid AS click_id, vid AS view_id
             |FROM rj WHERE rn = 1
             |""".stripMargin)),

    // low-level task API driven as a stream: per-user StreamTask with a
    // KVStore holding running (count, isum), one emission per message —
    // the oracle is the running window equivalent. Delivery order is
    // (ms, event_id) via orderBy within invocations and time-bucketed
    // feed across them.
    "q_stream_task" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = t(s, d, "events")
          .select($"user_id", unix_millis($"ts").as("tms"),
            $"event_id", $"value")
          .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._2, r._3))
        val steps = rows.groupBy(_._2 / FeedMs).toSeq.sortBy(_._1)
          .map { case (b, evs) => (b * FeedMs, evs.toSeq) }
        val task = new TaskRunner.StreamTaskLike[(Long, Long, Long, Double),
            (Long, Long, Long, Long)] {
          def process(msg: (Long, Long, Long, Double),
              store: TaskRunner.KVStore,
              collector: TaskRunner.Collector[(Long, Long, Long, Long)])
              : Unit = {
            val n = store.get("n").map(_.toLong).getOrElse(0L) + 1
            val isum = store.get("isum").map(_.toLong).getOrElse(0L) +
              math.floor(msg._4 * 100).toLong
            store.put("n", n.toString)
            store.put("isum", isum.toString)
            collector.send((msg._1, msg._3, n, isum))
          }
        }
        val out = StreamHarness.run(s, steps) { ds =>
          TaskRunner.run[(Long, Long, Long, Double), Long,
            (Long, Long, Long, Long)](
            ds, _._1, task,
            orderBy = e => e._2 * 1000000L + e._3 % 1000000L)
        }
        out.toDF("user_id", "event_id", "n", "run_isum")
      },
      Some("""SELECT user_id, event_id,
             |  row_number() OVER w AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w
             |       AS BIGINT) AS run_isum
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |             ORDER BY epoch_ms(ts), event_id
             |             ROWS UNBOUNDED PRECEDING)
             |""".stripMargin)),

    // MessageChooser + bootstrap priority, fully distributed: 'view'
    // events form a bootstrap stream, everything else the live stream,
    // both key-partitioned on user into 4 task partitions; one
    // DefaultChooser per task (bootstrapping(priority(round-robin)),
    // DefaultChooser.scala:260) decides delivery order executor-side.
    // Because each user's messages live in one task and one partition
    // per stream, per-user delivery order is SQL-derivable — bootstrap
    // messages first, then live, offset order within each — which is
    // what the oracle pins. Delivery positions feed per-user
    // row_number/first_value windows (user-partitioned: parallel, no
    // global sort). Task count is the parallelism knob, as container
    // count is in the reference.
    "q_bootstrap_chooser" -> Q(
      (s, d) => {
        import s.implicits._
        val parts = 4
        val ev = t(s, d, "events").select(
          when($"event_type" === "view", "boot").otherwise("live")
            .as("stream"),
          pmod($"user_id", lit(parts)).cast("int").as("part"),
          unix_millis($"ts").as("tms"), $"event_id", $"user_id")
        // dense per-(stream, partition) offsets in (ts, event_id)
        // order — a consumer delivers a partition offset-ascending
        val offW = Window.partitionBy($"stream", $"part")
          .orderBy($"tms", $"event_id")
        val withOff = ev.withColumn("off",
          row_number().over(offW).cast("long") - 1)
        // newest offset per bootstrap partition = its message count - 1
        // (tiny driver collect: one row per bootstrap partition, the
        // same nlist-row shape as the IVF codebook)
        val newest = withOff.filter($"stream" === "boot")
          .groupBy($"part").agg(max($"off").as("newest"))
          .collect().map { r =>
            Choosers.StreamPartition("boot", r.getInt(0)) -> r.getLong(1)
          }.toMap
        val envs = withOff.select($"stream", $"part", $"off",
          $"user_id", $"event_id")
          .as[(String, Int, Long, Long, Long)]
          .map { case (stream, part, off, user, eid) =>
            Choosers.Envelope(Choosers.StreamPartition(stream, part),
              off, (user, eid))
          }
        val delivered = Choosers.deliveryOrder(envs,
          () => Choosers.default[(Long, Long)](Set("boot", "live"),
            Choosers.BootstrapMetadata(newest)))
          .toDF("task", "seq", "env")
          .select($"env.value._1".as("user_id"),
            $"env.value._2".as("event_id"), $"seq")
        val userW = Window.partitionBy($"user_id").orderBy($"seq")
        delivered.select($"user_id", $"event_id",
          row_number().over(userW).cast("long").as("n"),
          first($"event_id").over(userW).as("first_event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  row_number() OVER w AS n,
             |  first_value(event_id) OVER w AS first_event_id
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |             ORDER BY (event_type <> 'view'),
             |                      epoch_ms(ts), event_id
             |             ROWS UNBOUNDED PRECEDING)
             |""".stripMargin)),

    // streaming near-dup detection at ingest (StreamDedup): MinHash
    // band buckets as operator state, pairs verified and emitted the
    // micro-batch the duplicate ARRIVES. Documents feed in id order
    // over 8 batches, so cross-batch state is exercised and the
    // emitted set equals the batch LSH pair set exactly — the oracle
    // IS q_dedup_minhash_lsh's oracle (same signatures, same bands,
    // same verification; the minimal-band rule dedups across bands
    // without a second stateful stage).
    "q_stream_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = t(s, d, "documents")
          .select($"doc_id".cast("long"), $"text")
          .as[(Long, String)].collect().sortBy(_._1)
        val chunk = math.max(1, rows.length / 8)
        val steps = rows.grouped(chunk).zipWithIndex
          .map { case (c, i) => (i * 60000L, c.toSeq) }.toSeq
        val out = StreamHarness.run(s, steps) { ds =>
          graft.streaming.StreamDedup.nearDupPairs(
            ds.toDF("doc_id", "text"), "doc_id", "text",
            n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
        }
        out.select($"id_a", $"id_b", $"jaccard")
      },
      Some(s"""WITH ${DedupQueries.oMinhashCtes}
              |SELECT id_a, id_b, jaccard FROM jp
              |""".stripMargin))
  )
}
