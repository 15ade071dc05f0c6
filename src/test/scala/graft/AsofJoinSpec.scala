package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.sources.Tables

/** As-of join: bucketed implementation vs a brute-force reference,
  * plus the plan guarantee the 100 TB story rests on (join keyed by
  * (key, bucket), no per-key window sort). */
class AsofJoinSpec extends SparkSpec {

  test("asofJoin matches brute-force most-recent-within-horizon") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(s, sf001, "events")
    val lookbackMs = 3600L * 1000
    val left = ev.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts")
    val right = ev.filter($"event_type" === "click")

    val got = AsofJoin.asofJoin(left, "event_id", right, "event_id",
        "user_id", "ts", lookbackMs)
      .select($"event_id", $"asof_id", $"asof_ts")
      .as[(Long, Option[Long], Option[Timestamp])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // brute force: per purchase, scan all clicks of that user
    val clicks = right.select($"user_id", $"event_id", $"ts")
      .as[(Long, Long, Timestamp)].collect()
      .groupBy(_._1)
    val want = left.as[(Long, Long, Timestamp)].collect().map {
      case (id, user, ts) =>
        val best = clicks.getOrElse(user, Array.empty)
          .filter(c => !c._3.after(ts) &&
            ts.getTime - c._3.getTime <= lookbackMs)
          .sortBy(c => (c._3.getTime, c._2)).lastOption
        id -> ((best.map(_._2), best.map(_._3)))
    }.toMap
    assert(got.size == want.size)
    want.foreach { case (id, exp) =>
      assert(got(id) == exp, s"purchase $id")
    }
    assert(want.values.exists(_._1.isDefined)) // matches exist
    assert(want.values.exists(_._1.isEmpty)) // and misses exist
  }

  test("rangeJoin equals the inequality join, without a nested-loop plan") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(s, sf001, "events").select("event_id", "value")
    val bands = Tables.load(s, sf001, "region").select(
      $"r_regionkey".cast("long").as("band_id"),
      greatest(lit(0.0), $"r_regionkey" * 100.0 - 25).as("lo"),
      ($"r_regionkey" * 100.0 + 100).as("hi"))
    val got = graft.operators.RangeJoin
      .rangeJoin(ev, "value", bands, "lo", "hi", bucketWidth = 100.0)
      .select("event_id", "band_id")
      .as[(Long, Long)].collect().toSet
    val want = ev.join(bands,
        $"value" >= $"lo" && $"value" <= $"hi")
      .select("event_id", "band_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    // overlap regions produce multi-band matches
    assert(got.size > got.map(_._1).size)
    val plan = graft.operators.RangeJoin
      .rangeJoin(ev, "value", bands, "lo", "hi", 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      plan)
  }

  test("plan joins on (key, bucket) with no Window node") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(s, sf001, "events")
    val df = AsofJoin.asofJoin(
      ev.filter($"event_type" === "purchase")
        .select("event_id", "user_id", "ts"),
      "event_id", ev.filter($"event_type" === "click"),
      "event_id", "user_id", "ts", 3600L * 1000)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the candidate join carries the bucket in its key
    assert(plan.contains("__b"), plan)
  }
}
