package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

class SaltingSpec extends SparkSpec {

  test("salted join equals plain join") {
    val s = spark
    import s.implicits._
    // skewed large side: 90% of rows share key 1
    val large = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, i.toLong))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched"))
      .toDF("k", "name")

    val plain = large.join(small, "k")
      .select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Salting.saltedJoin(large, small, "k", factor = 8,
        saltOf = hash(col("payload")))
      .select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val s = spark
    import s.implicits._
    val df = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L, i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Salting.saltedAgg(df, "k", factor = 8,
        saltOf = hash(col("v")),
        partialAggs = Seq("total" -> sum(col("v")),
          "n" -> count(lit(1))),
        mergeAggs = Seq("total" -> sum(col("total")),
          "n" -> sum(col("n"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salt is deterministic across evaluations") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v")
    val a = df.select(Salting.salt(16, col("v")).as("s")).as[Int].collect()
    val b = df.select(Salting.salt(16, col("v")).as("s")).as[Int].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(x => x >= 0 && x < 16))
  }
}
