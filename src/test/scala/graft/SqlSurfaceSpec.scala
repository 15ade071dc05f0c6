package graft

import graft.sql.SamzaSql

class SqlSurfaceSpec extends SparkSpec {

  test("parses INSERT INTO … SELECT") {
    val st = SamzaSql.parse(
      "INSERT INTO out SELECT a, b FROM t WHERE a > 1")
    assert(st.sink == "out")
    assert(st.select.toLowerCase.startsWith("select"))
  }

  test("rejects non-INSERT statements like the reference") {
    // SamzaSqlQueryParser rejects non-INSERT (:131-135)
    intercept[IllegalArgumentException] {
      SamzaSql.parse("SELECT * FROM t")
    }
    intercept[IllegalArgumentException] {
      SamzaSql.parse("DELETE FROM t")
    }
  }

  test("multi-statement jobs compose through sinks") {
    val out = SamzaSql.runAll(spark, sf0001, Seq(
      "INSERT INTO s1 SELECT event_id, user_id FROM events WHERE user_id = 1",
      "INSERT INTO s2 SELECT count(*) AS n FROM s1"))
    val n = out("s2").collect().head.getLong(0)
    assert(n > 0)
  }

  test("reference UDFs registered and case-insensitive") {
    SamzaSql.run(spark, sf0001,
      "INSERT INTO x SELECT doc_id FROM documents")
    val df = spark.sql(
      """SELECT regexmatch('^a.*', 'abc') AS m1,
        |       RegexMatch('^z.*', 'abc') AS m2,
        |       converttostring(42) AS s,
        |       BuildOutputRecord('k', 1, 'v', 'two').k AS k
        |""".stripMargin)
    val r = df.collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == "42")
    assert(r.getInt(3) == 1)
  }

  test("GetNestedField traverses dotted paths in SQL") {
    SamzaSql.run(spark, sf0001,
      "INSERT INTO y SELECT doc_id FROM documents")
    val r = spark.sql(
      """SELECT GetNestedField(
        |  BuildOutputRecord('a', BuildOutputRecord('b', 42)), 'a.b') AS v
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 42)
    // non-literal path is rejected at plan time
    intercept[Exception] {
      spark.sql("SELECT GetNestedField(BuildOutputRecord('a', 1), lower('A'))")
        .collect()
    }
  }
}
