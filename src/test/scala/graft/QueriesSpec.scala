package graft

import graft.queries.Registry

/** Smoke: every registered query runs at sf0.001 and returns rows
  * (hash-correctness vs DuckDB is the driver's gate; this catches
  * runtime regressions fast). */
class QueriesSpec extends SparkSpec {

  Registry.all.foreach { case (name, q) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = q.run(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name matches a query name") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
