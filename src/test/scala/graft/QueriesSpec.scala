package graft

/** Smoke-level regression: every declared query runs at sf0.001,
  * returns rows, and its oracle entry (if any) exists. Exact value
  * agreement with DuckDB is checked by the driver (and locally by
  * scripts/selfcheck.py) — this spec guards schema/runtime breakage.
  */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
