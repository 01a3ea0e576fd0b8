package graft

/** Driver-contract smoke: entry returns rows; every query has either an
  * oracle or a documented rows-only status; oracle keys ⊆ query keys.
  */
class EntrySpec extends SparkSpec {
  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
  test("materializeCtes: CTEs materialized, WINDOW clauses untouched, idempotent") {
    val f = OracleFragments.materializeCtes _
    assert(f("WITH a AS (SELECT 1), b2 AS (SELECT 2) SELECT 3") ==
      "WITH a AS MATERIALIZED (SELECT 1), b2 AS MATERIALIZED (SELECT 2) SELECT 3")
    // DuckDB rejects MATERIALIZED on a named window — must pass through
    val win = "SELECT 1 FROM t\nWINDOW w AS (PARTITION BY x)"
    assert(f(win) == win, "WINDOW clause was mangled")
    // column aliases and casts never match
    assert(f("SELECT x AS y, CAST(x AS INT) FROM t") ==
      "SELECT x AS y, CAST(x AS INT) FROM t")
    val once = f("WITH a AS (SELECT 1) SELECT 2")
    assert(f(once) == once, "not idempotent")
    // every exported oracle really went through the transform: any CTE
    // in the map is materialized (queries without CTEs are exempt)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val bare = "(?<!WINDOW\\s)\\b[a-z][a-z0-9_]*\\s+AS\\s*\\(".r
      assert(bare.findFirstIn(sql).isEmpty,
        s"$k exports an inlined (non-materialized) CTE")
    }
  }
}
