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
  test("no oracle uses a SQL form materializeCtes would mis-rewrite") {
    // the transform's lookbehind protects exactly ONE named window
    // (`WINDOW w AS (`), and a column-list CTE (`name(a,b) AS (`)
    // slips past both the rewrite and the bare-CTE audit above. Pin
    // the two blind spots out of the oracle corpus: a multi-window
    // clause's second window (`, w2 AS (`) would be rewritten to
    // invalid `AS MATERIALIZED` SQL, and a column-list CTE would ship
    // uninlined. Any future oracle needing either form must extend
    // materializeCtes first.
    val multiWindow = "(?s)\\bWINDOW\\s+[a-z][a-z0-9_]*\\s+AS\\s*\\(.*?\\)\\s*,\\s*[a-z][a-z0-9_]*\\s+AS\\s*\\(".r
    val columnListCte = "\\b[a-z][a-z0-9_]*\\s*\\([a-z0-9_,\\s]*\\)\\s+AS\\s*\\(".r
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(multiWindow.findFirstIn(sql).isEmpty,
        s"$k uses a multi-window WINDOW clause - materializeCtes would corrupt it")
      columnListCte.findAllIn(sql).toSeq.foreach { m =>
        // DuckDB table functions like range(8) r(k) are fine - only a
        // `name(cols) AS (` heading a CTE body is the hazard
        fail(s"$k uses a column-list CTE ('$m') - materializeCtes misses it")
      }
    }
  }
}
