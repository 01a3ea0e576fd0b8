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
}
