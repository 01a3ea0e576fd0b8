package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query over the driver's parquet testdata, with DuckDB-equivalent SQL in
  * [[oracleSql]] where the semantics are SQL-expressible. Column names are
  * aligned between the Spark result and the oracle SQL (the driver sorts
  * columns by name before hashing). All queries ORDER BY a full key so row
  * order is deterministic on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference flagship pipeline (examples/01_binary_ingest.py):
    * synthetic CCSDS packets -> parse -> decom -> calibrate -> tidy export.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every CTE is exported `AS MATERIALIZED`: DuckDB 1.0 inlines CTE
    * references, which re-evaluates self-referencing round chains
    * exponentially — s15's oracle measured 294 s inlined vs 0.4 s
    * materialized at sf0.01 (see OracleFragments.materializeCtes; the
    * likely mechanism behind the r15-r17 empty driver artifacts).
    */
  def oracleSql: Map[String, String] =
    Queries.oracles.map { case (k, v) =>
      k -> OracleFragments.materializeCtes(v)
    }
}
