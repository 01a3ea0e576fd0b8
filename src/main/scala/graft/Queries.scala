package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The driver-facing query registry: every operator in SURVEY.md §2 (plus
  * the training-data extensions) exposed as a named query over the parquet
  * testdata, paired with DuckDB oracle SQL.
  *
  * Conventions (driver hash-compare, see Verify.scala):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double-typed aggregates are rounded (2–6 dp) on both sides so
  *    summation-order ULP drift cannot flip the hash;
  *  - every query ends with a total-order ORDER BY.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship: reference examples/01_binary_ingest.py end-to-end on Spark. */
  def flagship(spark: SparkSession, dir: String): DataFrame =
    QueriesTelemetry.flagship(spark, dir)

  // ---------------------------------------------------------------------
  // §2.4 aggregations
  // ---------------------------------------------------------------------

  /** TPC-H Q1-shaped grouped aggregation (SURVEY §2.4: groupBy + min/max/
    * count analogs of ParameterRecord.time_range/count at scale). */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg(_, _))
  ) ++ QueriesTelemetry.queries ++ QueriesRelational.queries ++
    QueriesTrainingData.queries ++ QueriesExtended.queries

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ QueriesTelemetry.oracles ++ QueriesRelational.oracles ++
    QueriesTrainingData.oracles ++ QueriesExtended.oracles
}
