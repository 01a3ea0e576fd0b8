package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under `/root/testdata/sf*`/.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long and convert to a microsecond
    * timestamp (the testdata has no sub-microsecond components, so the
    * conversion is lossless and DuckDB-comparable).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      // integer division: `/` would promote the epoch-nanos bigint to
      // double (ulp 256 ns at current epochs) and truncate 1 µs low
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
}
