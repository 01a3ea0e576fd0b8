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

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (readable only as epoch-nanos long
    * under the legacy flag) and timestamp[us] (read as TIMESTAMP_NTZ
    * under Spark's default NTZ inference). Branch on the LOADED schema
    * so either generation yields the same session-TZ TimestampType
    * column every downstream query was written against. Session TZ is
    * UTC everywhere in this repo, so NTZ -> LTZ preserves the instant.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Rewrite `ts` to TimestampType whatever physical type it loaded as.
    * Shared by the batch loader and the streaming source (which must
    * declare its schema up front and so probes the file with a batch
    * read first).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // legacy epoch-nanos generation: integer division — `/` would
      // promote the bigint to double (ulp 256 ns at current epochs)
      // and truncate 1 µs low
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other")
    }
  }
}
