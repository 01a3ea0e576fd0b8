package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table, runnable inside the
  * batch correctness gate: stream the parquet file through a windowed
  * aggregation into a memory sink, drain it, and hand back the result
  * table. Batch and streaming answers coincide once every input file is
  * processed, so the same DuckDB SQL oracles the streaming pipeline.
  */
object EventStreaming {

  /** Parquet schema of events.parquet with ts as raw epoch-nanos (read
    * under spark.sql.legacy.parquet.nanosAsLong, as Tables.events does
    * for the batch path — streaming sources need the schema up front).
    */
  private val eventsNanosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window counts/sums per event_type, computed by a
    * real streaming query (micro-batch, complete output mode, memory
    * sink). Returns the drained result as a batch DataFrame.
    */
  def hourlyTypeStats(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source wants a directory: stream the whole sf dir
    // but list only the events file (new matching files would be picked
    // up as later micro-batches)
    val stream = spark.readStream
      .schema(eventsNanosSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
    val query = agg.writeStream
      .format("memory")
      .queryName("st1_mem")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
      query.awaitTermination()
    }
    spark.table("st1_mem")
  }

  /** Streaming deduplication: dropDuplicates on (user_id, event_type)
    * across micro-batches (state-store backed), then distinct-user
    * counts per type. Complete-mode memory sink, drained to a batch
    * DataFrame — the count is order-independent, so the batch oracle
    * (count DISTINCT) matches whatever row each micro-batch kept.
    */
  def dedupTypeCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsNanosSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val agg = stream
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
    val query = agg.writeStream
      .format("memory")
      .queryName("st2_mem")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
      query.awaitTermination()
    }
    spark.table("st2_mem")
  }
}
