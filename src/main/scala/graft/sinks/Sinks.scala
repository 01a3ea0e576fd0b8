package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File sinks (reference loaders, SURVEY.md §2.9).
  *
  * ParquetLoader/CsvLoader per-parameter mode → `partitionBy("name")`
  * (one directory per parameter instead of one file — same logical
  * content, scalable layout); `partition_by_apid` → additional
  * `partitionBy("apid")`; append mode → native `mode("append")` (the
  * reference's read-concat-rewrite is non-atomic; Spark's commit protocol
  * is the durable version of the same semantics).
  *
  * HDF5 is intentionally out of scope (no JVM-native Spark writer;
  * SURVEY.md §2.9) — Parquet is the durable format.
  */
object Sinks {

  /** Per-parameter tidy sink (parquet.py:50-78 per-parameter mode). */
  def writeTidyParquet(
      samples: DataFrame, dir: String,
      partitionByApid: Boolean = false, overwrite: Boolean = true): Unit = {
    val partCols = if (partitionByApid) Seq("name", "apid") else Seq("name")
    samples
      .select("name", "time_tai", "apid", "seq_count", "raw_value",
        "eng_value", "unit", "validity", "out_of_limit", "alarm_level")
      .sortWithinPartitions("time_tai")
      .write
      .partitionBy(partCols: _*)
      .mode(if (overwrite) "overwrite" else "append")
      .parquet(dir)
  }

  /** Wide sink (parquet.py wide mode → single pivoted table). */
  def writeWideParquet(wide: DataFrame, dir: String, overwrite: Boolean = true): Unit =
    wide.write.mode(if (overwrite) "overwrite" else "append").parquet(dir)

  /** CSV sink (csv loader, header on, per-parameter partitioning). */
  def writeTidyCsv(
      samples: DataFrame, dir: String, overwrite: Boolean = true): Unit =
    samples
      .select("name", "time_tai", "apid", "seq_count", "raw_value",
        "eng_value", "unit", "validity", "out_of_limit", "alarm_level")
      .sortWithinPartitions("time_tai")
      .write
      .option("header", "true")
      .partitionBy("name")
      .mode(if (overwrite) "overwrite" else "append")
      .csv(dir)
}
