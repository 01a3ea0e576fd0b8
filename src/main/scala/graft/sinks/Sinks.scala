package graft.sinks

import graft.sources.v2.SerializableHadoopConf
import graft.telemetry.CcsdsColumns
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
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

  /** CCSDS packet-stream sink: serializes parsed packets (the ccsds V2
    * source schema) back to raw big-endian byte streams, one file per
    * partition — the write-side counterpart of the splittable reader,
    * and the inverse of CCSDSPrimaryHeader.from_bytes
    * (/root/reference/src/mdp/models/packet.py:57-71). The byte pack is
    * a codegen'd column expression; only the final file append is
    * imperative. Each task re-creates its own file (overwrite=true), so
    * retries are idempotent; like any non-committed sink, concurrent
    * speculative attempts of one task should be disabled when using it
    * on a real cluster.
    */
  def writeCcsdsFiles(packets: DataFrame, dir: String): Unit = {
    // Overwrite semantics: clear the target before writing. Without
    // this, re-running with FEWER partitions leaves stale higher-
    // numbered part-*.bin files from the previous run in place, and the
    // extractor silently reads them back into the round-trip.
    locally {
      val target = new Path(dir)
      val fs = target.getFileSystem(
        packets.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(target)) fs.delete(target, true)
      fs.mkdirs(target)
    }
    val bytes = packets.select(concat(
      CcsdsColumns.packHeader(col("version"), col("type_flag"),
        col("sec_hdr_flag"), col("apid"), col("seq_flags"),
        col("seq_count"), col("data_length")),
      coalesce(col("secondary_header"), lit(Array.emptyByteArray)),
      coalesce(col("user_data"), lit(Array.emptyByteArray))).as("pkt"))
    val conf = new SerializableHadoopConf(
      packets.sparkSession.sparkContext.hadoopConfiguration)
    bytes.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val path = new Path(dir, f"part-${TaskContext.getPartitionId()}%05d.bin")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        try it.foreach(r => out.write(r.getAs[Array[Byte]](0)))
        finally out.close()
      }
    }
  }

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
