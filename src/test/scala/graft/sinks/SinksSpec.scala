package graft.sinks

import graft.SparkSpec
import graft.operators.{Calibration, Decom}
import graft.sources.CcsdsSource
import graft.telemetry.Fixtures
import org.apache.spark.sql.functions._

/** Write-then-read-back checks (the reference's loader test pattern,
  * tests/test_plugins_loaders.py).
  */
class SinksSpec extends SparkSpec {

  private lazy val samples = Calibration(
    Decom(
      CcsdsSource.packetsFromBytes(
        spark, Seq(Fixtures.hkStream(20)), CcsdsSource.Options(secHdrLength = 4)),
      Fixtures.hkParamDefs),
    Fixtures.hkCalibrations)

  test("tidy parquet sink partitions by parameter and appends") {
    val dir = java.nio.file.Files.createTempDirectory("sink_pq").toString
    Sinks.writeTidyParquet(samples, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 80)
    assert(new java.io.File(dir, "name=obc_temp_dn").isDirectory)
    Sinks.writeTidyParquet(samples, dir, overwrite = false)
    assert(spark.read.parquet(dir).count() == 160) // append accumulates
  }

  test("apid-partitioned layout adds apid subdirectories") {
    val dir = java.nio.file.Files.createTempDirectory("sink_apid").toString
    Sinks.writeTidyParquet(samples, dir, partitionByApid = true)
    assert(new java.io.File(dir, "name=obc_temp_dn/apid=256").isDirectory)
    val back = spark.read.parquet(dir)
    assert(back.where(col("apid") === 256).count() == 80)
  }

  test("wide parquet and csv sinks round-trip") {
    val wideDir = java.nio.file.Files.createTempDirectory("sink_wide").toString
    Sinks.writeWideParquet(graft.operators.Telemetry.wide(samples), wideDir)
    val wide = spark.read.parquet(wideDir)
    assert(wide.count() == 20)
    assert(wide.columns.contains("obc_temp_dn"))

    val csvDir = java.nio.file.Files.createTempDirectory("sink_csv").toString
    Sinks.writeTidyCsv(samples, csvDir)
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(csvDir)
    assert(csv.count() == 80)
    assert(csv.columns.contains("eng_value"))
  }

  test("ccsds binary sink overwrites: fewer partitions leave no stale files") {
    val packets = CcsdsSource.packetsFromBytes(
      spark, Seq(Fixtures.hkStream(20)), CcsdsSource.Options(secHdrLength = 4))
    val dir = java.nio.file.Files.createTempDirectory("sink_ccsds").toString
    Sinks.writeCcsdsFiles(packets.repartition(4), dir)
    val firstFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".bin"))
    assert(firstFiles > 2, s"expected >2 files from 4 partitions, got $firstFiles")
    // rewrite with FEWER partitions: the higher-numbered part files of
    // the first write must be gone, and the round-trip reads exactly
    // the second write's packets (not theirs + stale ones)
    Sinks.writeCcsdsFiles(packets.repartition(2), dir)
    val secondFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".bin"))
    assert(secondFiles <= 2, s"stale part files survived the rewrite: $secondFiles")
    val back = spark.read.format("ccsds").option("path", dir)
      .option("sec_hdr_length", "4").load()
    assert(back.count() == 20, "round-trip count changed after rewrite")
  }
}
