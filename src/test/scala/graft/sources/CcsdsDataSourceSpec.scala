package graft.sources

import graft.SparkSpec
import graft.telemetry.Fixtures
import org.apache.spark.sql.functions._

/** V2 source: split correctness (marker-framed files), equality with the
  * flatMap reader, and APID pushdown.
  */
class CcsdsDataSourceSpec extends SparkSpec {

  private def markerFramedFile(n: Int): (java.nio.file.Path, Array[Byte]) = {
    val bytes = (0 until n).flatMap { i =>
      CcsdsSource.SyncMarker ++ Fixtures.makeRawPacket(
        apid = if (i % 3 == 0) 0x200 else 0x100, seqCount = i % 16384,
        userData = graft.telemetry.BinaryFieldOps.packNumberBE(
          (i * 7).toDouble, 32, graft.telemetry.ParameterType.UINT),
        secHdr = Array[Byte](1, 2, 3, 4))
    }.toArray
    val dir = java.nio.file.Files.createTempDirectory("v2src")
    val f = dir.resolve("stream.bin")
    java.nio.file.Files.write(f, bytes)
    (f, bytes)
  }

  test("splittable read: many small splits reproduce the whole stream exactly") {
    val (f, bytes) = markerFramedFile(500)
    val df = spark.read.format("ccsds")
      .option("path", f.toString)
      .option("frame_sync", "true")
      .option("sec_hdr_length", "4")
      .option("split_size", "1024") // force many splits
      .load()
    assert(df.rdd.getNumPartitions > 5, "expected the file to split")
    assert(df.count() == 500)
    // matches the single-pass flatMap parser bit for bit
    val viaFlatMap = CcsdsSource.packetsFromBytes(spark, Seq(bytes),
      CcsdsSource.Options(secHdrLength = 4, frameSync = true))
    val a = df.select("apid", "seq_count", "user_data").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val b = viaFlatMap.select("apid", "seq_count", "user_data").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(a == b)
  }

  test("split boundaries never duplicate or drop packets (ownership rule)") {
    val (f, _) = markerFramedFile(199)
    for (split <- Seq(137L, 256L, 1000L, 100000L)) {
      val n = spark.read.format("ccsds")
        .option("path", f.toString).option("frame_sync", "true")
        .option("split_size", split.toString).load().count()
      assert(n == 199, s"split_size=$split gave $n")
    }
  }

  test("apid predicate pushes into the scan") {
    val (f, _) = markerFramedFile(300)
    val df = spark.read.format("ccsds")
      .option("path", f.toString).option("frame_sync", "true").load()
      .where(col("apid") === 0x200)
    assert(df.count() == 100) // every 3rd packet
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushed apids: 512"), s"scan not pushed:\n$scanDesc")
  }

  test("unframed file reads as a single partition") {
    val dir = java.nio.file.Files.createTempDirectory("v2plain")
    val f = dir.resolve("plain.bin")
    java.nio.file.Files.write(f, Fixtures.hkStream(50))
    val df = spark.read.format("ccsds")
      .option("path", f.toString).option("sec_hdr_length", "4").load()
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 50)
  }
}
