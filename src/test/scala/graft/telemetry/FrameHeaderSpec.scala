package graft.telemetry

import graft.SparkSpec
import graft.telemetry.FrameHeader.TmFrameHeader
import org.apache.spark.sql.functions._

class FrameHeaderSpec extends SparkSpec {
  import spark.implicits._

  test("frame header pack/parse round-trips all 11 fields") {
    val h = TmFrameHeader(
      version = 1, spacecraft_id = 0x2a5, virtual_channel_id = 5, ocf_flag = 1,
      master_frame_count = 200, virtual_frame_count = 17, sec_hdr_flag = 1,
      sync_flag = 0, packet_order_flag = 1, segment_length_id = 2,
      first_header_pointer = 0x5ff)
    val df = Seq(Tuple1(FrameHeader.packFrameHeader(h))).toDF("fh")
    val row = df.select(FrameHeader.parseFrameHeader(col("fh")).as("h"))
      .select("h.*").head()
    val parsed = TmFrameHeader(
      row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4),
      row.getInt(5), row.getInt(6), row.getInt(7), row.getInt(8), row.getInt(9),
      row.getInt(10))
    assert(parsed == h)
  }
}
