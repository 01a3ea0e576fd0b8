package graft.telemetry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CCSDS TM transfer-frame primary header parse (reference
  * /root/reference/src/mdp/models/frame.py:24-103 — modeled there but
  * never consumed by any stage; provided here for surface completeness).
  *
  * 6-byte layout: 2b version | 10b spacecraft_id | 3b virtual_channel_id
  * | 1b ocf_flag || 8b master_frame_count || 8b virtual_frame_count ||
  * 1b sec_hdr_flag | 1b sync_flag | 1b packet_order_flag | 2b seg_len_id
  * | 11b first_header_pointer.
  */
object FrameHeader {

  case class TmFrameHeader(
      version: Int, spacecraft_id: Int, virtual_channel_id: Int, ocf_flag: Int,
      master_frame_count: Int, virtual_frame_count: Int, sec_hdr_flag: Int,
      sync_flag: Int, packet_order_flag: Int, segment_length_id: Int,
      first_header_pointer: Int)

  /** Column-expression parse of a 6-byte frame header (built-ins only). */
  def parseFrameHeader(bytes: Column): Column = {
    val word0 = CcsdsColumns.uintBE(bytes, 0, 2)
    val mfc = CcsdsColumns.uintBE(bytes, 2, 1)
    val vfc = CcsdsColumns.uintBE(bytes, 3, 1)
    val status = CcsdsColumns.uintBE(bytes, 4, 2)
    struct(
      shiftright(word0, 14).bitwiseAND(lit(0x3)).cast("int").as("version"),
      shiftright(word0, 4).bitwiseAND(lit(0x3ff)).cast("int").as("spacecraft_id"),
      shiftright(word0, 1).bitwiseAND(lit(0x7)).cast("int").as("virtual_channel_id"),
      word0.bitwiseAND(lit(0x1)).cast("int").as("ocf_flag"),
      mfc.cast("int").as("master_frame_count"),
      vfc.cast("int").as("virtual_frame_count"),
      shiftright(status, 15).bitwiseAND(lit(0x1)).cast("int").as("sec_hdr_flag"),
      shiftright(status, 14).bitwiseAND(lit(0x1)).cast("int").as("sync_flag"),
      shiftright(status, 13).bitwiseAND(lit(0x1)).cast("int").as("packet_order_flag"),
      shiftright(status, 11).bitwiseAND(lit(0x3)).cast("int").as("segment_length_id"),
      status.bitwiseAND(lit(0x7ff)).cast("int").as("first_header_pointer"))
  }

  /** Fixture-side pack (inverse of parse; for tests). */
  def packFrameHeader(h: TmFrameHeader): Array[Byte] = {
    val word0 = (h.version << 14) | (h.spacecraft_id << 4) |
      (h.virtual_channel_id << 1) | h.ocf_flag
    val status = (h.sec_hdr_flag << 15) | (h.sync_flag << 14) |
      (h.packet_order_flag << 13) | (h.segment_length_id << 11) |
      h.first_header_pointer
    Array(
      (word0 >> 8).toByte, word0.toByte,
      h.master_frame_count.toByte, h.virtual_frame_count.toByte,
      (status >> 8).toByte, status.toByte)
  }
}
