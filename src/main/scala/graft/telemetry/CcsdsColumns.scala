package graft.telemetry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression CCSDS helpers: pack integer columns into big-endian
  * binary and parse 6-byte headers back — codegen'd Catalyst kernels
  * ([[BinaryExpressions.PackUintBE]]/[[BinaryExpressions.ReadUintBE]]:
  * direct byte writes/reads, replacing an earlier hex/lpad/unhex string
  * round-trip that allocated three strings per field per row) plus
  * built-in bit ops. No UDFs.
  *
  * Packing exists so the driver-facade queries can synthesize packet
  * streams from testdata ints (FIXTURES.md §5): DuckDB then oracle-checks
  * the decode arithmetically without having to parse binary itself.
  * Parse mirrors CCSDSPrimaryHeader.from_bytes
  * (/root/reference/src/mdp/models/packet.py:57-71).
  */
object CcsdsColumns {

  /** Big-endian fixed-width pack of a non-negative integral column.
    * Oversized values wrap mod 2^(8*nBytes) (the kernel keeps the least
    * significant bytes — same rule the masked-hex form applied).
    */
  def packUintBE(x: Column, nBytes: Int): Column =
    BinaryExpressions.packUintBE(x.cast("bigint"), nBytes)

  def packUint16(x: Column): Column = packUintBE(x, 2)
  def packUint32(x: Column): Column = packUintBE(x, 4)

  /** Read an unsigned big-endian integer at 0-based byte offset. */
  def uintBE(data: Column, byteOffset: Int, nBytes: Int): Column =
    BinaryExpressions.readUintBE(data, byteOffset, nBytes)

  /** Pack the 6-byte primary header from field columns. */
  def packHeader(
      version: Column, typeFlag: Column, secHdrFlag: Column, apid: Column,
      seqFlags: Column, seqCount: Column, dataLength: Column): Column = {
    val word0 = shiftleft(version.cast("int"), 13)
      .bitwiseOR(shiftleft(typeFlag.cast("int"), 12))
      .bitwiseOR(shiftleft(secHdrFlag.cast("int"), 11))
      .bitwiseOR(apid.cast("int").bitwiseAND(lit(0x7ff)))
    val word1 = shiftleft(seqFlags.cast("int"), 14)
      .bitwiseOR(seqCount.cast("int").bitwiseAND(lit(0x3fff)))
    concat(packUint16(word0), packUint16(word1), packUint16(dataLength))
  }

  /** Parse a 6-byte header into a struct of the 7 CCSDS fields. */
  def parseHeader(bytes: Column): Column = {
    val word0 = uintBE(bytes, 0, 2)
    val word1 = uintBE(bytes, 2, 2)
    val word2 = uintBE(bytes, 4, 2)
    struct(
      shiftright(word0, 13).bitwiseAND(lit(0x7)).cast("int").as("version"),
      shiftright(word0, 12).bitwiseAND(lit(0x1)).cast("int").as("type_flag"),
      shiftright(word0, 11).bitwiseAND(lit(0x1)).cast("int").as("sec_hdr_flag"),
      word0.bitwiseAND(lit(0x7ff)).cast("int").as("apid"),
      shiftright(word1, 14).bitwiseAND(lit(0x3)).cast("int").as("seq_flags"),
      word1.bitwiseAND(lit(0x3fff)).cast("int").as("seq_count"),
      word2.cast("int").as("data_length"))
  }
}
