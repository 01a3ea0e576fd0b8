package graft.telemetry

import java.nio.file.{Files, Path}

/** Synthetic CCSDS fixture builders — Scala ports of the reference test
  * factory (/root/reference/tests/conftest.py:19-45) and the flagship
  * example generator (/root/reference/examples/01_binary_ingest.py:49-86).
  * Driver-side only (tests + flagship input); data-plane packing for the
  * oracle queries is done with column expressions instead.
  */
object Fixtures {

  /** Hand-pack one CCSDS packet: 6-byte BE header + sec_hdr + user_data. */
  def makeRawPacket(
      apid: Int = 0x123,
      seqCount: Int = 0,
      userData: Array[Byte] = Array[Byte](0, 0, 0, 0),
      secHdr: Array[Byte] = Array.emptyByteArray,
      typeFlag: Int = 0,
      version: Int = 0,
      seqFlags: Int = 0x3): Array[Byte] = {
    val dataField = secHdr ++ userData
    require(dataField.nonEmpty, "CCSDS data field must be >= 1 byte")
    val secFlag = if (secHdr.nonEmpty) 1 else 0
    val word0 = (version << 13) | (typeFlag << 12) | (secFlag << 11) | (apid & 0x7ff)
    val word1 = (seqFlags << 14) | (seqCount & 0x3fff)
    val word2 = dataField.length - 1
    val out = new Array[Byte](6 + dataField.length)
    out(0) = (word0 >> 8).toByte; out(1) = word0.toByte
    out(2) = (word1 >> 8).toByte; out(3) = word1.toByte
    out(4) = (word2 >> 8).toByte; out(5) = word2.toByte
    System.arraycopy(dataField, 0, out, 6, dataField.length)
    out
  }

  /** The flagship HK stream: n packets, APID 0x100, 4-byte sec hdr >I(i),
    * 12-byte user_data >HHHfH (examples/01_binary_ingest.py:49-86).
    */
  def hkStream(n: Int = 200): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until n) {
      val userData =
        BinaryFieldOps.packNumberBE((2048 + 200 * math.sin(i / 20.0)).toInt.toDouble, 16, ParameterType.UINT) ++
        BinaryFieldOps.packNumberBE((3000 + 50 * math.sin(i / 50.0)).toInt.toDouble, 16, ParameterType.UINT) ++
        BinaryFieldOps.packNumberBE((1500 + 300 * math.cos(i / 15.0)).toInt.toDouble, 16, ParameterType.UINT) ++
        BinaryFieldOps.packNumberBE(i * 4.0, 32, ParameterType.FLOAT) ++
        BinaryFieldOps.packNumberBE(0xabcd.toDouble, 16, ParameterType.UINT)
      val secHdr = BinaryFieldOps.packNumberBE(i.toDouble, 32, ParameterType.UINT)
      out.write(makeRawPacket(apid = 0x100, seqCount = i, userData = userData, secHdr = secHdr))
    }
    out.toByteArray
  }

  def writeHkFile(path: Path, n: Int = 200): Path =
    Files.write(path, hkStream(n))

  /** MIB + calibrations from the flagship example
    * (examples/01_binary_ingest.py:94-148).
    */
  val hkParamDefs: Seq[ParameterDef] = Seq(
    ParameterDef("obc_temp_dn", 0x100, 0, 16, ParameterType.UINT, Some("DN")),
    ParameterDef("bus_voltage_dn", 0x100, 2, 16, ParameterType.UINT, Some("DN")),
    ParameterDef("bat_current_dn", 0x100, 4, 16, ParameterType.UINT, Some("DN")),
    ParameterDef("mission_time_s", 0x100, 6, 32, ParameterType.FLOAT, Some("s")))

  val hkCalibrations: Seq[CalibrationEntry] = Seq(
    CalibrationEntry("obc_temp_dn", "polynomial", Some("degC"),
      coefficients = Seq(-55.0, 0.04394531)),
    CalibrationEntry("bus_voltage_dn", "polynomial", Some("V"),
      coefficients = Seq(0.0, 0.008056640625)),
    CalibrationEntry("bat_current_dn", "table", Some("A"),
      table_raw = Seq(0.0, 1024.0, 2048.0, 3072.0, 4095.0),
      table_eng = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)))
}
