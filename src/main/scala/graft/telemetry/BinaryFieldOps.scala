package graft.telemetry

/** JVM decode/encode kernels for fixed-width binary telemetry fields.
  *
  * Semantics follow the reference's struct-format table
  * (/root/reference/src/mdp/plugins/transformers/decom.py:21-32,104-124):
  * uint/int at 8/16/32/64 bits, float32, double64, big- or little-endian;
  * BOOLEAN = first byte != 0; any other (type,width) combo decodes as an
  * unsigned integer of ceil(bits/8) bytes (capped at 64 bits here — the
  * reference's unbounded Python int fallback is a documented divergence).
  *
  * These are static methods so the Catalyst expressions in
  * [[BinaryExpressions]] can call them from generated Java code and stay
  * inside whole-stage codegen.
  */
object BinaryFieldOps {

  @inline private def byteCount(bitLength: Int): Int = (bitLength + 7) / 8

  /** Unsigned big/little-endian accumulate of `n` bytes into a Long. */
  private def readUnsignedBits(
      data: Array[Byte], offset: Int, n: Int, littleEndian: Boolean): Long = {
    var acc = 0L
    var i = 0
    while (i < n) {
      val idx = if (littleEndian) offset + n - 1 - i else offset + i
      acc = (acc << 8) | (data(idx) & 0xffL)
      i += 1
    }
    acc
  }

  @inline private def unsignedToDouble(x: Long): Double =
    if (x >= 0) x.toDouble
    else ((x >>> 1).toDouble * 2.0) + (x & 1L)

  /** Decode a numeric field; null (None) when out of bounds — the
    * reference skips such samples (decom.py:87-88).
    */
  def readNumberBoxed(
      data: Array[Byte],
      byteOffset: Int,
      bitLength: Int,
      paramType: String,
      littleEndian: Boolean): java.lang.Double = {
    if (data == null || byteOffset < 0) return null
    val n = byteCount(bitLength)
    if (n <= 0 || n > 8 || byteOffset + n > data.length) return null
    val bits = readUnsignedBits(data, byteOffset, n, littleEndian)
    paramType match {
      case ParameterType.INT =>
        val shift = 64 - 8 * n
        java.lang.Double.valueOf(((bits << shift) >> shift).toDouble)
      case ParameterType.FLOAT if bitLength == 32 =>
        java.lang.Double.valueOf(java.lang.Float.intBitsToFloat(bits.toInt).toDouble)
      case ParameterType.DOUBLE if bitLength == 64 =>
        java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(bits))
      case ParameterType.BOOLEAN =>
        java.lang.Double.valueOf(if (data(byteOffset) != 0) 1.0 else 0.0)
      case ParameterType.STRING | ParameterType.BINARY =>
        null // non-numeric types go through readString / hex
      case _ => // UINT, ENUMERATED, and the catch-all int.from_bytes path
        java.lang.Double.valueOf(unsignedToDouble(bits))
    }
  }

  /** ASCII decode with replacement + trailing-NUL strip (decom.py:117-118). */
  def readStringField(
      data: Array[Byte], byteOffset: Int, bitLength: Int): org.apache.spark.unsafe.types.UTF8String = {
    if (data == null || byteOffset < 0) return null
    val n = byteCount(bitLength)
    if (byteOffset + n > data.length) return null
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = data(byteOffset + i) & 0xff
      sb.append(if (b < 0x80) b.toChar else '\ufffd')
      i += 1
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == '\u0000') end -= 1
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.substring(0, end))
  }

  /** Big-endian fixed-width pack of a long: direct byte write, wrapping
    * mod 2^(8*nBytes) like the hex/lpad/unhex form it replaces (oversized
    * values keep the LEAST significant bytes). Codegen kernel for
    * [[BinaryExpressions.packUintBE]].
    */
  def packUintBE(value: Long, nBytes: Int): Array[Byte] = {
    val out = new Array[Byte](nBytes)
    var i = 0
    while (i < nBytes) {
      out(nBytes - 1 - i) = ((value >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Big-endian unsigned read of up to 8 bytes at a fixed offset; null
    * when the slice is empty (mirrors the substring/hex/conv chain this
    * replaces: a partially-out-of-bounds slice reads the available
    * bytes). Codegen kernel for [[BinaryExpressions.readUintBE]].
    */
  def readUintBEBoxed(data: Array[Byte], byteOffset: Int, nBytes: Int): java.lang.Long = {
    if (data == null) return null
    val start = math.max(byteOffset, 0)
    val end = math.min(byteOffset + nBytes, data.length)
    if (start >= end) return null
    var acc = 0L
    var i = start
    while (i < end) {
      acc = (acc << 8) | (data(i) & 0xffL)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Big-endian encode of a numeric value — fixture/packing side
    * (inverse of readNumberBoxed; used to synthesize CCSDS streams from
    * testdata ints so DuckDB can oracle-check the decode arithmetically).
    */
  def packNumberBE(value: Double, bitLength: Int, paramType: String): Array[Byte] = {
    val n = byteCount(bitLength)
    val bits: Long = paramType match {
      case ParameterType.FLOAT if bitLength == 32 =>
        java.lang.Float.floatToIntBits(value.toFloat).toLong & 0xffffffffL
      case ParameterType.DOUBLE if bitLength == 64 =>
        java.lang.Double.doubleToLongBits(value)
      case _ => value.toLong
    }
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(n - 1 - i) = ((bits >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }
}
