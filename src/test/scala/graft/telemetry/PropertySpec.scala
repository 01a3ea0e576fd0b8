package graft.telemetry

import graft.sources.CcsdsSource
import graft.sources.CcsdsSource.Options
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the pure kernels (SURVEY.md §5): header round-trip,
  * decode/encode inverses across widths and endianness, parser totality.
  * These run without a SparkSession — the kernels are plain JVM code that
  * the Catalyst expressions call. (Pure ScalaCheck Properties: sbt's
  * ScalaCheck framework runs this directly.)
  */
object PropertySpec extends Properties("telemetry-kernels") {

  private val headerGen = for {
    apid <- Gen.choose(0, 0x7ff)
    seq <- Gen.choose(0, 0x3fff)
    tf <- Gen.choose(0, 1)
    sf <- Gen.choose(0, 3)
    nData <- Gen.choose(1, 64)
    data <- Gen.listOfN(nData, Gen.choose(-128, 127).map(_.toByte))
  } yield (apid, seq, tf, sf, data.toArray)

  property("header pack -> parse round-trips all fields") =
    Prop.forAll(headerGen) { case (apid, seq, tf, sfl, data) =>
      val raw = Fixtures.makeRawPacket(
        apid = apid, seqCount = seq, userData = data, typeFlag = tf, seqFlags = sfl)
      val row = CcsdsSource.parseStream(raw, Options()).next()
      row.apid == apid && row.seq_count == seq && row.type_flag == tf &&
        row.seq_flags == sfl && row.data_length == data.length - 1 &&
        row.user_data.toSeq == data.toSeq
    }

  property("uint pack -> decode identity (8/16/32 BE)") = {
    val gen = for {
      bits <- Gen.oneOf(8, 16, 32)
      v <- Gen.choose(0L, (1L << bits) - 1)
    } yield (bits, v)
    Prop.forAll(gen) { case (bits, v) =>
      val packed = BinaryFieldOps.packNumberBE(v.toDouble, bits, ParameterType.UINT)
      BinaryFieldOps.readNumberBoxed(packed, 0, bits, ParameterType.UINT, false) ==
        java.lang.Double.valueOf(v.toDouble)
    }
  }

  property("int pack -> decode identity incl. negatives, both endiannesses") = {
    val gen = for {
      bits <- Gen.oneOf(8, 16, 32, 64)
      v <- Gen.choose(-(1L << (bits - 1)), (1L << (bits - 1)) - 1)
      le <- Gen.oneOf(true, false)
    } yield (bits, v, le)
    Prop.forAll(gen) { case (bits, v, le) =>
      val be = BinaryFieldOps.packNumberBE(v.toDouble, bits, ParameterType.INT)
      val bytes = if (le) be.reverse else be
      val got = BinaryFieldOps.readNumberBoxed(bytes, 0, bits, ParameterType.INT, le)
      (math.abs(v) > (1L << 53)) ||
        got == java.lang.Double.valueOf(v.toDouble)
    }
  }

  property("float32/double64 pack -> decode preserve the value") =
    Prop.forAll(Gen.choose(-1e6f, 1e6f)) { f =>
      val packed = BinaryFieldOps.packNumberBE(f.toDouble, 32, ParameterType.FLOAT)
      BinaryFieldOps.readNumberBoxed(packed, 0, 32, ParameterType.FLOAT, false) ==
        java.lang.Double.valueOf(f.toDouble)
    } && Prop.forAll(Gen.choose(-1e12, 1e12)) { d =>
      val packed = BinaryFieldOps.packNumberBE(d, 64, ParameterType.DOUBLE)
      BinaryFieldOps.readNumberBoxed(packed, 0, 64, ParameterType.DOUBLE, false) ==
        java.lang.Double.valueOf(d)
    }

  property("packUintBE wraps mod 2^(8n) and round-trips through readUintBE") = {
    val gen = for {
      n <- Gen.choose(1, 8)
      v <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (n, v)
    Prop.forAll(gen) { case (n, v) =>
      val packed = BinaryFieldOps.packUintBE(v, n)
      val back = BinaryFieldOps.readUintBEBoxed(packed, 0, n)
      val expected = if (n >= 8) v else v & ((1L << (8 * n)) - 1)
      packed.length == n && back != null && back.longValue() == expected
    }
  }

  property("readUintBE reads the available bytes on partial overrun, null on empty") = {
    val gen = for {
      len <- Gen.choose(0, 8)
      data <- Gen.listOfN(len, Gen.choose(-128, 127).map(_.toByte))
      off <- Gen.choose(0, 10)
      n <- Gen.choose(1, 8)
    } yield (data.toArray, off, n)
    Prop.forAll(gen) { case (data, off, n) =>
      val r = BinaryFieldOps.readUintBEBoxed(data, off, n)
      val slice = data.slice(off, math.min(off + n, data.length))
      if (slice.isEmpty) r == null
      else r.longValue() == slice.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
  }

  property("out-of-bounds reads decode to null, never throw") = {
    val gen = for {
      n <- Gen.choose(0, 8)
      data <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
      off <- Gen.choose(-2, 16)
      bits <- Gen.oneOf(8, 16, 32, 64)
    } yield (data.toArray, off, bits)
    Prop.forAll(gen) { case (data, off, bits) =>
      val r = BinaryFieldOps.readNumberBoxed(data, off, bits, ParameterType.UINT, false)
      val inBounds = off >= 0 && off + (bits + 7) / 8 <= data.length
      inBounds == (r != null)
    }
  }

  property("parser is total: never throws on packets + garbage tail") = {
    val streamGen = for {
      pkts <- Gen.listOf(headerGen)
      tail <- Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
    } yield pkts.map { case (a, s, tf, sfl, d) =>
      Fixtures.makeRawPacket(apid = a, seqCount = s, userData = d,
        typeFlag = tf, seqFlags = sfl)
    }.foldLeft(Array.emptyByteArray)(_ ++ _) ++ tail.toArray
    Prop.forAll(streamGen) { bytes =>
      CcsdsSource.parseStream(bytes, Options()).size >= 0
    }
  }

  property("table interpolation clamps at ends and is monotone inside") = {
    import graft.operators.Calibration
    val xs = Seq(0.0, 10.0, 20.0, 30.0)
    val ys = Seq(0.0, 5.0, 7.0, 30.0) // monotone table
    // evaluate the generated Column against a literal via the kernel math:
    def interp(x: Double): Double = {
      if (x <= xs.head) ys.head
      else if (x >= xs.last) ys.last
      else {
        val i = xs.lastIndexWhere(_ <= x)
        val idx = math.min(i, xs.size - 2)
        ys(idx) + (x - xs(idx)) * ((ys(idx + 1) - ys(idx)) / (xs(idx + 1) - xs(idx)))
      }
    }
    Prop.forAll(Gen.choose(-100.0, 100.0), Gen.choose(-100.0, 100.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      interp(lo) <= interp(hi) + 1e-9 // monotone table => monotone output
    }
  }
}
