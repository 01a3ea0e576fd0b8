package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the Rabin-Karp window-hash kernel (pure JVM —
  * the Catalyst expression delegates to exactly this method). The
  * reference is the direct per-window polynomial in BigInt, the same
  * formula the DuckDB oracle evaluates in HUGEINT.
  */
object TextHashPropertySpec extends Properties("text-hash-kernel") {

  private val M = BigInt(TextHashOps.M)
  private val B = BigInt(TextHashOps.B)

  /** Strings over a small alphabet (forces window collisions/repeats)
    * plus occasional multi-byte and supplementary code points.
    */
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 220)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf('a', 'b', 'c', ' '),
      1 -> Gen.oneOf('é', '中'),
      1 -> Gen.const("😀"))) // U+1F600, one code point
  } yield cs.mkString

  private def ref(s: String, winLen: Int): Seq[Long] = {
    val cps = s.codePoints().toArray.toSeq
    if (cps.length < winLen) Seq.empty
    else cps.sliding(winLen).map { w =>
      w.foldLeft(BigInt(0))((acc, cp) => (acc * B + cp) % M).toLong
    }.toSeq
  }

  property("rolling hashes equal the direct polynomial, any winLen") =
    Prop.forAll(textGen, Gen.choose(2, 50)) { (s, winLen) =>
      val got = TextHashOps.rollingHashes(UTF8String.fromString(s), winLen)
        .toLongArray().toSeq
      got == ref(s, winLen)
    }

  property("window count is codePoints - winLen + 1, floored at zero") =
    Prop.forAll(textGen, Gen.choose(2, 50)) { (s, winLen) =>
      val n = s.codePointCount(0, s.length)
      val got = TextHashOps.rollingHashes(UTF8String.fromString(s), winLen)
        .numElements()
      got == math.max(0, n - winLen + 1)
    }

  property("equal windows hash equal across different strings") =
    Prop.forAll(textGen, Gen.choose(2, 20)) { (s, winLen) =>
      val n = s.codePointCount(0, s.length)
      n < winLen || {
        // plant the first window of s inside unrelated context
        val cps = s.codePoints().toArray.take(winLen)
        val w = new String(cps, 0, cps.length)
        val other = "XY" + w + "Z"
        val a = TextHashOps.rollingHashes(UTF8String.fromString(s), winLen)
          .toLongArray()(0)
        val b = TextHashOps.rollingHashes(UTF8String.fromString(other), winLen)
          .toLongArray()(2)
        a == b
      }
    }

  property("mulmod matches BigInt for values up to M-1") =
    Prop.forAll(Gen.choose(0L, TextHashOps.M - 1), Gen.choose(0L, TextHashOps.M - 1)) {
      (a, b) =>
        TextHashOps.mulmod(a, b) == ((BigInt(a) * BigInt(b)) % M).toLong
    }

  property("powers are B^(winLen-1-j) mod M") =
    Prop.forAll(Gen.choose(2, 64)) { winLen =>
      val p = TextHashOps.powers(winLen)
      p.indices.forall(j => BigInt(p(j)) == B.modPow(winLen - 1 - j, M))
    }
}
