package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the word-n-gram hash kernel and the winnowing
  * window-min kernel (pure JVM — the Catalyst expressions delegate to
  * exactly these methods). The reference is the string pipeline the
  * DuckDB oracles replay: whitespace tokens, grams joined with a
  * single space, hash60 = first 15 hex digits of md5 as a BIGINT —
  * i.e. the r15 window-based `Dedup.gramRows` semantics.
  */
object TokenGramPropertySpec extends Properties("token-gram-kernel") {

  /** Strings over a tiny alphabet (forces repeated grams) with messy
    * whitespace and occasional multi-byte code points.
    */
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf("a", "b", "ab", "ba"),
      4 -> Gen.oneOf(" ", "  ", "\t", "\n"),
      1 -> Gen.oneOf("é", "中", "😀")))
  } yield cs.mkString

  /** Java-regex `\s+` collapse + trim — TextAnalysis.normalize minus
    * the lower() (irrelevant here: kernel and reference consume the
    * SAME normalized string).
    */
  private def norm(s: String): String = s.replaceAll("\\s+", " ").trim

  private def refGrams(normed: String, n: Int): Seq[String] = {
    val toks = normed.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < n) Seq(normed)
    else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xFF}%02x").mkString
  }

  private def refH60(g: String): Long =
    java.lang.Long.parseLong(md5Hex(g).substring(0, 15), 16)

  property("kernel hashes == hash60 of the string-pipeline grams") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (raw, n) =>
      val s = norm(raw)
      val got = TokenGramOps.tokenGramHash60s(UTF8String.fromString(s), n)
        .toLongArray().toSeq
      got == refGrams(s, n).map(refH60)
    }

  property("baseHash == (hash60 >>> 28) % P for any gram") =
    Prop.forAll(textGen) { raw =>
      val g = norm(raw)
      val h60 = refH60(g)
      val base = (BigInt(md5Hex(g).substring(0, 8), 16) %
        graft.operators.Dedup.minhashP).toLong
      ((h60 >>> 28) % graft.operators.Dedup.minhashP) == base
    }

  property("gram count = max(1, tokens - n + 1) on normalized input") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (raw, n) =>
      val s = norm(raw)
      val toks = s.split("\\s+").count(_.nonEmpty)
      val got = TokenGramOps.tokenGramHash60s(UTF8String.fromString(s), n)
        .numElements()
      got == (if (toks < n) 1 else toks - n + 1)
    }

  property("distinct grams never empty: short docs -> ONE whole-text gram") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (raw, n) =>
      // the s19 hybrid-rerank contract: every doc's gram-SET size is
      // >= 1 (a < n-token doc falls back to hash60 of the normalized
      // text — the oracle's `ELSE [normSql]` branch), so the Jaccard
      // denominator q_sz + c_sz - i is >= 1 and the engine's size()
      // can never be 0 where the oracle's gsz inner join has a row
      val s = norm(raw)
      val got = TokenGramOps
        .tokenGramHash60sDistinct(UTF8String.fromString(s), n)
      val toks = s.split("\\s+").count(_.nonEmpty)
      got.numElements() >= 1 &&
        (toks >= n || (got.numElements() == 1 &&
          got.toLongArray()(0) == refH60(s)))
    }

  property("seeded token hashes == hash60 of 'seed:token' per token") =
    Prop.forAll(textGen, Gen.choose(0, 5)) { (raw, seed) =>
      val s = norm(raw)
      val got = TokenGramOps.tokenSeededHash60s(UTF8String.fromString(s), seed)
        .toLongArray().toSeq
      val want = s.split("\\s+").filter(_.nonEmpty).toSeq
        .map(t => refH60(s"$seed:$t"))
      got == want
    }

  private val arrGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 60)
    vs <- Gen.listOfN(n, Gen.choose(0L, 9L)) // ties exercise the deque
  } yield vs

  property("sliding mins == per-window min; single all-min when short") =
    Prop.forAll(arrGen, Gen.choose(1, 8)) { (a, w) =>
      val got = SlidingWindowMins.mins(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray), w)
        .toLongArray().toSeq
      val want =
        if (a.isEmpty) Seq.empty[Long]
        else if (a.length < w) Seq(a.min)
        else a.sliding(w).map(_.min).toSeq
      got == want
    }
}
