package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the pure split-bounds math behind
  * Mixture.hashSplit (no SparkSession): an off-by-one in the bucket
  * ranges silently leaks eval docs into train, so the partition
  * invariants are checked over arbitrary fraction lists.
  */
object MixturePropertySpec extends Properties("mixture-split-bounds") {

  // 1..6 positive weights, normalized to sum exactly-enough to 1
  private val splitsGen: Gen[Seq[(String, Double)]] = for {
    n <- Gen.choose(1, 6)
    ws <- Gen.listOfN(n, Gen.choose(0.01, 10.0))
  } yield {
    val total = ws.sum
    ws.zipWithIndex.map { case (w, i) => s"s$i" -> w / total }
  }

  property("bounds partition [0, 1e6) exhaustively") =
    Prop.forAll(splitsGen) { splits =>
      val bounds = Mixture.splitBounds(splits)
      bounds.last._2 == 1000000L && // bucket 999999 always owned
        bounds.head._2 > 0L // first split owns a non-empty range
    }

  property("bounds are strictly increasing (every split non-empty)") =
    Prop.forAll(splitsGen) { splits =>
      val hi = Mixture.splitBounds(splits).map(_._2)
      hi.zip(hi.tail).forall { case (a, b) => a < b }
    }

  property("split order and names are preserved") =
    Prop.forAll(splitsGen) { splits =>
      Mixture.splitBounds(splits).map(_._1) == splits.map(_._1)
    }

  property("range widths track fractions within rounding") =
    Prop.forAll(splitsGen) { splits =>
      val bounds = Mixture.splitBounds(splits)
      val widths = bounds.map(_._2).zip(0L +: bounds.map(_._2).init)
        .map { case (hi, lo) => hi - lo }
      widths.zip(splits.map(_._2)).forall { case (w, f) =>
        // each width within 1 bucket of fraction * 1e6, except the
        // last which also absorbs the global rounding remainder
        math.abs(w - f * 1e6) <= splits.size + 1
      }
    }
}
