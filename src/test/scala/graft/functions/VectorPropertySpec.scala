package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the vector kernels (pure JVM, no SparkSession —
  * the Catalyst expressions delegate to exactly these methods).
  */
object VectorPropertySpec extends Properties("vector-kernels") {

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.choose(1, 96)
    xs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield xs.toArray

  private def ad(a: Array[Double]) = new GenericArrayData(a)

  property("dot equals the left-to-right reference fold") =
    Prop.forAll(vecGen) { a =>
      val b = a.map(x => x * 0.5 - 1.0)
      val expected = {
        var acc = 0.0
        var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      VectorOps.dot(ad(a), false, ad(b), false).doubleValue() == expected
    }

  property("dot is null on length mismatch") =
    Prop.forAll(vecGen) { a =>
      a.length < 2 ||
        VectorOps.dot(ad(a), false, ad(a.drop(1)), false) == null
    }

  property("normalize yields unit norm (or preserves the zero vector)") =
    Prop.forAll(vecGen) { a =>
      val out = VectorOps.normalize(ad(a), false).toDoubleArray()
      val norm = math.sqrt(out.map(x => x * x).sum)
      if (a.forall(_ == 0.0)) out.sameElements(a)
      else math.abs(norm - 1.0) < 1e-9
    }

  property("sqDist is non-negative, zero iff equal") =
    Prop.forAll(vecGen) { a =>
      val self = VectorOps.sqDist(ad(a), false, ad(a), false).doubleValue()
      val b = a.clone(); b(0) += 1.0
      val moved = VectorOps.sqDist(ad(a), false, ad(b), false).doubleValue()
      self == 0.0 && moved > 0.0
    }

  property("lshBuckets: numTables buckets, each within planesPerTable bits") =
    Prop.forAll(vecGen, Gen.choose(1, 8), Gen.choose(1, 8)) { (a, ppt, nt) =>
      val buckets = VectorOps.lshBuckets(ad(a), false, ppt, nt).toLongArray()
      buckets.length == nt && buckets.forall(b => b >= 0 && b < (1L << ppt))
    }

  property("lshBuckets is scale-invariant (sign bits only)") =
    Prop.forAll(vecGen, Gen.choose(0.001, 1000.0)) { (a, s) =>
      val scaled = a.map(_ * s)
      VectorOps.lshBuckets(ad(a), false, 4, 4).toLongArray()
        .sameElements(VectorOps.lshBuckets(ad(scaled), false, 4, 4).toLongArray())
    }
}
