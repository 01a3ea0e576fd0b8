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

  property("quantize8 stays in [-127,127] and dequantizes within scale/2 per element") =
    Prop.forAll(vecGen) { a =>
      val q = VectorOps.quantize8(ad(a), false).toByteArray()
      val s = VectorOps.quantScale(ad(a), false).doubleValue()
      q.length == a.length && q.forall(b => b >= -127 && b <= 127) &&
        (s == 0.0 || a.indices.forall(i => math.abs(q(i) * s - a(i)) <= s / 2 + 1e-12))
    }

  property("quantize8 of the zero vector is all zeros with zero scale") =
    Prop.forAll(Gen.choose(1, 96)) { n =>
      val z = Array.fill(n)(0.0)
      VectorOps.quantize8(ad(z), false).toByteArray().forall(_ == 0) &&
        VectorOps.quantScale(ad(z), false).doubleValue() == 0.0
    }

  property("dotInt8 dequantized approximates the exact dot of unit vectors") =
    Prop.forAll(vecGen) { a =>
      a.forall(_ == 0.0) || {
        val ea = VectorOps.normalize(ad(a), false)
        val b = a.map(x => -x * 0.25 + 1.0)
        val eb = VectorOps.normalize(ad(b), false)
        val (qa, qb) = (VectorOps.quantize8(ea, false), VectorOps.quantize8(eb, false))
        val (sa, sb) = (VectorOps.quantScale(ea, false).doubleValue(),
          VectorOps.quantScale(eb, false).doubleValue())
        val approx = VectorOps.dotInt8(qa, qb).longValue() * sa * sb
        val exact = VectorOps.dot(ea, false, eb, false).doubleValue()
        // worst-case per-element error s/2 each side, n elements, unit norms
        math.abs(approx - exact) <= a.length * (sa / 2 + sb / 2) + 1e-9
      }
    }

  property("sortedContains matches linear membership on sorted arrays") =
    Prop.forAll(Gen.listOf(Gen.choose(-1000L, 1000L)), Gen.choose(-1000L, 1000L)) { (xs, probe) =>
      val sorted = xs.distinct.sorted.toArray
      val arr = new GenericArrayData(sorted)
      VectorOps.sortedContains(arr, probe) == sorted.contains(probe)
    }

  property("topCentroids equals sort-all-then-slice, ties included") =
    Prop.forAll(vecGen, Gen.choose(1, 10), Gen.choose(1, 12)) { (v, nprobe, k0) =>
      val dims = v.length
      // k0 derived centroids plus a clone of the first -> an exact
      // distance tie the cid tie-break must resolve identically
      val base = (0 until k0).map(c =>
        (c, v.map(x => x * ((c % 5) - 2) * 0.1 + c)))
      val cents = base :+ (k0, base.head._2.clone)
      val flat = cents.flatMap(_._2).toArray
      val cids = cents.map(_._1).toArray
      val got = VectorOps.topCentroids(ad(v), false, flat, cids, dims, nprobe)
      val ref = cents.map { case (c, ce) =>
        var acc = 0.0
        var i = 0
        while (i < dims) { val d = v(i) - ce(i); acc += d * d; i += 1 }
        (acc, c)
      }.sorted.take(nprobe)
      val rows = (0 until got.numElements()).map { j =>
        val r = got.getStruct(j, 2)
        (r.getDouble(0), r.getInt(1))
      }
      rows == ref
    }

  property("topCentroids at nprobe >= k returns all k, fully sorted") =
    Prop.forAll(vecGen, Gen.choose(1, 12)) { (v, k0) =>
      val cents = (0 until k0).map(c => (c, v.map(_ + c * 0.5)))
      val flat = cents.flatMap(_._2).toArray
      val cids = cents.map(_._1).toArray
      val got = VectorOps.topCentroids(ad(v), false, flat, cids, v.length, k0 + 7)
      val rows = (0 until got.numElements()).map { j =>
        val r = got.getStruct(j, 2)
        (r.getDouble(0), r.getInt(1))
      }
      rows.length == k0 && rows == rows.sorted
    }

  property("topCentroids first entry equals nearestCentroid") =
    Prop.forAll(vecGen, Gen.choose(2, 12)) { (v, k0) =>
      val cents = (0 until k0).map(c => (c, v.map(x => x * 0.9 + c - 3)))
      val flat = cents.flatMap(_._2).toArray
      val cids = cents.map(_._1).toArray
      val top = VectorOps.topCentroids(ad(v), false, flat, cids, v.length, 1)
        .getStruct(0, 2)
      val nn = VectorOps.nearestCentroid(ad(v), false, flat, cids, v.length)
      top.getDouble(0) == nn.getDouble(0) && top.getInt(1) == nn.getInt(1)
    }

  property("dotInt8 is null on length mismatch") =
    Prop.forAll(vecGen) { a =>
      a.length < 2 || {
        val q = VectorOps.quantize8(ad(a), false)
        val shorter = VectorOps.quantize8(ad(a.drop(1)), false)
        VectorOps.dotInt8(q, shorter) == null
      }
    }
}
