package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates. The oracle gate asserts
  * q19's in-bound booleans hash-wise; this spec asserts the underlying
  * quantitative curve (raw sketch vs exact) so a bound loosened by
  * accident would still be caught here.
  */
class ApproxSpec extends SparkSpec {

  test("approx sketches stay within tolerance of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val o = Tables(spark, dir, "orders")
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"),
        expr("percentile(o_totalprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = o.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("ac"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("am"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (n, med)) =>
      val (en, emed) = exact(k)
      assert(math.abs(n - en).toDouble / en < 0.05, s"$k count-distinct off: $n vs $en")
      assert(math.abs(med - emed) / emed < 0.05, s"$k median off: $med vs $emed")
    }
    // and the gate query's flags are all true (what the oracle asserts)
    val flags = SparkEntry.queries("q19_approx")(spark, dir).collect()
    flags.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4), s"q19 bound flag false: $r")
    }
  }
}
