package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates (q19 is rows-only in the
  * oracle gate; the quantitative check lives here).
  */
class ApproxSpec extends SparkSpec {

  test("approx sketches stay within tolerance of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val o = Tables(spark, dir, "orders")
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"),
        expr("percentile(o_totalprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q19_approx")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (n, med)) =>
      val (en, emed) = exact(k)
      assert(math.abs(n - en).toDouble / en < 0.05, s"$k count-distinct off: $n vs $en")
      assert(math.abs(med - emed) / emed < 0.05, s"$k median off: $med vs $emed")
    }
  }
}
