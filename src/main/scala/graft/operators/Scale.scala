package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns packaged as operators: skew-salted joins and bucketed
  * co-located joins. On local[32] these are exercised for plan shape and
  * result equality; on a real cluster they are the difference between a
  * straggler-bound shuffle and an even one.
  */
object Scale {

  /** Inner equi-join where `left` is heavily skewed on the key: salt the
    * left side into `saltFactor` pseudo-keys and replicate the right
    * side across all salts. The salt is a round-robin row counter, so
    * bit-identical duplicate rows of the hot key (the common log-replay
    * shape) still spread; and since the right side is replicated to
    * EVERY salt, any salt assignment yields the identical join result —
    * correctness does not depend on salt determinism across retries.
    *
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological single-key case (e.g. one APID
    * carrying 90% of packets) where even a split partition is one key.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltedLeft = left.withColumn(
      "_salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val salts = explode(sequence(lit(0), lit(saltFactor - 1)))
    val saltedRight = right.withColumn("_salt", salts)
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a table bucketed+sorted by a join key. Two tables bucketed
    * the same way join with NO exchange (co-located sort-merge join) —
    * the 100 TB answer for repeated fact-fact joins on the same key.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
