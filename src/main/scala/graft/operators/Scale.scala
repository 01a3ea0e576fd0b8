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
    * left side into `saltFactor` pseudo-keys (deterministic hash of the
    * whole row, not rand(), so retries/speculation stay consistent) and
    * replicate the right side across all salts. Result equals the plain
    * join; the hot key's rows spread over saltFactor reducers.
    *
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological single-key case (e.g. one APID
    * carrying 90% of packets) where even a split partition is one key.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltedLeft = left.withColumn(
      "_salt", pmod(hash(struct(left.columns.map(col): _*)), lit(saltFactor)))
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
