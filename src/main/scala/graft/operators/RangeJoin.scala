package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range joins without a nested-loop explosion.
  *
  * Spark plans a plain `a.ts BETWEEN b.start AND b.end` join as
  * BroadcastNestedLoopJoin (O(n*m) compares, and undistributable when
  * neither side broadcasts). The scalable shape is bucketization: quantize
  * time into fixed-width buckets, explode the interval side over the
  * buckets it overlaps, equi-join on the bucket id (hash-partitionable),
  * and re-apply the exact predicate as a residual filter. With interval
  * width <= bucket width each interval lands in at most 2 buckets, so the
  * exchange grows by at most 2x while the join becomes an ordinary
  * shuffle/broadcast hash join — the same trick Databricks' range-join
  * hints and Flink's interval joins use.
  */
object RangeJoin {

  /** Join `points` (event side, instant `pointCol`) to `intervals`
    * (interval side, [startCol, startCol + widthSeconds)), on
    * bucket-equality + residual predicate. Bucket width == interval
    * width, so each interval explodes to exactly 2 buckets.
    *
    * Output: all columns of both inputs for every (point, interval)
    * match. Callers aggregate afterwards.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, widthSeconds: Long): DataFrame = {
    require(widthSeconds > 0, "interval width must be positive")
    // join-key column name must not collide with caller columns
    val bucket = {
      val taken = (points.columns ++ intervals.columns).toSet
      Iterator.from(0).map(i => s"_rj_bucket$i").find(!taken(_)).get
    }
    val w = lit(widthSeconds)
    val pBucket = (unix_timestamp(col(pointCol)) / w).cast("bigint")
    val iBucket = (unix_timestamp(col(startCol)) / w).cast("bigint")
    val probe = points.withColumn(bucket, pBucket)
    val build = intervals
      .withColumn(bucket, explode(array(iBucket, iBucket + 1)))
    probe.join(build, Seq(bucket))
      .where(col(pointCol) >= col(startCol) &&
        col(pointCol) < col(startCol) + expr(s"INTERVAL $widthSeconds SECONDS"))
      .drop(bucket)
  }
}
