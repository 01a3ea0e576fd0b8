package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators Spark lacks as single built-ins, composed the
  * scalable way (SURVEY.md custom-operator preference (a): compose
  * existing ops).
  */
object Events {

  /** As-of join: for each left row, the latest right row with
    * rightTime <= leftTime within the same key.
    *
    * Shape: tag + union + one window pass with a carry-forward
    * `last(..., ignoreNulls)` — a single shuffle on (key), linear state,
    * instead of the range-join + per-pair filter that explodes on hot
    * keys. Right rows at exactly leftTime match (<=): the sort places
    * right (tag 0) before left (tag 1) at equal timestamps.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    // Carry the right row as ONE struct: `last(ignoreNulls)` then skips
    // left rows (null struct) but never a right row whose individual
    // value is null — carrying values separately would both return
    // stale non-null values and mix fields from different right rows.
    val payload = struct(valueCols.map(col): _*)
    val rTagged = right
      // a NULL right timestamp never satisfies `rightTime <= leftTime`;
      // unfiltered it would sort nulls-first and poison the carry
      .where(col(timeCol).isNotNull)
      .select((Seq(col(key), col(timeCol)) ++ valueCols.map(col)): _*)
      .withColumn("_tag", lit(0))
      .withColumn("_asof", payload)
      .drop(valueCols: _*)
    val lTagged = left
      .withColumn("_tag", lit(1))
      .withColumn("_asof", lit(null).cast(rTagged.schema("_asof").dataType))
    // align columns: left keeps its full schema; right rows carry nulls
    // for the remaining left columns and are dropped after the window
    val rAligned = left.columns.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lTagged.unionByName(rAligned.select(lTagged.columns.map(col): _*))
    val w = Window.partitionBy(key).orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_asof",
      last(col("_asof"), ignoreNulls = true).over(w))
    // matched right values surface as asof_<col> (never collides with a
    // left column of the same name)
    carried
      .where(col("_tag") === 1)
      .withColumns(valueCols.map(v => s"asof_$v" -> col("_asof")(v)).toMap)
      .drop("_tag", "_asof")
  }

  /** Sessionization: a new session starts after a gap > gapSeconds
    * within a key. One window pass: flag gap starts, running-sum the
    * flags into session ids.
    */
  def sessionize(
      events: DataFrame, key: String, timeCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(timeCol)
    val prevTs = lag(col(timeCol), 1).over(w)
    // timestamp -> double keeps fractional seconds; unix_timestamp's
    // whole-second floor let gaps up to 1s over the threshold slip by
    val newSession = when(
      prevTs.isNull ||
        col(timeCol).cast("double") - prevTs.cast("double") > gapSeconds.toDouble, 1L)
      .otherwise(0L)
    events
      .withColumn("_new_session", newSession)
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_session")
  }
}
