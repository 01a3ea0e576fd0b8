package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val clicks = Seq((1L, ts(100), 10L), (1L, ts(200), 11L), (1L, ts(50), 12L),
      (2L, ts(100), 20L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq((1L, ts(80), 8.0), (1L, ts(200), 9.0), (3L, ts(10), 99.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = Events.asOfJoin(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
      .select("event_id", "asof_purchase_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).contains(8.0)) // ts 100 -> purchase at 80
    assert(out(11L).contains(9.0)) // ts 200 -> purchase AT 200 (<= matches)
    assert(out(12L).isEmpty) // ts 50 -> nothing before
    assert(out(20L).isEmpty) // user 2 has no purchases
  }

  test("asOfJoin returns the latest right row even when its value is NULL") {
    val clicks = Seq((1L, ts(30), 1L)).toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, ts(10), Some(5.0)), (1L, ts(20), None: Option[Double]))
      .toDF("user_id", "ts", "purchase_value")
    val out = Events.asOfJoin(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
      .select("asof_purchase_value").head()
    // the t=20 row is the as-of match; its NULL value must surface,
    // not the stale t=10 value
    assert(out.isNullAt(0))
  }

  test("asOfJoin ignores right rows with NULL timestamps") {
    val clicks = Seq((1L, ts(30), 1L)).toDF("user_id", "ts", "event_id")
    val purchases = Seq(
      (1L, Some(ts(10)), 5.0), (1L, None: Option[java.sql.Timestamp], 99.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = Events.asOfJoin(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
      .select("asof_purchase_value").head()
    assert(out.getDouble(0) == 5.0) // null-ts row never matches
  }

  test("sessionize splits on sub-second gap excess") {
    val a = new java.sql.Timestamp(950L) // 0.95s
    val b = new java.sql.Timestamp(1800L * 1000 + 1900L) // 1801.9s -> gap 1800.95
    val e = Seq((1L, a), (1L, b)).toDF("user_id", "ts")
    val out = Events.sessionize(e, "user_id", "ts", gapSeconds = 1800)
      .select("session_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L)) // whole-second floor would merge them
  }

  test("sessionize splits on gaps and numbers sessions per key") {
    val e = Seq(
      (1L, ts(0)), (1L, ts(100)), (1L, ts(2000)), (1L, ts(2100)), // gap at 2000
      (2L, ts(0)))
      .toDF("user_id", "ts")
    val out = Events.sessionize(e, "user_id", "ts", gapSeconds = 1800)
      .orderBy("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("session_id")))
    assert(out.toSeq == Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)))
  }
}
