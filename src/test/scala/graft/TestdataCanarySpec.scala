package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Canary against driver-side testdata regeneration changing a physical
  * schema out from under us. Round 9 lost 12 queries to analysis errors
  * and silently wrong-answered 3 streaming queries when events.ts moved
  * from epoch-nanos int64 to timestamp[us]: the hardcoded nanos read
  * interpreted µs values as ns, compressing the timeline 1000x while
  * schema_match stayed true. These checks fail LOUDLY on any such shift
  * before window math ever runs.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("events.ts loads as a timestamp within a sane epoch range") {
    val events = Tables.events(spark, sfDir)
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts loaded as ${events.schema("ts").dataType}, expected TimestampType")
    val Array(row) = events.agg(
      min("ts").as("lo"), max("ts").as("hi"), count(lit(1)).as("n")).collect()
    val (lo, hi) = (row.getAs[Timestamp]("lo"), row.getAs[Timestamp]("hi"))
    val loYear = 2020
    val hiYear = 2040
    def year(t: Timestamp): Int = t.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
    assert(row.getAs[Long]("n") > 0, "events table is empty")
    assert(year(lo) >= loYear && year(hi) <= hiYear,
      s"events.ts range [$lo, $hi] outside sane epoch years [$loYear, $hiYear] — " +
        "a unit-scale misread (ns vs us vs ms) compresses or explodes the timeline")
    // a 1000x-compressed timeline also collapses the span: the testdata
    // covers days of activity, so demand the span exceeds one hour
    assert(hi.getTime - lo.getTime > 3600L * 1000,
      s"events.ts span ${hi.getTime - lo.getTime} ms is under an hour — timeline compressed?")
  }

  test("streaming source sees the same timeline as the batch loader") {
    // the streaming path derives its schema separately (file probe), so
    // canary it separately: same row count and same min/max instant
    val batch = Tables.events(spark, sfDir)
      .agg(count(lit(1)), min("ts"), max("ts")).collect()(0)
    val streamed = streaming.EventStreaming.drainToMemorySink(
      spark, "canary_mem")(
      streamingEvents().groupBy().agg(count(lit(1)), min("ts"), max("ts")))
      .collect()(0)
    assert(streamed == batch,
      s"streaming (count,min,max)=$streamed != batch $batch")
  }

  /** Full schema inventory of every driver table, as Spark loads them
    * TODAY. Strict on purpose: a silent driver-side type change (the
    * events ts int64 -> timestamp[us] shift) corrupts oracle compares
    * or timelines without tripping any schema_match flag, so a regen
    * that alters ANY column should make `sbt test` red at HEAD and be
    * adapted to deliberately, not discovered via 15 failed queries.
    * events is asserted post-normalization above, not here.
    */
  test("driver tables load with the expected columns and types") {
    val expected = Map(
      "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double",
        "c_mktsegment" -> "string"),
      "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
      "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp_ntz"),
      "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Seq("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val got = Tables(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType.simpleString)
      if (got == cols) None
      else Some(s"$name: loaded $got, expected $cols")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  /** The legacy branch must keep working: a future driver regen could
    * revert to TIMESTAMP(NANOS) (read as epoch-nanos long under the
    * legacy flag), and the current testdata no longer exercises it.
    */
  test("normalizeEventTs converts an epoch-nanos long column to the same instant") {
    import spark.implicits._
    val micros = 1748736000000000L // 2025-06-01T00:00:00Z in epoch-micros
    val legacy = Seq((1L, micros * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Tables.normalizeEventTs(legacy)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select("ts").collect()(0).getAs[Timestamp]("ts")
    assert(got.toInstant.toEpochMilli == micros / 1000,
      s"nanos branch produced $got")
  }

  private def streamingEvents() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }
}
