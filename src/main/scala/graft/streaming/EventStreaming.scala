package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table, runnable inside the
  * batch correctness gate: stream the parquet file through a
  * transformation into a memory sink, drain it, and hand back the
  * result table. Batch and streaming answers coincide once every input
  * file is processed, so the same DuckDB SQL oracles the streaming
  * pipeline.
  */
object EventStreaming {

  /** Test-only tap: when set (per thread), [[drainToMemorySink]] hands
    * the LAST micro-batch's executed physical plan to the callback
    * after the drain completes and before the query stops. This is how
    * StreamingSpec asserts the stream-static join posture (no per-batch
    * Exchange on the static side) on the plan a micro-batch actually
    * re-runs — the pre-start logical plan can't show it. Null outside
    * tests; never read on the hot path beyond one null check.
    */
  private[graft] val lastPlanTap =
    new ThreadLocal[org.apache.spark.sql.execution.SparkPlan => Unit]

  /** Shared harness: events file stream -> `transform` -> complete-mode
    * memory sink, drained and returned as a batch DataFrame. The drain
    * protocol (processAllAvailable inside try, stop+awaitTermination in
    * finally) is the fragile part — keep it in one place.
    *
    * Streaming sources need their schema up front, and the testdata's
    * `ts` physical type has changed across driver generations (epoch-
    * nanos int64 vs timestamp[us]) — so probe the actual file with a
    * batch read and reuse Tables.normalizeEventTs for the conversion,
    * instead of hardcoding a schema that silently mis-scales when the
    * file changes (round 9's 1000x-compressed-timeline failure).
    */
  private def runToMemorySink(
      spark: SparkSession, dir: String, queryName: String,
      outputMode: String = "complete")(
      transform: DataFrame => DataFrame): DataFrame = {
    val (stream, hint) = eventsStream(spark, dir)
    drainToMemorySink(spark, queryName, outputMode, hint)(transform(stream))
  }

  /** [[runToMemorySink]]'s sibling for APPEND-mode queries whose
    * output is data-proportional: drain through the real parquet FILE
    * sink (exactly-once via the sink's commit log) and read the result
    * back — rows land executor-parallel on disk, never in a
    * driver-side memory table. This is the sink a production
    * sessionization job uses; the memory sink stays for the
    * complete-mode and small-output gates.
    */
  private def runToFileSink(
      spark: SparkSession, dir: String, tag: String)(
      transform: DataFrame => DataFrame): DataFrame = {
    val (stream, hint) = eventsStream(spark, dir)
    // TempDirs.fresh, not raw createTempDirectory: sink + checkpoint die
    // with the JVM like every other scratch path (r16 ADVICE — they used
    // to accumulate in /tmp across sessions)
    val out = graft.TempDirs.fresh(s"graft_${tag}_sink")
    val ckpt = graft.TempDirs.fresh(s"graft_${tag}_ckpt")
    val result = transform(stream)
    val query = withStreamConfs(spark,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", hint.toString)) {
      result.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }
    try {
      query.processAllAvailable()
      val tap = lastPlanTap.get
      if (tap != null)
        tap(org.apache.spark.sql.GraftShims.lastExecutedPlan(query))
    } finally {
      query.stop()
      query.awaitTermination()
    }
    // If the watermark never closed a single session (short-timeline
    // inputs — e.g. an sf0.001 iteration dataset), the sink directory
    // has no data files and spark.read.parquet would die on schema
    // inference. The correct answer there is the empty result with the
    // query's own schema.
    val hasData = {
      val d = new java.io.File(out)
      Option(d.listFiles).exists(_.exists(f =>
        f.isFile && f.getName.endsWith(".parquet")))
    }
    if (hasData) spark.read.parquet(out)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], result.schema)
  }

  /** Confs a stateful streaming query captures at start(): shuffle
    * partitions (= state-store instance count) and the state-store
    * provider. Set around `start`, restored immediately after — the
    * rest of the shared session keeps the batch settings.
    *
    * SPARK_GRAFT_STATE_STORE=rocksdb switches to the in-box
    * RocksDBStateStoreProvider (rocksdbjni ships with Spark). Default
    * stays the HDFS-backed in-memory provider: at our gate scales the
    * state fits comfortably in memory and RocksDB's per-batch
    * checkpoint/compaction overhead only pays off when state exceeds
    * executor memory — measured on st2/st4/st7 at sf1/sf3, see
    * SCALE.md r17.
    */
  private def withStreamConfs[T](
      spark: SparkSession, partitions: String)(start: => T): T = {
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val savedPartitions = spark.conf.get("spark.sql.shuffle.partitions")
    val savedProvider = spark.conf.getOption(providerConf)
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
      spark.conf.set(providerConf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try start finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedPartitions)
      savedProvider match {
        case Some(p) => spark.conf.set(providerConf, p)
        case None    => spark.conf.unset(providerConf)
      }
    }
  }

  /** Per-dir memo of the events source metadata both drains re-derive
    * on EVERY streaming query start: the schema probe (a driver-side
    * batch read of the parquet footer) and the content-summary size
    * behind the state-partition hint. Pure deterministic metadata of
    * an immutable testdata file — ten streaming gate queries paid the
    * two driver round-trips each, per bench rep (r21, guide §1.2
    * "per-task work" applied to the driver).
    */
  private val sourceMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (StructType, Long)]()

  /** The shared events file-stream source (schema probed from the
    * actual file, ts normalized) plus the input-sized state-partition
    * hint both drains use.
    */
  private def eventsStream(
      spark: SparkSession, dir: String): (DataFrame, Int) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Size the stateful-shuffle partition count by INPUT volume (~2 MB
    // of source parquet per state partition, clamped to [8, cores]):
    // at the sf0.1 gate (2 MB) state-store instance overhead dominates
    // and 8 wins by ~1 s/query; at sf3 (58 MB, 2.9M session rows) the
    // state commit+emit parallelism dominates and 32 wins 34.5->23.7 s
    // on st4. This is the knob the drain comment promises "rises with
    // throughput" — tied to bytes, not core count.
    // Hadoop FS, not java.io.File.length(): length() silently reads 0
    // for a missing path and ~4096 for a directory-style parquet
    // layout, collapsing the sizing knob to its floor with no signal.
    // getContentSummary sums correctly for both single-file and
    // directory layouts; an absent path is shouted (the stream read
    // below will fail with its own error anyway).
    val (fileSchema, inputBytes) = sourceMetaCache.computeIfAbsent(dir, { _ =>
      val bytes = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.getContentSummary(p).getLength
        else {
          System.err.println(
            s"EventStreaming: input $p is absent — state-partition hint " +
              s"falls back to its floor")
          0L
        }
      }
      (spark.read.parquet(s"$dir/events.parquet").schema, bytes)
    })
    val hint = math.min(
      spark.sparkContext.defaultParallelism,
      math.max(8, (inputBytes / (2L << 20)).toInt))
    // the file-stream source wants a directory: stream the whole sf dir
    // but list only the events file (new matching files would be picked
    // up as later micro-batches)
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    (stream, hint)
  }

  /** Generic drain harness for ANY streaming DataFrame (the shared
    * protocol behind every gate streaming query): start into a memory
    * sink, processAllAvailable, stop, detach the result from the sink
    * and drop its temp view. Public so other domains (document
    * streams) reuse the one battle-tested drain instead of re-growing
    * the round-2 leaks.
    */
  def drainToMemorySink(
      spark: SparkSession, queryName: String,
      outputMode: String = "complete",
      statePartitions: Int = 8)(streamed: DataFrame): DataFrame = {
    // Stateful streaming cost here is dominated by state-store
    // INSTANCES (one per shuffle partition per store, re-opened every
    // micro-batch), not by data volume — pin the streaming query to
    // fewer partitions than the batch engine uses. The query's state
    // partitioning is fixed at its first run, which is exactly the
    // per-query scoping we want; answers are partitioning-independent.
    // At production stream volumes this knob rises with throughput —
    // runToMemorySink sizes it from the source file (see hint there).
    val query = withStreamConfs(spark,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS",
        statePartitions.toString)) {
      streamed.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode(outputMode)
        .start()
    }
    try {
      query.processAllAvailable()
      val tap = lastPlanTap.get
      if (tap != null)
        tap(org.apache.spark.sql.GraftShims.lastExecutedPlan(query))
    } finally {
      query.stop()
      query.awaitTermination()
    }
    // Detach the result from the sink and DROP the sink's temp view:
    // the memory sink holds every drained row on the driver for as
    // long as the view is registered, which pollutes long sessions
    // (the round-2 bench leaked st1/st2/st3 tables for its lifetime).
    // Detach via an eager localCheckpoint, NOT collect+createDataFrame:
    // the old copy-out built a LocalRelation whose rows were re-encoded
    // on EVERY downstream action — at st4's sf3 output (2.86M session
    // rows) that drain protocol cost ~50 s against a 12 s streaming
    // query. The checkpoint pays one encode pass into block-manager
    // partitions and every later action is a plain scan.
    val drained = spark.table(queryName).localCheckpoint(true)
    spark.catalog.dropTempView(queryName)
    drained
  }

  /** Hourly tumbling-window counts/sums per event_type, computed by a
    * real streaming query (micro-batch, complete output mode, memory
    * sink). Returns the drained result as a batch DataFrame.
    */
  def hourlyTypeStats(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(spark, dir, "st1_mem") { stream =>
      stream
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
    }

  /** Streaming deduplication: dropDuplicates on (user_id, event_type)
    * across micro-batches (state-store backed), then distinct-user
    * counts per type. The count is order-independent, so the batch
    * oracle (count DISTINCT) matches whatever row each micro-batch
    * kept.
    */
  def dedupTypeCounts(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(spark, dir, "st2_mem") { stream =>
      stream
        .dropDuplicates("user_id", "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
    }

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark`
    * holds a key's dedup state only until the event-time watermark
    * passes its timestamp plus the delay — re-occurrences after expiry
    * are admitted again, so state is bounded by the watermark horizon
    * instead of the stream's full key cardinality. That is the
    * production posture for an unbounded stream: st2's plain
    * `dropDuplicates` state grows forever (correct for the gate,
    * unbounded at 100 TB/day). The TTL re-admission semantics is
    * spec-tested across three micro-batches; within the gate's single
    * micro-batch nothing expires, so the drained counts equal global
    * distinct counts and the batch oracle applies.
    */
  def dedupTypeCountsBounded(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(spark, dir, "st7_mem", outputMode = "append") { stream =>
      stream
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
    }.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))

  /** Sessionization as a NATIVE streaming aggregation: Spark's
    * session_window merges events with gaps under 30 minutes into one
    * growing per-user window (state-store-backed window merge — the
    * streaming analog of the batch lag/running-sum sessionize).
    * Complete output mode at the gate. session_window's `end` is
    * last-event + gap, so the last event time is end - 30 min; a gap of
    * EXACTLY the window size starts a new session (merge requires
    * next < end), which the oracle mirrors with >= in its gap test.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(spark, dir, "st4_mem") { stream =>
      stream
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          (col("w.end") - expr("INTERVAL 30 MINUTES")).as("session_last"),
          col("n_events"), col("session_value"))
    }

  /** [[sessionStats]] in the PRODUCTION shape, runnable at the gate:
    * append output mode behind the event-time watermark, drained with
    * the engine's final no-data micro-batch. After the file source's
    * data batches, the watermark advances to max(ts) - delay and the
    * no-data batch (spark.sql.streaming.noDataMicroBatches, on by
    * default) emits-and-EVICTS every session whose close (last event +
    * gap) the watermark passed — so the result is the deterministic
    * set of CLOSED sessions, each emitted exactly once, independent of
    * how the source split batches. The only sessions never emitted are
    * the stream-tail ones the watermark hasn't passed (the oracle
    * bounds itself to the same closed set). This replaces the r15 gate
    * form (complete mode), whose per-batch re-emission of EVERY
    * session was the suite's one linear-in-total-state output at scale
    * (r15 verdict item 3).
    *
    * Drained through a PARQUET sink, not the memory sink: append mode
    * unlocks the real file sink (exactly-once via the sink's commit
    * log), so session rows land executor-parallel on disk instead of
    * being collected into a driver-side memory table — at sf3 the
    * memory drain of 2.85M session rows was most of the gate's cost,
    * and at production volume a driver-held result is a non-starter.
    */
  def sessionStatsClosed(spark: SparkSession, dir: String): DataFrame =
    runToFileSink(spark, dir, "st4") { stream =>
      sessionizedStream(stream)
    }

  /** PRODUCTION-shape sessionization — the default entry point for an
    * unbounded stream: the same session_window aggregate behind an
    * event-time watermark in APPEND output mode, so each session row
    * is emitted exactly ONCE (when the watermark passes its close =
    * last event + gap) and its state-store entry is evicted. The
    * complete-mode [[sessionStats]] re-emits EVERY session each
    * micro-batch — linear-in-total-sessions per batch; it survives as
    * the replayable-full-table form for batch-parity checks, while the
    * st4 gate runs [[sessionStatsClosed]] above.
    */
  def sessionizedStream(
      stream: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        (col("w.end") - expr(s"INTERVAL $gap")).as("session_last"),
        col("n_events"), col("session_value"))

  /** Stream-stream inner join: each click matched to the same user's
    * purchases within ±30 minutes. Append output mode (the only mode
    * stream-stream joins support). BOTH sides carry a 2-hour watermark:
    * with the time-interval join condition this makes join state
    * evictable (rows older than watermark - 30 min are dropped from the
    * state stores), which is what keeps an unbounded stream from
    * accumulating unbounded state. The drained table still equals the
    * batch join because the file source delivers the whole input as one
    * micro-batch (watermarks only discard rows arriving LATER than the
    * watermark of a previous batch). One source stream, filtered two
    * ways — the join is still planned as a genuine stream-stream join
    * with two state stores.
    */
  def clickPurchaseJoin(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(spark, dir, "st3_mem", outputMode = "append") { stream =>
      val clicks = stream.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "2 hours")
      val purchases = stream.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
      clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") - expr("INTERVAL 30 MINUTES") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select("user_id", "click_id", "purchase_id")
    }

}
