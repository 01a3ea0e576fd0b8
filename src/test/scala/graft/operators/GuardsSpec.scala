package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misuse guards: plan-time checks that turn quiet scale hazards
  * (eager plan-time scans, oversized broadcasts, clobbered user
  * columns) into loud errors.
  */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  /** A frame whose scan THROWS: proves by construction whether an
    * operator runs a job at plan time.
    */
  private def poisonedSamples: DataFrame =
    spark.range(4).as[Long]
      .map { _ =>
        throw new RuntimeException("plan-time scan!")
        (0.0, "p", 0.0, 0) // scalastyle:ignore — unreachable, fixes the encoder
      }
      .toDF("time_tai", "name", "eng_value", "seq_count")

  test("wide() with explicit names builds its plan without launching a job") {
    // would throw if the pivot scanned the frame for distinct names
    val planned = Telemetry.wide(poisonedSamples, Seq("p_qty", "p_part"))
    assert(planned.columns.toSeq == Seq("time_tai", "p_qty", "p_part"))
  }

  test("wide() default (no names) runs the documented eager distinct scan") {
    val e = intercept[Exception](Telemetry.wide(poisonedSamples))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("plan-time scan")))
  }

  private def vecs(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array(lit(1.0f), col("id").cast("float")).as("embedding"))

  test("bruteForceTopK / quantizedTopK fail at plan time when the query side exceeds the broadcast limit") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try {
      val corpus = vecs(10)
      val big = vecs(100000) // range stats >> 1KB, no job needed to know
      val e1 = intercept[IllegalArgumentException](
        Similarity.bruteForceTopK(corpus, big, k = 3))
      assert(e1.getMessage.contains("lshTopK"))
      val e2 = intercept[IllegalArgumentException](
        Similarity.quantizedTopK(corpus, big, k = 3))
      assert(e2.getMessage.contains("quantizedTopK"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bruteForceTopK still plans and runs under the limit") {
    val out = Similarity.bruteForceTopK(vecs(20), vecs(2), k = 3)
    assert(out.count() == 6)
  }

  test("broadcast guard probes the TRUE row count when the plan estimate lies") {
    // Without CBO stats a Filter keeps its child's size estimate: a
    // 20-row slice of a large table "estimates" at table size and the
    // r19-sf10 guard spuriously rejected every AnnTruth query set. The
    // guard now falls back to a limit-bounded count before rejecting.
    val dir = "/root/testdata/sf0.1"
    val e = graft.Tables(spark, dir, "embeddings")
    val tiny = e.where(col("vec_id") < 20) // TRUE size ~10 KB
    val est = tiny.queryExecution.optimizedPlan.stats.sizeInBytes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the fast path to fail: threshold below the (inflated)
      // filter estimate but whose ~1 KiB/row cap admits 20 rows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100KB")
      assert(est > 100L * 1024,
        s"fixture no longer inflates the estimate ($est) - pick a bigger table")
      val out = Similarity.bruteForceTopK(e, tiny, k = 3)
      assert(out.count() == 60) // the probe admitted the true 20 rows
      // and a genuinely-too-large query set is still rejected by the probe
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB") // cap = 1 row
      val e1 = intercept[IllegalArgumentException](
        Similarity.bruteForceTopK(e, tiny, k = 3))
      assert(e1.getMessage.contains("rows"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("registry stages fail fast when scratch columns collide with user data") {
    val df = Seq((1L, "text here", "web", 7)).toDF("doc_id", "text", "source", "_rk")
    val stage = graft.Registry.transformers("weighted_sample")(
      graft.Registry.parseConfig("""{"max_per_stratum": 5}"""))
    val e = intercept[IllegalArgumentException](stage(df))
    assert(e.getMessage.contains("_rk"))
  }

  test("every join-in stage rejects inputs that already carry its output columns") {
    // each of these stages joins named columns onto the user frame; a
    // pre-existing column of the same name would otherwise surface as
    // an ambiguous-reference error rows later (or silent data loss)
    val cases = Seq(
      ("line_dedup", "{}", "clean_text"),
      ("dup_span_strip", "{}", "_spans"),
      ("dsir_sample", "{}", "log_weight"),
      ("chunk_documents", "{}", "chunk_id"),
      ("pack_sequences", "{}", "pack_offset"))
    for ((stageName, cfg, clash) <- cases) {
      val df = Seq((1L, "some text", "web", 1.0))
        .toDF("doc_id", "text", "source", clash)
      val stage = graft.Registry.transformers(stageName)(
        graft.Registry.parseConfig(cfg))
      val e = intercept[IllegalArgumentException](stage(df))
      assert(e.getMessage.contains(clash), s"$stageName: ${e.getMessage}")
      assert(e.getMessage.contains(stageName), s"$stageName: ${e.getMessage}")
    }
  }

  test("soft_dedup_weights overwrites a pre-existing weight column instead of duplicating it") {
    val df = Seq(
      (1L, "alpha beta gamma", 0.5),
      (2L, "alpha beta gamma", 0.5),
      (3L, "something else entirely", 0.5)).toDF("doc_id", "text", "weight")
    val out = graft.Registry.transformers("soft_dedup_weights")(
      graft.Registry.parseConfig("{}"))(df)
    assert(out.columns.count(_ == "weight") == 1)
    val w = out.select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w(3L) == 1.0) // unique doc: weight reset to 1/1, not the stale 0.5
  }
}
