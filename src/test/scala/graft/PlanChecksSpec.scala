package graft

/** Plan-shape assertions for representative queries: the properties
  * that make these operators survive a 100 TB scale-up are visible in
  * the physical plan, so regressions (lost pushdown, a join degrading
  * to nested-loop, a scan reading every column) fail here rather than
  * in production.
  */
class PlanChecksSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Executed-plan string AFTER running the query — AQE only shows the
    * final stages (and their codegen '*(n)' markers) post-execution.
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("q2 filter+projection reach the parquet scan") {
    val plan = planOf("q2_filter_project")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    assert(plan.contains("l_shipdate"), "shipdate filter not pushed")
    // column pruning: the scan must not read the full 11-column lineitem
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"),
      "scan reads pruned columns")
  }

  test("q19 exact median is window-ranked, never a value-buffering percentile") {
    // Spark's `percentile` aggregate holds every group's full value
    // list in executor memory (ObjectHashAggregate) — with 3 status
    // groups each buffer is corpus/3, a memory wall at scale. The
    // exact side must come from the banded quantile (approx-bracket,
    // exact count below, window-sort only the band).
    val plan = planOf("q19_approx")
    assert(!plan.contains("percentile("),
      s"q19 still plans the buffering `percentile` aggregate:\n$plan")
    assert(plan.contains("row_number"), "q19 lost the window-rank median")
  }

  test("q4 dimension join broadcasts the small side") {
    val plan = planOf("q4_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("t2 decom joins definitions via broadcast, not shuffle") {
    val plan = planOf("t2_decom")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "definition join degraded to SMJ")
  }

  test("q20 range join is hash/broadcast, never a nested loop") {
    val plan = planOf("q20_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("s2 LSH signatures are a pure map - no shuffle before bucket join") {
    val plan = planOf("s2_ann_lsh")
    // the bucket derivation itself must not exchange: the only SHUFFLES
    // allowed are candidate-distinct, window partial/final, output sort
    // (AQE prints initial+final plans, so dedup by plan_id; broadcast
    // exchanges are fine — they are how the small sides ship)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val shuffles = """Exchange (?:hash|range)partitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(shuffles.size <= 4,
      s"${shuffles.size} shuffles — signature stage shuffles?\n$finalPlan")
    assert(plan.contains("LshBuckets") || plan.contains("lshbuckets"),
      "kernel expression missing from plan")
  }

  test("s3 IVF gate probes the persisted index with partition pruning") {
    val plan = planOf("s3_ann_ivf")
    // the probe scan must read only the probed cells' directories: a
    // partition filter on the index's cell column, visible in the scan
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"cell not in partition filters:\n$plan")
  }

  test("s16 filtered ANN: bounded partition pruning + pushed exact-label filter") {
    val plan = planOf("s16_filtered_ann")
    // the same-label constraint reaches the scan in two layers: the
    // (cell, label_bucket) disjunction prunes DIRECTORIES at planning
    // time (bounded by cells x LabelBuckets at any label cardinality —
    // partitioning by the raw label measured 4,800 dirs and an 11 s
    // FileIndex build at sf3), and the exact-label isin pushes into
    // the parquet row groups. A label filter evaluated after the read
    // would be the post-filter plan that scans whole cells and
    // discards ~90% of the rows at 10% selectivity.
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"cell not in partition filters:\n$plan")
    assert("""PartitionFilters: \[[^\]]*label_bucket""".r.findFirstIn(plan).isDefined,
      s"label_bucket not in partition filters:\n$plan")
    assert("""PushedFilters: \[[^\]]*In\(label""".r.findFirstIn(plan).isDefined,
      s"exact-label isin not pushed to the scan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      "filtered probe degraded to an unblocked product")
  }

  test("d6 simhash candidates join on bit segments, not the block alone") {
    val plan = planOf("d6_simhash_pairs")
    // the candidate equi-join must carry the segment value in its keys:
    // a block-only self-join is the O(block²) shape that dies at scale
    assert(plan.contains("segval"), s"no segment key in candidate join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "simhash candidates degraded to an unblocked product")
  }

  test("d7 embedding dedup candidates come from LSH buckets, not block alone") {
    val plan = planOf("d7_embed_dup")
    assert(plan.contains("LshBuckets") || plan.contains("lshbuckets"),
      s"no LSH bucket kernel in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "embedding dedup degraded to an unblocked product")
  }

  test("q17 as-of join does not degrade to nested loop") {
    val plan = planOf("q17_asof_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n$plan")
  }

  test("t15 pushes the apid predicate into the V2 byte walk") {
    val plan = planOf("t15_v2_pushdown")
    // CcsdsScan prints its pushed apids in description(); an empty
    // pushdown would show 'pushed apids: *'
    assert(plan.contains("pushed apids: 256"), s"apid not pushed:\n$plan")
  }

  test("q29 salted join stays an equi-join with no right-side blowup") {
    val plan = planOf("q29_salted_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"salted join degraded to a product:\n$plan")
    // the salt must be part of the join key, or the salted left side
    // would multiply the right side saltFactor times
    assert(plan.contains("_salt"), s"salt column missing from plan:\n$plan")
  }

  test("x15 mixture rates ship broadcast; the doc filter is row-local") {
    val plan = planOf("x15_source_mix")
    assert(plan.contains("BroadcastHashJoin"), s"rate table not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("x14 sequence packing is one exchange per block column") {
    val plan = planOf("x14_seq_pack")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // one hash exchange for the per-source window; the output sort's
    // range exchange is the only other allowed shuffle
    val hashShuffles = """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(hashShuffles.size <= 1,
      s"${hashShuffles.size} hash shuffles — packing should need one:\n$finalPlan")
  }

  test("d12 line dedup: one frequency shuffle, in-place broadcast filter") {
    val plan = planOf("d12_line_dedup")
    // the boilerplate set ships as ONE broadcast sorted array; the
    // probe side must filter in place (binary-search kernel), never
    // explode + regroup (the regroup shuffle cost 18x the rest)
    assert(plan.toLowerCase.contains("sortedcontains"),
      s"binary-search kernel missing:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"removal degraded to SMJ:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val hashShuffles = """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(hashShuffles.size <= 2,
      s"${hashShuffles.size} hash shuffles — probe side regrouping?\n$finalPlan")
  }

  test("s5 quantized scoring broadcasts queries and keeps kernels in codegen") {
    val plan = planOf("s5_quantized_cosine")
    assert(!plan.contains("CartesianProduct"),
      s"quantized scoring degraded to a shuffled product:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$plan")
    assert(plan.contains("vectordotint8") || plan.contains("VectorDotInt8"),
      s"int8 kernel missing from plan:\n$plan")
  }

  test("s10 pq scoring broadcasts query LUTs and encodes via the compiled argmin kernel") {
    val plan = planOf("s10_pq_adc")
    assert(!plan.contains("CartesianProduct"),
      s"ADC scoring degraded to a shuffled product:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$plan")
    assert(plan.toLowerCase.contains("nearestcentroid"),
      s"compiled PQ encode kernel missing from plan:\n$plan")
  }

  test("s11 ivf-pq: ADC scan is code-only and cell-pruned; rerank scan is vector-only") {
    val plan = planOf("s11_ivfpq")
    assert(!plan.contains("CartesianProduct"),
      s"IVF-PQ degraded to a shuffled product:\n$plan")
    val pruned = """PartitionFilters: \[[^\]]*cell""".r.findAllIn(plan).size
    assert(pruned >= 2, s"expected 2 cell-pruned index scans, got $pruned:\n$plan")
    val schemas = """ReadSchema: [^\n]*""".r.findAllIn(plan).toSeq
    assert(schemas.exists(s => s.contains("codes") && !s.contains("c_vec")),
      s"ADC pass reads vectors:\n${schemas.mkString("\n")}")
    assert(schemas.exists(s => s.contains("c_vec") && !s.contains("codes")),
      s"rerank pass reads codes:\n${schemas.mkString("\n")}")
  }

  test("d13 semantic dedup pairs only within cells - no all-pairs product") {
    val plan = planOf("d13_semantic_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cell blocking lost - all-pairs product:\n$plan")
  }

  test("x23 token budget is one hash exchange (the per-source window)") {
    val plan = planOf("x23_token_budget")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val hashShuffles = """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(hashShuffles.size <= 1,
      s"${hashShuffles.size} hash shuffles — the quota needs one:\n$finalPlan")
  }

  test("x24 quantile filter: threshold join broadcasts, no percentile buffer") {
    val plan = planOf("x24_quantile_filter")
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table not broadcast:\n$plan")
    // the whole point: the exact quantile must come from the window
    // rank-pick, never the memory-unbounded percentile aggregate
    assert(!plan.contains("percentile"),
      s"percentile aggregate crept back in:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"window rank-pick missing:\n$plan")
  }

  test("d14 bloom prefilter is a codegen expression, not a ScalaUDF") {
    // membership must run as Spark's own BloomFilterMightContain so the
    // prefilter participates in whole-stage codegen; a ScalaUDF would
    // box every hash and fence the codegen span right where the
    // corpus-wide scan is hottest
    val plan = planOf("d14_bloom_contamination")
    assert(plan.contains("might_contain"),
      s"BloomFilterMightContain missing from the d14 plan:\n$plan")
    assert(!plan.contains("UDF"), s"ScalaUDF crept back into d14:\n$plan")
  }

  test("source upsampling is shuffle-free (row-local explode)") {
    // the operator itself (not the x21 reporting aggregate) must add
    // NO exchange: copies are derived per row from the id hash
    val df = graft.operators.Mixture.sourceUpsample(
      SparkEntry.queries("q2_filter_project")(spark, dir)
        .limit(10).withColumn("doc_id", org.apache.spark.sql.functions.monotonically_increasing_id()),
      org.apache.spark.sql.functions.lit(2.5))
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"upsample introduced a shuffle:\n$plan")
  }

  test("d15 dup spans: rolling-hash kernel in plan, two data exchanges") {
    val plan = planOf("d15_dup_spans")
    // windows must come from the Rabin-Karp kernel, not substr+md5
    assert(plan.toLowerCase.contains("rollingwindowhashes"),
      s"rolling-hash kernel missing:\n$plan")
    // the designed shape: one exchange on the hash (occurrence count),
    // one on the doc id (islands) — plus the output sort's range
    // exchange; anything more means the frequency pass regressed to
    // the recompute-both-sides join
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val hashShuffles = """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(hashShuffles.size <= 2,
      s"${hashShuffles.size} hash shuffles — frequency join regressed?\n$finalPlan")
  }

  test("lang_filter tokenizes once per row even after predicate pushdown") {
    // the optimizer pushes the language predicate through projections by
    // alias-inlining; langId being a single aggregate-kernel expression
    // means inlining still yields exactly ONE split() per row (r10
    // ADVICE flagged the pre-kernel form, where each of ~15 marker
    // probes re-tokenized)
    val d = Tables(spark, dir, "documents")
      .withColumn("extra", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val stage = Registry.transformers("lang_filter")(
      Registry.parseConfig("""{"languages": ["en"]}"""))
    val plan = stage(d).queryExecution.optimizedPlan.toString
    val n = "split\\(".r.findAllIn(plan).size
    assert(n == 1, s"tokenization appears $n times in the optimized plan:\n$plan")
  }

  test("p1's pushed predicates tokenize twice total (quality + langId kernels)") {
    // quality and language are separate single-pass kernels, so the
    // fully-inlined Filter condition carries exactly two split() calls
    // per row; the pre-kernel stopwordRatio put FOUR in this plan
    val plan = SparkEntry.queries("p1_doc_pipeline")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val n = "split\\(".r.findAllIn(plan).size
    assert(n == 2, s"tokenization appears $n times in the optimized plan:\n$plan")
  }

  test("whole-stage codegen covers the scan->agg path of q1") {
    val plan = planOf("q1_agg")
    // '*(n)' prefixes mark codegen stages in Spark 4 plan strings
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"no codegen span:\n$plan")
  }
}
