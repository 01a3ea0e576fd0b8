package graft

/** Registry-wide anti-pattern sweep: every one of the ~114 registered
  * queries executes at sf0.001 and its final physical plan is checked
  * for the three shapes that kill a 100 TB run — an unbounded
  * cartesian/nested-loop product, and a ScalaUDF fencing whole-stage
  * codegen. PlanChecksSpec asserts the POSITIVE shape of representative
  * queries (pushdown reached the scan, the salt is in the join key);
  * this spec asserts the NEGATIVE registry-wide, so a new query — or a
  * refactor of a shared helper — cannot quietly reintroduce a product
  * or a UDF anywhere in the surface.
  *
  * Nested-loop allowlist: a BroadcastNestedLoopJoin is the correct
  * plan when one side is a broadcast scalar or a k-row table (that is
  * how `crossJoin(broadcast(tiny))` ships corpus-level constants), so
  * queries whose tiny side is bounded by construction are listed with
  * the bound that keeps them safe. CartesianProduct (the shuffled
  * product) is never acceptable.
  */
class RegistryPlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The EXACT set of queries whose sf0.001 plan contains a
    * BroadcastNestedLoopJoin, each justified by a driver-bounded
    * broadcast side. The check is two-way: an unlisted BNLJ fails the
    * sweep, and a listed query whose plan no longer has one fails as
    * stale — so the list can neither grow silently nor rot.
    */
  private val bnljAllowed: Map[String, String] = Map(
    "s1_cosine_topk" -> "labeled brute-force baseline: query side is k rows",
    "s5_quantized_cosine" -> "query side broadcast: k rows",
    "s10_pq_adc" -> "query side broadcast: k rows (ADC lookup tables ride the broadcast)",
    "s13_pq_tuning" -> "same ADC scan as s10 (one depth-64 ranking pass serves every swept shortlist depth); query side broadcast: k rows",
    "d2_ngram_jaccard" -> "corpus doc-count scalar broadcast: 1 row",
    "d12_line_dedup" -> "boilerplate array broadcast: df-capped line set",
    "x6_tfidf" -> "corpus doc-count scalar broadcast: 1 row",
    "x8_bm25" -> "doc-count + avgdl scalars broadcast: 1 row each",
    "s20_hybrid_bm25" -> "doc-count + avgdl scalars broadcast: 1 row each (the x8 BM25 constants on the lexical leg)",
    "x13_unigram_logprob" -> "corpus token-total scalar broadcast: 1 row",
    "x27_dsir_sample" -> "LM totals + vocab-size scalar broadcast: 1 row",
    "x20_bigram_logprob" -> "corpus total scalar broadcast: 1 row",
    "x15_source_mix" -> "rate table broadcast: one row per source",
    "t9_string_decom" -> "parameter-definition fan-out: config-sized broadcast",
    "x31_ccnet_buckets" -> "corpus token-total scalar broadcast: 1 row (the x13 LM)",
    "x32_unimax_mix" -> "water-level scalar broadcast: 1 row",
    "c7_token_drift" -> "two-sided token-total scalar broadcast: 1 row"
  )

  test("no registry query plans a CartesianProduct, a ScalaUDF, " +
    "or an unlisted nested-loop join") {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnljSeen = scala.collection.mutable.Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, dir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val finalPlan = plan.split("== Initial Plan ==")(0)
      if (finalPlan.contains("CartesianProduct"))
        violations += s"$name: CartesianProduct (shuffled all-pairs product)"
      if (finalPlan.contains("ScalaUDF"))
        violations += s"$name: ScalaUDF fences whole-stage codegen"
      if (finalPlan.contains("BroadcastNestedLoopJoin")) {
        bnljSeen += name
        if (!bnljAllowed.contains(name))
          violations += s"$name: BroadcastNestedLoopJoin outside the bounded allowlist"
      }
    }
    for (stale <- bnljAllowed.keySet.diff(bnljSeen).toSeq.sorted)
      violations += s"$stale: allowlisted for BNLJ but its plan no longer has one (stale entry)"
    assert(violations.isEmpty,
      s"registry anti-pattern sweep found:\n  ${violations.mkString("\n  ")}")
  }
}
