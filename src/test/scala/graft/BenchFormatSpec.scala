package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact bench line's number formatting: the official artifact's
  * per-query values pass through this, so corruption here silently
  * falsifies the performance record.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("trim strips trailing zeros only after a decimal point") {
    // the dp=0 degradation path must not eat integral zeros
    assert(Bench.trim(10.2, 0) == "10")
    assert(Bench.trim(100.0, 0) == "100")
    assert(Bench.trim(0.4, 0) == "0")
    // dp>0: strip trailing zeros, then a bare point
    assert(Bench.trim(10.20, 2) == "10.2")
    assert(Bench.trim(10.0, 2) == "10")
    assert(Bench.trim(0.0, 2) == "0")
    assert(Bench.trim(0.25, 2) == "0.25")
    assert(Bench.trim(64.33, 1) == "64.3")
  }

  private def parse(line: String): Map[String, Any] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(line).values
      .asInstanceOf[Map[String, Any]]
  }

  test("frozen-baseline parse: registry names only, metadata keys excluded") {
    val txt =
      """{
        | "frozen_at_round": 10,
        | "queries": {
        |  "q1_agg": 1.046,
        |  "d6_simhash_pairs": 2.656,
        |  "x22_hash_split": 0.124
        | }
        |}""".stripMargin
    val got = Bench.parseFrozen(txt, Set("q1_agg", "d6_simhash_pairs", "nope"))
    assert(got == Map("q1_agg" -> 1.046, "d6_simhash_pairs" -> 2.656))
    // metadata keys and non-registry names never reach the guard
    assert(!got.contains("frozen_at_round") && !got.contains("x22_hash_split"))
    // garbage input degrades to empty, never throws (the guard must not
    // be able to break a bench run)
    assert(Bench.parseFrozen("not json at all", Set("q1_agg")).isEmpty)
  }

  test("round-artifact parse: only the queries map yields name:number pairs") {
    // the round-over-round guard reads full BENCH_r*.json artifacts —
    // the per-query shuffle/repolled sub-objects and staging entries
    // must not register as query timings, and an errored query's -1
    // sentinel must come through (the caller filters it out)
    val txt =
      """{"metric":"total","value":9.9,"queries":{"q1_agg":1.25,
        |"d6_simhash_pairs":-1.0},"staging":{"shingles3":5.2},
        |"repolled":{"q1_agg":{"official":2.0,"fresh":1.25}},
        |"shuffle":{"q1_agg":{"read":10,"write":20,"spill":0}}}"""
        .stripMargin.replace("\n", "")
    val got = Bench.parseFrozen(txt, Set("q1_agg", "d6_simhash_pairs"))
    assert(got("q1_agg") == 1.25)
    // "official"/"fresh"/"read" keys are not registry names; the nested
    // q1_agg objects are not numbers, so no overwrite happens; and the
    // errored query's -1.0 sentinel never parses (no '-' in the number
    // class), so it can't arm the guard with a negative floor
    assert(got.keySet == Set("q1_agg"))
  }

  test("compact line keeps the FULL registry via prefix keys when names overflow") {
    // 114 realistic names cannot fit a 2000-char tail at any precision
    // with full names; the prefix format must carry every query
    val names = (1 to 14).map(i => s"d${i}_dedup_variant_name") ++
      (1 to 26).map(i => s"x${i}_text_variant_name") ++
      (1 to 30).map(i => s"q${i}_relational_name") ++
      (1 to 15).map(i => s"t${i}_telemetry_name") ++
      (1 to 6).map(i => s"st${i}_stream_name") ++
      (1 to 5).map(i => s"c${i}_corpus_name") ++
      (1 to 5).map(i => s"s${i}_ann_name") ++
      (1 to 3).map(i => s"e${i}_cluster_name")
    val results = names.zipWithIndex.map { case (n, i) => n -> (i % 50) / 10.0 }
    val line = Bench.compactJson(results, 67.0, "sf0.1", "{}")
    assert(line.length <= 1990, s"compact line overflows: ${line.length}")
    val m = parse(line)
    assert(m("keys") == "prefix")
    assert(m("n_queries").toString == results.size.toString)
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.size == results.size, s"dropped queries: ${qs.size}")
    assert(qs.contains("d8") && qs.contains("st3") && qs.contains("x24"))
  }

  test("compact line keeps full names when they fit") {
    val results = (1 to 10).map(i => s"q${i}_short_name" -> i / 10.0)
    val m = parse(Bench.compactJson(results, 5.5, "sf0.1", "{}"))
    assert(!m.contains("keys"))
    assert(m("queries").asInstanceOf[Map[String, Any]].contains("q1_short_name"))
  }

  test("compact line falls back to slowest-k when prefixes collide") {
    // duplicate prefixes (two q1_*) disqualify the prefix format; the
    // line must degrade to the slowest-k truncation, never emit a dict
    // with silently-merged keys
    val base = (1 to 200).map(i =>
      s"q${i}_some_quite_long_query_name_variant_$i" -> i / 10.0)
    val results = base :+ ("q1_second_query_with_same_prefix" -> 9.9)
    val line = Bench.compactJson(results, 100.0, "sf0.1", "{}")
    assert(line.length <= 1990)
    val m = parse(line)
    assert(!m.contains("keys"))
    assert(m("n_queries") == 201)
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.size < 201 && qs.nonEmpty)
    // slowest-k keeps the worst offenders under their FULL names
    assert(qs.contains("q200_some_quite_long_query_name_variant_200"))
  }
}
