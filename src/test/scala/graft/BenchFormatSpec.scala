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

  test("round-artifact parse: real prefix-keyed driver snapshot shape") {
    // Fixture copied from BENCH_r14.json's actual structure: the driver
    // stores {"n","rc","cpus","sf","tail","parsed"} where "tail" is an
    // ESCAPED copy of our stdout and "parsed" is the compact line with
    // PREFIX-keyed queries ("keys":"prefix") plus a staging map whose
    // "t15" key collides with query t15_v2_pushdown's prefix. The r14
    // guard parsed nothing from this shape (full-name filter) and so
    // never armed — this fixture fails any parser that doesn't read
    // the real format.
    val txt =
      """{
        |  "n": 14,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "...\"queries\":{\"d19\":99.0,\"t15\":99.0}...",
        |  "parsed": {"metric": "total", "value": 124.17, "unit": "sec",
        |    "sf": "sf0.1", "n_queries": 146, "keys": "prefix",
        |    "queries_file": "BENCH_LAST.json",
        |    "staging": {"shingles3": 5.704, "t15": 0.878},
        |    "errors": {},
        |    "queries": {"d19": 10.03, "t15": 3.2, "q1": 0.41,
        |      "x22": -1, "zz": 7.7}}
        |}""".stripMargin
    val names = Set("d19_lsh_tuning", "t15_v2_pushdown", "q1_agg",
      "x22_hash_split", "s6_range_search")
    val got = Bench.parseRound(txt, names)
    // prefix keys translate back to registry full names
    assert(got == Map(
      "d19_lsh_tuning" -> 10.03, "t15_v2_pushdown" -> 3.2,
      "q1_agg" -> 0.41))
    // staging's "t15":0.878 must NOT shadow query t15's 3.2 (it sits in
    // a different object); "zz" maps to no registry prefix and drops;
    // x22's -1 error sentinel never parses; the escaped tail copy's
    // \"d19\":99.0 never matches (its quotes are escaped)
    assert(!got.values.exists(v => v == 0.878 || v == 99.0 || v == 7.7))
    // ambiguous prefixes are dropped, never guessed
    val amb = Bench.parseRound(
      """{"queries":{"d1":1.0}}""", Set("d1_exact", "d1_other"))
    assert(amb.isEmpty)
    // full-name artifacts (the long BENCH_LAST.json format) still parse
    val full = Bench.parseRound(
      """{"queries":{"q1_agg":1.25,"d6_simhash_pairs":-1.0},
        |"staging":{"shingles3":5.2},
        |"repolled":{"q1_agg":{"official":2.0,"fresh":1.25}}}"""
        .stripMargin.replace("\n", ""),
      Set("q1_agg", "d6_simhash_pairs"))
    assert(full == Map("q1_agg" -> 1.25))
    // garbage degrades to empty, never throws
    assert(Bench.parseRound("not json", names).isEmpty)
  }

  test("round-artifact parse: the committed BENCH_r14.json itself") {
    // The ultimate fixture is the real thing: r14's committed artifact
    // is exactly the shape whose silent non-parse made the guard inert.
    // Skipped (vacuously green) only if the artifact is ever pruned.
    val f = new java.io.File("BENCH_r14.json")
    if (f.isFile) {
      val txt = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val got = Bench.parseRound(txt, SparkEntry.queries.keySet)
      // the regression the guard was built to catch must be visible
      assert(got.get("d19_lsh_tuning").contains(10.03), got.get("d19_lsh_tuning"))
      // staging's t15 entry (0.878 in r14) must not shadow the query
      // value (0.75 in r14's queries map)
      assert(got.get("t15_v2_pushdown").contains(0.75), got.get("t15_v2_pushdown"))
      // the whole 146-query registry of r14 must be recovered
      assert(got.size >= 140, s"only ${got.size} queries parsed")
    }
  }

  test("scale records carry a populated correctness stamp (no stale zero-entry alarms)") {
    // A regenerated/re-floored BENCH_SF* record must re-stamp its
    // correctness_artifact field: an `entries: 0` stamp reads as "these
    // floors were never correctness-backed" to anyone auditing the
    // artifact chain (the r18 verdict's hygiene finding).
    for (p <- Seq("BENCH_SF1.json", "BENCH_SF3.json")) {
      val f = new java.io.File(p)
      if (f.isFile) {
        val txt = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val entries =
          """"correctness_artifact"\s*:\s*\{[^}]*"entries"\s*:\s*(\d+)""".r
        entries.findFirstMatchIn(txt) match {
          case Some(m) => assert(m.group(1).toInt > 0,
            s"$p: stale zero-entry correctness stamp - re-stamp on regeneration")
          case None => fail(s"$p: no correctness_artifact stamp")
        }
      }
    }
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

  test("compact line carries the CURRENT registry at two-decimal precision") {
    // r19's official artifact degraded to ONE decimal (the 2-dp prefix
    // line no longer fit the 2000-char tail at 162 queries), inflating
    // apparent drift on sub-second queries. Pin: with the REAL registry
    // names and worst-case values (two non-zero decimals everywhere, so
    // trailing-zero strip saves nothing), the chosen line still carries
    // every query at >= 2 decimals. Registry growth that breaks this
    // should fail HERE, not silently blunt the driver's drift tracking.
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size >= 160, s"registry shrank? ${names.size}")
    // realistic magnitudes (sf0.1: most queries sub-10s, a 12.37s tail
    // every 20th) with a non-zero second decimal everywhere so
    // trailing-zero strip saves nothing
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 20 == 19) 12.37 else (i % 90) / 10.0 + 0.07)
    }
    val line = Bench.compactJson(results, 1234.56, "sf0.1", "{}",
      stagingTotal = 18.31)
    assert(line.length <= 1990, s"compact line overflows: ${line.length}")
    val m = parse(line)
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.size == results.size, s"dropped queries: ${qs.size}")
    // every emitted value preserves its second decimal (a 7)
    assert(qs.values.forall(v =>
      math.round(v.toString.toDouble * 100) % 10 == 7),
      "per-query values lost decimal precision")
    assert(m("staging_total") == 18.31)
    assert(!m.contains("errors"), "empty errors map should be omitted")
  }

  test("compact line keeps non-empty errors and -1 sentinels") {
    val results = Seq("q1_ok" -> 1.23, "q2_bad" -> -1.0)
    val m = parse(Bench.compactJson(results, 1.23, "sf0.1",
      """{"q2_bad":"boom"}"""))
    assert(m("errors").asInstanceOf[Map[String, Any]]("q2_bad") == "boom")
    assert(m("queries").asInstanceOf[Map[String, Any]]("q2_bad") == -1)
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
