package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior specs for the training-data operators: do the dedup methods
  * actually find planted duplicates, does ANN recall hold, do the
  * multimodal stages preserve the pipeline contract.
  */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "a"),
    (1L, "THE  QUICK   brown fox jumps over the lazy dog", "a"), // exact dup after normalize
    (2L, "the quick brown fox jumps over the lazy cat", "a"), // near dup
    (3L, "completely different content about spark query engines", "a"),
    (4L, "another unrelated document mentioning data pipelines", "b"),
    (5L, "another unrelated document mentioning data pipelines", "b")) // exact dup
    .toDF("doc_id", "text", "source")

  test("exact dedup groups normalize-equal docs and keeps min id") {
    val groups = Dedup.exactGroups(corpus).collect()
    assert(groups.length == 4)
    val dupGroups = groups.filter(_.getAs[Long]("n_docs") == 2)
    assert(dupGroups.map(_.getAs[Long]("survivor_id")).toSet == Set(0L, 4L))
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.3, blockCol = "source")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical after normalize -> jaccard 1
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(pairs.contains((4L, 5L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("registry near_dedup survivor policies: min_id vs best_quality") {
    import org.json4s.jackson.JsonMethods.parse
    // docs 0 and 1 are normalize-identical (jaccard 1.0), so they
    // cluster at threshold 0.8; doc 1's RAW text is longer (extra
    // whitespace), so its length-driven quality score is higher
    val minId = graft.Registry.transformers("near_dedup")(
      parse("""{"block_column": "source"}"""))(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(0L, 2L, 3L, 4L), s"min_id kept $minId")
    val bestQ = graft.Registry.transformers("near_dedup")(
      parse("""{"block_column": "source", "keep": "best_quality"}"""))(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bestQ == Set(1L, 2L, 3L, 4L), s"best_quality kept $bestQ")
  }

  test("incremental dedup flags exact and near dups of the new batch only") {
    // batch = {1 (exact dup of 0), 2 (near dup of 0), 3 (unique)};
    // corpus = {0, 4, 5}. Corpus-internal duplication (4 == 5) must NOT
    // surface — only batch-vs-corpus relations are flagged.
    val flags = Dedup.incrementalDedupFlags(corpus,
        isNew = col("doc_id").isin(1L, 2L, 3L), threshold = 0.3)
      .orderBy("doc_id").collect()
    assert(flags.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = flags.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId(1L) == ((true, 1L, false)), s"doc 1: ${byId(1L)}") // exact (and near) dup of 0
    assert(byId(2L)._1 == false && byId(2L)._2 >= 1L && !byId(2L)._3, s"doc 2: ${byId(2L)}")
    assert(byId(3L) == ((false, 0L, true)), s"doc 3: ${byId(3L)}") // unique -> kept
  }

  test("cluster survivors keep the highest-quality member, min id on ties") {
    // 0 and 1 normalize identically (equal quality -> min id 0 wins);
    // 2 is a near dup in the same cluster
    val out = Dedup.jaccardClusters(corpus, threshold = 0.3)
    val c = out.where(col("doc_id").isin(0L, 1L, 2L))
      .select("cluster_id").distinct().collect()
    assert(c.length == 1, "0,1,2 should share one cluster")
  }

  test("minhash signature approximates jaccard; lsh recovers dup candidates") {
    val sigs = Dedup.minhashSignatures(corpus, numHashes = 8, shingleSize = 3)
    assert(sigs.count() == 6 * 8)
    // identical docs -> identical signatures
    val s0 = sigs.where($"doc_id" === 0).orderBy("k").collect().map(_.getLong(2)).toSeq
    val s1 = sigs.where($"doc_id" === 1).orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(s0 == s1)
    val cands = Dedup.lshCandidates(sigs, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)) && cands.contains((4L, 5L)))
  }

  test("simhash: identical docs hash equal; near dups within small hamming") {
    val sigs = Dedup.simhashTable(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(4L) == sigs(5L))
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) <= 16)
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(3L)) > 10)
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 48)))
  }

  test("brute-force topk is exact and lsh recall is sane") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "embeddings")
    val queries = e.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
    val approx = Similarity.lshTopK(e, queries, k = 5, planesPerTable = 4, numTables = 8)
    val exactPairs = exact.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxPairs = approx.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.size == 50) // 10 queries x k=5
    val recall = (exactPairs & approxPairs).size.toDouble / exactPairs.size
    assert(recall > 0.5, s"LSH recall $recall collapsed") // 8 tables x 4 planes
    // self never returned
    assert(!exactPairs.exists { case (q, n) => q == n })
  }

  test("pq: codes are the per-subspace argmin, ADC reproduces the LUT sum, recall sane") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "embeddings")
    val nSub = 16; val subDims = 4
    val cbs = Similarity.pqCodebooks(e, nSub = nSub, codebookSize = 16)
    assert(cbs.size == nSub && cbs.forall(_.size == 16))
    assert(cbs.forall(_.forall(_._2.length == subDims)))
    // a seed vector must encode to its own codeword in every subspace
    // (distance 0 is the unique minimum unless two seeds collide)
    val queries = e.where($"vec_id" < 10)
    val got = Similarity.pqTopK(e, queries, k = 5, cbs)
    val rows = got.collect()
    assert(rows.length == 50) // 10 queries x k=5
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self returned")
    // JVM-side replay of encode+ADC for one pair pins the kernel math
    val seeds = e.where($"vec_id" < 16)
      .select($"vec_id".cast("int"),
        graft.operators.Similarity.normalized($"embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def encode(v: Array[Double]): Array[Int] =
      (0 until nSub).map { j =>
        seeds.map { case (c, s) =>
          val d = (0 until subDims).map { i =>
            val x = v(j * subDims + i) - s(j * subDims + i); x * x
          }.sum
          (d, c)
        }.min._2
      }.toArray
    val vecs = e.select($"vec_id",
        graft.operators.Similarity.normalized($"embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val (qid, nid) = (rows.head.getLong(0), rows.head.getLong(1))
    val expAdc = {
      val q = vecs(qid); val codes = encode(vecs(nid))
      (0 until nSub).map { j =>
        val cw = seeds(codes(j))._2
        (0 until subDims).map(i => q(j * subDims + i) * cw(j * subDims + i)).sum
      }.sum
    }
    assert(math.abs(rows.head.getDouble(2) - expAdc) < 1e-5,
      s"ADC score ${rows.head.getDouble(2)} != replayed $expAdc")
    // compressed-domain ranking still finds most true neighbors
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall > 0.6,
      s"PQ recall $recall collapsed (ADC shortlist should recover most true neighbors)")
  }

  test("banded simhash pairs equal the naive block-wide join") {
    // pigeonhole guarantee: segment banding must lose NO pair within
    // the hamming budget — compare against the O(block²) definition
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
    val banded = Dedup.simhashPairs(docs, maxHamming = 14, blockCol = "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Dedup.simhashTable(docs)
      .join(docs.select($"doc_id", $"source".as("block")), "doc_id")
    val naive = sigs.select($"block", $"doc_id".as("a_id"), $"simhash".as("a_sig"))
      .join(sigs.select($"block", $"doc_id".as("b_id"), $"simhash".as("b_sig")), "block")
      .where($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"a_sig".bitwiseXOR($"b_sig")).as("hamming"))
      .where($"hamming" <= 14)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == naive, s"banding lost/invented pairs: ${(banded diff naive).take(3)} / ${(naive diff banded).take(3)}")
    assert(naive.nonEmpty)
  }

  test("lsh-blocked embedding dedup: exact subset, recall holds") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "embeddings")
    val exact = Similarity.cosineDupPairs(e, threshold = 0.3, blockCol = "label")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineDupPairsLsh(e, threshold = 0.3, blockCol = "label",
        planesPerTable = 2, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh diff exact).isEmpty, "LSH path invented pairs the exact verify should have dropped")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH dedup recall $recall collapsed (${exact.size} exact pairs)")
  }

  test("multimodal meta/feature stages: schema, determinism, corrupt input") {
    val media = Seq(
      (1L, "image", "abcdef0123456789".getBytes("UTF-8"), "s1"),
      (2L, "image", Array[Byte](1, 2), "s1"), // too short -> corrupt
      (3L, "video", null.asInstanceOf[Array[Byte]], "s2")) // null payload
      .toDF("media_id", "media_type", "payload", "source")
    val meta = Multimodal.withMeta(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(meta(2L) == "corrupt" && meta(3L) == "corrupt")
    assert(Set("png", "jpeg").contains(meta(1L)))

    val feats = Multimodal.withFeatures(media)
    assert(!feats.columns.contains("payload")) // payload dropped before shuffle boundary
    val f1 = feats.where($"media_id" === 1).head().getSeq[Float](3)
    assert(f1.length == Multimodal.featureDim)
    val f1again = Multimodal.withFeatures(media)
      .where($"media_id" === 1).head().getSeq[Float](3)
    assert(f1 == f1again) // deterministic stub
    val f3 = feats.where($"media_id" === 3).head().getSeq[Float](3)
    assert(f3.forall(_ == 0.0f)) // null payload -> zero vector
  }

  test("repetition stats flag degenerate docs and clear clean ones") {
    val df = Seq(
      (1L, "the the the the"),                       // one word repeated
      (2L, "alpha beta gamma delta epsilon zeta"),   // no repetition
      (3L, "ab cd ab cd ab cd ab cd"))               // repeated bigram/trigram
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 1.0)                         // top word covers everything
    assert(out(1L)._3 == 0.5)                         // "the the the" x2 -> 1 distinct of 2
    assert(out(2L)._1 < 0.2 && out(2L)._3 == 0.0)     // all unique
    assert(out(3L)._2 == 0.571429)                    // "ab cd" = 4 of 7 bigrams
    assert(out(3L)._3 > 0.5)                          // trigram cycle repeats
  }

  test("pii counts and redaction") {
    val df = Seq((1L, "mail john.doe@acme.io from 192.168.0.1 or dial 555-1234 now"))
      .toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.emailCount($"text"), TextAnalysis.ipv4Count($"text"),
      TextAnalysis.phoneCount($"text"), TextAnalysis.redactPii($"text")).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getString(3) == "mail <EMAIL> from <IP> or dial <PHONE> now")
  }

  test("unigram logprob ranks typical docs above rare-token noise") {
    val df = Seq(
      (1L, "data data data data"),            // only the most common token
      (2L, "data table data table"),          // common tokens
      (3L, "zyx qwv bnm plk"))                // singleton tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    assert(out.values.forall(_ < 0.0)) // log-probs are negative
  }

  test("contamination pairs find the planted train/eval overlap") {
    val df = Seq(
      (0L, "spark shuffles hash partitions across the executor fleet tonight"),
      (1L, "completely unrelated words about gardens and slow cooking herbs"),
      (10L, "spark shuffles hash partitions across the executor fleet at dawn"))
      .toDF("doc_id", "text")
    val pairs = Dedup.contaminationPairs(df, n = 3, minShared = 3,
        evalPred = $"doc_id" >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 10L)))
    assert(pairs.head._3 >= 5) // long shared prefix -> many shared trigrams
  }

  test("registry: repetition_filter, pii_redact, decontaminate stages") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    implicit val fmts: Formats = DefaultFormats
    val df = Seq(
      (0L, "the the the the the the"),
      (1L, "a healthy varied document mentioning john@acme.io by mail"),
      (10L, "a healthy varied document mentioning nobody at all today"))
      .toDF("doc_id", "text")
    val rep = graft.Registry.transformers("repetition_filter")(parse("{}"))(df)
    assert(!rep.collect().map(_.getLong(0)).contains(0L))
    val red = graft.Registry.transformers("pii_redact")(parse("{}"))(df)
    val t1 = red.where($"doc_id" === 1L).head().getString(1)
    assert(t1.contains("<EMAIL>") && !t1.contains("acme.io"))
    val dec = graft.Registry.transformers("decontaminate")(
      parse("""{"eval_ids": [10], "min_shared": 2}"""))(df)
    val kept = dec.collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L)) // doc 1 shares "a healthy varied document mentioning" with eval 10
  }

  test("sequence packing invariants: offsets in budget, dense packs, full coverage") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val budget = 128L
    val packed = Mixture.packSequences(docs, budget)
    assert(packed.count() == docs.count()) // every doc placed exactly once
    assert(packed.where(col("pack_offset") < 0 || col("pack_offset") >= budget).count() == 0)
    // pack ids are dense 0..max per source: count(distinct) == max+1
    val dense = packed.groupBy("source")
      .agg(countDistinct("pack_id").as("n"), max("pack_id").as("mx"))
      .where(col("n") =!= col("mx") + 1)
    assert(dense.count() == 0, "pack ids have holes")
    // total layout length is conserved: last pack start + content = sum of tokens
    val bySource = packed.groupBy("source")
      .agg(sum("n_toks").as("toks"), max(col("pack_id") * budget + col("pack_offset")).as("last_start"))
      .where(col("last_start") >= col("toks"))
    assert(bySource.count() == 0, "a doc starts at or past the end of the token stream")
  }

  test("source mix hits configured proportions and keeps the binding source whole") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    // weight 3 on src1, 1 elsewhere: src1 should end up ~3x any other
    // source's share relative to their sizes
    val weight = when(col("source") === "src1", 3.0).otherwise(1.0)
    val mixed = Mixture.sourceMix(docs, weight)
    val n = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // binding source = argmin(n_s / w_s); with near-equal sizes that is
    // src1 (weight 3): it must keep every row
    val binding = n.keys.minBy(s => n(s) / (if (s == "src1") 3.0 else 1.0))
    assert(kept(binding) == n(binding), s"binding source $binding lost rows")
    // deterministic: rerun keeps the identical documents
    val again = Mixture.sourceMix(docs, weight).select("doc_id")
    assert(mixed.select("doc_id").exceptAll(again).isEmpty)
  }

  test("jsonl source: pinned schema, corrupt lines isolated not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-0.json"))
    w.println("""{"doc_id": 1, "text": "hello\nworld", "lang": "en", "source": "s"}""")
    w.println("""{"doc_id": 2, "text": "truncated""") // malformed line
    w.println("""{"doc_id": 3, "text": "drei", "lang": "de", "source": "s"}""")
    w.close()
    // reference all columns (Spark disallows projecting ONLY the
    // corrupt column from a raw JSON scan)
    val rows = graft.sources.JsonlSource.read(spark, dir).collect()
    val ci = rows.head.fieldIndex("_corrupt")
    assert(rows.count(r => !r.isNullAt(ci)) == 1) // isolated, not fatal
    val clean = rows.filter(_.isNullAt(ci)).sortBy(_.getLong(0))
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(clean(0).getString(1) == "hello\nworld") // escape round-trips newline
  }

  test("jsonl extractor observes the corrupt-line count on the real action") {
    import org.json4s.jackson.JsonMethods.parse
    val dir = java.nio.file.Files.createTempDirectory("jsonlobs").toString
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-0.json"))
    w.println("""{"doc_id": 1, "text": "a", "lang": "en", "source": "s"}""")
    w.println("""{"doc_id": 2, "text": "truncated""") // malformed line
    w.println("""not json at all""")                   // malformed line
    w.println("""{"doc_id": 3, "text": "b", "lang": "de", "source": "s"}""")
    w.close()
    @volatile var corrupt = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        // the observation name carries the source path (uniqueness
        // within a multi-extract action) — listeners match the prefix
        qe.observedMetrics
          .collectFirst { case (n, r) if n.startsWith("jsonl_corrupt_lines") => r }
          .foreach(r => corrupt = r.getAs[Long]("rows"))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = graft.Registry.extractors("jsonl")(spark, parse(s"""{"path": "$dir"}"""))
      assert(df.count() == 2) // clean rows only
      org.apache.spark.GraftSparkShims.waitForListeners(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    // the dropped-line count reached a listener off the SAME action —
    // the metric the extractor comment promises is genuinely observable
    assert(corrupt == 2L)
    // the uniqueness footgun the path-suffixed name prevents: two
    // jsonl extracts unioned in ONE action must pass analysis (a
    // shared observation name fails with duplicated observed metrics)
    val dir2 = java.nio.file.Files.createTempDirectory("jsonlobs2").toString
    val w2 = new java.io.PrintWriter(new java.io.File(dir2, "part-0.json"))
    w2.println("""{"doc_id": 9, "text": "c", "lang": "en", "source": "s"}""")
    w2.close()
    val both = graft.Registry.extractors("jsonl")(spark, parse(s"""{"path": "$dir"}"""))
      .unionByName(
        graft.Registry.extractors("jsonl")(spark, parse(s"""{"path": "$dir2"}""")))
    assert(both.count() == 3)
  }

  test("registry: jsonl loader/extractor round-trip and url_dedup stage") {
    import org.json4s.jackson.JsonMethods.parse
    val docs3 = Seq(
      (0L, "alpha", "en", "s"), (1L, "beta", "en", "s"),
      (2L, "gamma\nline", "de", "t")) // embedded newline must survive
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("regjsonl").toString
    graft.Registry.loaders("jsonl")(docs3, parse(s"""{"output_dir": "$dir"}"""))
    val back = graft.Registry.extractors("jsonl")(spark, parse(s"""{"path": "$dir"}"""))
    assert(back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma\nline")))
    val urls = Seq(
      (0L, "https://www.example.com/p1"),
      (1L, "HTTP://example.com/p1?x=1"), // same page as 0 after canonicalization
      (2L, "https://example.com/p2"))
      .toDF("doc_id", "url")
    val kept = graft.Registry.transformers("url_dedup")(parse("{}"))(urls)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L))
  }

  test("registry: orc loader/extractor round-trip with overwrite") {
    import org.json4s.jackson.JsonMethods.parse
    val docs3 = Seq((0L, "alpha", "en", "s"), (1L, "beta\nline", "de", "t"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("regorc").toString
    graft.Registry.loaders("orc")(docs3, parse(s"""{"output_dir": "$dir"}"""))
    val back = graft.Registry.extractors("orc")(spark, parse(s"""{"path": "$dir"}"""))
    assert(back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "alpha"), (1L, "beta\nline")))
    // overwrite (the default) replaces, never accumulates
    graft.Registry.loaders("orc")(docs3.limit(1), parse(s"""{"output_dir": "$dir"}"""))
    assert(graft.Registry.extractors("orc")(spark, parse(s"""{"path": "$dir"}""")).count() == 1)
  }

  test("url canonicalization folds spelling variants and is idempotent") {
    val urls = Seq(
      "https://www.M3.Example.COM/p7?utm_source=feed",
      "HTTP://m3.example.com/p7",
      "https://m3.example.com/p7/#section-2",
      "m3.example.com/p7",          // already canonical
      "https://example.com",        // bare host, no path
      "https://www.example.com/").toDF("url")
    val canon = urls.select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(canon.take(4).distinct == Seq("m3.example.com/p7"))
    assert(canon(4) == "example.com" && canon(5) == "example.com")
    // idempotent: canonicalizing a canonical url is identity
    val twice = urls.select(TextAnalysis.canonicalizeUrl(
      TextAnalysis.canonicalizeUrl(col("url"))).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == canon)
    // registrable domain = last two host labels, path ignored
    val dom = urls.limit(1).select(TextAnalysis.registrableDomain(
      TextAnalysis.canonicalizeUrl(col("url"))).as("d")).head().getString(0)
    assert(dom == "example.com")
  }

  test("hash split: exhaustive buckets, shuffle-free, stable under partitioning") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val split = Mixture.hashSplit(docs,
      Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == 500 && byName.keySet == Set("train", "valid", "test"))
    // roughly proportional (hash uniformity at n=500: train within 5pp)
    assert(math.abs(byName("train") - 450L) < 25, s"train=${byName("train")}")
    // pure projection: the executed plan must contain NO exchange
    split.collect()
    assert(!split.queryExecution.executedPlan.toString.contains("Exchange"),
      "hashSplit must be shuffle-free")
    // assignment is a function of the id alone: repartitioning the
    // input must not move any doc between splits
    val a = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Mixture.hashSplit(docs.repartition(17), Seq("train" -> 0.9,
        "valid" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // bad fractions fail fast
    intercept[IllegalArgumentException](
      Mixture.hashSplit(docs, Seq("train" -> 0.5, "test" -> 0.4)))
    intercept[IllegalArgumentException](
      Mixture.hashSplit(docs, Seq("train" -> 1.5, "test" -> -0.5)))
  }

  test("token budget sample: per-source cumsum respects the budget") {
    val docs = Seq(
      (0L, "a b c d e f g h i j", "s1"),   // 10 toks
      (1L, "a b c d e f g h i j", "s1"),
      (2L, "a b c d e f g h i j", "s1"),
      (3L, "one two", "s2"),               // 2 toks
      (4L, null.asInstanceOf[String], "s2")) // null text = 0 tokens
      .toDF("doc_id", "text", "source")
    val kept = Mixture.tokenBudgetSample(docs, budgetTokens = 25L)
    val rows = kept.collect()
    // s1: hash order admits two of the three 10-token docs (30 > 25);
    // s2 fits entirely (0 or 2 cumulative)
    assert(rows.count(_.getString(1) == "s1") == 2)
    assert(rows.count(_.getString(1) == "s2") == 2)
    assert(rows.forall(_.getAs[Long]("cum_toks") <= 25L))
    intercept[IllegalArgumentException](
      Mixture.tokenBudgetSample(docs, budgetTokens = 0L))
  }

  test("bloom contamination is bit-identical to the exact join") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val evalPred = Dedup.hash60(col("doc_id").cast("string")) % 25 === 1
    val exact = Dedup.contaminationPairs(docs, n = 2, minShared = 12, evalPred)
      .orderBy("train_id", "eval_id").collect().toSeq
    val bloomed = Dedup.bloomContaminationPairs(docs, n = 2, minShared = 12,
        evalPred, fpp = 0.01)
      .orderBy("train_id", "eval_id").collect().toSeq
    assert(bloomed == exact, "bloom prefilter must not change the result")
    assert(exact.nonEmpty) // the invariant is vacuous on an empty result
  }

  test("bpe merges follow the classic greedy pair frequency order") {
    // word counts: "aa" x4, "ab" x1 -> pair (a,a) weight 4 beats
    // (a,b) weight 1; after both merges no adjacent pairs remain, so
    // steps=4 exhausts at 2 merges instead of padding
    val docs = Seq((0L, "aa aa ab"), (1L, "aa aa"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, steps = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.length == 2, s"expected exhaustion after 2 merges: ${m.toSeq}")
    assert(m(0) == ((0, "a", "a", "aa", 4L)), s"step0: ${m(0)}")
    assert(m(1) == ((1, "a", "b", "ab", 1L)), s"step1: ${m(1)}")
    // overlap semantics: 'aaa' consumes left-to-right (one 'aa' + 'a')
    val tri = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeMerges(tri, steps = 2).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    assert(m2(0) == (("aa", 4L)), s"step0 of aaa: ${m2(0)}") // 2 adjacent pairs x weight 2
    assert(m2(1) == (("aaa", 2L)), s"step1 of aaa: ${m2(1)}")
  }

  test("bpe merge application is classic greedy left-to-right on 4+ repeats") {
    // the case a single-spaced consuming replace gets WRONG: 'aaaa'
    // must merge to [aa, aa] (classic/subword-nmt), not [aa, a, a]
    // (alternate merging). Step 1 then merges (aa, aa) -> 'aaaa',
    // which only exists if step 0 produced BOTH 'aa' symbols.
    val docs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, steps = 2).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m(0) == ((0, "aa", 3L)), s"step0: ${m(0)}") // pairs (a,a) x3 overlapping
    assert(m(1) == ((1, "aaaa", 1L)), s"step1: ${m(1)}")
  }

  test("bpe merge learning at steps=64 stays flat per step (checkpointed lineage)") {
    // 100 distinct 4-char words over 11 letters: several hundred
    // learnable merges, so 64 steps never exhaust. The checkpoint
    // every 8 steps bounds each step's lineage to <=7 pending
    // replaces over the last materialization — without it, cost per
    // step grows linearly in the step index (O(k^2) total) and the
    // 64-step run lands ~4x over the linear prediction. The ratio
    // bound is deliberately loose (linear predicts ~4x, the
    // unchecked-pointed loop measures >~10x) to stay robust to job-
    // scheduling noise.
    val words = for { a <- 'a' to 'j'; b <- 'a' to 'j' } yield s"$a${b}x$a$b"
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    def timed(steps: Int): (Long, Int) = {
      val t0 = System.nanoTime()
      val n = TextAnalysis.bpeMerges(docs, steps).count()
      ((System.nanoTime() - t0) / 1000000L, n.toInt)
    }
    timed(4) // warm: codegen + shuffle-service init off the measurement
    val (t16, n16) = timed(16)
    val (t64, n64) = timed(64)
    assert(n16 == 16 && n64 == 64, s"expected full merge counts: $n16, $n64")
    assert(t64 <= 8 * t16 + 2000,
      s"steps=64 took ${t64}ms vs ${t16}ms for steps=16 - per-step cost is growing")
  }

  test("bpe compression applies learned merges to the word table") {
    // vocab 'aa' x4 + 'ab' x1 learns merges (a,a)->aa then (a,b)->ab;
    // applied, every word collapses to ONE symbol: 10 chars, 5 symbols
    val docs = Seq((0L, "aa aa ab", "s1"), (1L, "aa aa", "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.bpeCompression(docs, steps = 4).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 10L, s"n_chars: ${r(0)}")
    assert(r(0).getLong(2) == 5L, s"n_symbols: ${r(0)}")
    assert(r(0).getDouble(3) == 0.5, s"ratio: ${r(0)}")
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((0L, "same", "a"), (1L, "will change", "a"), (2L, "gone", "b"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((0L, "same", "a"), (1L, "did change", "a"), (3L, "fresh", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got == Map(
      0L -> ("unchanged", "a"), 1L -> ("changed", "a"),
      2L -> ("removed", "b"), 3L -> ("added", "b")))
  }

  test("snapshot diff: null text never fakes presence") {
    val v1 = Seq((0L, null.asInstanceOf[String], "a"), (1L, "x", "a"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((0L, "now real", "a"), (1L, null.asInstanceOf[String], "a"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // both ids exist in both versions: null -> text and text -> null
    // are EDITS, not additions/removals
    assert(got == Map(0L -> "changed", 1L -> "changed"), s"got $got")
  }

  test("quantile threshold ignores null values like percentile does") {
    val rows = Seq(("s", Some(1.0)), ("s", None), ("s", Some(3.0)),
      ("s", None), ("s", Some(2.0)))
      .toDF("source", "v")
    val got = TextAnalysis.quantileThreshold(rows, 0.5, "source", "v")
      .head()
    assert(got.getLong(1) == 3L, s"n must count non-null only: $got")
    assert(got.getDouble(2) == 2.0, s"median of 1,2,3 is 2: $got")
  }

  test("hash_split stage errors on malformed splits config") {
    import org.json4s.jackson.JsonMethods.parse
    val docs = Seq((0L, "t")).toDF("doc_id", "text")
    // map-shaped (unordered) config must fail, not silently 90/5/5
    val e = intercept[RuntimeException] {
      graft.Registry.transformers("hash_split")(
        parse("""{"splits": {"train": 0.8, "test": 0.2}}"""))(docs)
    }
    assert(e.getMessage.contains("LIST"), e.getMessage)
    // absent key still means the documented default
    val ok = graft.Registry.transformers("hash_split")(parse("{}"))(docs)
    assert(ok.columns.contains("split"))
  }

  test("quantile threshold matches Spark's exact percentile aggregate") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("n_chars").cast("double").as("v"))
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = TextAnalysis.quantileThreshold(docs, p, "source", "v")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val want = docs.groupBy("source")
        .agg(round(expr(s"percentile(v, $p)"), 6).as("t"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"p=$p")
    }
  }

  test("registrable domain strips ports, keeps unparseable hosts distinct") {
    import spark.implicits._
    val cases = Seq(
      "sub.ex-1.org/a/b" -> "ex-1.org",      // multi-label: last two
      "ex-1.org:8080/a" -> "ex-1.org",       // :port stripped
      "ex-1.org./a" -> "ex-1.org",           // trailing dot stripped
      "localhost/a" -> "localhost",          // single label: whole host
      "localhost:9000" -> "localhost",       // single label + port
      "intranet" -> "intranet",              // bare single-label host
      // two-label public suffixes: registrable = last THREE labels
      "bbc.co.uk/news" -> "bbc.co.uk",
      "amazon.co.uk/dp/1" -> "amazon.co.uk",
      "news.bbc.co.uk/x" -> "bbc.co.uk",     // deeper host: still three
      "shop.example.com.au" -> "example.com.au",
      "co.uk" -> "co.uk",                    // host IS the suffix: keep it
      // numeric hosts: whole host, never 'last two labels'
      "1.2.3.4/page" -> "1.2.3.4",
      "5.6.3.4:8080/x" -> "5.6.3.4")
    val got = cases.map(_._1).toDF("c")
      .select(col("c"), TextAnalysis.registrableDomain(col("c")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"domain for '$in'")
    }
    // the failure mode the fallback prevents: two unrelated unparseable
    // hosts must NOT collapse into one '' quota bucket
    assert(got("localhost/a") != got("intranet"))
    // ...and the PSL failure mode: two UK registrants must not merge,
    // nor two unrelated IP hosts sharing their last two octets
    assert(got("bbc.co.uk/news") != got("amazon.co.uk/dp/1"))
    assert(got("1.2.3.4/page") != got("5.6.3.4:8080/x"))
  }

  test("url canonicalization matches the reference model over the variant space") {
    // exhaustive cross-product of spelling dimensions (540 urls) vs a
    // pure-Scala mirror of the regex chain — guards the Column
    // implementation against regex-semantics drift (all patterns match
    // at most once, so replaceAll == the single-pass model)
    def model(u: String): String = u.toLowerCase
      .replaceAll("#.*$", "").replaceAll("\\?.*$", "")
      .replaceAll("^https?://", "").replaceAll("^www\\.", "")
      .replaceAll("/$", "")
    val urls = for {
      scheme <- Seq("", "http://", "https://", "HTTP://", "HtTpS://")
      www <- Seq("", "www.", "WWW.")
      path <- Seq("ex-1.org", "sub.ex-1.org/a/b")
      trail <- Seq("", "/")
      query <- Seq("", "?utm=1", "?a=b&c=d/e")
      frag <- Seq("", "#x", "#/deep?q=1")
    } yield s"$scheme$www$path$trail$query$frag"
    val got = urls.toDF("url")
      .select(col("url"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { u =>
      assert(got(u) == model(u), s"mismatch for '$u'")
    }
  }

  test("source mix rejects non-positive weights instead of dropping all rows") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    // weight 0 on src1 would make t_cap = 0 and silently empty the
    // corpus; the in-plan guard must fail the action with a named error
    val zeroW = when(col("source") === "src1", 0.0).otherwise(1.0)
    val e = intercept[Throwable] { Mixture.sourceMix(docs, zeroW).count() }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("weight must be > 0")), msgs(e).mkString(" | "))
  }

  test("chunking overlaps consecutive chunks by exactly the configured tokens") {
    val doc = Seq((1L, (1 to 25).mkString(" "), "a")).toDF("doc_id", "text", "source")
    val chunks = Mixture.chunkDocuments(doc, chunkTokens = 10, overlap = 3)
      .orderBy("chunk_id").collect()
    // step 7: starts 0,7,14,21 -> 4 chunks; last is the 4-token tail
    assert(chunks.length == 4)
    assert(chunks.map(_.getAs[Int]("chunk_len")).toSeq == Seq(10, 10, 10, 4))
    val texts = chunks.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    // chunk i's last `overlap` tokens == chunk i+1's first `overlap` tokens
    texts.sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(a.takeRight(3) == b.take(3), s"overlap broken: $a | $b")
    }
    assert(texts.head.head == "1" && texts.last.last == "25")
    // zero-overlap partitions the stream exactly
    val flat = Mixture.chunkDocuments(doc, chunkTokens = 10, overlap = 0)
      .orderBy("chunk_id").collect()
      .flatMap(_.getAs[String]("chunk_text").split(" "))
    assert(flat.toSeq == (1 to 25).map(_.toString))
  }

  test("vector kernels reject non-float arrays at analysis time") {
    val df = Seq((1L, Array(1, 2, 3))).toDF("id", "v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.VectorExpressions.vectorDot($"v", $"v")).collect()
    }
    assert(ex.getMessage.contains("array<float>"),
      s"unexpected analysis error: ${ex.getMessage}")
  }

  test("line dedup strips corpus-frequent lines, keeps order, handles all-boilerplate docs") {
    // "hdr" appears in 3 of 4 docs (df 3 >= 2); body lines are unique
    val docsDf = Seq(
      (0L, Seq("hdr", "alpha beta", "gamma")),
      (1L, Seq("hdr", "delta")),
      (2L, Seq("hdr")), // all boilerplate -> zero survivors
      (3L, Seq("epsilon", "zeta")))
      .toDF("doc_id", "lines")
    val out = Dedup.lineDedup(docsDf, minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((3L, 2L, "alpha beta\ngamma")))
    assert(out(1L) == ((2L, 1L, "delta")))
    assert(out(2L) == ((1L, 0L, ""))) // present, empty survivor set
    assert(out(3L) == ((2L, 2L, "epsilon\nzeta")))
  }

  test("registry line_dedup rewrites text and drops all-boilerplate docs") {
    import org.json4s.jackson.JsonMethods.parse
    val docsDf = Seq(
      (0L, "promo\nalpha beta\ngamma", "a"),
      (1L, "promo\ndelta", "a"),
      (2L, "promo", "b"), // nothing survives -> row dropped
      (3L, "epsilon\nzeta", "b"))
      .toDF("doc_id", "text", "source")
    val out = graft.Registry.transformers("line_dedup")(
      parse("""{"min_doc_freq": 2}"""))(docsDf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out == Map(0L -> "alpha beta\ngamma", 1L -> "delta", 3L -> "epsilon\nzeta"))
  }

  test("semantic dedup drops the in-cell cosine dup, keeps leaders and singletons") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.995f, 0.1f)), // cos ~0.995 with 0 -> dropped
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))) // cos -1 with 0 -> kept
      .toDF("vec_id", "embedding")
    val out = Clustering.semanticDedup(vecs, nCells = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> true, 3L -> true), s"got $out")
  }

  test("registry semantic_dedup stage keeps only leader rows") {
    import org.json4s.jackson.JsonMethods.parse
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.995f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("doc_id", "embedding")
    val kept = graft.Registry.transformers("semantic_dedup")(
      parse("""{"n_cells": 2, "threshold": 0.9}"""))(vecs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L), s"kept $kept")
  }

  test("bigram logprob scores repeated phrases above shuffled ones; registry order=2 wires it") {
    import org.json4s.jackson.JsonMethods.parse
    // docs 0/1 share every bigram; doc 2 uses the same words in an
    // order whose bigrams appear only once — lower interpolated score
    val df = Seq(
      (0L, "the quick fox jumps high"),
      (1L, "the quick fox jumps high"),
      (2L, "high the jumps quick fox"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(0L) == scored(1L))
    assert(scored(2L) < scored(0L), s"shuffled doc not penalized: $scored")
    // one-token docs are scoreless under order=2 but kept with keep_empty
    val df1 = df.unionByName(Seq((3L, "solo")).toDF("doc_id", "text"))
    val kept = graft.Registry.transformers("perplexity_filter")(
      parse(s"""{"order": 2, "min_avg_logprob": ${scored(2L) + 0.001}, "keep_empty": true}"""))(df1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 3L), s"kept $kept")
  }

  test("source upsample: integer factors repeat exactly, fractional within lottery bounds") {
    import org.json4s.jackson.JsonMethods.parse
    val df = (0L until 100L).map(i =>
        (i, "t", if (i < 50) "a" else "b")).toSeq
      .toDF("doc_id", "text", "source")
    val out = graft.Registry.transformers("source_upsample")(
      parse("""{"factors": {"a": 2.0, "b": 1.5}}"""))(df)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("a") == 100L) // 2.0 -> exactly two copies each
    assert(bySource("b") > 50L && bySource("b") < 100L, // 1.5 -> 50 + lottery
      s"fractional upsample out of bounds: ${bySource("b")}")
    // copy index separates repeats: (doc_id, copy) pairs are unique
    assert(out.select("doc_id", "copy").distinct().count() == out.count())
    // negative factor fails the action in-plan
    val bad = graft.Registry.transformers("source_upsample")(
      parse("""{"factors": {"a": -1.0}}"""))(df)
    intercept[Exception](bad.collect())
  }

  test("registry weighted_sample keeps max_per_stratum rows and favors quality") {
    import org.json4s.jackson.JsonMethods.parse
    // long high-quality text vs near-empty text: over many ids per
    // stratum the high-quality doc family must dominate the sample
    val good = "the quick brown fox jumps over the lazy dog and keeps going " * 5
    val df = (0L until 40L).map(i =>
        (i, if (i % 2 == 0) good else "x", "s")).toSeq
      .toDF("doc_id", "text", "source")
    val kept = graft.Registry.transformers("weighted_sample")(
      parse("""{"max_per_stratum": 10}"""))(df)
      .select("doc_id").collect().map(_.getLong(0))
    assert(kept.length == 10)
    val goodShare = kept.count(_ % 2 == 0)
    assert(goodShare >= 7, s"quality weighting ineffective: $goodShare/10 good docs")
  }

  test("registry domain_cap keeps lowest ids per registrable domain") {
    import org.json4s.jackson.JsonMethods.parse
    val df = Seq(
      (0L, "https://a.example.com/x"), (1L, "https://b.example.com/y"),
      (2L, "https://example.com/z"), (3L, "https://other.net/w"))
      .toDF("doc_id", "url")
    val kept = graft.Registry.transformers("domain_cap")(
      parse("""{"max_per_domain": 2}"""))(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 3L), s"kept $kept") // example.com capped at 2
    // two-label public suffixes are NOT one quota bucket: with cap=2,
    // 2 bbc.co.uk pages and 2 amazon.co.uk pages all survive (under
    // the old last-two-labels rule all four shared domain 'co.uk' and
    // two would be dropped)
    val uk = Seq(
      (0L, "https://bbc.co.uk/news"), (1L, "https://bbc.co.uk/sport"),
      (2L, "https://amazon.co.uk/dp/1"), (3L, "https://amazon.co.uk/dp/2"))
      .toDF("doc_id", "url")
    val keptUk = graft.Registry.transformers("domain_cap")(
      parse("""{"max_per_domain": 2}"""))(uk)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptUk == Set(0L, 1L, 2L, 3L), s"kept $keptUk")
  }

  test("text analysis edge cases: empty and whitespace-only text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "the the the")).toDF("doc_id", "text")
    val out = df.select(
      $"doc_id",
      TextAnalysis.wsTokenCount($"text").as("n"),
      TextAnalysis.stopwordRatio($"text").as("sr"),
      TextAnalysis.qualityScore($"text").as("q")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 0 && out(2L)._1 == 0)
    assert(out(3L)._2 == 1.0) // all stopwords
  }

  test("dup spans: exact boundaries for cross-doc copies and within-doc repeats") {
    // doc 1 and 2 share COPY (60 chars) at different offsets inside
    // otherwise-unique text; doc 3 repeats REP (25 chars) twice
    // internally; doc 4 is unique; doc 5 is shorter than the window.
    // Fillers share no 20-char substring with each other or with the
    // planted runs, and the characters ADJACENT to each planted run
    // differ across docs — otherwise the shared context legitimately
    // extends the duplicated span past the plant.
    val az = ('a' to 'z').mkString            // 26
    val copy = az + az.reverse + "01234567"   // 60 chars, in docs 1 and 2
    val rep = "0123456789ABCDEFGHJKLMNOP"     // 25 chars, twice in doc 3
    val pad1 = "alpha segment with strictly original wording."
    val pad2 = "beta segment keeps to its very own phrasing!"
    val pad3 = "gamma portion written in another standalone voice;"
    val pad4 = "delta tail that closes with still different text?"
    val pad5 = " middle filler appearing exactly once here "
    val pad6 = "epsilon body made of words used nowhere else at all"
    val df = Seq(
      (1L, pad1 + copy + pad2),
      (2L, pad3 + pad4 + copy),
      (3L, rep + pad5 + rep),
      (4L, pad6),
      (5L, "short")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(df, winLen = 20)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
    // cross-doc copy: one span each, EXACTLY covering the 60 shared chars
    val p1 = pad1.length.toLong
    assert(spans(1L) == List((p1 + 1, p1 + 60, 60L)), s"doc1: ${spans.get(1L)}")
    val p34 = (pad3.length + pad4.length).toLong
    assert(spans(2L) == List((p34 + 1, p34 + 60, 60L)), s"doc2: ${spans.get(2L)}")
    // within-doc repeat: both occurrences reported, exact 25-char spans
    val d3start2 = (rep.length + pad5.length).toLong
    assert(spans(3L) == List((1L, 25L, 25L), (d3start2 + 1, d3start2 + 25, 25L)),
      s"doc3: ${spans.get(3L)}")
    // unique and too-short docs contribute nothing
    assert(!spans.contains(4L) && !spans.contains(5L))
  }

  test("dupSpans keepFirst: corpus-wide first occurrence survives (Lee et al. semantics)") {
    // the same fixture as the keep-all test; with keepFirst the span
    // set must shrink to exactly the NON-first occurrences
    val az = ('a' to 'z').mkString
    val copy = az + az.reverse + "01234567"
    val rep = "0123456789ABCDEFGHJKLMNOP"
    val pad1 = "alpha segment with strictly original wording."
    val pad3 = "gamma portion written in another standalone voice;"
    val pad4 = "delta tail that closes with still different text?"
    val pad5 = " middle filler appearing exactly once here "
    val df = Seq(
      (1L, pad1 + copy),
      (2L, pad3 + pad4 + copy),
      (3L, rep + pad5 + rep)).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(df, winLen = 20, keepFirst = true)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
    // doc 1 holds the corpus-wide first occurrence of COPY: no span
    assert(!spans.contains(1L), s"first occurrence must survive: ${spans.get(1L)}")
    // doc 2's copy is a non-first occurrence: exact 60-char span
    val p34 = (pad3.length + pad4.length).toLong
    assert(spans(2L) == List((p34 + 1, p34 + 60, 60L)), s"doc2: ${spans.get(2L)}")
    // within-doc repeat: only the SECOND occurrence is marked
    val d3start2 = (rep.length + pad5.length).toLong
    assert(spans(3L) == List((d3start2 + 1, d3start2 + 25, 25L)),
      s"doc3: ${spans.get(3L)}")
    // and a strip built on keep-first spans retains one copy per run:
    // the registry stage wires the policy through
    import org.json4s.jackson.JsonMethods.parse
    val stripped = graft.Registry.transformers("dup_span_strip")(
      parse("""{"window_len": 20, "keep": "first"}"""))(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(1L) == pad1 + copy, "first-occurrence doc untouched")
    assert(stripped(2L) == pad3 + pad4, s"doc2 keeps only unique text: ${stripped(2L)}")
    assert(stripped(3L) == rep + pad5, s"doc3 keeps first rep: ${stripped(3L)}")
  }

  test("gopher rules: each rule flips on its designed fixture") {
    import org.json4s.jackson.JsonMethods.parse
    val good = ("the quick brown fox jumps over a lazy dog and then " * 6).trim // 66 words, stopwords, alpha
    val docsDf = Seq(
      (0L, good), // passes everything
      (1L, "the a of"), // too few words
      (2L, ("ab " * 60 + "the a").trim), // mean word len 2.06 < 3
      (3L, ("12345 " * 60 + "the a").trim), // alpha frac ~0.03
      (4L, ("quick brown fox jumps " * 15).trim), // no stopwords
      (5L, (("#### " * 12) + good).trim), // symbol ratio 12/78 > 0.1
      (6L, "")) // zero tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("kept"), s"good doc rejected: ${out(0L)}")
    assert(!out(1L).getAs[Boolean]("pass_word_count"))
    assert(!out(2L).getAs[Boolean]("pass_mean_word_len"), s"${out(2L)}")
    assert(!out(3L).getAs[Boolean]("pass_alpha_words"), s"${out(3L)}")
    assert(!out(4L).getAs[Boolean]("pass_stopwords"))
    assert(!out(5L).getAs[Boolean]("pass_symbol_ratio"), s"${out(5L)}")
    assert(out(6L).getAs[Long]("n_words") == 0L && !out(6L).getAs[Boolean]("kept"))
    // every reject is single-cause except the designed overlaps
    assert((1L to 6L).forall(i => !out(i).getAs[Boolean]("kept")))
    val kept = graft.Registry.transformers("gopher_filter")(
      parse("""{"min_words": 50}"""))(docsDf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(0L), s"stage kept $kept")
  }

  test("dsir log-weights favor target-like docs; registry stage keeps k winners") {
    import org.json4s.jackson.JsonMethods.parse
    // target dialect {apple banana cherry}, off-target {rock stone
    // gravel}; the probes share no words across dialects
    val docsDf = Seq(
      (0L, "apple banana cherry apple banana", "tgt"),
      (1L, "cherry apple banana cherry apple", "tgt"),
      (2L, "rock stone gravel rock stone gravel", "raw"),
      (3L, "stone gravel rock stone gravel", "raw"),
      (4L, "apple banana apple banana", "probe"), // target-like
      (5L, "rock stone rock stone", "probe")) // off-target
      .toDF("doc_id", "text", "source")
    val lw = TextAnalysis.dsirLogWeights(docsDf, $"source" === "tgt")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    assert(lw(4L) > lw(5L),
      s"target-like probe should outweigh off-target: $lw")
    assert(lw(4L) > 0 && lw(5L) < 0,
      s"signs should split around the neutral ratio: $lw")
    // stage plumbing: k=3 keeps 3 full rows with the weight attached
    // (qMin 0 makes every doc target, so this checks shape, not bias —
    // the bias property is asserted on dsirLogWeights above)
    val kept = graft.Registry.transformers("dsir_sample")(
      parse("""{"k": 3, "target_quality_min": 0.0}"""))(docsDf)
    assert(kept.count() == 3)
    assert(kept.columns.toSet == Set("doc_id", "text", "source", "log_weight"))
  }

  test("dup spans match a brute-force reference on random small-alphabet corpora") {
    // small alphabet forces organic window collisions; the reference
    // recomputes duplicated windows by literal substring counting and
    // merges islands in plain Scala
    val winLen = 6
    val rnd = new scala.util.Random(42)
    val corpora = (1 to 3).map { _ =>
      (0L until 12L).map { id =>
        val len = 4 + rnd.nextInt(40)
        (id, (1 to len).map(_ => "abc".charAt(rnd.nextInt(3))).mkString)
      }
    }
    for (corpus <- corpora) {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for ((_, t) <- corpus; i <- 0 to t.length - winLen)
        counts(t.substring(i, i + winLen)) = counts.getOrElse(t.substring(i, i + winLen), 0) + 1
      val expected = corpus.flatMap { case (id, t) =>
        val dupPos = (0 to t.length - winLen)
          .filter(i => counts(t.substring(i, i + winLen)) >= 2).map(_ + 1L)
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- dupPos) {
          // merge iff this window starts at or before the previous
          // window's start + winLen (contiguous coverage), i.e. at or
          // before the current span end + 1
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) = (spans.last._1, p + winLen - 1)
          else spans += ((p, p + winLen - 1))
        }
        spans.map { case (a, b) => (id, a, b, b - a + 1) }
      }.toSet
      val got = Dedup.dupSpans(corpus.toDF("doc_id", "text"), winLen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected,
        s"missing=${expected -- got} extra=${got -- expected}")
      // and the strip stage must cut exactly those spans from the text
      val expectedText = corpus.map { case (id, t) =>
        val spans = expected.filter(_._1 == id).toSeq.sortBy(_._2)
        val sb = new StringBuilder
        var cur = 1L
        for ((_, a, b, _) <- spans) {
          sb ++= t.substring(cur.toInt - 1, a.toInt - 1)
          cur = b + 1
        }
        sb ++= t.substring(cur.toInt - 1)
        id -> sb.toString
      }.filter(_._2.nonEmpty).toMap
      val stripped = graft.Registry.transformers("dup_span_strip")(
        org.json4s.jackson.JsonMethods.parse(s"""{"window_len": $winLen}"""))(
        corpus.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      assert(stripped == expectedText,
        s"diff=${(expectedText.toSet diff stripped.toSet) ++ (stripped.toSet diff expectedText.toSet)}")
    }
  }

  test("registry dup_span_strip cuts duplicated runs and drops emptied docs") {
    import org.json4s.jackson.JsonMethods.parse
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE!!" // 38 chars, everywhere
    val docsDf = Seq(
      (0L, "alpha body one keeps its words " + boiler, "a"),
      (1L, boiler + " beta body two phrased differently", "a"),
      (2L, boiler, "b"), // nothing but the duplicated run -> dropped
      (3L, "gamma body three never repeats anything", "b"))
      .toDF("doc_id", "text", "source")
    val out = graft.Registry.transformers("dup_span_strip")(
      parse("""{"window_len": 20}"""))(docsDf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out == Map(
      0L -> "alpha body one keeps its words ",
      1L -> " beta body two phrased differently",
      3L -> "gamma body three never repeats anything"), s"got $out")
  }

  test("c4 rules: each line and page rule flips on its designed fixture") {
    import org.json4s.jackson.JsonMethods.parse
    val goodLine = "this line has plenty of words and ends well."
    val docsDf = Seq(
      (0L, Seq(goodLine, "another perfectly fine sentence right here!", "a third keeper question mark line here?")), // kept
      (1L, Seq(goodLine, "no terminal punctuation on this line", goodLine)), // line 2 dropped -> below min
      (2L, Seq(goodLine, "too short.", goodLine)), // short line dropped
      (3L, Seq(goodLine, "this line mentions javascript somewhere fine.", goodLine)), // js line dropped
      (4L, Seq(goodLine, goodLine, goodLine, "some Lorem Ipsum filler text here.")), // page reject
      (5L, Seq(goodLine, goodLine, goodLine, "config = { nested: true } stuff.")), // page reject
      (6L, Seq(goodLine, goodLine, goodLine, "contains badword1 in the middle somewhere.")), // page reject
      (7L, Seq.empty[String])) // nothing survives
      .toDF("doc_id", "lines")
    val out = TextAnalysis.c4Clean(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("kept") && out(0L).getAs[Long]("n_kept") == 3)
    assert(out(1L).getAs[Long]("n_kept") == 2 && !out(1L).getAs[Boolean]("kept"))
    assert(out(2L).getAs[Long]("n_kept") == 2 && !out(2L).getAs[Boolean]("kept"))
    assert(out(3L).getAs[Long]("n_kept") == 2 && !out(3L).getAs[Boolean]("kept"))
    assert(out(4L).getAs[Boolean]("has_lorem") && !out(4L).getAs[Boolean]("kept"))
    assert(out(5L).getAs[Boolean]("has_brace") && !out(5L).getAs[Boolean]("kept"))
    assert(out(6L).getAs[Boolean]("has_badword") && !out(6L).getAs[Boolean]("kept"))
    assert(out(7L).getAs[Long]("n_kept") == 0L && out(7L).getAs[String]("clean_text") == "")
    // the clean text is the surviving lines in original order
    assert(out(1L).getAs[String]("clean_text") == s"$goodLine\n$goodLine")
    // stage: newline-joined text in, only passing pages out, text rewritten
    val pages = Seq(
      (0L, Seq(goodLine, goodLine, goodLine).mkString("\n")),
      (4L, Seq(goodLine, goodLine, goodLine, "some lorem ipsum here.").mkString("\n")))
      .toDF("doc_id", "text")
    val kept = graft.Registry.transformers("c4_clean")(parse("{}"))(pages)
      .collect()
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == Set(0L))
    assert(kept.head.getAs[String]("text") == Seq(goodLine, goodLine, goodLine).mkString("\n"))
  }

  test("ccnet buckets: equal-depth terciles per source, head most LM-like") {
    import org.json4s.jackson.JsonMethods.parse
    // 6 docs per source; common words score high under the corpus LM,
    // rare words low
    val docsDf = (0L to 5L).map { i =>
      val text = if (i < 3) "common common common words words"
      else s"rare$i unique$i singleton$i oddity$i token$i"
      (i, text, "sA")
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.perplexityBuckets(docsDf).collect()
    assert(out.length == 6)
    val byBucket = out.groupBy(_.getAs[String]("bucket_name"))
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.forall(_.length == 2), s"tercile depth: ${byBucket.view.mapValues(_.length).toMap}")
    val headMin = byBucket("head").map(_.getAs[Double]("avg_logprob")).min
    val tailMax = byBucket("tail").map(_.getAs[Double]("avg_logprob")).max
    assert(headMin >= tailMax, s"head $headMin should be >= tail $tailMax")
    // zero-token docs drop out (x13 inner-join semantics)
    val withEmpty = docsDf.union(Seq((9L, "", "sA")).toDF("doc_id", "text", "source"))
    assert(TextAnalysis.perplexityBuckets(withEmpty).count() == 6)
    // stage keeps head+middle by default
    val kept = graft.Registry.transformers("ccnet_bucket_filter")(parse("{}"))(docsDf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.size == 4, s"stage kept $kept")
  }

  test("unimax allocation matches the greedy water-fill reference") {
    // reference: UniMax's own loop — repeatedly give every remaining
    // group an equal share, saturating any group whose cap is below it
    def greedy(caps: Seq[Double], budget: Double): Map[Int, Double] = {
      var remaining = budget
      var left = caps.zipWithIndex.sortBy(_._1).toList
      var out = Map.empty[Int, Double]
      while (left.nonEmpty) {
        val share = remaining / left.size
        left.find(_._1 <= share) match {
          case Some((c, i)) =>
            out += i -> c; remaining -= c; left = left.filterNot(_._2 == i)
          case None =>
            out ++= left.map { case (_, i) => i -> share }; left = Nil
        }
      }
      out
    }
    for ((sizes, frac, cap) <- Seq(
        (Seq(10L, 20L, 40L, 100L), 0.5, 1.0),
        (Seq(10L, 20L, 40L, 100L), 0.5, 2.0),
        (Seq(7L, 7L, 7L), 0.9, 1.0), // uniform groups, nobody capped
        (Seq(5L, 300L), 0.99, 1.0), // tiny + giant
        (Seq(12L, 30L), 2.0, 1.5))) { // budget exceeds capacity: all capped
      val docsDf = sizes.zipWithIndex.flatMap { case (n, i) =>
        // two docs per group so the token aggregate actually groups
        Seq((s"l$i", ("w " * (n.toInt / 2)).trim),
          (s"l$i", ("w " * (n.toInt - n.toInt / 2)).trim))
      }.zipWithIndex.map { case ((l, t), id) => (id.toLong, l, t) }
        .toDF("doc_id", "lang", "text")
      val out = Mixture.unimaxAllocation(docsDf, frac, cap, "lang").collect()
        .map(r => r.getAs[String]("lang") -> r).toMap
      val caps = sizes.map(_.toDouble * cap)
      val budget = sizes.sum.toDouble * frac
      val ref = greedy(caps, math.min(budget, caps.sum))
      sizes.indices.foreach { i =>
        val got = out(s"l$i").getAs[Double]("alloc")
        assert(math.abs(got - ref(i)) < 1e-5,
          s"sizes=$sizes frac=$frac cap=$cap group $i: got $got want ${ref(i)}")
        assert(got <= caps(i) + 1e-9)
      }
      if (caps.sum >= budget) {
        val total = out.values.map(_.getAs[Double]("alloc")).sum
        assert(math.abs(total - budget) < 1e-4, s"alloc sum $total != budget $budget")
      }
    }
  }

  test("unimax_resample stage keeps capped groups whole and thins the rest") {
    import org.json4s.jackson.JsonMethods.parse
    // small lang: capped at 1 epoch (every doc exactly once); big
    // lang: thinned to the water level by the hash lottery
    val docsDf = ((0L to 9L).map(i => (i, "aa", "w w w w w")) ++
      (10L to 59L).map(i => (i, "bb", "w w w w w")))
      .toDF("doc_id", "lang", "text")
    val res = graft.Registry.transformers("unimax_resample")(
      parse("""{"budget_fraction": 0.5}"""))(docsDf)
    val byLang = res.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // budget = 150 tokens; caps: aa 50, bb 250 -> aa saturated (50),
    // bb at level 100 tokens = 20 docs expected via lottery
    assert(byLang("aa") == 10L, s"capped group must keep every doc once: $byLang")
    assert(byLang("bb") < 50L && byLang("bb") > 5L,
      s"thinned group should be lottery-reduced toward 20: $byLang")
    assert(res.columns.contains("copy"))
  }

  test("char entropy: uniform > skewed > single-symbol, and exact on a known doc") {
    val docsDf = Seq(
      (0L, "abcd"),          // uniform over 4 symbols: H = ln 4
      (1L, "aaab"),          // skewed
      (2L, "aaaa"),          // single symbol: H = 0
      (3L, ""),              // empty: H = 0 by convention
      (4L, "AB  cd"))        // normalize: lowercase + space collapse -> "ab cd"
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_norm"), r.getAs[Double]("char_entropy_nats"))).toMap
    assert(math.abs(got(0L)._2 - math.log(4)) < 1e-6, s"uniform: $got")
    assert(got(2L) == (4L, 0.0))
    assert(got(3L) == (0L, 0.0))
    assert(got(1L)._2 > 0.0 && got(1L)._2 < got(0L)._2,
      s"skewed must land strictly between 0 and uniform: $got")
    assert(got(4L)._1 == 5L, s"normalized length must collapse whitespace: $got")
    // the codegen explode+aggregate shape (the x33 default) must agree
    // with the map-only fold bit-for-bit — same math, same quantization
    val grouped = TextAnalysis.charEntropyGrouped(docsDf)
      .orderBy("doc_id").collect().toSeq
    val fold = TextAnalysis.charEntropy(docsDf)
      .orderBy("doc_id").collect().toSeq
    assert(grouped == fold, s"variants disagree:\n$grouped\n$fold")
  }

  test("classifier score is the integer-milli mean weight and kept thresholds at 0") {
    val docsDf = Seq((0L, "alpha beta beta"), (1L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("clf_score"),
          r.getAs[Boolean]("kept"))).toMap
    // reproduce the deterministic weight table by hand
    def h60(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(15), 16)
    def wm(t: String): Long = h60(s"clsw:${h60(t) % 65536}") % 2001 - 1000
    val expect = (wm("alpha") + 2 * wm("beta")).toDouble / (3 * 1000.0)
    assert(got(0L)._1 == 3L)
    assert(math.abs(got(0L)._2 - expect) < 1e-6, s"got ${got(0L)._2} expect $expect")
    assert(got(0L)._3 == (expect > 0.0))
    assert(got(1L) == (0L, 0.0, false), s"empty doc: $got")
  }

  test("soft dedup weights: cluster members share 1/size, singletons weigh 1.0") {
    val w = Dedup.softDedupWeights(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_size"), r.getAs[Double]("weight"))).toMap
    assert(w.size == 6, s"one row per input doc: $w")
    // docs 0,1,2 are one near-dup cluster; 4,5 exact dups; 3 alone
    assert(w(0L) == (3L, 0.333333) && w(1L) == (3L, 0.333333) && w(2L) == (3L, 0.333333), s"$w")
    assert(w(4L) == (2L, 0.5) && w(5L) == (2L, 0.5), s"$w")
    assert(w(3L) == (1L, 1.0), s"$w")
  }

  test("ngram novelty: unique docs score 1.0, duplicated docs 0.0, partial in between") {
    val nov = Dedup.ngramNovelty(corpus, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(nov.size == 6, "one row per doc")
    def novelty(id: Long) = nov(id).getAs[Double]("novelty")
    // docs 0,1 normalize-identical and 4,5 exact dups: every gram df>=2
    assert(novelty(0L) == 0.0 && novelty(1L) == 0.0)
    assert(novelty(4L) == 0.0 && novelty(5L) == 0.0)
    // doc 3 shares no grams with anything
    assert(novelty(3L) == 1.0)
    // doc 2 shares 6 of its 7 grams with docs 0/1; only "the lazy cat"
    // is corpus-unique
    assert(nov(2L).getAs[Long]("n_grams") == 7L && nov(2L).getAs[Long]("n_unique") == 1L)
    assert(novelty(2L) == 0.142857, s"${nov(2L)}")
    // stage: min_novelty 0.5 keeps only the fully-novel doc
    import org.json4s.jackson.JsonMethods.parse
    val kept = graft.Registry.transformers("novelty_filter")(
      parse("""{"min_novelty": 0.5}"""))(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"kept $kept")
  }

  test("code detection separates source code from prose; stage routes both ways") {
    import org.json4s.jackson.JsonMethods.parse
    val df = Seq(
      (0L, "def add(x, y) { return x + y; } import math; const z = add(1, 2);"),
      (1L, "the quick brown fox jumps over the lazy dog and naps in the sun"),
      (2L, "")).toDF("doc_id", "text")
    val sig = TextAnalysis.codeSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sig(0L).getAs[Boolean]("is_code"), s"code doc flagged: ${sig(0L)}")
    assert(!sig(1L).getAs[Boolean]("is_code"), s"prose doc not flagged: ${sig(1L)}")
    assert(sig(2L).getAs[Double]("code_score") == 0.0 &&
      !sig(2L).getAs[Boolean]("is_code"), s"empty doc scores 0: ${sig(2L)}")
    // doc 0: keywords def/return/import/const = 4 hits, 2 braces, 3 semis
    assert(sig(0L).getAs[Long]("n_keywords") == 4L, s"${sig(0L)}")
    assert(sig(0L).getAs[Long]("n_braces") == 2L && sig(0L).getAs[Long]("n_semis") == 3L)
    // the scalar codeScore agrees with the signal table's code_score
    val scalar = df.select(col("doc_id"), TextAnalysis.codeScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sig.foreach { case (id, r) =>
      assert(scalar(id) == r.getAs[Double]("code_score"), s"doc $id: $scalar vs $sig") }
    // registry stage: drop removes the code doc, keep selects only it
    val drop = graft.Registry.transformers("code_filter")(parse("{}"))(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(drop == Set(1L, 2L), s"drop kept $drop")
    val keep = graft.Registry.transformers("code_filter")(
      parse("""{"mode": "keep"}"""))(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keep == Set(0L), s"keep kept $keep")
  }

  test("code_filter routes NULL text to the prose side: keep ∪ drop = input") {
    import org.json4s.jackson.JsonMethods.parse
    val df = Seq(
      (0L, "def f(x): { return x; }; import os; const y = 1;"),
      (1L, "plain prose with no symbols at all"))
      .toDF("doc_id", "text")
      .unionByName(Seq(2L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    def ids(mode: String) =
      graft.Registry.transformers("code_filter")(parse(mode))(df)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val drop = ids("{}")
    val keep = ids("""{"mode": "keep"}""")
    assert((drop ++ keep) == Set(0L, 1L, 2L) && (drop & keep).isEmpty,
      s"modes must partition the input: drop=$drop keep=$keep")
    assert(drop.contains(2L), "NULL text routes to the prose (drop-survivor) side")
  }

  test("lengthBatching: every doc assigned once, batches bounded, spread ≤ bucket width") {
    val docs = (0L until 200L).map { i =>
      (i, Seq.fill((i % 37).toInt + 1)("tok").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Mixture.lengthBatching(docs, batchSize = 8, bucketTokens = 16)
      .collect()
    assert(out.length == 200 &&
      out.map(_.getAs[Long]("doc_id")).distinct.length == 200,
      "exactly one assignment per doc")
    val byBatch = out.groupBy(r =>
      (r.getAs[Int]("bucket"), r.getAs[Long]("batch_id")))
    assert(byBatch.values.forall(_.length <= 8), "batch size bound")
    byBatch.foreach { case ((bucket, _), rows) =>
      val lens = rows.map(_.getAs[Long]("n_toks"))
      assert(lens.max - lens.min < 16,
        s"bucket $bucket batch spread ${lens.max - lens.min} >= width")
      assert(lens.forall(l => l / 16 == bucket.toLong), "bucket id consistent")
      // slots are a permutation of 0..n-1 within the batch
      assert(rows.map(_.getAs[Int]("slot")).sorted.toSeq ==
        (0 until rows.length), "slot numbering")
    }
    // batches within a bucket fill densely: only the LAST batch is short
    byBatch.keys.groupBy(_._1).foreach { case (bucket, keys) =>
      val sizes = keys.toSeq.sortBy(_._2).map(byBatch(_).length)
      assert(sizes.init.forall(_ == 8),
        s"bucket $bucket has a short non-final batch: $sizes")
    }
  }

  test("containment flags a quoted subset that jaccard keeps below threshold") {
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = short + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val df = Seq((0L, short, "a"), (1L, long, "a"),
      (2L, "entirely different words everywhere here now", "a"))
      .toDF("doc_id", "text", "source")
    val st = Dedup.shingleTable(df, 3)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"),
        Dedup.baseHash(col("s")).as("hb"))
    val inter = st.where(col("doc_id") === 0L).select("h")
      .intersect(st.where(col("doc_id") === 1L).select("h")).count()
    val szA = st.where(col("doc_id") === 0L).count()
    val szB = st.where(col("doc_id") === 1L).count()
    val contA = inter.toDouble / szA
    val jac = inter.toDouble / (szA + szB - inter)
    assert(contA == 1.0, s"short doc fully contained: $contA")
    assert(jac < 0.2, s"jaccard stays under a dedup threshold: $jac")
    // and the documented d17 caveat, pinned: at THIS extreme asymmetry
    // the minhash agreement rate ≈ jaccard (~0.15), so the symmetric
    // banded LSH deterministically does NOT surface the pair — the
    // reason d17's scaladoc states containment recall is bounded by
    // the candidate generator, and extreme subsets need the d15
    // dup-span machinery instead
    val sigs = Dedup.minhashFromBaseHashes(
      st.select(col("doc_id"), col("hb").as("h")), numHashes = 8)
    val cands = Dedup.lshCandidates(sigs, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.contains((0L, 1L)),
      s"extreme-asymmetry pair banding is the documented recall gap: $cands")
  }

  test("eval overlap: per-doc train-gram fraction; eval-eval sharing never counts") {
    // doc 0 train "a b c d e"; doc 1 eval shares exactly one 3-gram
    // with it ("a b c") out of its four; doc 2 eval is a full copy of
    // the train doc (fraction 1.0); doc 3 eval shares "x y z" with
    // doc 1 ONLY — both eval, so that gram must not count as train
    val df = Seq(
      (0L, "a b c d e"),
      (1L, "a b c x y z"),
      (2L, "a b c d e"),
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val grams = Dedup.shingleTable(df, 3)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"))
    val rep = Dedup.evalOverlapFromHashes(grams, col("doc_id") =!= 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rep(1L) == ((4L, 1L, 0.25)), s"doc 1: ${rep(1L)}")
    assert(rep(2L) == ((3L, 3L, 1.0)), s"doc 2: ${rep(2L)}")
    assert(rep(3L) == ((2L, 0L, 0.0)), s"doc 3 (eval-eval share only): ${rep(3L)}")
    assert(!rep.contains(0L), "train docs carry no report row")
  }

  test("registry eval_overlap stage annotates eval docs, passes train docs through") {
    import org.json4s.jackson.JsonMethods.parse
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.Registry.transformers("eval_overlap")(
      parse("""{"eval_modulus": 20}"""))(docs)
    assert(out.count() == docs.count(), "annotator must not drop rows")
    val evalPred = Dedup.hash60(col("doc_id").cast("string")) % 20 === 0
    val nEval = docs.where(evalPred).count()
    assert(nEval > 0, "fixture has eval docs")
    // every eval doc is annotated; every train doc is NULL
    assert(out.where(evalPred && col("overlap_frac").isNull).count() == 0)
    assert(out.where(!evalPred && col("overlap_frac").isNotNull).count() == 0)
    // fractions are fractions
    assert(out.where(col("overlap_frac") < 0 || col("overlap_frac") > 1).count() == 0)
  }

  test("registry eval_overlap tolerates duplicate-id input (counts not inflated)") {
    // the gram kernel's in-kernel dedup equals a global distinct only
    // for unique doc ids; the stage accepts USER DataFrames, so it
    // re-applies an explicit distinct at its boundary — a duplicated
    // row must not change any eval doc's overlap numbers (r16 ADVICE)
    import org.json4s.jackson.JsonMethods.parse
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60).localCheckpoint(true)
    def report(df: org.apache.spark.sql.DataFrame) =
      graft.Registry.transformers("eval_overlap")(
          parse("""{"eval_modulus": 5}"""))(df)
        .where(col("overlap_frac").isNotNull)
        .select("doc_id", "n_grams", "n_overlap", "overlap_frac")
        .distinct()   // dup input yields dup annotated rows; values must match
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val clean = report(docs)
    assert(clean.nonEmpty, "fixture has eval docs")
    val withDups = report(docs.union(docs.limit(10)))
    assert(withDups == clean,
      s"duplicate-id rows changed overlap counts: ${withDups.toSeq.diff(clean.toSeq)}")
  }

  test("registry eval_overlap: conflicting duplicate-id flags resolve eval-wins") {
    // r17 ADVICE: dropDuplicates picked an arbitrary row when duplicate
    // ids carried CONFLICTING eval_flag values — the report was
    // nondeterministic. The flag now aggregates with max(): any
    // eval-flagged duplicate marks the id eval, independent of row
    // order or partitioning.
    import org.json4s.jackson.JsonMethods.parse
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40).localCheckpoint(true)
    val conflicted = docs.limit(5)
    val input = docs.withColumn("ev", lit(false))
      .union(conflicted.withColumn("ev", lit(true)))
    val out = graft.Registry.transformers("eval_overlap")(
        parse("""{"eval_flag_column": "ev"}"""))(input)
    val conflictedIds = conflicted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val annotated = out.where(col("overlap_frac").isNotNull)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(conflictedIds.subsetOf(annotated),
      s"conflicted ids not all eval: ${conflictedIds -- annotated}")
    // and ONLY the conflicted ids are eval (everything else was false)
    assert(annotated == conflictedIds,
      s"unexpected eval ids: ${annotated -- conflictedIds}")
  }

  test("range-search report is exactly the per-vector reduction of the LSH pair graph") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Similarity.cosineDupPairsLsh(embs, threshold = 0.3,
      blockCol = "label", planesPerTable = 2, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty, "fixture yields verified pairs")
    val sym = pairs.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
    val expected = sym.groupBy(_._1).map { case (id, rows) =>
      val best = rows.maxBy(r => (r._3, -r._2))
      id -> ((rows.size.toLong, best._3, best._2))
    }
    val got = Similarity.rangeSearchReport(embs, threshold = 0.3,
        blockCol = "label", planesPerTable = 2, numTables = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == expected,
      s"report diverges: got ${got.size} rows, expected ${expected.size}")
  }

  test("c8 per-source impact rows sum exactly to p4's global funnel counts") {
    // c8 reports per-source what p4 reports globally for its first two
    // gates — summing c8 across sources must land on p4's stage rows
    // exactly (same survivor sets, same token counter), or the two
    // "published" views of one dedup run have silently diverged
    val sfDir = "/root/testdata/sf0.001"
    val p4 = graft.SparkEntry.queries("p4_pretrain_funnel")(spark, sfDir)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    val a = graft.SparkEntry.queries("c8_dedup_impact")(spark, sfDir)
      .agg(sum("docs_total"), sum("docs_exact"), sum("docs_near"),
        sum("tokens_total"), sum("tokens_exact"), sum("tokens_near")).head()
    assert((a.getLong(0), a.getLong(3)) == p4("input"), s"input: $a vs $p4")
    assert((a.getLong(1), a.getLong(4)) == p4("exact_dedup"), s"exact: $a vs $p4")
    assert((a.getLong(2), a.getLong(5)) == p4("near_dedup"), s"near: $a vs $p4")
  }

  test("p5 full funnel: stages 0-2 == p4, containment/semantic deltas replay d17/d13") {
    // p5 threads the d17 containment drop and the d13 semantic drop
    // between p4's near-dedup and gopher gates. Three identities, at
    // sf0.01 where the semantic delta is non-trivial (476 -> 297):
    //  1. stages 0-2 equal p4's rows exactly (shared funnelBaseStages);
    //  2. the containment delta equals the drop rule applied to the
    //     STANDALONE d17 query's pairs restricted to near-dedup
    //     survivors (zero drops on this corpus — the assertion still
    //     binds: any p5-side drop d17's pairs don't support fails);
    //  3. the semantic delta equals the STANDALONE d13 query's
    //     kept=false ids among containment survivors.
    val sfDir = "/root/testdata/sf0.01"
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
    val p5 = rows("p5_full_funnel")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    val p4 = rows("p4_pretrain_funnel")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    Seq("input", "exact_dedup", "near_dedup").foreach(st =>
      assert(p5(st) == p4(st), s"$st: p5=${p5(st)} p4=${p4(st)}"))
    // docs/tokens must be monotone non-increasing down the funnel
    val ordered = Seq("input", "exact_dedup", "near_dedup", "containment",
      "semantic", "gopher", "token_budget").map(p5)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 <= a._1 && b._2 <= a._2, s"non-monotone: $a -> $b") }
    // reconstruct the near-dedup survivor id set via the SAME registry
    // stages CliSpec proved equal to p4's s2
    val extract = graft.Registry.getExtractor("parquet")
    val docs = extract(spark, graft.Registry.parseConfig(
      s"""{"path": "$sfDir/documents.parquet"}"""))
    val exact = graft.Registry.getTransformer("exact_dedup")(
      graft.Registry.parseConfig("{}"))
    val near = graft.Registry.getTransformer("near_dedup")(
      graft.Registry.parseConfig(
        """{"method": "minhash_lsh", "threshold": 0.1, "ngram": 3,
          | "num_hashes": 8, "rows_per_band": 2,
          | "keep": "best_quality"}""".stripMargin))
    val surv2 = near(exact(docs)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(surv2.size.toLong == p5("near_dedup")._1, "survivor recompute drifted")
    // identity 2: containment delta from the standalone d17 query
    val d17drops = rows("d17_containment").flatMap { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val (asz, bsz) = (r.getAs[Long]("a_sz"), r.getAs[Long]("b_sz"))
      val it = r.getAs[Long]("inter").toDouble
      if (!surv2(a) || !surv2(b)) None
      else if (it / asz >= 0.5 && asz < bsz) Some(a)
      else if (it / bsz >= 0.5 && bsz <= asz) Some(b)
      else None
    }.toSet
    assert(p5("containment")._1 == p5("near_dedup")._1 - d17drops.size,
      s"containment delta != d17 replay: $d17drops")
    val surv3 = surv2 -- d17drops
    // identity 3: semantic delta from the standalone d13 query
    val d13dropped = rows("d13_semantic_dedup")
      .filter(!_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    val semDrops = surv3.intersect(d13dropped)
    assert(p5("semantic")._1 == p5("containment")._1 - semDrops.size,
      s"semantic delta != d13 replay: expected -${semDrops.size}")
    assert(semDrops.nonEmpty, "semantic gate vacuous at sf0.01")
  }

  test("extreme asymmetry (50x): containmentDedup misses, dupSpans catches (d17 contract)") {
    // The adversarial regime d17's scaladoc documents: a doc FULLY
    // contained in a ~50x larger doc. Its containment is 1.0 but its
    // Jaccard ~ 1/50, so the banded-minhash candidate generator cannot
    // surface the pair — containmentDedup keeps both docs (the stated
    // recall bound, asserted here as the CONTRACT, not a comment), and
    // the correct routing for this regime is d15's exact substring
    // machinery: dupSpans flags the shared run in BOTH docs.
    val short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 250).map(i => s"filler$i token$i").mkString(" ")
    val long = filler + " " + short // |long| ~ 50x |short| in shingles
    val df = Seq((0L, short), (1L, long),
      (2L, "entirely different words everywhere around here today"))
      .toDF("doc_id", "text")
    // sanity: the fixture IS the extreme regime (containment 1, J << t)
    val st = Dedup.shingleTable(df, 3)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"))
    val inter = st.where(col("doc_id") === 0L).select("h")
      .intersect(st.where(col("doc_id") === 1L).select("h")).count()
    val szA = st.where(col("doc_id") === 0L).count()
    val szB = st.where(col("doc_id") === 1L).count()
    assert(inter == szA, "short doc fully contained")
    assert(szB >= 40 * szA, s"asymmetry is extreme: $szB vs $szA")
    // the documented MISS: every doc survives containment dedup
    val kept = Dedup.containmentDedup(df, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L),
      s"banded LSH cannot see a J~1/50 pair — documented recall bound: $kept")
    // the documented ROUTING: exact substring spans catch it in both
    // docs (the short text is a contiguous >=20-char duplicated run)
    val spans = Dedup.dupSpans(df, winLen = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(spans.contains(0L) && spans.contains(1L) && !spans.contains(2L),
      s"dupSpans must flag the contained run in both docs: $spans")
  }

  test("exactJaccardPairsPrefix equals the brute inverted-index join (lossless)") {
    // the AllPairs prefix filter must not lose a single true pair —
    // compare against the uncapped full-index join at several
    // thresholds, including one low enough to stress the bound
    val st = Dedup.shingleTable(corpus, 3)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard_sim"))
    Seq(0.1, 0.5, 0.75, 1.0).foreach { t =>
      val pref = Dedup.exactJaccardPairsPrefix(st, t).collect().map(key).toSet
      val brute = Dedup.ngramJaccardPairsFromIndex(
        st.select(lit(0).as("block"), col("doc_id").as("id"), col("h").as("s")),
        corpus.select(count(lit(1)).as("n_docs")), t).collect().map(key).toSet
      assert(pref == brute, s"t=$t: prefix $pref vs brute $brute")
    }
    // and the fixture actually exercises it: J=0.75 pairs exist
    assert(Dedup.exactJaccardPairsPrefix(st, 0.5).count() == 4)
  }

  test("exactJaccardPairsPrefix lossless under size/positional pruning (randomized)") {
    // r15 added the Bayardo length filter and the PPJoin positional
    // filter to candidate generation — both must stay CONSERVATIVE.
    // Stress them with a deterministic pseudo-random corpus whose doc
    // sizes vary 2-40 grams over a 60-hash universe (heavy partial
    // overlaps, size ratios straddling every threshold), at thresholds
    // including non-representable ones where the ceil-epsilon matters.
    val rows = (0L until 40L).flatMap { d =>
      val rnd = new scala.util.Random(d * 7919 + 13)
      val sz = 2 + rnd.nextInt(39)
      Seq.fill(sz)(rnd.nextInt(60)).distinct.map(h => (d, h.toLong))
    } ++
      // planted high-J block so every swept threshold has true pairs:
      // 40==41 exactly, 42 drops one gram (J=9/10), 43 drops two (8/10)
      Seq.tabulate(10)(h => (40L, 100L + h)) ++
      Seq.tabulate(10)(h => (41L, 100L + h)) ++
      Seq.tabulate(9)(h => (42L, 100L + h)) ++
      Seq.tabulate(8)(h => (43L, 100L + h))
    val st = spark.createDataFrame(rows).toDF("doc_id", "h")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard_sim"))
    Seq(0.07, 0.3, 0.62, 0.9).foreach { t =>
      val pref = Dedup.exactJaccardPairsPrefix(st, t).collect().map(key).toSet
      val brute = Dedup.ngramJaccardPairsFromIndex(
        st.select(lit(0).as("block"), col("doc_id").as("id"), col("h").as("s")),
        st.select(countDistinct("doc_id").as("n_docs")), t)
        .collect().map(key).toSet
      assert(pref == brute,
        s"t=$t: missing=${brute -- pref} extra=${pref -- brute}")
      assert(pref.nonEmpty, s"t=$t: vacuous fixture")
    }
  }

  test("lshTuningReport: nested candidate sets, exact dups never missed, floor math") {
    // corpus truth at J >= 0.5: (0,1) J=1, (4,5) J=1, (0,2)/(1,2) J=0.75
    val st = Dedup.shingleTable(corpus, 3)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"),
        Dedup.baseHash(col("s")).as("hb"))
    val rows = Dedup.lshTuningReport(st, numHashes = 8,
        rowsPerBands = Seq(1, 2, 4, 8), threshold = 0.5)
      .orderBy("rows_per_band").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Long]("n_true_pairs") == 4L),
      s"truth = two exact-dup pairs + two J=0.75 pairs: ${rows.toSeq}")
    // rows-per-band chain 1|2|4|8 refines band keys, so candidate sets
    // are NESTED: volumes and hits must be non-increasing in r
    val cands = rows.map(_.getAs[Long]("n_candidates")).toSeq
    val hits = rows.map(_.getAs[Long]("n_hits")).toSeq
    assert(cands == cands.sorted.reverse, s"candidates must shrink: $cands")
    assert(hits == hits.sorted.reverse, s"hits must shrink: $hits")
    // an exact dup has an identical signature — EVERY config catches it
    assert(hits.forall(_ >= 2L), s"exact-dup pairs always collide: $hits")
    // reported micro ratios are exactly the floor of the counts
    rows.foreach { r =>
      val (c, h, t) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_true_pairs"))
      val p = if (c > 0) (h.toDouble * 1e6 / c.toDouble).floor.toLong else 0L
      assert(r.getAs[Long]("precision_micro") == p, s"$r")
      assert(r.getAs[Long]("recall_micro") == (h.toDouble * 1e6 / t).floor.toLong, s"$r")
    }
    // a rows-per-band that does not divide K is a config error
    intercept[IllegalArgumentException](
      Dedup.lshTuningReport(st, numHashes = 8, rowsPerBands = Seq(3)))
    // sampleMod keeps a deterministic doc slice: truth can only shrink
    val sampled = Dedup.lshTuningReport(st, sampleMod = 2)
      .orderBy("rows_per_band").collect()
    assert(sampled.head.getAs[Long]("n_true_pairs") <= 4L)
  }

  test("temperatureMix: T=1 is proportional, higher T upsamples the small source") {
    // 9 docs x 10 tokens from "a", 1 doc x 10 tokens from "b":
    // f_a = 0.9, f_b = 0.1 — hand-checkable sqrt-chain shares
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docsDf = ((0 until 9).map(i => (i.toLong, ten, "a")) :+ (9L, ten, "b"))
      .toDF("doc_id", "text", "source")
    val rows = Mixture.temperatureMix(docsDf).collect()
      .map(r => (r.getAs[Int]("temperature"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("p_micro"), r.getAs[Long]("epochs_micro")))).toMap
    // T=1: exact proportional shares, every group at exactly one epoch
    assert(rows((1, "a")) == ((900000L, 1000000L)), s"$rows")
    assert(rows((1, "b")) == ((100000L, 1000000L)), s"$rows")
    // T=2: p_b = sqrt(.1)/(sqrt(.9)+sqrt(.1)) = 0.25 -> epochs_b = 2.5
    assert(math.abs(rows((2, "b"))._1 - 250000L) <= 2, s"$rows")
    assert(math.abs(rows((2, "b"))._2 - 2500000L) <= 20, s"$rows")
    // shares are monotone in T: the small source rises, the big falls
    assert(rows((1, "b"))._1 < rows((2, "b"))._1 &&
      rows((2, "b"))._1 < rows((4, "b"))._1, s"$rows")
    assert(rows((1, "a"))._1 > rows((2, "a"))._1 &&
      rows((2, "a"))._1 > rows((4, "a"))._1, s"$rows")
    // each temperature's shares sum to 1e6 within |groups| floor slack
    Seq(1, 2, 4).foreach { t =>
      val s = rows((t, "a"))._1 + rows((t, "b"))._1
      assert(s <= 1000000L && s >= 1000000L - 2, s"T=$t sums to $s")
    }
    // non-power-of-two temperatures are rejected (sqrt-chain contract)
    intercept[IllegalArgumentException](
      Mixture.temperatureMix(docsDf, temperatures = Seq(3)))
    // stage: T=1 is the identity multiset; T=4 repeats the small
    // source at its epoch rate and thins the big one below 1x
    import org.json4s.jackson.JsonMethods.parse
    val t1 = graft.Registry.transformers("temperature_mix")(
      parse("""{"temperature": 1}"""))(docsDf)
    assert(t1.count() == 10L, "T=1 resample must pass every doc once")
    val t4 = graft.Registry.transformers("temperature_mix")(
      parse("""{"temperature": 4}"""))(docsDf)
    val bySrc = t4.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // epochs_a ~ 0.70, epochs_b ~ 3.66 at T=4
    assert(bySrc("b") >= 3L, s"small source must repeat: $bySrc")
    assert(bySrc.getOrElse("a", 0L) < 9L, s"big source must thin: $bySrc")
  }

  test("x40 calibration table tiles every source into deciles ordered by score") {
    // The reliability-table contract: (1) every doc lands in exactly one
    // (source, decile) cell, so n_docs sums back to the corpus; (2)
    // deciles are assigned by ntile over clf_score, so the per-cell mean
    // classifier score must be NON-DECREASING in decile within a source
    // — if it ever dips, the bucketing and the reported means have
    // desynchronized and the whole calibration read is garbage
    val sfDir = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = graft.SparkEntry.queries("x40_quality_calibration")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every doc in exactly one cell")
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, cells) =>
      val byDecile = cells.sortBy(_.getAs[Int]("decile"))
      assert(byDecile.map(_.getAs[Int]("decile")).toSeq == (1 to cells.length),
        s"$src: deciles must tile 1..n with no gaps")
      assert(cells.length == 10, s"$src has >=10 docs at sf0.001, so 10 cells")
      val means = byDecile.map(_.getAs[Long]("mean_clf_micro")).toSeq
      assert(means == means.sorted,
        s"$src: mean score must be monotone across deciles: $means")
      // ntile balance: cell sizes differ by at most 1
      val sizes = cells.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src: ntile balance: ${sizes.toSeq}")
    }
  }

  test("containmentDedup drops the contained doc and keeps the superset + unrelated") {
    val short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val long = short + " lambda mu nu" // moderate asymmetry: bands collide
    val df = Seq((0L, short), (1L, long),
      (2L, "entirely different words everywhere around here today"))
      .toDF("doc_id", "text")
    val kept = Dedup.containmentDedup(df, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"short quoted doc must drop: kept $kept")
    // identical docs: the larger id drops (deterministic tie-break)
    val dup = Seq((10L, short), (11L, short)).toDF("doc_id", "text")
    val keptDup = Dedup.containmentDedup(dup, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptDup == Set(10L), s"equal-size tie drops the larger id: $keptDup")
    // registry stage wires the same semantics
    import org.json4s.jackson.JsonMethods.parse
    val viaStage = graft.Registry.transformers("containment_dedup")(
      parse("{}"))(df).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaStage == Set(1L, 2L), s"stage: $viaStage")
  }
}
