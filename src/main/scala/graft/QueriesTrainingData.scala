package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline facade: dedup / similarity / text analysis /
  * multimodal over the `documents` and `embeddings` tables, each with a
  * DuckDB oracle — every hash, plane component, and accumulation order
  * is md5-derived / left-to-right for exactly this reason (even the LSH
  * ANN pipeline is deterministic enough to hash-match, s2).
  */
object QueriesTrainingData {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Session-staged n=3 shingle index over `documents`: one row per
    * (doc_id, source, DISTINCT shingle) with `h` = [[Dedup.hash60]]
    * (the exact-overlap / jaccard key) and `hb` = [[Dedup.baseHash]]
    * (the minhash input) — built ONCE per (testdata, JVM) and
    * materialized as parquet, the [[QueriesExtended.stagedClusters]]
    * pattern. A production dedup pipeline computes its inverted index
    * once and every consumer (d2 jaccard, d3/d4 minhash+LSH, d9
    * contamination, d11 incremental, x36 novelty) reads it; the r11
    * shape instead re-ran the tokenize+window gram pass in every
    * branch of every consumer's plan. Values are bit-identical to the
    * inline build (tokenization and hashes are deterministic), so all
    * oracles are unchanged; the one-time build cost lands in the bench
    * artifact's `staging` map (see [[TempDirs.stagingSeconds]]), never
    * inside a per-query minimum.
    */
  private[graft] def stagedShingles(s: SparkSession, dir: String): DataFrame = {
    val staged = TempDirs.cached(s"shingles3:$dir") { d =>
      Dedup.hashedGramTable(docs(s, dir), 3, carryCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("h"), col("hb"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$d/shingles")
    }
    s.read.parquet(s"$staged/shingles")
  }

  // --- text analysis ---------------------------------------------------

  private def x1TokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  /** Per-language tokenizer fertility report — the table a tokenizer
    * design review reads (fertility = subword tokens per whitespace
    * word; chars per subword token = compression): languages whose
    * fertility runs high are under-served by the vocab (the UniMax /
    * tokenizer-parity concern), and the byte-budget per token drives
    * context-window economics. Map-only counters + one lang-scale
    * aggregation; exact integer sums, one rounded division per ratio.
    */
  private def x39TokenizerFertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"),
        length(col("text")).cast("long").as("_chars"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("_ws"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("_bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("_chars").as("n_chars"),
        sum("_ws").as("n_ws_tokens"),
        sum("_bpe").as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        col("n_ws_tokens"), col("n_bpe_tokens"),
        when(col("n_ws_tokens") > 0,
          round(col("n_bpe_tokens").cast("double")
            / col("n_ws_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("fertility"),
        when(col("n_bpe_tokens") > 0,
          round(col("n_chars").cast("double")
            / col("n_bpe_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("chars_per_token"))
      .orderBy("lang")

  private def x2Quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
      round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextAnalysis.meanWordLength(col("text")), 6).as("mean_word_len"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")

  private def x3LangId(s: SparkSession, dir: String): DataFrame =
    // staged: tokenize once per row, then score the aliased attribute —
    // the inline langId(col) form re-evaluated the tokenization per
    // language and per field reference (~30 regex splits per row)
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.wsTokens(lower(col("text"))).as("_toks"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langIdFromTokens(col("_toks")).as("_pred"))
      .select(
        col("doc_id"),
        col("_pred").getField("code").as("lang_pred"),
        round(col("_pred").getField("score"), 6).as("lang_score"),
        col("lang").as("lang_true"))
      .orderBy("doc_id")

  private def x4Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
      TextAnalysis.fingerprint64(col("text")).as("fp64"))
      .orderBy("doc_id")

  private def x11Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(docs(s, dir)).orderBy("doc_id")

  /** PII detection/redaction over deterministically synthesized
    * PII-bearing text (the raw corpus contains none — the same
    * synthesize-from-documents pattern as the media table, so the
    * regex machinery is exercised with non-trivial matches and the
    * oracle recomputes the identical input).
    */
  private def x12Pii(s: SparkSession, dir: String): DataFrame = {
    val piiText = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com ip 10.0."), (col("doc_id") % 256).cast("string"),
      lit(".17 call 555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0"))
    docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.emailCount(piiText).as("n_emails"),
        TextAnalysis.ipv4Count(piiText).as("n_ipv4"),
        TextAnalysis.phoneCount(piiText).as("n_phones"),
        TextAnalysis.redactPii(piiText).as("redacted"))
      .orderBy("doc_id")
  }

  /** Docs with no tokens have no unigram rows and drop out — the same
    * inner-join semantics as the oracle's per-doc grouping.
    */
  private def x13UnigramLogprob(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(docs(s, dir)).orderBy("doc_id")

  private def x20BigramLogprob(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(docs(s, dir)).orderBy("doc_id")

  private def d9Contamination(s: SparkSession, dir: String): DataFrame =
    Dedup.contaminationPairsFromHashes(
        stagedShingles(s, dir).select(col("doc_id"), col("h")),
        docs(s, dir), minShared = 3,
        evalPred = Dedup.hash60(col("doc_id").cast("string")) % 20 === 0)
      .orderBy("train_id", "eval_id")

  /** Per-eval-doc contamination fraction off the staged shingle index
    * (same eval split as d9 — the pair view; this is the per-doc view
    * a decontamination threshold is applied to).
    */
  private def x38EvalOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.evalOverlapFromHashes(
        stagedShingles(s, dir).select(col("doc_id"), col("h")),
        evalPred = Dedup.hash60(col("doc_id").cast("string")) % 20 === 0)
      .orderBy("doc_id")

  // --- dedup -----------------------------------------------------------

  private def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir)).orderBy("content_md5")

  private def d2NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsFromIndex(
        stagedShingles(s, dir).select(col("source").as("block"),
          col("doc_id").as("id"), col("h").as("s")),
        docs(s, dir).select(count(lit(1)).as("n_docs")),
        threshold = 0.05, maxDfFraction = Some(0.01))
      .orderBy("a_id", "b_id")

  private def x28GopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherFlags(docs(s, dir)).orderBy("doc_id")

  /** Synthetic C4 input: the d12 8-token line grouping, plus the
    * markers the rules look for — a deterministic terminal-punct cycle
    * per line (doc_id + line index mod 4: . ! ? none), a "javascript"
    * token on line 0 of every 7th doc, and one lorem / brace / badword
    * line appended to every 11th / 13th / 17th doc (the raw corpus
    * contains none of these, so without synthesis every page-level
    * rule would be vacuously true — the x12 PII pattern).
    */
  private def c4LineDf(s: SparkSession, dir: String): DataFrame = {
    // tokenize ONCE into an attribute before the per-line transform:
    // referencing the wsTokens EXPRESSION inside the lambda would
    // re-inline it, re-tokenizing the whole document for every line
    // it yields — O(tokens²) per doc (the r16 explode re-inlining
    // trap, Generate's Project cousin). _toks is consumed many times
    // below, so CollapseProject keeps the boundary.
    val base = docs(s, dir).select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("_toks"))
    val toks = col("_toks")
    val nContent = ceil(size(toks) / lit(8.0)).cast("int")
    val punctCycle = array(lit("."), lit("!"), lit("?"), lit(""))
    val content = when(nContent > lit(0),
      transform(sequence(lit(0), nContent - lit(1)), l => {
        val body = array_join(slice(toks, l * lit(8) + lit(1), lit(8)), " ")
        val withJs = when(col("doc_id") % 7 === 0 && l === lit(0),
          concat(lit("javascript "), body)).otherwise(body)
        concat(withJs,
          element_at(punctCycle, ((col("doc_id") + l) % 4).cast("int") + lit(1)))
      }))
      .otherwise(array().cast("array<string>"))
    def marker(mod: Int, line: String) =
      when(col("doc_id") % mod === 0, array(lit(line)))
        .otherwise(array().cast("array<string>"))
    base.select(col("doc_id"),
      concat(content,
        marker(11, "lorem ipsum dolor sit amet."),
        marker(13, "var page = { config: true };"),
        marker(17, "this line mentions badword1 explicitly."))
        .as("lines"))
  }

  /** C4 heuristic cleaning rules (Raffel et al. 2020): line keeps +
    * page rejects over the synthesized line table, fingerprinting the
    * surviving text.
    */
  private def x30C4Rules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.c4Clean(c4LineDf(s, dir))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("has_lorem"), col("has_brace"), col("has_badword"), col("kept"),
        md5(col("clean_text").cast("binary")).as("clean_md5"))
      .orderBy("doc_id")

  /** CCNet perplexity bucketing (Wenzek et al. 2020): corpus-LM
    * likelihood terciles per source — head / middle / tail.
    */
  private def x31CcnetBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(docs(s, dir), nBuckets = 3)
      .select("doc_id", "source", "n_tokens", "avg_logprob",
        "bucket", "bucket_name")
      .orderBy("doc_id")

  /** UniMax budget allocation (Chung et al. 2023): water-filling a
    * 75%-of-corpus token budget across languages at a 1-epoch cap.
    */
  /** Temperature-scaled mixture table (Mixture.temperatureMix): how a
    * T in {1, 2, 4} reweights each source's sampling share and epoch
    * rate — the multilingual-LM mixing knob next to x32's UniMax
    * alternative. Power-of-two temperatures keep f^(1/T) a
    * correctly-rounded sqrt chain on both engines.
    */
  private def x41TemperatureMix(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.temperatureMix(docs(s, dir))
      .orderBy("temperature", "source")

  private def x32UnimaxMix(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.unimaxAllocation(docs(s, dir),
        budgetFraction = 0.75, epochCap = 1.0)
      .orderBy("lang")

  /** DSIR importance resampling end-to-end: log-weights against a
    * quality-exemplar target (docs with quality >= 0.5), then A-ES
    * weighted sampling entirely in log space (key = ln(-ln u) -
    * log_weight orders exactly like -ln(u)/w), global top-50 via
    * distributed TakeOrdered + a rank window over the 50 survivors.
    */
  private def x27DsirSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lw = TextAnalysis.dsirLogWeights(
      docs(s, dir), TextAnalysis.qualityScore(col("text")) >= 0.5)
    val h = Dedup.hash60(concat(lit("dsir:"), col("doc_id").cast("string")))
    // u in (0, 1]; at the 2^-60 edge u = 1, ln(-ln 1) = -inf and the
    // doc deterministically sorts first — both engines agree, same
    // benign class as x19's key-0 edge
    val u = (h + lit(1L)).cast("double") / 1.152921504606846976e18
    lw.withColumn("sample_key",
        round(log(negate(log(u))) - col("log_weight"), 6))
      .orderBy("sample_key", "doc_id").limit(50)
      .withColumn("rk",
        row_number().over(Window.orderBy("sample_key", "doc_id")))
      .select("rk", "doc_id", "n_tokens", "log_weight", "sample_key")
      .orderBy("rk")
  }

  private def d15DupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(docs(s, dir), winLen = 40)
      .orderBy("doc_id", "span_start")

  /** The Lee et al. (2022) keep-first-occurrence variant of d15: the
    * corpus-wide first occurrence of each repeated run is NOT marked,
    * so a strip built on these spans retains exactly one copy of every
    * duplicated substring (the paper's suffix-array semantics; d15
    * marks all occurrences — the boilerplate stance).
    */
  private def d18DupSpansFirst(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(docs(s, dir), winLen = 40, keepFirst = true)
      .orderBy("doc_id", "span_start")

  private def d3MinhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashFromBaseHashes(
        stagedShingles(s, dir).select(col("doc_id"), col("hb").as("h")),
        numHashes = 8)
      .orderBy("doc_id", "k")

  /** Shared LSH-verify scaffold for d4/d17: banded minhash candidate
    * pairs from the staged index, exact-verified on the 60-bit hashes —
    * one row per candidate pair with (a_id, b_id, inter, a_sz, b_sz),
    * inter = 0 for band collisions with no shared shingle. Extracting
    * this keeps the two queries' candidate sets provably identical
    * (and their oracles mirror the same CTE chain).
    */
  private def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    stagedVerifiedPairs(s, dir)

  /** The verified-pair scaffold MATERIALIZED once per (testdata, JVM)
    * (r21): band keys + candidate self-join + exact hash-verify are
    * identical work in d4, d17, p5's containment gate AND the cluster
    * staging's edge input — each used to re-run the four-exchange
    * scaffold per invocation per bench rep. Build cost lands in the
    * bench staging map as `lshPairs`; consumers scan a narrow parquet.
    */
  private[graft] def stagedVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val shingles = stagedShingles(s, dir)
    val staged = TempDirs.cached(s"lshPairs:$dir") { d =>
      Dedup.lshVerifiedPairsFromHashes(shingles)
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$d/pairs")
    }
    s.read.parquet(s"$staged/pairs")
  }

  private def d4LshPairs(s: SparkSession, dir: String): DataFrame =
    lshVerifiedPairs(s, dir)
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"), 6)
          .as("jaccard_sim"))
      .orderBy("a_id", "b_id")

  /** Asymmetric containment pairs: for each LSH candidate pair, the
    * fraction of EACH side's distinct shingles that is shared — the
    * quote/subset detector. A short doc embedded in a long one has
    * containment ~1.0 on the short side while its Jaccard (union-
    * normalized) stays far below any dedup threshold, so d4 never
    * flags it. Candidates come from the same banded minhash collisions
    * as d4 (symmetric LSH under-recalls EXTREME size asymmetry — the
    * standard trade, worth stating); the verify join on the staged
    * 60-bit hashes is exact, and the emit threshold is
    * either-direction containment >= 0.5.
    */
  private def d17Containment(s: SparkSession, dir: String): DataFrame =
    lshVerifiedPairs(s, dir)
      .select(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"), col("inter"),
        round(col("inter").cast("double") / col("a_sz"), 6).as("cont_a"),
        round(col("inter").cast("double") / col("b_sz"), 6).as("cont_b"))
      .where(col("cont_a") >= 0.5 || col("cont_b") >= 0.5)
      .orderBy("a_id", "b_id")

  /** LSH band-configuration S-curve (Dedup.lshTuningReport): candidate
    * volume / precision / recall at J >= 0.5 for rows-per-band in
    * {1, 2, 4, 8} over one K=8 signature table off the staged shingle
    * index. The tuning table behind d4/d8/d17's (band, row) choice —
    * exact ground truth is viable here because the report targets a
    * bounded sample by design (sampleMod at crawl scale).
    */
  private def d19LshTuning(s: SparkSession, dir: String): DataFrame =
    Dedup.lshTuningReport(
        stagedShingles(s, dir).select(col("doc_id"), col("h"), col("hb")))
      .orderBy("rows_per_band")

  private def d5Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashTable(docs(s, dir)).orderBy("doc_id")

  private def d6SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), maxHamming = 14, blockCol = "source")
      .orderBy("a_id", "b_id")

  private def d7EmbedDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineDupPairsLsh(embs(s, dir), threshold = 0.3, blockCol = "label",
        planesPerTable = 2, numTables = 8)
      .orderBy("a_id", "b_id")

  /** Per-vector neighborhood-density report over the d7 pair graph
    * (same LSH tables, same verify threshold): neighbor count + best
    * neighbor, the range-search complement to s1/s2's top-k.
    */
  private def s6RangeSearch(s: SparkSession, dir: String): DataFrame =
    Similarity.rangeSearchReport(embs(s, dir), threshold = 0.3, blockCol = "label",
        planesPerTable = 2, numTables = 8)
      .orderBy("vec_id")

  // --- similarity search ----------------------------------------------

  private def s1CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.bruteForceTopK(e, e.where(col("vec_id") < 20), k = 5)
      .orderBy("query_id", "rank")
  }

  private def s2AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.lshTopK(e, e.where(col("vec_id") < 20), k = 5, planesPerTable = 4, numTables = 8)
      .orderBy("query_id", "rank")
  }

  /** Recall@5 of the LSH index (s2's exact config) against brute-force
    * ground truth (s1) — the eval harness an ANN index ships with: per
    * query, how many of the true top-5 the banded index surfaced. The
    * spec asserts a recall floor; this query pins the EXACT per-query
    * values (both sides deterministic), so an LSH plane/bucket
    * regression shows up as a hash mismatch, not a silent quality
    * drift.
    */
  private def s7AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.where(col("vec_id") < 20)
    val exact = AnnTruth.topK5(s, dir, e)
    val ann = Similarity.lshTopK(e, q, k = 5, planesPerTable = 4, numTables = 8)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("_hit"))
    exact
      .join(ann, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_hits"))
      .select(col("query_id"), col("k"), col("n_hits"),
        round(col("n_hits").cast("double") / col("k").cast("double"), 6)
          .as("recall_at_k"))
      .orderBy("query_id")
  }

  /** s2 with query-side multi-probe: every bucket at hamming distance 1
    * is also visited (planesPerTable extra probes per table per query),
    * recovering neighbors that fell just across one hyperplane. The
    * corpus index is untouched — the scale-relevant property.
    */
  private def s4AnnLshMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.lshTopK(e, e.where(col("vec_id") < 20), k = 5,
        planesPerTable = 4, numTables = 8, multiProbe = true)
      .orderBy("query_id", "rank")
  }

  /** Int8-quantized scoring with exact rerank (the memory-bound ANN
    * layout: 4x smaller resident corpus, float math only for the
    * survivors). Exposes both the approx and the exact score so the
    * quantization error is directly observable.
    */
  private def s5QuantizedCosine(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.quantizedTopK(e, e.where(col("vec_id") < 20), k = 5)
      .orderBy("query_id", "rank")
  }

  /** PQ + ADC top-5 (Similarity.pqTopK): 16 subspaces × 16 codewords
    * (4-bit codes, 8 bytes/vector — 32× over f32×64) seeded from the
    * first 16 normalized vectors — the compressed-domain ANN family
    * next to s5's int8. 16 subspaces of 4 dims, not 8 of 8: PQ
    * distortion is governed by total code bits (m·log₂k); at 32 bits
    * recall@5 collapses below 0.3 on this corpus, at 64 bits the
    * two-stage search (ADC shortlist of 32, exact rerank to top-5)
    * holds recall while still compressing 8× beyond int8.
    */
  private def s10PqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val cbs = Similarity.pqCodebooks(e, nSub = 16, codebookSize = 16)
    Similarity.pqTopK(e, e.where(col("vec_id") < 20), k = 5, cbs)
      .orderBy("query_id", "rank")
  }

  /** Per-label embedding centroids: elementwise mean vector, reported
    * as (label, n, centroid norm) — the vector-aggregation shape that
    * clustering/IVF coarse quantizers need at scale (explode + grouped
    * sums = one shuffle on (label, dim)).
    */
  private def e1Centroids(s: SparkSession, dir: String): DataFrame = {
    val byDim = embs(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"), col("col").cast("double").as("x"))
      .groupBy("label", "pos")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
    byDim
      .select(col("label"), col("n"),
        (col("sx") / col("n")).as("m"))
      .groupBy("label")
      .agg(max("n").as("n_vectors"),
        round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
      .orderBy("label")
  }

  /** Corpus-wide top-20 words with counts (the classic frequency table,
    * partial-aggregated before the exchange).
    */
  private def x5WordTopK(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextAnalysis.wsTokens(TextAnalysis.normalize(col("text")))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** End-to-end training-data selection pipeline in one plan: exact-dedup
    * survivors -> quality filter -> language filter -> per-source yield.
    */
  private def p1DocPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val survivors = Dedup.exactGroups(d).select(col("survivor_id").as("doc_id"))
    d.join(survivors, "doc_id")
      .where(TextAnalysis.qualityScore(col("text")) >= 0.5)
      .withColumn("_toks", TextAnalysis.wsTokens(lower(col("text"))))
      .where(TextAnalysis.langIdFromTokens(col("_toks")).getField("code") === "en")
      .drop("_toks")
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        round(avg(length(col("text"))), 6).as("avg_len"))
      .orderBy("source")
  }

  /** Web-corpus funnel (the composite for the crawl lane, as [[p1]] is
    * for the doc lane): fetch-level URL dedup -> per-domain cap ->
    * quality floor, reported as per-stage yields — the numbers a crawl
    * pipeline publishes per snapshot. Each stage is the already-oracled
    * operator applied to the previous stage's survivor set.
    */
  private def p2WebPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // stage 1: one survivor per canonical URL (u1 semantics)
    val pages = urlDf(s, dir)
      .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min("doc_id").as("doc_id"))
      .withColumn("domain", TextAnalysis.registrableDomain(col("canonical_url")))
    // stage 2: <= 3 pages per registrable domain (x18 semantics)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy(col("doc_id"), col("canonical_url"))
    val capped = pages.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3).select("doc_id")
    // stage 3: quality floor on the surviving docs' text
    val quality = d.join(capped, "doc_id")
      .where(TextAnalysis.qualityScore(col("text")) >= 0.5)
      .select("doc_id")
    def stage(idx: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(idx).as("stage"), lit(name).as("stage_name"), col("n_docs"))
    stage(0, "input", d)
      .unionByName(stage(1, "url_dedup", pages))
      .unionByName(stage(2, "domain_cap", capped))
      .unionByName(stage(3, "quality", quality))
      .orderBy("stage")
  }

  // --- training mixture ------------------------------------------------

  /** Sequence packing (Mixture.packSequences): 512-token concat-then-
    * chunk layout per source in deterministic hash order.
    */
  private def x14SeqPack(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.packSequences(docs(s, dir), budget = 512L)
      .orderBy("source", "pack_id", "pack_offset", "doc_id")

  /** Source-weighted mixture sampling (Mixture.sourceMix): weights
    * 1/2/3 cycling by source number; the binding source keeps all its
    * rows, everything else down-samples by deterministic hash-mod.
    */
  private def x15SourceMix(s: SparkSession, dir: String): DataFrame = {
    val weight = (lit(1.0) +
      (regexp_extract(col("source"), "([0-9]+)", 1).cast("int") % 3).cast("double"))
    operators.Mixture.sourceMix(docs(s, dir), weight)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Source upsampling (Mixture.sourceUpsample): repeat factors
    * 1.0/1.5/2.0/2.5 by source hash; reported per source as realized
    * rate vs the configured factor (floor copies + hash-lottery
    * fractional copy per doc).
    */
  private def x21SourceUpsample(s: SparkSession, dir: String): DataFrame = {
    val factor = lit(1.0) +
      (operators.Dedup.hash60(col("source")) % 4).cast("double") * 0.5
    operators.Mixture.sourceUpsample(docs(s, dir).withColumn("fac", factor), col("fac"))
      .groupBy("source")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_rows"),
        round(min("fac"), 6).as("factor"),
        round(count(lit(1)).cast("double") / countDistinct("doc_id"), 6)
          .as("realized_rate"))
      .orderBy("source")
  }

  /** Deterministic shard shuffle (Mixture.shuffleShards): 8 shards,
    * position = hash rank within shard.
    */
  private def x16ShardShuffle(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.shuffleShards(docs(s, dir), nShards = 8)
      .select("doc_id", "shard", "position")
      .orderBy("shard", "position")

  /** Context-window chunking (Mixture.chunkDocuments): 64-token chunks
    * with a 16-token overlap.
    */
  private def x17Chunking(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.chunkDocuments(docs(s, dir), chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id")

  // --- corpus data card ------------------------------------------------

  /** Per-source corpus "data card": the one-table summary a dataset
    * release ships — volume (docs, tokens), uniqueness (distinct
    * content hashes), language composition, quality profile, and the
    * median document length. The heavy per-doc text expressions run
    * ONCE over a localCheckpointed projection; the median comes from
    * the banded exact quantile (the q19 lesson — the `percentile`
    * aggregate buffers every group value in executor memory, and a
    * distinct aggregate in the same agg() would key its buffers by
    * the distinct column), and countDistinct rides with the cheap
    * algebraic aggregates only.
    */
  private def c1CorpusCard(s: SparkSession, dir: String): DataFrame = {
    val pred = TextAnalysis.langIdFromTokens(col("_toks")).getField("code")
    val base = docs(s, dir)
      .withColumn("_toks", TextAnalysis.wsTokens(lower(col("text"))))
      .select(col("source"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        md5(TextAnalysis.normalize(col("text")).cast("binary")).as("cm"),
        (pred === "en").as("is_en"))
      .localCheckpoint()
    val med = TextAnalysis
      .quantileThresholdBanded(base, 0.5, "source", "toks")
      .select(col("source"),
        round(col("threshold"), 6).as("median_tokens"))
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        countDistinct(col("cm")).as("n_unique_content"),
        sum(when(col("is_en"), 1L).otherwise(0L)).as("n_en"),
        round(avg("q"), 6).as("mean_quality"))
      .join(med, Seq("source"))
      .orderBy("source")
  }

  // --- jsonl ingestion -------------------------------------------------

  /** JSONL round-trip ingestion gate: the documents table serialized to
    * newline-delimited JSON once per (testdata, JVM), read back through
    * [[graft.sources.JsonlSource]] with a PINNED schema (no inference
    * pass — at corpus scale inference is a second full scan), then a
    * per-language profile. The oracle recomputes from the parquet
    * documents directly, so any text mangling in the JSON escape /
    * unescape round-trip (or a corrupt-row leak) breaks the hash match.
    */
  /** The documents table as a JSONL dump, staged once per (testdata,
    * JVM) — shared by j1 (batch read-back) and st5 (streaming ingest).
    */
  private[graft] def stagedJsonl(s: SparkSession, dir: String): String =
    TempDirs.cached(s"jsonl:$dir") { d =>
      graft.sources.JsonlSource.write(
        docs(s, dir).select("doc_id", "text", "lang", "source"), d)
    }

  /** The "new batch" slice (doc_id % 10 == 7) as a JSONL dump, staged
    * once per (testdata, JVM) — shared by st6, st8 and st9. Written as
    * (at least) TWO files so the `maxFilesPerTrigger=1` consumers
    * genuinely run multi-batch at every SF — with one file the
    * "one micro-batch per landed file" shape those queries exist to
    * exercise silently degenerated to a single batch (StreamingSpec
    * pins the >= 2-file contract).
    */
  private[graft] def stagedJsonlNew(s: SparkSession, dir: String): String =
    TempDirs.cached(s"jsonl_new:$dir") { d =>
      graft.sources.JsonlSource.write(
        docs(s, dir).where(col("doc_id") % 10 === 7)
          .select("doc_id", "text", "lang", "source").repartition(2), d)
    }

  private def j1JsonlIngest(s: SparkSession, dir: String): DataFrame = {
    val path = stagedJsonl(s, dir)
    val read = graft.sources.JsonlSource.read(s, path)
    read
      .where(col("_corrupt").isNull)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min("doc_id").as("min_doc_id"))
      .orderBy("lang")
  }

  /** STREAMING JSONL ingestion: the j1 corpus profile computed by a
    * real Structured Streaming query over the same JSONL dump, with
    * `maxFilesPerTrigger=1` forcing one micro-batch per file — the
    * continuous-ingestion shape (new crawl files land, counts update)
    * rather than a one-shot read. Complete-mode aggregation drained
    * through the shared memory-sink harness; batch and streaming
    * answers coincide once every file is processed, so j1's DuckDB
    * oracle also oracles the stream.
    */
  private def st5JsonlStream(s: SparkSession, dir: String): DataFrame = {
    val path = stagedJsonl(s, dir)
    val stream = s.readStream
      .schema(graft.sources.JsonlSource.documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .json(path)
    graft.streaming.EventStreaming.drainToMemorySink(s, "st5_mem")(
        stream.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("total_chars"),
            min("doc_id").as("min_doc_id")))
      .orderBy("lang")
  }

  /** Stream-static dedup (the continuous form of d11's increment
    * check): new documents arrive as a JSONL stream — one micro-batch
    * per landed file — and each is flagged against the STATIC corpus's
    * content hashes via a stream-static join. The static side is the
    * staged index BUCKETED on the join key ([[stagedCorpusMd5]]): the
    * r13 shape recomputed the corpus-wide distinct (a full scan + a
    * shuffle) inside EVERY micro-batch — the static side of a
    * stream-static join is re-executed per trigger, so that cost
    * multiplied by the file count and would multiply by the trigger
    * count forever in production. The `merge` hint pins the sort-merge
    * strategy (at test SFs the index is small enough that Catalyst
    * would auto-broadcast — which re-broadcasts per batch and stops
    * being possible at corpus scale at all); the bucketed scan makes
    * the static side Exchange-free and Sort-free in every batch.
    * Append mode: no state store at all — the static hash set is the
    * only "memory", so throughput scales with batch size, not history.
    */
  private def st6StreamStaticDedup(s: SparkSession, dir: String): DataFrame = {
    val path = stagedJsonlNew(s, dir)
    val corpusMd5 = s.table(stagedCorpusMd5(s, dir))
      .withColumn("_dup", lit(true))
    val stream = s.readStream
      .schema(graft.sources.JsonlSource.documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .json(path)
      .select(col("doc_id"), contentMd5(col("text")).as("content_md5"))
    val flagged = stream
      .join(corpusMd5.hint("merge"), Seq("content_md5"), "left")
      .select(col("doc_id"), col("_dup").isNotNull.as("is_exact_dup"))
    graft.streaming.EventStreaming.drainToMemorySink(s, "st6_mem",
        outputMode = "append")(flagged)
      .orderBy("doc_id")
  }

  /** The FULL continuous-increment dedup shape (st6 + st7 combined,
    * r10 verdict Next-7): landed files stream one micro-batch at a
    * time; each batch is deduplicated WITHIN the stream under BOUNDED
    * state first (`dropDuplicatesWithinWatermark` on (lang,
    * content_md5): a key's state expires once the event-time watermark
    * passes its timestamp + delay, so dedup memory is the watermark
    * horizon, not stream history — st6 alone would re-admit an
    * intra-stream duplicate landing in a later file), and each
    * surviving document is then flagged against the static corpus's
    * content hashes via the st6 bucketed stream-static join (no state
    * at all). Event time is synthesized deterministically from doc_id;
    * within the gate's drain nothing expires, so survivors = distinct
    * (lang, content_md5) and the DuckDB oracle replays the aggregate
    * exactly. The output groups by (lang, is_corpus_dup), which is
    * independent of WHICH duplicate row each micro-batch kept — the
    * st2 determinism rule. TTL re-admission itself is spec-tested on
    * the shared mechanism (StreamingSpec, st7).
    */
  private def st8IncrementDedup(s: SparkSession, dir: String): DataFrame = {
    val path = stagedJsonlNew(s, dir)
    // bucketed static index, merge-hinted for the same reason as st6:
    // no per-batch Exchange (or broadcast rebuild) on the static side
    val corpusMd5 = s.table(stagedCorpusMd5(s, dir))
      .withColumn("_dup", lit(true))
    val deduped = s.readStream
      .schema(graft.sources.JsonlSource.documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .json(path)
      .select(col("doc_id"), col("lang"), contentMd5(col("text")).as("content_md5"))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
      .withWatermark("ts", "30 days")
      .dropDuplicatesWithinWatermark("lang", "content_md5")
    val flagged = deduped
      .join(corpusMd5.hint("merge"), Seq("content_md5"), "left")
      .select(col("lang"), col("_dup").isNotNull.as("is_corpus_dup"))
    graft.streaming.EventStreaming.drainToMemorySink(s, "st8_mem",
        outputMode = "append")(flagged)
      .groupBy("lang", "is_corpus_dup")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "is_corpus_dup")
  }

  /** Stage a static join-side index ONCE per (key, testdata, JVM) as a
    * BUCKETED external table on `bucketCol` and return the table name.
    *
    * Bucketing is the whole point: a stream-static join re-plans and
    * re-executes the static side EVERY micro-batch, and a plain parquet
    * index re-pays its shuffle Exchange each time (at sf3 that per-batch
    * re-exchange dominated st9 — the one named scale-killer of the r13
    * audit; at 1000 executors it re-shuffles the full index per trigger).
    * A table bucketed on the join key scans ALREADY partitioned — the
    * bucketed side of the join carries NO Exchange in any micro-batch;
    * only the (batch-size-bounded) stream side shuffles. `repartition`
    * on the bucket column before the write uses the same murmur3
    * bucket-id assignment as `bucketBy`, so each task holds exactly one
    * bucket -> one file per bucket, which with `sortBy` also lets the
    * sort-merge join skip the static-side Sort. This is the production
    * posture for a decontamination/dedup index too big to broadcast.
    */
  /** Bucket count for staged static indexes. Sized to the INDEX (target
    * ~128-256 MB per bucket file at production scale — a 100 GB gram
    * index wants ~512-1024 buckets), NOT to the executor count: the
    * bucketed scan always yields exactly `nBuckets` partitions
    * regardless of `SPARK_GRAFT_CPUS`, and the stream side re-shuffles
    * to the table's bucket count whatever `spark.sql.shuffle.partitions`
    * says. 32 here matches the test indexes (a few MB — bucket-file
    * floor dominates, more buckets only add open/close cost); the r14
    * audit flagged the literal as coincidentally equal to local[32].
    */
  private[graft] val IndexBuckets: Int = 32
  private[graft] def stagedBucketedIndex(
      s: SparkSession, key: String, dir: String, bucketCol: String,
      nBuckets: Int = IndexBuckets)(build: => DataFrame): String = {
    // table name must be unique per (key, testdata dir): the session
    // catalog is JVM-wide and tests stage several sf dirs side by side
    val tbl = "graft_" + key + "_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)
    TempDirs.cached(s"$key:$dir") { d =>
      build
        .repartition(nBuckets, col(bucketCol))
        .write.mode("overwrite")
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .option("path", s"$d/tbl")
        .saveAsTable(tbl)
    }
    tbl
  }

  /** st10's static eval cell index (bucketed on `cell`), assigned with
    * the shared audit quantizer — a named builder so the bench
    * pre-stage pass can construct it (and its quantizer) outside any
    * query's timed reps.
    */
  private[graft] def st10EvalIndex(s: SparkSession, dir: String): String = {
    val cents = AuditQuantizer.centroids(s, dir)
    stagedBucketedIndex(s, "st10eval", dir, "cell") {
      operators.Clustering
        .assign(embs(s, dir).where(col("vec_id") % 10 === 7), cents)
        .select(col("centroid_id").as("cell"), col("vec_id").as("eval_id"),
          Similarity.normalized(col("embedding")).as("e_en"))
    }
  }

  /** Normalized-content MD5 — the exact-dup identity shared by st6/st8
    * and their DuckDB oracles.
    */
  private def contentMd5(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(TextAnalysis.normalize(c).cast("binary"))

  /** The static exact-dup index for st6/st8: DISTINCT normalized-content
    * MD5s of the non-new corpus, staged once per (testdata, JVM) as a
    * table bucketed on the join key. At corpus scale this index does NOT
    * fit a broadcast (one hash per document), so the honest join is
    * sort-merge against the bucketed scan — zero static-side Exchange
    * per micro-batch (asserted in StreamingSpec).
    */
  private[graft] def stagedCorpusMd5(s: SparkSession, dir: String): String =
    stagedBucketedIndex(s, "corpusmd5", dir, "content_md5") {
      docs(s, dir).where(!(col("doc_id") % 10 === 7))
        .select(contentMd5(col("text")).as("content_md5"))
        .distinct()
    }

  /** The static decontamination index for st9: DISTINCT gram hashes of
    * the non-new corpus, derived from [[stagedShingles]] and staged
    * once per (testdata, JVM) as a table bucketed on the gram hash
    * (see [[stagedBucketedIndex]] for why bucketed).
    */
  private[graft] def stagedCorpusGrams(s: SparkSession, dir: String): String =
    stagedBucketedIndex(s, "st9grams", dir, "h") {
      stagedShingles(s, dir)
        .where(!(col("doc_id") % 10 === 7))
        .select("h").distinct()
    }

  /** STREAMING decontamination — the continuous form of x38: new
    * documents land as a JSONL stream (one micro-batch per file) and
    * each is scored for per-doc n-gram overlap against the STATIC
    * corpus's gram-hash index via a stream-static left join. The
    * static index is staged to parquet once ([[stagedCorpusGrams]],
    * off the session-staged shingle index) so each micro-batch probes
    * a materialized file instead of re-deriving the corpus-wide gram
    * explode — exactly how a production stream holds its
    * decontamination index. The stream side grams with a pure
    * map-side expression (array transform over the token array,
    * distinct per doc — bit-identical to the batch shingle semantics
    * incl. the small-doc fallback; the window-function gram builder is
    * not streamable). Complete-mode aggregation: per-doc state is one
    * (count, count) pair, bounded by the increment's doc count, and
    * the gate's drain processes every file — so the DuckDB oracle
    * replays the batch semantics exactly.
    */
  private def st9StreamContamination(s: SparkSession, dir: String): DataFrame = {
    val path = stagedJsonlNew(s, dir)
    val n = 3
    // static index: distinct gram hashes of the non-new corpus, staged
    // once per (testdata, JVM) as a table BUCKETED on the join key —
    // derived from the session-staged shingle index (the tokenize+hash
    // pass is never re-run); build cost lands in the bench staging map
    // like every other index. A stream-static join re-executes the
    // static side EVERY micro-batch, so the index must come back
    // already partitioned: the bucketed scan carries no Exchange and no
    // Sort in any batch (the r13 shape cached an unbucketed parquet,
    // which still re-paid the join Exchange per trigger — the r13
    // audit's one named scale-killer; at sf3 that was 43.5 s). The
    // `merge` hint pins sort-merge: at test SFs Catalyst would
    // auto-broadcast the small index, which re-broadcasts per batch
    // and is impossible at corpus scale (the gram index is ~corpus
    // sized — never broadcastable).
    val corpusGrams = s.table(stagedCorpusGrams(s, dir))
      .withColumn("_hit", lit(true))
    // Tokenize ONCE per row behind a projection boundary, then gram off
    // the materialized array. The r13 shape inlined `toks` (regex
    // normalize + split) as a free expression inside the transform
    // lambda — and higher-order-function lambdas do NOT subexpression-
    // eliminate free expressions, so the full regex pass re-ran per
    // element_at: 3 x n_grams regex splits of the whole document per
    // doc (~1.1M per micro-batch at sf3 — 19 of st9's 21 s/batch).
    // CollapseProject keeps the boundary: `_toks` is referenced many
    // times and split/regexp is non-cheap, so the alias is not inlined.
    val toks = col("_toks")
    val grams = when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array(concat_ws(" ", toks)))
    val streamGrams = s.readStream
      .schema(graft.sources.JsonlSource.documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .json(path)
      .select(col("doc_id"),
        TextAnalysis.wsTokens(TextAnalysis.normalize(col("text"))).as("_toks"))
      .select(col("doc_id"), explode(grams).as("s"))
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"))
    val scored = streamGrams
      .join(corpusGrams.hint("merge"), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_overlap"))
    graft.streaming.EventStreaming.drainToMemorySink(s, "st9_mem")(scored)
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_grams").cast("double"), 6)
          .as("overlap_frac"))
      .orderBy("doc_id")
  }

  /** Staged "arriving vectors" stream fixture: the vec_id % 10 == 3
    * slice of the embeddings table as TWO parquet files (one
    * micro-batch each under maxFilesPerTrigger=1). Parquet, not JSONL:
    * float payloads stream bit-exactly, no text round-trip.
    */
  private[graft] def stagedVecStreamNew(s: SparkSession, dir: String): String =
    TempDirs.cached(s"vecs_new:$dir") { d =>
      embs(s, dir).where(col("vec_id") % 10 === 3)
        .repartition(2).write.mode("overwrite").parquet(d)
    }

  /** STREAMING semantic decontamination (s21's continuous form — the
    * embedding sibling of st9): newly embedded vectors land as a
    * parquet file stream and every micro-batch is checked against the
    * STATIC eval set (vec_id % 10 = 7) by blocked cosine. Each
    * arriving vector probes its 4 nearest cells of a quantizer FROZEN
    * before the increment existed (the s17 freshness rule) — the
    * shared [[AuditQuantizer]], whose train corpus excludes both the
    * increment and the eval split, and a stream-static
    * join on `cell` against the bucketed eval cell index scores only
    * within probed cells. The static index comes back BUCKETED on the
    * join key so no micro-batch re-exchanges or re-sorts it, and the
    * merge hint pins sort-merge — auto-broadcast would re-broadcast
    * per trigger, and an eval index need not be broadcastable at
    * corpus scale (st9's two rules, verbatim). Complete-mode state is
    * one (count, max) pair per CONTAMINATED arriving vector — bounded
    * by the increment, never the corpus. The s21 recall law applies
    * unchanged: fixed nprobe serves the near-dup regime; a weak-tau
    * audit scales nprobe with the cell count.
    */
  private def st10StreamSemanticContamination(
      s: SparkSession, dir: String): DataFrame = {
    val path = stagedVecStreamNew(s, dir)
    val e = embs(s, dir)
    // the SHARED audit quantizer (trained on the corpus minus the
    // increment AND minus the eval split): its exclusion set is a
    // superset of the freshness rule's, and one train pass per session
    // serves s21 + s22 + st10 instead of one each per invocation
    val cents = AuditQuantizer.centroids(s, dir)
    val evalCells = s.table(st10EvalIndex(s, dir))
    val streamProbes = s.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(path)
      .select(col("vec_id"),
        Similarity.normalized(col("embedding")).as("n_en"),
        explode(graft.functions.VectorExpressions
          .topCentroidsStruct(col("embedding"), cents, 4)).as("pc"))
      .select(col("vec_id"), col("n_en"), col("pc.cid").as("cell"))
    val scored = streamProbes
      .join(evalCells.hint("merge"), Seq("cell"))
      .select(col("vec_id"),
        round(Similarity.dot(col("n_en"), col("e_en")), 6).as("cos"))
      .where(col("cos") >= 0.3)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_eval_matches"), max(col("cos")).as("max_cos"))
    graft.streaming.EventStreaming.drainToMemorySink(s, "st10_mem")(scored)
      .orderBy("vec_id")
  }

  // --- url canonicalization / web-corpus dedup -------------------------

  /** URL table synthesized from documents (the raw corpus has no url
    * column — same synthesize-from-documents pattern as the PII and
    * media tables, so the oracle recomputes the identical input): four
    * spelling variants of one logical page per (source, doc_id/4)
    * group — scheme case, www prefix, tracking query, fragment — which
    * canonicalization must fold together.
    */
  private def urlDf(s: SparkSession, dir: String): DataFrame = {
    // page key: 4 consecutive doc_ids = 4 spellings of ONE page;
    // site key: 5 consecutive pages = one registrable domain
    val g = floor(col("doc_id") / 4).cast("long")
    val gd = floor(col("doc_id") / 20).cast("long")
    val variant = (col("doc_id") % 4 + 1).cast("int")
    val prefix = element_at(array(
      lit("https://www."), lit("HTTP://"), lit("https://"), lit("https://www.")), variant)
    val suffix = element_at(array(
      lit(""), lit(""), lit("?utm_source=feed"), lit("/#sec1")), variant)
    val tld = element_at(array(lit(".com"), lit(".org"), lit(".net")),
      (gd % 3 + 1).cast("int"))
    val host = concat(lit("m"), (g % 7).cast("string"), lit("."),
      substring(md5(gd.cast("string").cast("binary")), 1, 6), tld)
    docs(s, dir).select(col("doc_id"),
      concat(prefix, host, lit("/p"), g.cast("string"), suffix).as("url"))
  }

  /** Exact URL-level dedup after canonicalization (min-id survivor per
    * page) — the d1 shape keyed on the canonical url instead of the
    * content hash. Map-only canonicalization, ONE groupBy shuffle.
    */
  private def u1UrlDedup(s: SparkSession, dir: String): DataFrame =
    urlDf(s, dir)
      .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_url")

  /** Per-registrable-domain corpus stats (fetch count vs distinct
    * pages) — the blocking/quota table a crawl-scale pipeline keys
    * politeness and per-domain caps on.
    */
  private def u2DomainStats(s: SparkSession, dir: String): DataFrame =
    urlDf(s, dir)
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("canonical_url"))
      .select(TextAnalysis.registrableDomain(col("canonical_url")).as("domain"),
        col("canonical_url"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canonical_url")).as("n_pages"))
      .orderBy("domain")

  /** Documents as ordered line arrays (the corpus text is single-line,
    * so lines are synthesized deterministically, like [[urlDf]]): a
    * per-source header, the body split into 8-token lines, and a footer
    * shared by half the corpus. Header df = docs-per-source and footer
    * df = half the corpus, so both cross any sane boilerplate
    * threshold; body lines are effectively unique.
    */
  private def lineDf(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.wsTokens(lower(col("text")))
    val nContent = ceil(size(toks) / lit(8.0)).cast("int")
    val content = when(nContent > lit(0),
      transform(sequence(lit(0), nContent - lit(1)),
        l => array_join(slice(toks, l * lit(8) + lit(1), lit(8)), " ")))
      .otherwise(array().cast("array<string>"))
    docs(s, dir).select(col("doc_id"),
      concat(
        array(concat(lit("begin newsletter "), col("source"))),
        content,
        array(concat(lit("unsubscribe footer "), (col("doc_id") % 2).cast("string"))))
        .as("lines"))
  }

  /** [[lineDf]] STAGED once per (testdata, JVM): a real corpus HAS
    * lines (text split on newlines, one cheap map); the 8-token-slice
    * synthesis above is gate plumbing that the live plan would
    * otherwise run TWICE (lineDedup consumes `docs` in both its
    * frequency pass and its rebuild pass), so d12 was measuring 2×
    * fixture synthesis + the operator. Bit-identical data, oracles
    * unchanged — the synthPackets / stagedClusters pattern.
    */
  private[graft] def stagedLineDf(s: SparkSession, dir: String): DataFrame = {
    val staged = TempDirs.cached(s"lineDf:$dir") { d =>
      lineDf(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$d/lines")
    }
    s.read.parquet(s"$staged/lines")
  }

  /** Line-level boilerplate dedup (CCNet): drop lines with corpus
    * document frequency >= 5, reassemble, fingerprint the survivors.
    */
  private def d12LineDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.lineDedup(stagedLineDf(s, dir), minDocFreq = 5)
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("clean_text").cast("binary")).as("clean_md5"))
      .orderBy("doc_id")

  /** Per-registrable-domain document cap (crawl-corpus domain
    * balancing): canonical-URL dedup first, then keep at most 3 pages
    * per domain by survivor id — the quota step after [[u2DomainStats]]
    * measures the skew. One window over the page table; no join.
    */
  private def x18DomainCap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pages = urlDf(s, dir)
      .select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min("doc_id").as("survivor_id"))
      .withColumn("domain", TextAnalysis.registrableDomain(col("canonical_url")))
    val w = Window.partitionBy("domain").orderBy(col("survivor_id"), col("canonical_url"))
    pages
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("domain", "canonical_url", "survivor_id", "rank")
      .orderBy("domain", "rank")
  }

  /** Deterministic train/valid/test split (Mixture.hashSplit):
    * 90/5/5 by hash-of-id — per-doc assignment, shuffle-free.
    */
  private def x22HashSplit(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.hashSplit(docs(s, dir),
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split_bucket", "split")
      .orderBy("doc_id")

  /** Per-source token-budget sampling (Mixture.tokenBudgetSample):
    * keep docs in hash order while the source's running whitespace-
    * token total stays within 800 tokens (per-source corpora run
    * 1.2-1.7k tokens at every test SF, so the budget actually binds —
    * roughly the densest 60% of each source survives).
    */
  private def x23TokenBudget(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.tokenBudgetSample(docs(s, dir), budgetTokens = 800L)
      .orderBy("doc_id")

  /** Bloom-prefiltered train/eval contamination
    * (Dedup.bloomContaminationPairs): bit-identical to the exact
    * inverted-index join — the Bloom sketch only prunes train postings
    * before the shuffle — so the oracle replays the exact semantics.
    * Different corpus slice than d9 (bigrams, hash%25 eval tag) so the
    * two contamination paths are independently checked.
    */
  private def d14BloomContamination(s: SparkSession, dir: String): DataFrame =
    Dedup.bloomContaminationPairs(docs(s, dir), n = 2, minShared = 12,
        evalPred = Dedup.hash60(col("doc_id").cast("string")) % 25 === 1)
      .orderBy("train_id", "eval_id")

  /** Per-source quality floor at the exact 25th percentile
    * (TextAnalysis.quantileThreshold — window-sort quantile, no
    * in-memory percentile aggregator), then the keep-count above it.
    */
  private def x24QuantileFilter(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("source"), TextAnalysis.qualityScore(col("text")).as("q"))
    val thr = TextAnalysis.quantileThreshold(d, 0.25, "source", "q")
      .withColumnRenamed("threshold", "q25")
    d.join(broadcast(thr), "source")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= col("q25"), 1L).otherwise(0L)).as("n_kept"),
        min("q25").as("q25"))
      .orderBy("source")
  }

  /** Shard-mixing quality report: per training shard (the x16
    * hash-shard layout at 16 shards), the source-distribution entropy —
    * a well-shuffled corpus shows near-identical entropy across shards;
    * a skewed shard flags a broken mix before a trainer consumes it.
    * Entropy terms are quantized to integer micro-nats BEFORE the
    * per-shard sum (the x13/x20 discipline), so summation order can
    * never flip the result.
    */
  private def c5MixEntropy(s: SparkSession, dir: String): DataFrame = {
    val sh = operators.Mixture.shuffleShards(docs(s, dir), nShards = 16)
    val c = sh.groupBy("shard", "source").agg(count(lit(1)).as("cnt"))
    val t = c.groupBy("shard").agg(sum("cnt").as("tot"))
    val p = col("cnt").cast("double") / col("tot").cast("double")
    c.join(broadcast(t), "shard")
      .select(col("shard"), col("cnt"),
        round(-p * log(p) * 1e6).cast("long").as("unats"))
      .groupBy("shard")
      .agg(sum("cnt").as("n_docs"), sum("unats").as("entropy_unats"))
      .orderBy("shard")
  }

  /** Token frequency-of-frequencies (the Good-Turing spectrum): for
    * each log2 bucket of occurrence count, how many distinct tokens
    * land there and what token mass they carry. The data-card view of
    * the corpus's Zipf shape — a fat singleton bucket means noisy
    * vocabulary, a thin one means heavy boilerplate. Two vocab-scale
    * aggregates: token->count, then count-bucket->stats; no global
    * rank sort (rank-based Zipf curves need a single-partition window
    * at corpus scale; the spectrum carries the same signal shuffle-
    * light).
    */
  private def c6FreqSpectrum(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(
      explode(TextAnalysis.wsTokens(TextAnalysis.normalize(col("text")))).as("w"))
    // exact integer floor(log2): binary-digit count minus one — a
    // float log2 rounds differently across engines at 2^k edges
    toks.groupBy("w").agg(count(lit(1)).as("cf"))
      .select((length(conv(col("cf"), 10, 2)) - 1).cast("long").as("bucket"), col("cf"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cf")).as("token_mass"))
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("count_lo"),
        col("n_tokens"), col("token_mass"))
      .orderBy("bucket")
  }

  /** Unigram distribution drift between two corpus snapshots (here the
    * deterministic doc_id-parity halves — the c4 versioning pattern):
    * per-token add-1-smoothed log-likelihood ratio, top 20 by
    * magnitude — the distribution-shift report a pipeline runs before
    * swapping in a new crawl snapshot (which tokens exploded, which
    * vanished). Log terms are quantized to integer micro-nats (the
    * x13 A-ES discipline) so both engines agree bit-for-bit despite
    * libm ULP drift; top-k ties break on the token itself.
    *
    * Scale shape: one exchange on the token for the two-sided
    * frequency table, a one-row broadcast of the totals, then a
    * TakeOrdered top-20 — no global sort, nothing doc-scale past the
    * first aggregate.
    */
  private def c7TokenDrift(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select((col("doc_id") % 2 === 0).as("in_a"),
      explode(TextAnalysis.wsTokens(TextAnalysis.normalize(col("text")))).as("w"))
    val freq = toks.groupBy("w").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
    val tot = freq.agg(sum("n_a").as("na"), sum("n_b").as("nb"),
      count(lit(1)).as("v"))
    freq.crossJoin(broadcast(tot))
      .withColumn("llr_micro",
        round((log((col("n_a") + 1).cast("double") /
            (col("na") + col("v")).cast("double"))
          - log((col("n_b") + 1).cast("double") /
            (col("nb") + col("v")).cast("double"))) * 1e6)
          .cast("long"))
      .select(col("w").as("token"), col("n_a"), col("n_b"), col("llr_micro"))
      .orderBy(abs(col("llr_micro")).desc, col("token"))
      .limit(20)
      .orderBy("token")
  }

  /** Per-source lexical diversity: token count, distinct-token count,
    * and type-token ratio — the data-card signal for template-heavy
    * vs organic sources. One exchange on (source, token) for the
    * distinct, then a source-level rollup.
    */
  private def x29LexicalDiversity(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("source"),
      explode(TextAnalysis.wsTokens(TextAnalysis.normalize(col("text")))).as("w"))
    toks.groupBy("source").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_types"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"))
      .orderBy("source")
  }

  /** BPE merge learning (TextAnalysis.bpeMerges): the first 4 merges
    * over the corpus word-count table — vocab-scale iterations, one
    * argmax row on the driver per step.
    */
  private def x25BpeMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMerges(docs(s, dir), steps = 4).orderBy("step")

  /** BPE apply side (TextAnalysis.bpeCompression): the 4 learned
    * merges applied to the per-source word table — chars vs post-merge
    * symbols per source.
    */
  private def x26BpeCompression(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeCompression(docs(s, dir), steps = 4).orderBy("source")

  /** Corpus snapshot diff (Dedup.snapshotDiff): two deterministic
    * synthetic versions of the corpus — v1 drops 10% of ids, v2 drops
    * a different ~8% and edits every 7th doc — classified added /
    * removed / changed / unchanged, counted per source. The dataset-
    * versioning report a corpus release ships with.
    */
  private def c4CorpusDiff(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
    val v1 = base.where(
      Dedup.hash60(concat(lit("v1drop:"), col("doc_id").cast("string"))) % 10 =!= 0)
    val v2 = base
      .where(
        Dedup.hash60(concat(lit("v2drop:"), col("doc_id").cast("string"))) % 12 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    Dedup.snapshotDiff(v1, v2)
      .groupBy("source", "status").agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  /** Incremental corpus-update funnel — the release-to-release lane
    * (p1 is the doc lane, p2 the crawl lane): snapshot diff picks the
    * content entering the new version (added + changed), an exact-hash
    * anti-join drops entrants whose content already lives in the
    * retained (unchanged) corpus, and a quality floor gates what's
    * left. Per-stage yields, one action.
    */
  private def p3UpdatePipeline(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
    val v1 = base.where(
      Dedup.hash60(concat(lit("v1drop:"), col("doc_id").cast("string"))) % 10 =!= 0)
    // v2 synthesis: every 7th doc edited (-> 'changed'), and every
    // 11th-(mod 3) doc COPIES its neighbor's text — the corpus itself
    // has no exact text dups, so without the injection the
    // corpus_dedup stage would be structurally unable to bind
    val neighbor = base.select(
      (col("doc_id") + 1).as("doc_id"), col("text").as("_ntext"))
    val v2 = base
      .where(
        Dedup.hash60(concat(lit("v2drop:"), col("doc_id").cast("string"))) % 12 =!= 0)
      .join(neighbor, Seq("doc_id"), "left")
      .withColumn("text",
        when(col("doc_id") % 11 === 3 && col("_ntext").isNotNull, col("_ntext"))
          .when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .drop("_ntext")
    val diff = Dedup.snapshotDiff(v1, v2)
    val entering = v2.join(
      diff.where(col("status").isin("added", "changed")).select("doc_id"),
      "doc_id")
    val retainedMd5 = v2
      .join(diff.where(col("status") === "unchanged").select("doc_id"), "doc_id")
      .select(md5(col("text").cast("binary")).as("m")).distinct()
    val deduped = entering
      .withColumn("m", md5(col("text").cast("binary")))
      .join(retainedMd5, Seq("m"), "left_anti")
    val quality = deduped
      .where(TextAnalysis.qualityScore(col("text")) >= 0.5)
    def stage(idx: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(idx).as("stage"), lit(name).as("stage_name"), col("n_docs"))
    stage(0, "entering", entering)
      .unionByName(stage(1, "corpus_dedup", deduped))
      .unionByName(stage(2, "quality", quality))
      .orderBy("stage")
  }

  /** Per-source document-length histogram (data-card companion to
    * [[c1CorpusCard]]): fixed 128-char buckets, capped at 15, with the
    * within-source share. Single groupBy plus a broadcast-sized window.
    */
  private def c2LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = least(floor(col("n_chars") / 128), lit(15)).cast("long")
    docs(s, dir)
      .select(col("source"), bucket.as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs") / sum("n_docs").over(Window.partitionBy("source")), 6))
      .select(col("source"), col("bucket"), (col("bucket") * 128).as("bucket_lo"),
        col("n_docs"), col("share"))
      .orderBy("source", "bucket")
  }

  // --- multimodal ------------------------------------------------------

  /** Media table synthesized from documents: payload = md5-hex bytes
    * (ASCII-safe so the oracle can recompute per-byte arithmetic).
    */
  private def mediaDf(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      md5(col("text").cast("binary")).cast("binary").as("payload"),
      col("source"))

  /** Interleaved multimodal sequence assembly — the VLM training
    * layout: each document's text is cut into non-overlapping 64-token
    * chunks and its media item is spliced in at a deterministic
    * position (doc_id mod (n_chunks+1)), with per-modality token costs
    * (image 64 / audio 128 / video 256 "vision tokens"). One row per
    * sequence element: (doc_id, seq_pos, modality, n_tokens, fp) —
    * exactly the manifest a sequence packer consumes downstream.
    *
    * Scale shape: chunking is an explode (map-side), the splice is
    * per-row arithmetic off a per-doc chunk count, and the union
    * shuffles once on doc_id for the ordered write; media payloads are
    * reduced to a fingerprint BEFORE the union, so bytes never ride
    * the exchange (the m3 discipline).
    */
  private def m5Interleaved(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = d.select(col("doc_id"),
        size(TextAnalysis.wsTokens(TextAnalysis.normalize(col("text"))))
          .as("n_toks"))
      .withColumn("n_chunks",
        when(col("n_toks") > 0,
          ((col("n_toks") - 1) / lit(64)).cast("long") + 1).otherwise(lit(0L)))
      .withColumn("insert_pos",
        (col("doc_id") % (col("n_chunks") + 1)).cast("int"))
      .select("doc_id", "insert_pos")
    val textEl = operators.Mixture.chunkDocuments(d, chunkTokens = 64)
      .join(base, "doc_id")
      .select(col("doc_id"),
        (col("chunk_id") +
          when(col("chunk_id") >= col("insert_pos"), 1).otherwise(0))
          .cast("int").as("seq_pos"),
        lit("text").as("modality"),
        col("chunk_len").cast("long").as("n_tokens"),
        md5(col("chunk_text").cast("binary")).as("fp"))
    val mediaEl = mediaDf(s, dir)
      .join(base, col("media_id") === col("doc_id"))
      .select(col("doc_id"), col("insert_pos").as("seq_pos"),
        col("media_type").as("modality"),
        when(col("media_type") === "image", 64L)
          .when(col("media_type") === "audio", 128L)
          .otherwise(256L).as("n_tokens"),
        // payload is the md5 hex string's ascii bytes (m1 contract);
        // casting back to string recovers the hex fingerprint
        col("payload").cast("string").as("fp"))
    textEl.unionByName(mediaEl).orderBy("doc_id", "seq_pos")
  }

  /** Exact media dedup report — per modality: item/unique counts and
    * the byte savings of content-hash dedup (the first pass any
    * multimodal corpus runs: identical images/clips are re-crawled
    * constantly, and payload bytes dominate storage). Synthesis: 4
    * consecutive doc_ids share one payload (the urlDf pattern — raw
    * corpus media are unique-per-doc, so dedup would be vacuous
    * without planted duplication; the oracle replays the identical
    * synthesis), payload size keyed on the group so duplicates are
    * bit-identical. Scale shape: one (type, hash)-scale aggregation
    * then a 3-row reduce — payload BYTES never shuffle, only hashes
    * and sizes (the m3 discipline).
    */
  private def m6MediaDedup(s: SparkSession, dir: String): DataFrame = {
    val grp = (col("doc_id") / 4).cast("long")
    val m = docs(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      md5(concat(lit("media:"), grp.cast("string"))).as("content_md5"),
      ((grp % 50 + 10) * 1024).cast("long").as("payload_bytes"))
    m.groupBy("media_type", "content_md5")
      .agg(count(lit(1)).as("n_copies"), min("payload_bytes").as("bytes"))
      .groupBy("media_type")
      .agg(sum("n_copies").as("n_items"),
        count(lit(1)).as("n_unique"),
        (sum("n_copies") - count(lit(1))).as("n_dup_items"),
        sum(col("n_copies") * col("bytes")).as("bytes_total"),
        sum("bytes").as("bytes_after_dedup"))
      .select(col("media_type"), col("n_items"), col("n_unique"),
        col("n_dup_items"), col("bytes_total"), col("bytes_after_dedup"),
        round(lit(1.0) - col("bytes_after_dedup").cast("double")
          / col("bytes_total").cast("double"), 6).as("dedup_savings"))
      .orderBy("media_type")
  }

  private def m1MediaMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMeta(mediaDf(s, dir))
      .select(col("media_id"), col("media_type"), col("width"), col("height"),
        col("format"), length(col("payload")).as("payload_len"))
      .orderBy("media_id")

  private def m2MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.withFeatures(mediaDf(s, dir))
      .select(col("media_id"), size(col("features")).as("feature_dim"))
      .orderBy("media_id")

  /** Per-doc character entropy (TextAnalysis.charEntropy): the
    * gibberish/compression quality signal, micro-nat-quantized.
    */
  private def x33CharEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropyGrouped(docs(s, dir)).orderBy("doc_id")

  /** Hashed-feature linear classifier apply (TextAnalysis
    * .classifierScore): the FineWeb-Edu-style quality-model filter
    * shape with a deterministic weight table.
    */
  private def x34ClassifierScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.classifierScore(docs(s, dir)).orderBy("doc_id")

  /** Quality-classifier calibration table (the FineWeb-Edu-style
    * reliability report): per (source, classifier-score decile), the
    * mean classifier score vs the mean heuristic quality signal — the
    * table that says whether the model's score ORDERING agrees with
    * the independent heuristic before anyone trusts its threshold.
    * Deciles are per SOURCE (ntile over a partitioned window), so the
    * sort parallelizes across sources instead of funneling the corpus
    * through one global ordering. Means are emitted as FLOORED
    * micro-unit integers (the c7 micro-nat convention): sums of
    * 6-dp-rounded inputs are exact integers in micro-units, and
    * floor(sum/n) is boundary-free — a rounded-double mean hit an
    * exact .5e-6 half (1037335/2) where Spark's HALF_UP and DuckDB's
    * rounding disagree.
    */
  private def x40QualityCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.classifierScore(docs(s, dir))
      .select(col("doc_id"), col("clf_score"))
    val qual = docs(s, dir).select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val w = Window.partitionBy("source").orderBy(col("clf_score"), col("doc_id"))
    def micro(c: org.apache.spark.sql.Column) =
      round(c * 1000000.0, 0).cast("long")
    scored.join(qual, "doc_id")
      .withColumn("decile", ntile(10).over(w))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(micro(col("clf_score"))).as("_sc"),
        sum(micro(col("q"))).as("_sq"))
      .select(col("source"), col("decile"), col("n_docs"),
        floor(col("_sc").cast("double") / col("n_docs")).cast("long")
          .as("mean_clf_micro"),
        floor(col("_sq").cast("double") / col("n_docs")).cast("long")
          .as("mean_quality_micro"))
      .orderBy("source", "decile")
  }

  /** Code-vs-prose routing (TextAnalysis.codeSignals) over
    * deterministically synthesized code-bearing text: every 5th doc
    * gets a snippet woven from its own doc_id (the raw corpus contains
    * no braces/keywords — the x12 PII synthesis pattern), so the
    * detector must separate exactly the doc_id % 5 == 0 rows.
    */
  private def x35CodeDetect(s: SparkSession, dir: String): DataFrame = {
    val snippet = concat(col("text"),
      lit(" def fn"), col("doc_id").cast("string"),
      lit("(x) { return x + "), (col("doc_id") % 7).cast("string"),
      lit("; } import lib"), (col("doc_id") % 3).cast("string"), lit(";"))
    val withCode = docs(s, dir).withColumn("text",
      when(col("doc_id") % 5 === 0, snippet).otherwise(col("text")))
    TextAnalysis.codeSignals(withCode).orderBy("doc_id")
  }

  /** Per-doc corpus novelty (Dedup.ngramNovelty): fraction of each
    * doc's distinct 3-grams that no other doc contains.
    */
  /** Length-bucketed dynamic batching (Mixture.lengthBatching): padding
    * economics per batch — the layout that bounds padding waste by the
    * bucket width instead of the corpus length spread.
    */
  private def x37LengthBatching(s: SparkSession, dir: String): DataFrame =
    operators.Mixture.lengthBatching(docs(s, dir))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max("n_toks").as("max_len"),
        sum("n_toks").as("sum_len"))
      .withColumn("waste_frac",
        when(col("max_len") > 0,
          round(lit(1.0) - col("sum_len").cast("double") /
            (col("n_docs") * col("max_len")).cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy("bucket", "batch_id")

  private def x36NgramNovelty(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramNoveltyFromHashes(
        stagedShingles(s, dir).select(col("doc_id"), col("h")))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x33_char_entropy" -> (x33CharEntropy(_, _)),
    "x34_classifier_score" -> (x34ClassifierScore(_, _)),
    "x35_code_detect" -> (x35CodeDetect(_, _)),
    "x36_ngram_novelty" -> (x36NgramNovelty(_, _)),
    "x37_length_batching" -> (x37LengthBatching(_, _)),
    "x1_token_stats" -> (x1TokenStats(_, _)),
    "x39_tokenizer_fertility" -> (x39TokenizerFertility(_, _)),
    "x40_quality_calibration" -> (x40QualityCalibration(_, _)),
    "x2_quality" -> (x2Quality(_, _)),
    "x3_langid" -> (x3LangId(_, _)),
    "x4_fingerprint" -> (x4Fingerprint(_, _)),
    "x11_repetition" -> (x11Repetition(_, _)),
    "x12_pii" -> (x12Pii(_, _)),
    "x13_unigram_logprob" -> (x13UnigramLogprob(_, _)),
    "x20_bigram_logprob" -> (x20BigramLogprob(_, _)),
    "x14_seq_pack" -> (x14SeqPack(_, _)),
    "x15_source_mix" -> (x15SourceMix(_, _)),
    "x16_shard_shuffle" -> (x16ShardShuffle(_, _)),
    "x17_chunking" -> (x17Chunking(_, _)),
    "x21_source_upsample" -> (x21SourceUpsample(_, _)),
    "x27_dsir_sample" -> (x27DsirSample(_, _)),
    "x28_gopher_rules" -> (x28GopherRules(_, _)),
    "x29_lexical_diversity" -> (x29LexicalDiversity(_, _)),
    "c6_freq_spectrum" -> (c6FreqSpectrum(_, _)),
    "c7_token_drift" -> (c7TokenDrift(_, _)),
    "d9_contamination" -> (d9Contamination(_, _)),
    "x38_eval_overlap" -> (x38EvalOverlap(_, _)),
    "d1_exact_dedup" -> (d1ExactDedup(_, _)),
    "d2_ngram_jaccard" -> (d2NgramJaccard(_, _)),
    "d15_dup_spans" -> (d15DupSpans(_, _)),
    "d18_dup_spans_first" -> (d18DupSpansFirst(_, _)),
    "d3_minhash_sig" -> (d3MinhashSig(_, _)),
    "d4_lsh_pairs" -> (d4LshPairs(_, _)),
    "d17_containment" -> (d17Containment(_, _)),
    "d19_lsh_tuning" -> (d19LshTuning(_, _)),
    "d5_simhash" -> (d5Simhash(_, _)),
    "d6_simhash_pairs" -> (d6SimhashPairs(_, _)),
    "d7_embed_dup" -> (d7EmbedDup(_, _)),
    "s6_range_search" -> (s6RangeSearch(_, _)),
    "s7_ann_recall" -> (s7AnnRecall(_, _)),
    "s1_cosine_topk" -> (s1CosineTopK(_, _)),
    "s2_ann_lsh" -> (s2AnnLsh(_, _)),
    "s4_ann_lsh_multiprobe" -> (s4AnnLshMultiprobe(_, _)),
    "s5_quantized_cosine" -> (s5QuantizedCosine(_, _)),
    "s10_pq_adc" -> (s10PqAdc(_, _)),
    "u1_url_dedup" -> (u1UrlDedup(_, _)),
    "u2_domain_stats" -> (u2DomainStats(_, _)),
    "d12_line_dedup" -> (d12LineDedup(_, _)),
    "x18_domain_cap" -> (x18DomainCap(_, _)),
    "c2_length_histogram" -> (c2LengthHistogram(_, _)),
    "j1_jsonl_ingest" -> (j1JsonlIngest(_, _)),
    "c1_corpus_card" -> (c1CorpusCard(_, _)),
    "st5_jsonl_stream" -> (st5JsonlStream(_, _)),
    "st6_stream_static_dedup" -> (st6StreamStaticDedup(_, _)),
    "st8_increment_dedup" -> (st8IncrementDedup(_, _)),
    "st9_stream_contamination" -> (st9StreamContamination(_, _)),
    "st10_stream_semantic_contamination" ->
      (st10StreamSemanticContamination(_, _)),
    "e1_centroids" -> (e1Centroids(_, _)),
    "x5_word_topk" -> (x5WordTopK(_, _)),
    "p1_doc_pipeline" -> (p1DocPipeline(_, _)),
    "p2_web_pipeline" -> (p2WebPipeline(_, _)),
    "m1_media_meta" -> (m1MediaMeta(_, _)),
    "m2_media_features" -> (m2MediaFeatures(_, _)),
    "m5_interleaved" -> (m5Interleaved(_, _)),
    "m6_media_dedup" -> (m6MediaDedup(_, _)),
    "c4_corpus_diff" -> (c4CorpusDiff(_, _)),
    "c5_mix_entropy" -> (c5MixEntropy(_, _)),
    "p3_update_pipeline" -> (p3UpdatePipeline(_, _)),
    "x25_bpe_merges" -> (x25BpeMerges(_, _)),
    "x26_bpe_compression" -> (x26BpeCompression(_, _)),
    "x22_hash_split" -> (x22HashSplit(_, _)),
    "x23_token_budget" -> (x23TokenBudget(_, _)),
    "x24_quantile_filter" -> (x24QuantileFilter(_, _)),
    "d14_bloom_contamination" -> (d14BloomContamination(_, _)),
    "x30_c4_rules" -> (x30C4Rules(_, _)),
    "x31_ccnet_buckets" -> (x31CcnetBuckets(_, _)),
    "x32_unimax_mix" -> (x32UnimaxMix(_, _)),
    "x41_temperature_mix" -> (x41TemperatureMix(_, _)))

  // --- oracle SQL fragments (DuckDB dialect) ---------------------------

  private val toksSql = OracleFragments.toksSql
  private val normSql = OracleFragments.normSql
  private val rawToksSql = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
  private val stopListSql = TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  private def shinglesSql(n: Int): String = OracleFragments.shinglesSql(n)

  private val hash60 = OracleFragments.hash60

  private val rawToksLowerSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

  private val langScores: Seq[(String, String)] =
    TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (code, markers) =>
      val lst = markers.map(m => s"'$m'").mkString("[", ", ", "]")
      code -> s"(CASE WHEN len($rawToksLowerSql) > 0 THEN len(list_filter($rawToksLowerSql, x -> list_contains($lst, x)))::DOUBLE / len($rawToksLowerSql) ELSE 0.0 END)"
    }


  /** Shared CTE text for the universal-hash minhash signatures (K=8). */
  private def minhashSigsCte: String = OracleFragments.minhashSigsCte

  /** Shared CTE text for the 48-bit simhash signatures. */
  private def simhashSigsCte: String =
    s"""toks AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |hx AS (SELECT doc_id, ('0x' || substr(md5('0:' || t), 1, 15))::BIGINT AS h FROM toks),
       |ones AS (
       |  SELECT doc_id, b::INT AS b,
       |    sum(CASE WHEN (h >> b::INT) & 1 = 1 THEN 1 ELSE 0 END) AS o, count(*) AS n
       |  FROM hx CROSS JOIN range(48) r(b) GROUP BY doc_id, b
       |), sigsraw AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN o * 2 > n THEN (1::BIGINT << b) ELSE 0::BIGINT END)::BIGINT AS simhash
       |  FROM ones GROUP BY doc_id
       |), sigs AS (
       |  SELECT d.doc_id, d.source, coalesce(s.simhash, 0)::BIGINT AS simhash
       |  FROM documents d LEFT JOIN sigsraw s ON d.doc_id = s.doc_id
       |)""".stripMargin

  /** Shared CTE text for unit-normalized embedding vectors. */
  private def normVecCte: String = OracleFragments.normVecCte

  /** Shared CTE text for the synthesized URL table + canonical form
    * (mirrors [[urlDf]] + [[TextAnalysis.canonicalizeUrl]] exactly;
    * every regex is valid in both Java regex and RE2).
    */
  private def urlCanonCte: String =
    s"""u AS (
       |  SELECT doc_id,
       |    (CASE doc_id % 4 WHEN 0 THEN 'https://www.' WHEN 1 THEN 'HTTP://'
       |     WHEN 2 THEN 'https://' ELSE 'https://www.' END) ||
       |    'm' || ((doc_id // 4) % 7) || '.' || substr(md5((doc_id // 20)::VARCHAR), 1, 6) ||
       |    (CASE (doc_id // 20) % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org' ELSE '.net' END) ||
       |    '/p' || (doc_id // 4) ||
       |    (CASE doc_id % 4 WHEN 2 THEN '?utm_source=feed' WHEN 3 THEN '/#sec1' ELSE '' END)
       |    AS url
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      lower(url), '#.*$$', ''), '\\?.*$$', ''), '^https?://', ''), '^www\\.', ''),
       |      '/$$', '') AS canonical_url
       |  FROM u
       |)""".stripMargin

  /** The 4 BPE merge steps unrolled as CTE stages (shared by x25 and
    * x26): w_i = the global symbol table after i merges, p_i = pair
    * counts, m_i = the argmax merge (count desc, pair asc). Symbols
    * are DOUBLE-space joined with single-space ends (the
    * TextAnalysis.bpeMerges representation): a plain non-overlapping
    * replace of ' l  r ' then merges greedily left-to-right exactly
    * like classic BPE — the match only consumes one space of each
    * boundary gap, so ' a  a  a  a ' -> ' aa  aa '. replace() and
    * Spark's literal-quoted regexp_replace share the scan semantics.
    */
  private def bpeMergeCtes: String = {
    val w0 =
      s"""w0 AS (
         |  SELECT ' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '
         |      AS sym,
         |    count(*) AS cnt
         |  FROM (SELECT unnest(${OracleFragments.toksSql}) AS w
         |        FROM documents) t
         |  GROUP BY w
         |)""".stripMargin
    val stages = (0 until 4).map { i =>
      s"""p$i AS (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
         |      j -> syms[j] || ' ' || syms[j + 1])) AS pair
         |    FROM (SELECT list_filter(string_split(sym, ' '), x -> x <> '')
         |            AS syms, cnt FROM w$i) t
         |  ) GROUP BY pair
         |), m$i AS (
         |  SELECT $i AS step, pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1
         |), w${i + 1} AS (
         |  SELECT replace(sym, ' ' || replace(m.pair, ' ', '  ') || ' ',
         |    ' ' || replace(m.pair, ' ', '') || ' ') AS sym, cnt
         |  FROM w$i CROSS JOIN m$i m
         |)""".stripMargin
    }.mkString(",\n")
    s"$w0,\n$stages"
  }

  /** SQL mirror of [[TextAnalysis.registrableDomain]]: strip path,
    * `:port`, trailing dot; numeric (IPv4-style) hosts keep the whole
    * host; last two labels — promoted to last THREE when the two-label
    * tail is a known public suffix (the embedded PSL subset, shared
    * with the Spark side so the IN list can never drift) — with the
    * whole host as fallback when the two-label pattern can't match.
    */
  private def domainSql(urlExpr: String): String = {
    val host = s"regexp_replace(regexp_replace(regexp_replace($urlExpr, " +
      s"'/.*$$', ''), ':[0-9]+$$', ''), '\\.$$', '')"
    val two = s"regexp_extract($host, '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1)"
    val three =
      s"regexp_extract($host, '([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$$', 1)"
    val psl = TextAnalysis.publicSuffixes.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"(CASE WHEN regexp_matches($host, '^[0-9.]+$$') OR $two = '' THEN $host " +
      s"WHEN $two IN ($psl) AND $three <> '' THEN $three ELSE $two END)"
  }

  val oracles: Map[String, String] = Map(
    "x33_char_entropy" ->
      s"""WITH chars AS (
         |  SELECT doc_id, unnest(regexp_extract_all($normSql, '.')) AS c
         |  FROM documents
         |), cnts AS (
         |  SELECT doc_id, c, count(*)::BIGINT AS cnt FROM chars GROUP BY doc_id, c
         |), agg AS (
         |  SELECT doc_id, sum(cnt)::BIGINT AS n, count(*)::BIGINT AS k,
         |    sum(round(cnt * ln(cnt) * 1e6)::BIGINT)::BIGINT AS squ
         |  FROM cnts GROUP BY doc_id
         |)
         |SELECT d.doc_id, coalesce(a.n, 0) AS n_chars_norm,
         |  coalesce(a.k, 0) AS n_distinct_chars,
         |  CASE WHEN coalesce(a.n, 0) <= 0 THEN 0.0
         |       ELSE round((round(ln(a.n) * 1e6)::BIGINT * a.n - a.squ)::DOUBLE
         |                  / (a.n * 1e6), 6)
         |  END AS char_entropy_nats
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "x34_classifier_score" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    ${hash60(s"'clsw:' || (${hash60("t")} % 65536)::VARCHAR")} % 2001 - 1000
         |      AS wm
         |  FROM toks
         |), agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n, sum(wm)::BIGINT AS s
         |  FROM w GROUP BY doc_id
         |), scored AS (
         |  SELECT d.doc_id, coalesce(a.n, 0) AS n_tokens,
         |    CASE WHEN coalesce(a.n, 0) <= 0 THEN 0.0
         |         ELSE (CASE WHEN a.s < 0 THEN -1 WHEN a.s > 0 THEN 1 ELSE 0 END
         |               * ((2000 * abs(a.s) + a.n) // (2 * a.n)))::DOUBLE / 1e6
         |         END AS clf_score
         |  FROM documents d LEFT JOIN agg a USING (doc_id)
         |)
         |SELECT doc_id, n_tokens, clf_score,
         |  (n_tokens > 0 AND clf_score > 0.0) AS kept
         |FROM scored ORDER BY doc_id""".stripMargin,
    "x40_quality_calibration" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    ${hash60(s"'clsw:' || (${hash60("t")} % 65536)::VARCHAR")} % 2001 - 1000
         |      AS wm
         |  FROM toks
         |), agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n, sum(wm)::BIGINT AS s
         |  FROM w GROUP BY doc_id
         |), scored AS (
         |  SELECT d.doc_id,
         |    CASE WHEN coalesce(a.n, 0) <= 0 THEN 0.0
         |         ELSE (CASE WHEN a.s < 0 THEN -1 WHEN a.s > 0 THEN 1 ELSE 0 END
         |               * ((2000 * abs(a.s) + a.n) // (2 * a.n)))::DOUBLE / 1e6
         |         END AS clf_score
         |  FROM documents d LEFT JOIN agg a USING (doc_id)
         |), qual AS (
         |  SELECT doc_id, source, ${OracleFragments.qualitySql} AS q FROM documents
         |), j AS (
         |  SELECT ql.source, s.clf_score, ql.q,
         |    ntile(10) OVER (PARTITION BY ql.source ORDER BY s.clf_score, s.doc_id)
         |      AS decile
         |  FROM scored s JOIN qual ql USING (doc_id)
         |)
         |SELECT source, decile, count(*) AS n_docs,
         |  floor(sum(round(clf_score * 1000000, 0)::BIGINT)::DOUBLE
         |    / count(*))::BIGINT AS mean_clf_micro,
         |  floor(sum(round(q * 1000000, 0)::BIGINT)::DOUBLE
         |    / count(*))::BIGINT AS mean_quality_micro
         |FROM j GROUP BY source, decile ORDER BY source, decile""".stripMargin,
    "x35_code_detect" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' def fn' || doc_id
         |      || '(x) { return x + ' || (doc_id % 7) || '; } import lib'
         |      || (doc_id % 3) || ';' ELSE text END AS t
         |  FROM documents
         |), sig AS (
         |  SELECT doc_id, length(t)::BIGINT AS n_chars,
         |    len(regexp_extract_all(t, '${TextAnalysis.braceRe}'))::BIGINT AS n_braces,
         |    len(regexp_extract_all(t, ';'))::BIGINT AS n_semis,
         |    len(regexp_extract_all(t, '${TextAnalysis.codeKeywordRe}'))::BIGINT
         |      AS n_keywords,
         |    len(regexp_extract_all(t, '${TextAnalysis.codeSymbolRe}'))::BIGINT
         |      AS n_syms
         |  FROM p
         |)
         |SELECT doc_id, n_chars, n_braces, n_semis, n_keywords,
         |  CASE WHEN n_chars <= 0 THEN 0.0
         |       ELSE round(n_syms * 100.0 / n_chars, 6) END AS symbol_per_100_chars,
         |  CASE WHEN n_chars <= 0 THEN 0.0
         |       ELSE round((n_keywords * 2 + n_braces + n_semis) * 100.0 / n_chars, 6)
         |  END AS code_score,
         |  (CASE WHEN n_chars <= 0 THEN 0.0
         |        ELSE round((n_keywords * 2 + n_braces + n_semis) * 100.0 / n_chars, 6)
         |   END >= 1.0) AS is_code
         |FROM sig ORDER BY doc_id""".stripMargin,
    "x36_ngram_novelty" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(${OracleFragments.shinglesSql(3)}) AS s
         |  FROM documents
         |), gh AS (
         |  SELECT doc_id, ${OracleFragments.hash60("s")} AS h FROM g
         |), dfreq AS (
         |  SELECT h, count(*) AS df FROM gh GROUP BY h
         |)
         |SELECT doc_id, count(*) AS n_grams,
         |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
         |  round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |    AS novelty
         |FROM gh JOIN dfreq USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x37_length_batching" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(coalesce(len(${OracleFragments.rawToksSqlNoNorm}), 0) AS BIGINT)
         |      AS n_toks,
         |    ('0x' || substr(md5('lenbatch:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, n_toks, CAST(n_toks // 32 AS INT) AS bucket, h FROM t
         |), r AS (
         |  SELECT doc_id, n_toks, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1 AS rn
         |  FROM b
         |), a AS (
         |  SELECT bucket, CAST(rn // 8 AS BIGINT) AS batch_id, n_toks FROM r
         |)
         |SELECT bucket, batch_id, count(*) AS n_docs, max(n_toks) AS max_len,
         |  CAST(sum(n_toks) AS BIGINT) AS sum_len,
         |  CASE WHEN max(n_toks) > 0
         |    THEN round(1.0 - sum(n_toks)::DOUBLE / (count(*) * max(n_toks)), 6)
         |    ELSE 0.0 END AS waste_frac
         |FROM a GROUP BY bucket, batch_id
         |ORDER BY bucket, batch_id""".stripMargin,
    "x14_seq_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_toks,
         |    ${hash60("doc_id::VARCHAR")} AS h
         |  FROM documents
         |), cum AS (
         |  SELECT doc_id, source, n_toks,
         |    CAST(coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
         |  FROM toks
         |)
         |SELECT doc_id, source, n_toks,
         |  cum_prev // 512 AS pack_id,
         |  cum_prev % 512 AS pack_offset
         |FROM cum ORDER BY source, pack_id, pack_offset, doc_id""".stripMargin,
    "x15_source_mix" ->
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n_s,
         |    1.0 + CAST(regexp_extract(source, '([0-9]+)', 1)::INT % 3 AS DOUBLE) AS w
         |  FROM documents GROUP BY source
         |), cap AS (
         |  SELECT min(n_s::DOUBLE / w) AS t_cap FROM counts
         |), rates AS (
         |  SELECT source, w * t_cap / n_s::DOUBLE AS rate
         |  FROM counts CROSS JOIN cap
         |)
         |SELECT source, count(*) AS n_kept
         |FROM documents d JOIN rates USING (source)
         |WHERE (${hash60("d.doc_id::VARCHAR")} % 1000000)::DOUBLE < rate * 1000000.0
         |GROUP BY source ORDER BY source""".stripMargin,
    "x16_shard_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id, ${hash60("doc_id::VARCHAR")} AS h
         |  FROM documents
         |)
         |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT)
         |    AS position
         |FROM h ORDER BY shard, position""".stripMargin,
    "x17_chunking" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS t FROM documents
         |), starts AS (
         |  SELECT doc_id, t, unnest(range(0, len(t), 48)) AS st
         |  FROM toks WHERE len(t) > 0
         |)
         |SELECT doc_id,
         |  CAST(st // 48 AS INT) AS chunk_id,
         |  CAST(least(64, len(t) - st) AS INT) AS chunk_len,
         |  array_to_string(t[st + 1 : st + 64], ' ') AS chunk_text
         |FROM starts ORDER BY doc_id, chunk_id""".stripMargin,
    "x1_token_stats" ->
      s"""SELECT doc_id,
         |  len($rawToksSql) AS n_ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
         |  length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x39_tokenizer_fertility" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  sum(length(text))::BIGINT AS n_chars,
         |  sum(len($rawToksSql))::BIGINT AS n_ws_tokens,
         |  sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')))::BIGINT
         |    AS n_bpe_tokens,
         |  CASE WHEN sum(len($rawToksSql)) > 0
         |    THEN round(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')))::DOUBLE
         |      / sum(len($rawToksSql)), 6)
         |    ELSE 0.0 END AS fertility,
         |  CASE WHEN sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))) > 0
         |    THEN round(sum(length(text))::DOUBLE
         |      / sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))), 6)
         |    ELSE 0.0 END AS chars_per_token
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x2_quality" ->
      s"""SELECT doc_id,
         |  round(stop_ratio, 6) AS stop_ratio,
         |  round(punct_ratio, 6) AS punct_ratio,
         |  round(mean_word_len, 6) AS mean_word_len,
         |  round(least(length(text)::DOUBLE / 1000.0, 1.0) * 0.4
         |      + least(stop_ratio * 4.0, 1.0) * 0.3
         |      + greatest(0.0, 1.0 - punct_ratio * 10.0) * 0.3, 6) AS quality_score
         |FROM (
         |  SELECT doc_id, text,
         |    CASE WHEN len($rawToksLowerSql) > 0
         |      THEN len(list_filter($rawToksLowerSql, x -> list_contains($stopListSql, x)))::DOUBLE
         |           / len($rawToksLowerSql) ELSE 0.0 END AS stop_ratio,
         |    CASE WHEN length(text) > 0
         |      THEN len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text)
         |      ELSE 0.0 END AS punct_ratio,
         |    CASE WHEN len($rawToksSql) > 0
         |      THEN list_sum(list_transform($rawToksSql, t -> length(t)))::DOUBLE / len($rawToksSql)
         |      ELSE 0.0 END AS mean_word_len
         |  FROM documents
         |) ORDER BY doc_id""".stripMargin,
    "x3_langid" ->
      s"""SELECT doc_id,
         |  CASE ${langScores.reverse.map { case (c, _) => s"WHEN s_$c = msc THEN '$c'" }.mkString(" ")}
         |  END AS lang_pred,
         |  round(msc, 6) AS lang_score,
         |  lang AS lang_true
         |FROM (
         |  SELECT doc_id, lang,
         |    ${langScores.map { case (c, e) => s"$e AS s_$c" }.mkString(",\n    ")},
         |    greatest(${langScores.map { case (c, _) => s"s_$c" }.mkString(", ")}) AS msc
         |  FROM documents
         |) ORDER BY doc_id""".stripMargin,
    "x4_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp_md5,
         |  ${hash60(normSql)} AS fp64
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x11_repetition" ->
      s"""WITH w AS (SELECT doc_id, unnest($toksSql) AS s FROM documents),
         |wc AS (SELECT doc_id, s, count(*) AS c FROM w GROUP BY 1, 2),
         |ws AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS f FROM wc GROUP BY 1),
         |-- gram identity = hash60 of the gram, in lockstep with the
         |-- engine's window-free gram-hash kernel (identical values
         |-- unless two grams of one doc collide in 60 bits, which this
         |-- replay then mirrors exactly)
         |g2 AS (SELECT doc_id, ${hash60("s_raw")} AS s FROM
         |  (SELECT doc_id, unnest(${OracleFragments.posGramsSql(2)}) AS s_raw FROM documents)),
         |g2c AS (SELECT doc_id, s, count(*) AS c FROM g2 GROUP BY 1, 2),
         |g2s AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS f FROM g2c GROUP BY 1),
         |g3 AS (SELECT doc_id, ${hash60("s_raw")} AS s FROM
         |  (SELECT doc_id, unnest(${OracleFragments.posGramsSql(3)}) AS s_raw FROM documents)),
         |g3s AS (SELECT doc_id,
         |          1.0 - count(DISTINCT s)::DOUBLE / count(*) AS f FROM g3 GROUP BY 1)
         |SELECT d.doc_id,
         |  round(coalesce(ws.f, 0.0), 6) AS top_word_frac,
         |  round(coalesce(g2s.f, 0.0), 6) AS top_bigram_frac,
         |  round(coalesce(g3s.f, 0.0), 6) AS dup_3gram_frac
         |FROM documents d
         |LEFT JOIN ws USING (doc_id) LEFT JOIN g2s USING (doc_id)
         |LEFT JOIN g3s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "x12_pii" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com ip 10.0.'
         |      || (doc_id % 256) || '.17 call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
         |      AS pii_text
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(regexp_extract_all(pii_text, '${TextAnalysis.emailRe}')) AS n_emails,
         |  len(regexp_extract_all(pii_text, '${TextAnalysis.ipv4Re}')) AS n_ipv4,
         |  len(regexp_extract_all(pii_text, '${TextAnalysis.phoneRe}')) AS n_phones,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(pii_text, '${TextAnalysis.emailRe}', '<EMAIL>', 'g'),
         |      '${TextAnalysis.ipv4Re}', '<IP>', 'g'),
         |    '${TextAnalysis.phoneRe}', '<PHONE>', 'g') AS redacted
         |FROM p ORDER BY doc_id""".stripMargin,
    "x13_unigram_logprob" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |tot AS (SELECT count(*)::DOUBLE AS n_total FROM toks),
         |freq AS (SELECT w, count(*) AS cf FROM toks GROUP BY w)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(sum(round(ln(cf / n_total) * 1e6)::BIGINT)::DOUBLE
         |        / (count(*) * 1e6), 6) AS avg_logprob
         |FROM toks JOIN freq USING (w), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c6_freq_spectrum" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
         |freq AS (SELECT w, count(*) AS cf FROM toks GROUP BY w)
         |SELECT (length(bin(cf)) - 1)::BIGINT AS bucket,
         |  (1::BIGINT << (length(bin(cf)) - 1)) AS count_lo,
         |  count(*) AS n_tokens, sum(cf)::BIGINT AS token_mass
         |FROM freq GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    "c7_token_drift" ->
      s"""WITH toks AS (
         |  SELECT (doc_id % 2 = 0) AS in_a, unnest($toksSql) AS w FROM documents
         |), freq AS (
         |  SELECT w, sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM toks GROUP BY w
         |), tot AS (
         |  SELECT sum(n_a)::BIGINT AS na, sum(n_b)::BIGINT AS nb,
         |    count(*)::BIGINT AS v
         |  FROM freq
         |), sc AS (
         |  SELECT w AS token, n_a, n_b,
         |    CAST(round((ln((n_a + 1)::DOUBLE / (na + v))
         |      - ln((n_b + 1)::DOUBLE / (nb + v))) * 1e6) AS BIGINT) AS llr_micro
         |  FROM freq, tot
         |), topk AS (
         |  SELECT token, n_a, n_b, llr_micro FROM sc
         |  ORDER BY abs(llr_micro) DESC, token LIMIT 20
         |)
         |SELECT token, n_a, n_b, llr_micro FROM topk ORDER BY token""".stripMargin,
    "x29_lexical_diversity" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS w FROM documents)
         |SELECT source, count(*) AS n_tokens, count(DISTINCT w) AS n_types,
         |  round(count(DISTINCT w)::DOUBLE / count(*), 6) AS ttr
         |FROM toks GROUP BY source ORDER BY source""".stripMargin,
    "x28_gopher_rules" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |stats AS (
         |  SELECT doc_id, count(*) AS n_words,
         |    round(sum(length(w))::DOUBLE / count(*), 6) AS mean_word_len,
         |    round(sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END)::DOUBLE
         |          / count(*), 6) AS frac_alpha_words,
         |    count(DISTINCT CASE WHEN list_contains(${OracleFragments.stopListSql}, w)
         |                        THEN w END) AS n_stop_distinct,
         |    round(sum(CASE WHEN regexp_matches(w, '#|\\.\\.\\.') THEN 1 ELSE 0 END)::DOUBLE
         |          / count(*), 6) AS symbol_word_ratio
         |  FROM toks GROUP BY doc_id
         |), co AS (
         |  SELECT d.doc_id,
         |    coalesce(s.n_words, 0) AS n_words,
         |    coalesce(s.mean_word_len, 0.0) AS mean_word_len,
         |    coalesce(s.frac_alpha_words, 0.0) AS frac_alpha_words,
         |    coalesce(s.n_stop_distinct, 0) AS n_stop_distinct,
         |    coalesce(s.symbol_word_ratio, 0.0) AS symbol_word_ratio
         |  FROM documents d LEFT JOIN stats s USING (doc_id)
         |)
         |SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
         |  n_stop_distinct, symbol_word_ratio,
         |  (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_mean_word_len,
         |  (frac_alpha_words >= 0.8) AS pass_alpha_words,
         |  (n_stop_distinct >= 2) AS pass_stopwords,
         |  (symbol_word_ratio < 0.1) AS pass_symbol_ratio,
         |  ((n_words >= 50 AND n_words <= 100000)
         |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         |    AND (frac_alpha_words >= 0.8)
         |    AND (n_stop_distinct >= 2)
         |    AND (symbol_word_ratio < 0.1)) AS kept
         |FROM co ORDER BY doc_id""".stripMargin,
    "x27_dsir_sample" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${OracleFragments.qualitySql} >= 0.5 AS is_t,
         |    unnest($toksSql) AS w
         |  FROM documents
         |), freq AS (
         |  SELECT w, count(*) AS cr,
         |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
         |  FROM toks GROUP BY w
         |), scal AS (
         |  SELECT sum(cr)::DOUBLE AS nr, sum(ct)::DOUBLE AS nt,
         |    count(*)::DOUBLE AS v
         |  FROM freq
         |), agg AS (
         |  SELECT t.doc_id, count(*) AS n_tokens,
         |    sum(round((ln((f.ct + 1) / (s.nt + s.v))
         |             - ln((f.cr + 1) / (s.nr + s.v))) * 1e6)::BIGINT) AS slr
         |  FROM toks t JOIN freq f USING (w), scal s
         |  GROUP BY t.doc_id
         |), keyed AS (
         |  SELECT doc_id, n_tokens,
         |    round(slr::DOUBLE / (n_tokens * 1e6), 6) AS log_weight,
         |    round(ln(-ln((('0x' || substr(md5('dsir:' || doc_id::VARCHAR), 1, 15))::BIGINT + 1)::DOUBLE
         |          / 1152921504606846976.0))
         |      - round(slr::DOUBLE / (n_tokens * 1e6), 6), 6) AS sample_key
         |  FROM agg
         |)
         |SELECT row_number() OVER (ORDER BY sample_key, doc_id) AS rk,
         |  doc_id, n_tokens, log_weight, sample_key
         |FROM keyed ORDER BY sample_key, doc_id LIMIT 50""".stripMargin,
    "x20_bigram_logprob" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |tl AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bgs AS (
         |  SELECT doc_id, unnest(t[1 : len(t) - 1]) AS w1, unnest(t[2 : len(t)]) AS w2
         |  FROM tl WHERE len(t) >= 2
         |), uni AS (SELECT w, count(*) AS cf FROM toks GROUP BY w),
         |tot AS (SELECT sum(cf)::DOUBLE AS n_total FROM uni),
         |bgf AS (SELECT w1, w2, count(*) AS cbg FROM bgs GROUP BY w1, w2)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(sum(round(ln(0.75 * (cbg::DOUBLE / u1.cf)
         |                     + 0.25 * (u2.cf::DOUBLE / n_total)) * 1e6)::BIGINT)::DOUBLE
         |        / (count(*) * 1e6), 6) AS avg_logprob
         |FROM bgs
         |JOIN bgf USING (w1, w2)
         |JOIN uni u1 ON u1.w = bgs.w1
         |JOIN uni u2 ON u2.w = bgs.w2, tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "p3_update_pipeline" ->
      s"""WITH v2 AS (
         |  SELECT d.doc_id, d.source,
         |    CASE WHEN d.doc_id % 11 = 3 AND n.text IS NOT NULL THEN n.text
         |         WHEN d.doc_id % 7 = 0 THEN d.text || ' rev2'
         |         ELSE d.text END AS text
         |  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id - 1
         |  WHERE ('0x' || substr(md5('v2drop:' || d.doc_id::VARCHAR), 1, 15))::BIGINT
         |    % 12 <> 0
         |), v1m AS (
         |  SELECT doc_id, md5(text) AS m FROM documents
         |  WHERE ('0x' || substr(md5('v1drop:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |    % 10 <> 0
         |), v2m AS (
         |  SELECT doc_id, md5(text) AS m FROM v2
         |), st AS (
         |  SELECT doc_id,
         |    CASE WHEN v1m.m IS NULL THEN 'added'
         |         WHEN v2m.m IS NULL THEN 'removed'
         |         WHEN v1m.m <> v2m.m THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM v1m FULL OUTER JOIN v2m USING (doc_id)
         |), entering AS (
         |  SELECT v2.doc_id, v2.text FROM v2 JOIN st USING (doc_id)
         |  WHERE st.status IN ('added', 'changed')
         |), ret AS (
         |  SELECT DISTINCT md5(v2.text) AS m FROM v2 JOIN st USING (doc_id)
         |  WHERE st.status = 'unchanged'
         |), ded AS (
         |  SELECT e.doc_id, e.text FROM entering e
         |  WHERE md5(e.text) NOT IN (SELECT m FROM ret)
         |), q AS (
         |  SELECT doc_id FROM ded WHERE ${OracleFragments.qualitySql} >= 0.5
         |)
         |SELECT 0 AS stage, 'entering' AS stage_name, count(*) AS n_docs
         |FROM entering
         |UNION ALL SELECT 1, 'corpus_dedup', count(*) FROM ded
         |UNION ALL SELECT 2, 'quality', count(*) FROM q
         |ORDER BY stage""".stripMargin,
    "c5_mix_entropy" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    CAST(${hash60("doc_id::VARCHAR")} % 16 AS INT) AS shard
         |  FROM documents
         |), c AS (
         |  SELECT shard, source, count(*) AS cnt FROM sh GROUP BY 1, 2
         |), t AS (
         |  SELECT shard, sum(cnt) AS tot FROM c GROUP BY 1
         |), e AS (
         |  SELECT c.shard, cnt,
         |    CAST(round(-(cnt::DOUBLE / tot::DOUBLE)
         |      * ln(cnt::DOUBLE / tot::DOUBLE) * 1e6) AS BIGINT) AS unats
         |  FROM c JOIN t USING (shard)
         |)
         |SELECT shard, CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  CAST(sum(unats) AS BIGINT) AS entropy_unats
         |FROM e GROUP BY shard ORDER BY shard""".stripMargin,
    "x25_bpe_merges" ->
      s"""WITH $bpeMergeCtes
         |SELECT step, split_part(pair, ' ', 1) AS lhs,
         |  split_part(pair, ' ', 2) AS rhs,
         |  replace(pair, ' ', '') AS merged, c AS pair_count
         |FROM (SELECT * FROM m0 UNION ALL SELECT * FROM m1
         |      UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
         |ORDER BY step""".stripMargin,
    "x26_bpe_compression" -> {
      // per-source word table symbolized (double-space joined, see
      // bpeMergeCtes), the four learned merges applied via scalar
      // subqueries against m0..m3, then the per-source char vs
      // post-merge symbol totals
      // coalesce(chr(7)) guards merge exhaustion (< 4 learned merges
      // on a degenerate corpus): the search pattern becomes ' \a '
      // (BEL), which normalized symbols never contain, so the stage is
      // a no-op instead of NULLing every sym — mirroring the Spark
      // side, which simply applies fewer replaces. ('' is no longer a
      // safe sentinel: '  ' DOES occur between double-spaced symbols.)
      val apply = (0 until 4).map { i =>
        // NOTE: inner lines must not START with '||' — this fragment
        // is stripMargin'd again inside the outer template, which
        // would eat the first pipe as a margin char
        s"""ws${i + 1} AS (
           |  SELECT source, w, cnt, replace(sym,
           |    ' ' || coalesce((SELECT replace(pair, ' ', '  ') FROM m$i),
           |      chr(7)) || ' ',
           |    ' ' || coalesce((SELECT replace(pair, ' ', '') FROM m$i),
           |      chr(7)) || ' ') AS sym
           |  FROM ws$i
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $bpeMergeCtes,
         |ws0 AS (
         |  SELECT source, w, count(*) AS cnt,
         |    ' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS sym
         |  FROM (SELECT source, unnest(${OracleFragments.toksSql}) AS w
         |        FROM documents) t
         |  GROUP BY source, w
         |),
         |$apply,
         |agg AS (
         |  SELECT source,
         |    CAST(sum(cnt * length(w)) AS BIGINT) AS n_chars,
         |    CAST(sum(cnt * len(list_filter(string_split(sym, ' '),
         |      x -> x <> ''))) AS BIGINT) AS n_symbols
         |  FROM ws4 GROUP BY source
         |)
         |SELECT source, n_chars, n_symbols,
         |  round(n_symbols::DOUBLE / n_chars::DOUBLE, 6) AS symbols_per_char
         |FROM agg ORDER BY source""".stripMargin
    },
    "c4_corpus_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id, source, md5(text) AS m FROM documents
         |  WHERE ('0x' || substr(md5('v1drop:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |    % 10 <> 0
         |), v2 AS (
         |  SELECT doc_id, source,
         |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS m
         |  FROM documents
         |  WHERE ('0x' || substr(md5('v2drop:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |    % 12 <> 0
         |), d AS (
         |  SELECT coalesce(v2.source, v1.source) AS source,
         |    CASE WHEN v1.m IS NULL THEN 'added'
         |         WHEN v2.m IS NULL THEN 'removed'
         |         WHEN v1.m <> v2.m THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM v1 FULL OUTER JOIN v2 USING (doc_id)
         |)
         |SELECT source, status, count(*) AS n_docs FROM d
         |GROUP BY source, status ORDER BY source, status""".stripMargin,
    "x22_hash_split" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % 1000000 AS split_bucket
         |  FROM documents
         |)
         |SELECT doc_id, split_bucket,
         |  CASE WHEN split_bucket < 900000 THEN 'train'
         |       WHEN split_bucket < 950000 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "x23_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(${OracleFragments.rawToksSqlNoNorm}) AS BIGINT) AS n_toks,
         |    ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_toks,
         |    sum(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum_toks
         |  FROM t
         |)
         |SELECT doc_id, source, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
         |FROM c WHERE cum_toks <= 800 ORDER BY doc_id""".stripMargin,
    "x24_quantile_filter" ->
      s"""WITH q AS (
         |  SELECT source, ${OracleFragments.qualitySql} AS q FROM documents
         |), r AS (
         |  SELECT source, q,
         |    row_number() OVER (PARTITION BY source ORDER BY q) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM q
         |), t AS (
         |  SELECT source, max(n) AS n,
         |    min(CASE WHEN rn = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1
         |        THEN q END) AS v_lo,
         |    min(CASE WHEN rn = CAST(ceil((n - 1) * 0.25) AS BIGINT) + 1
         |        THEN q END) AS v_hi
         |  FROM r GROUP BY source
         |), thr AS (
         |  SELECT source,
         |    round(v_lo + ((n - 1) * 0.25 - floor((n - 1) * 0.25))
         |      * (v_hi - v_lo), 6) AS q25
         |  FROM t
         |)
         |SELECT q.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN q.q >= thr.q25 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  min(thr.q25) AS q25
         |FROM q JOIN thr USING (source)
         |GROUP BY q.source ORDER BY q.source""".stripMargin,
    "d14_bloom_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(2)} AS sh FROM documents
         |), ex AS (
         |  -- DISTINCT on (doc, hash): the engine dedups 60-bit gram
         |  -- hashes (not gram strings) so its exchange carries longs;
         |  -- identical values unless two grams of one doc collide,
         |  -- which this replay then mirrors exactly
         |  SELECT DISTINCT doc_id,
         |    ('0x' || substr(md5(s_raw), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s_raw FROM sh)
         |), tag AS (
         |  SELECT doc_id,
         |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 25 = 1) AS is_eval
         |  FROM documents
         |), train AS (
         |  SELECT e.doc_id AS train_id, e.h FROM ex e JOIN tag USING (doc_id)
         |  WHERE NOT is_eval
         |), ev AS (
         |  SELECT e.doc_id AS eval_id, e.h FROM ex e JOIN tag USING (doc_id)
         |  WHERE is_eval
         |), sz AS (SELECT train_id, count(*) AS sz FROM train GROUP BY 1),
         |shared AS (
         |  SELECT t.train_id, ev.eval_id, count(*) AS n_shared
         |  FROM train t JOIN ev ON t.h = ev.h
         |  GROUP BY 1, 2
         |)
         |SELECT s.train_id, s.eval_id, s.n_shared,
         |  round(s.n_shared::DOUBLE / sz.sz, 6) AS overlap_frac
         |FROM shared s JOIN sz USING (train_id)
         |WHERE s.n_shared >= 12
         |ORDER BY s.train_id, s.eval_id""".stripMargin,
    "d9_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS sh FROM documents
         |), ex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s_raw), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s_raw FROM sh)
         |), tag AS (
         |  SELECT doc_id,
         |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 20 = 0) AS is_eval
         |  FROM documents
         |), train AS (
         |  SELECT e.doc_id AS train_id, e.h FROM ex e JOIN tag USING (doc_id)
         |  WHERE NOT is_eval
         |), ev AS (
         |  SELECT e.doc_id AS eval_id, e.h FROM ex e JOIN tag USING (doc_id)
         |  WHERE is_eval
         |), sz AS (SELECT train_id, count(*) AS sz FROM train GROUP BY 1),
         |shared AS (
         |  SELECT t.train_id, ev.eval_id, count(*) AS n_shared
         |  FROM train t JOIN ev ON t.h = ev.h
         |  GROUP BY 1, 2
         |)
         |SELECT s.train_id, s.eval_id, s.n_shared,
         |  round(s.n_shared::DOUBLE / sz.sz, 6) AS overlap_frac
         |FROM shared s JOIN sz USING (train_id)
         |WHERE s.n_shared >= 3
         |ORDER BY s.train_id, s.eval_id""".stripMargin,
    "x38_eval_overlap" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(3)} AS sh FROM documents
         |), ex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s_raw), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s_raw FROM sh)
         |), tag AS (
         |  SELECT doc_id,
         |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 20 = 0) AS is_eval
         |  FROM documents
         |), gf AS (
         |  SELECT h, max(CASE WHEN NOT t.is_eval THEN 1 ELSE 0 END) AS in_train
         |  FROM ex e JOIN tag t USING (doc_id) GROUP BY h
         |), ev AS (
         |  SELECT e.doc_id, e.h FROM ex e JOIN tag t USING (doc_id) WHERE t.is_eval
         |)
         |SELECT ev.doc_id, count(*) AS n_grams,
         |  sum(gf.in_train)::BIGINT AS n_overlap,
         |  round(sum(gf.in_train)::DOUBLE / count(*), 6) AS overlap_frac
         |FROM ev JOIN gf USING (h)
         |GROUP BY ev.doc_id ORDER BY doc_id""".stripMargin,
    "d1_exact_dedup" ->
      s"""SELECT md5($normSql) AS content_md5,
         |  min(doc_id) AS survivor_id, count(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY content_md5""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source, ${shinglesSql(3)} AS sh FROM documents
         |), ex AS (
         |  SELECT doc_id, source, ('0x' || substr(md5(s_raw), 1, 15))::BIGINT AS s
         |  FROM (SELECT doc_id, source, unnest(sh) AS s_raw FROM sh)
         |), dfq AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |exf AS (
         |  SELECT e.doc_id, e.source, e.s
         |  FROM ex e JOIN dfq USING (s), nd
         |  WHERE dfq.df <= ceil(nd.n_docs * 0.01)
         |), inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM exf a JOIN exf b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
         |SELECT a_id, b_id,
         |  round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard_sim
         |FROM inter JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.05
         |ORDER BY a_id, b_id""".stripMargin,
    "d15_dup_spans" ->
      s"""WITH pos AS (
         |  SELECT doc_id, text, unnest(range(1, length(text) - 38)) AS pos
         |  FROM documents WHERE length(text) >= 40
         |), wins AS (
         |  SELECT doc_id, pos,
         |    ${OracleFragments.rollingHashSql(40)} AS h
         |  FROM pos
         |), rep AS (
         |  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
         |), marked AS (
         |  SELECT w.doc_id, w.pos,
         |    CASE WHEN lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) IS NULL
         |           OR w.pos > lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) + 40
         |         THEN 1 ELSE 0 END AS brk
         |  FROM wins w JOIN rep USING (h)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM marked
         |)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 39 AS span_end,
         |  max(pos) + 39 - min(pos) + 1 AS span_len
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,
    "d18_dup_spans_first" ->
      s"""WITH pos AS (
         |  SELECT doc_id, text, unnest(range(1, length(text) - 38)) AS pos
         |  FROM documents WHERE length(text) >= 40
         |), wins AS (
         |  SELECT doc_id, pos,
         |    ${OracleFragments.rollingHashSql(40)} AS h
         |  FROM pos
         |), ranked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         |    count(*) OVER (PARTITION BY h) AS occ
         |  FROM wins
         |), dups AS (
         |  SELECT doc_id, pos FROM ranked WHERE occ >= 2 AND rn > 1
         |), marked AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
         |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
         |         THEN 1 ELSE 0 END AS brk
         |  FROM dups
         |), isl AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM marked
         |)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 39 AS span_end,
         |  max(pos) + 39 - min(pos) + 1 AS span_len
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,
    "d3_minhash_sig" ->
      s"""WITH $minhashSigsCte
         |SELECT doc_id, k, minhash FROM sigs ORDER BY doc_id, k""".stripMargin,
    "d4_lsh_pairs" ->
      s"""WITH $minhashSigsCte,
         |bands AS (
         |  SELECT doc_id, k // 2 AS band,
         |    string_agg(k || ':' || minhash, ',' ORDER BY k) AS band_key
         |  FROM sigs GROUP BY doc_id, k // 2
         |), cands AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |)
         |, exh AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex
         |), sz AS (SELECT doc_id, count(*) AS sz FROM exh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a_id, c.b_id, count(*) AS i
         |  FROM cands c JOIN exh ea ON ea.doc_id = c.a_id
         |               JOIN exh eb ON eb.doc_id = c.b_id AND eb.h = ea.h
         |  GROUP BY 1, 2
         |)
         |SELECT c.a_id AS a_id, c.b_id AS b_id,
         |  round(coalesce(i, 0)::DOUBLE / (sa.sz + sb.sz - coalesce(i, 0)), 6) AS jaccard_sim
         |FROM cands c
         |LEFT JOIN inter ON inter.a_id = c.a_id AND inter.b_id = c.b_id
         |JOIN sz sa ON sa.doc_id = c.a_id JOIN sz sb ON sb.doc_id = c.b_id
         |ORDER BY c.a_id, c.b_id""".stripMargin,
    "d17_containment" ->
      s"""WITH $minhashSigsCte,
         |bands AS (
         |  SELECT doc_id, k // 2 AS band,
         |    string_agg(k || ':' || minhash, ',' ORDER BY k) AS band_key
         |  FROM sigs GROUP BY doc_id, k // 2
         |), cands AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |), exh AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex
         |), sz AS (SELECT doc_id, count(*) AS sz FROM exh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a_id, c.b_id, count(*) AS i
         |  FROM cands c JOIN exh ea ON ea.doc_id = c.a_id
         |               JOIN exh eb ON eb.doc_id = c.b_id AND eb.h = ea.h
         |  GROUP BY 1, 2
         |)
         |SELECT i.a_id, i.b_id, sa.sz AS a_sz, sb.sz AS b_sz, i.i AS inter,
         |  round(i.i::DOUBLE / sa.sz, 6) AS cont_a,
         |  round(i.i::DOUBLE / sb.sz, 6) AS cont_b
         |FROM inter i JOIN sz sa ON sa.doc_id = i.a_id
         |             JOIN sz sb ON sb.doc_id = i.b_id
         |WHERE round(i.i::DOUBLE / sa.sz, 6) >= 0.5
         |   OR round(i.i::DOUBLE / sb.sz, 6) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    "d19_lsh_tuning" -> {
      val bandCtes = Seq(1, 2, 4, 8).map { r =>
        s"""bands_$r AS (
           |  SELECT doc_id, k // $r AS band,
           |    string_agg(k || ':' || minhash, ',' ORDER BY k) AS band_key
           |  FROM sigs GROUP BY doc_id, k // $r
           |), cands_$r AS (
           |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM bands_$r a JOIN bands_$r b
           |    ON a.band = b.band AND a.band_key = b.band_key
           |    AND a.doc_id < b.doc_id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashSigsCte,
         |$bandCtes,
         |exh AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex
         |), sz AS (SELECT doc_id, count(*) AS sz FROM exh GROUP BY doc_id),
         |ti AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM exh a JOIN exh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), truth AS (
         |  SELECT a_id, b_id FROM ti
         |  JOIN sz sa ON sa.doc_id = ti.a_id
         |  JOIN sz sb ON sb.doc_id = ti.b_id
         |  WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.5
         |), per_r AS (
         |  SELECT 1 AS rows_per_band, a_id, b_id FROM cands_1
         |  UNION ALL SELECT 2, a_id, b_id FROM cands_2
         |  UNION ALL SELECT 4, a_id, b_id FROM cands_4
         |  UNION ALL SELECT 8, a_id, b_id FROM cands_8
         |), agg AS (
         |  SELECT rows_per_band, count(*)::BIGINT AS n_candidates,
         |    coalesce(sum(CASE WHEN t.a_id IS NOT NULL THEN 1 END), 0)::BIGINT
         |      AS n_hits
         |  FROM per_r p LEFT JOIN truth t
         |    ON t.a_id = p.a_id AND t.b_id = p.b_id
         |  GROUP BY rows_per_band
         |), rs AS (SELECT unnest([1, 2, 4, 8]) AS rows_per_band),
         |tc AS (SELECT count(*)::BIGINT AS n_true_pairs FROM truth)
         |SELECT rs.rows_per_band, CAST(8 // rs.rows_per_band AS INT) AS n_bands,
         |  coalesce(a.n_candidates, 0)::BIGINT AS n_candidates,
         |  coalesce(a.n_hits, 0)::BIGINT AS n_hits,
         |  tc.n_true_pairs,
         |  CASE WHEN coalesce(a.n_candidates, 0) > 0
         |    THEN CAST(floor(a.n_hits::DOUBLE * 1e6 / a.n_candidates::DOUBLE)
         |      AS BIGINT) ELSE 0 END AS precision_micro,
         |  CASE WHEN tc.n_true_pairs > 0
         |    THEN CAST(floor(coalesce(a.n_hits, 0)::DOUBLE * 1e6
         |      / tc.n_true_pairs::DOUBLE) AS BIGINT) ELSE 0 END AS recall_micro
         |FROM rs LEFT JOIN agg a USING (rows_per_band), tc
         |ORDER BY rs.rows_per_band""".stripMargin
    },
    "d5_simhash" ->
      s"""WITH $simhashSigsCte
         |SELECT doc_id, simhash FROM sigs ORDER BY doc_id""".stripMargin,
    "d6_simhash_pairs" ->
      s"""WITH $simhashSigsCte
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sigs a JOIN sigs b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 14
         |ORDER BY a_id, b_id""".stripMargin,
    "d7_embed_dup" ->
      s"""WITH $normVecCte,
         |${OracleFragments.lshBucketsCte(planesPerTable = 2, numTables = 8, dims = 64)},
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM lshbuckets a JOIN lshbuckets b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  JOIN vn va ON va.vec_id = a.vec_id
         |  JOIN vn vb ON vb.vec_id = b.vec_id AND vb.label = va.label
         |  WHERE a.vec_id < b.vec_id
         |)
         |SELECT a_id, b_id, cos_sim FROM (
         |  SELECT c.a_id, c.b_id,
         |    round(list_sum(list_transform(range(1, 65), i -> a.en[i] * b.en[i])), 6) AS cos_sim
         |  FROM cands c JOIN vn a ON a.vec_id = c.a_id JOIN vn b ON b.vec_id = c.b_id
         |) WHERE cos_sim >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,
    "s6_range_search" ->
      s"""WITH $normVecCte,
         |${OracleFragments.lshBucketsCte(planesPerTable = 2, numTables = 8, dims = 64)},
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM lshbuckets a JOIN lshbuckets b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  JOIN vn va ON va.vec_id = a.vec_id
         |  JOIN vn vb ON vb.vec_id = b.vec_id AND vb.label = va.label
         |  WHERE a.vec_id < b.vec_id
         |), pairs AS (
         |  SELECT a_id, b_id, cos_sim FROM (
         |    SELECT c.a_id, c.b_id,
         |      round(list_sum(list_transform(range(1, 65), i -> a.en[i] * b.en[i])), 6) AS cos_sim
         |    FROM cands c JOIN vn a ON a.vec_id = c.a_id JOIN vn b ON b.vec_id = c.b_id
         |  ) WHERE cos_sim >= 0.3
         |), sym AS (
         |  SELECT a_id AS vec_id, b_id AS nbr, cos_sim FROM pairs
         |  UNION ALL SELECT b_id AS vec_id, a_id AS nbr, cos_sim FROM pairs
         |), ranked AS (
         |  SELECT vec_id, nbr, cos_sim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, nbr ASC) AS rn,
         |    count(*) OVER (PARTITION BY vec_id) AS n_neighbors
         |  FROM sym
         |)
         |SELECT vec_id, n_neighbors, cos_sim AS best_sim, nbr AS best_id
         |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "s2_ann_lsh" ->
      s"""WITH $normVecCte,
         |${OracleFragments.lshBucketsCte(planesPerTable = 4, numTables = 8, dims = 64)},
         |cands AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM lshbuckets q JOIN lshbuckets c
         |    ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
         |), scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.en[i] * c.en[i])), 6) AS cos_sim
         |  FROM cands cand
         |  JOIN vn q ON q.vec_id = cand.query_id
         |  JOIN vn c ON c.vec_id = cand.neighbor_id
         |)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS rank
         |  FROM scored
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "s7_ann_recall" ->
      s"""WITH $normVecCte,
         |${OracleFragments.lshBucketsCte(planesPerTable = 4, numTables = 8, dims = 64)},
         |escored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.en[i] * c.en[i])), 6) AS cos_sim
         |  FROM vn q JOIN vn c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |), exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |      AS rank
         |    FROM escored
         |  ) WHERE rank <= 5
         |), acands AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM lshbuckets q JOIN lshbuckets c
         |    ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
         |), ascored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.en[i] * c.en[i])), 6) AS cos_sim
         |  FROM acands cand
         |  JOIN vn q ON q.vec_id = cand.query_id
         |  JOIN vn c ON c.vec_id = cand.neighbor_id
         |), ann AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |      AS rank
         |    FROM ascored
         |  ) WHERE rank <= 5
         |)
         |SELECT e.query_id, count(*) AS k,
         |  sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
         |  round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 6) AS recall_at_k
         |FROM exact e LEFT JOIN ann a
         |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,
    "c1_corpus_card" ->
      s"""WITH perdoc AS (
         |  SELECT source,
         |    CAST(len($toksSql) AS BIGINT) AS toks,
         |    ${OracleFragments.qualitySql} AS q,
         |    md5($normSql) AS cm,
         |    (CASE ${langScores.reverse.map { case (c, _) => s"WHEN s_$c = msc THEN '$c'" }.mkString(" ")}
         |     END) = 'en' AS is_en
         |  FROM (
         |    SELECT source, text,
         |      ${langScores.map { case (c, e) => s"$e AS s_$c" }.mkString(",\n      ")},
         |      greatest(${langScores.map { case (c, _) => s"s_$c" }.mkString(", ")}) AS msc
         |    FROM documents
         |  )
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  count(DISTINCT cm) AS n_unique_content,
         |  CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |  round(avg(q), 6) AS mean_quality,
         |  round(median(toks)::DOUBLE, 6) AS median_tokens
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "j1_jsonl_ingest" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "st5_jsonl_stream" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "p2_web_pipeline" ->
      s"""WITH $urlCanonCte,
         |pages AS (
         |  SELECT canonical_url, min(doc_id) AS doc_id,
         |    ${domainSql("canonical_url")} AS domain
         |  FROM c GROUP BY canonical_url
         |), capped AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY domain
         |      ORDER BY doc_id, canonical_url) AS rank
         |    FROM pages) WHERE rank <= 3
         |), q AS (
         |  SELECT d.doc_id FROM documents d JOIN capped USING (doc_id)
         |  WHERE ${OracleFragments.qualitySql} >= 0.5
         |)
         |SELECT 0 AS stage, 'input' AS stage_name, count(*) AS n_docs FROM documents
         |UNION ALL SELECT 1, 'url_dedup', count(*) FROM pages
         |UNION ALL SELECT 2, 'domain_cap', count(*) FROM capped
         |UNION ALL SELECT 3, 'quality', count(*) FROM q
         |ORDER BY stage""".stripMargin,
    "x21_source_upsample" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    1.0 + (${hash60("source")} % 4)::DOUBLE * 0.5 AS fac,
         |    (${hash60("'up:' || doc_id::VARCHAR")} % 1000000)::DOUBLE AS h
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, fac,
         |    floor(fac)::INT + CASE WHEN h < (fac - floor(fac)) * 1e6 THEN 1 ELSE 0 END
         |      AS n_copies
         |  FROM f
         |), ex AS (
         |  SELECT doc_id, source, fac, unnest(range(1, n_copies + 1)) AS copy
         |  FROM c WHERE n_copies > 0
         |)
         |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_rows,
         |  round(min(fac), 6) AS factor,
         |  round(count(*)::DOUBLE / count(DISTINCT doc_id), 6) AS realized_rate
         |FROM ex GROUP BY source ORDER BY source""".stripMargin,
    "st6_stream_static_dedup" ->
      s"""WITH tagged AS (SELECT doc_id, (doc_id % 10 = 7) AS is_new FROM documents),
         |ch AS (SELECT doc_id, md5($normSql) AS content_md5 FROM documents),
         |corpus_md5 AS (
         |  SELECT DISTINCT content_md5 FROM ch JOIN tagged USING (doc_id) WHERE NOT is_new
         |)
         |SELECT t.doc_id,
         |  (ch.content_md5 IN (SELECT content_md5 FROM corpus_md5)) AS is_exact_dup
         |FROM tagged t JOIN ch USING (doc_id)
         |WHERE t.is_new ORDER BY t.doc_id""".stripMargin,
    "st8_increment_dedup" ->
      s"""WITH tagged AS (SELECT doc_id, (doc_id % 10 = 7) AS is_new FROM documents),
         |ch AS (SELECT doc_id, lang, md5($normSql) AS content_md5 FROM documents),
         |corpus_md5 AS (
         |  SELECT DISTINCT content_md5 FROM ch JOIN tagged USING (doc_id) WHERE NOT is_new
         |),
         |survivors AS (
         |  SELECT DISTINCT lang, content_md5
         |  FROM ch JOIN tagged USING (doc_id) WHERE is_new
         |)
         |SELECT lang,
         |  (content_md5 IN (SELECT content_md5 FROM corpus_md5)) AS is_corpus_dup,
         |  count(*) AS n_docs
         |FROM survivors
         |GROUP BY lang, is_corpus_dup
         |ORDER BY lang, is_corpus_dup""".stripMargin,
    "st9_stream_contamination" ->
      s"""WITH tag AS (SELECT doc_id, (doc_id % 10 = 7) AS is_new FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM documents),
         |ex AS (
         |  SELECT doc_id, ('0x' || substr(md5(s_raw), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s_raw FROM sh)
         |), corpus AS (
         |  SELECT DISTINCT e.h FROM ex e JOIN tag USING (doc_id) WHERE NOT is_new
         |), newg AS (
         |  SELECT e.doc_id, e.h FROM ex e JOIN tag USING (doc_id) WHERE is_new
         |)
         |SELECT n.doc_id, count(*) AS n_grams,
         |  sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_overlap,
         |  round(sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 6) AS overlap_frac
         |FROM newg n LEFT JOIN corpus c USING (h)
         |GROUP BY n.doc_id ORDER BY doc_id""".stripMargin,
    "st10_stream_semantic_contamination" ->
      s"""WITH ${graft.OracleFragments.normVecCte},
         |${graft.OracleFragments.ivfCellsCteDynamic(AuditQuantizer.trainPredSql)},
         |ecell AS (
         |  SELECT vec_id AS eval_id, cell FROM cellassign
         |  WHERE vec_id % 10 = 7
         |), nprb AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d1 WHERE vec_id % 10 = 3) WHERE rn <= 4
         |), shits AS (
         |  SELECT p.vec_id,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> a.en[i] * b.en[i])), 6) AS cos
         |  FROM nprb p JOIN ecell ec USING (cell)
         |  JOIN vn a ON a.vec_id = p.vec_id
         |  JOIN vn b ON b.vec_id = ec.eval_id
         |)
         |SELECT vec_id, count(*) AS n_eval_matches, max(cos) AS max_cos
         |FROM shits WHERE cos >= 0.3
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "u1_url_dedup" ->
      s"""WITH $urlCanonCte
         |SELECT canonical_url, min(doc_id) AS survivor_id, count(*) AS n_docs
         |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,
    "u2_domain_stats" ->
      s"""WITH $urlCanonCte
         |SELECT
         |  ${domainSql("canonical_url")} AS domain,
         |  count(*) AS n_urls,
         |  count(DISTINCT canonical_url) AS n_pages
         |FROM c GROUP BY domain ORDER BY domain""".stripMargin,
    "d12_line_dedup" ->
      s"""WITH ln AS (
         |  SELECT doc_id, source, $rawToksLowerSql AS toks FROM documents
         |), lns AS (
         |  SELECT doc_id,
         |    ['begin newsletter ' || source] ||
         |    list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
         |      l -> array_to_string(toks[l * 8 + 1 : l * 8 + 8], ' ')) ||
         |    ['unsubscribe footer ' || (doc_id % 2)::VARCHAR] AS lines
         |  FROM ln
         |), ex AS (
         |  SELECT doc_id, unnest(lines) AS line,
         |    unnest(range(1, len(lines) + 1)) AS pos
         |  FROM lns
         |), boiler AS (
         |  SELECT ${hash60("line")} AS lh
         |  FROM (SELECT DISTINCT line, doc_id FROM ex)
         |  GROUP BY lh HAVING count(*) >= 5
         |), kept AS (
         |  SELECT doc_id, pos, line FROM ex
         |  WHERE ${hash60("line")} NOT IN (SELECT lh FROM boiler)
         |), reb AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT l.doc_id, CAST(len(l.lines) AS BIGINT) AS n_lines,
         |  coalesce(r.n_kept, 0) AS n_kept,
         |  coalesce(r.clean_md5, md5('')) AS clean_md5
         |FROM lns l LEFT JOIN reb r ON l.doc_id = r.doc_id
         |ORDER BY l.doc_id""".stripMargin,
    "x18_domain_cap" ->
      s"""WITH $urlCanonCte,
         |pages AS (
         |  SELECT canonical_url, min(doc_id) AS survivor_id
         |  FROM c GROUP BY canonical_url
         |), dom AS (
         |  SELECT ${domainSql("canonical_url")} AS domain,
         |    canonical_url, survivor_id
         |  FROM pages
         |)
         |SELECT domain, canonical_url, survivor_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY domain
         |    ORDER BY survivor_id, canonical_url) AS rank
         |  FROM dom
         |) WHERE rank <= 3 ORDER BY domain, rank""".stripMargin,
    "c2_length_histogram" ->
      s"""WITH b AS (
         |  SELECT source, CAST(least(n_chars // 128, 15) AS BIGINT) AS bucket
         |  FROM documents
         |), g AS (
         |  SELECT source, bucket, count(*) AS n_docs FROM b GROUP BY source, bucket
         |)
         |SELECT source, bucket, bucket * 128 AS bucket_lo, n_docs,
         |  round(n_docs / sum(n_docs) OVER (PARTITION BY source), 6) AS share
         |FROM g ORDER BY source, bucket""".stripMargin,
    "s4_ann_lsh_multiprobe" ->
      s"""WITH $normVecCte,
         |${OracleFragments.lshBucketsCte(planesPerTable = 4, numTables = 8, dims = 64)},
         |qpro AS (
         |  SELECT vec_id, tbl,
         |    unnest([bucket, xor(bucket, 1::BIGINT), xor(bucket, 2::BIGINT),
         |            xor(bucket, 4::BIGINT), xor(bucket, 8::BIGINT)]) AS bucket
         |  FROM lshbuckets WHERE vec_id < 20
         |), cands AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qpro q JOIN lshbuckets c
         |    ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id <> c.vec_id
         |), scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.en[i] * c.en[i])), 6) AS cos_sim
         |  FROM cands cand
         |  JOIN vn q ON q.vec_id = cand.query_id
         |  JOIN vn c ON c.vec_id = cand.neighbor_id
         |)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS rank
         |  FROM scored
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "s10_pq_adc" ->
      s"""WITH $normVecCte,
         |${OracleFragments.pqCtes},
         |scored AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, 17),
         |      j -> q.luts[j][n.codes[j] + 1])), 6) AS approx_cos
         |  FROM luts q JOIN codes n ON q.query_id <> n.vec_id
         |)
         |, shortlist AS (
         |  SELECT query_id, neighbor_id, approx_cos,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> qe.en[i] * ne.en[i])), 6) AS cos_sim
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY approx_cos DESC, neighbor_id) AS adc_rank
         |    FROM scored
         |  ) s
         |  JOIN vn qe ON qe.vec_id = s.query_id
         |  JOIN vn ne ON ne.vec_id = s.neighbor_id
         |  WHERE adc_rank <= 32
         |)
         |SELECT query_id, neighbor_id, approx_cos, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM shortlist
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "s5_quantized_cosine" ->
      s"""WITH $normVecCte,
         |qt AS (
         |  SELECT vec_id, en,
         |    list_max(list_transform(en, x -> abs(x))) / 127.0 AS scale
         |  FROM vn
         |), qv AS (
         |  SELECT vec_id, en, scale,
         |    CASE WHEN scale > 0
         |      THEN list_transform(en, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
         |      ELSE list_transform(en, x -> CAST(0 AS BIGINT)) END AS qv
         |  FROM qt
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.qv[i]))
         |      * q.scale * c.scale, 6) AS approx_cos,
         |    q.en AS q_en, c.en AS c_en
         |  FROM qv q JOIN qv c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |)
         |SELECT query_id, neighbor_id, approx_cos,
         |  round(list_sum(list_transform(range(1, 65), i -> q_en[i] * c_en[i])), 6) AS cos_sim,
         |  rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY approx_cos DESC, neighbor_id) AS rank
         |  FROM scored
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "s1_cosine_topk" ->
      s"""WITH $normVecCte,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, 65), i -> q.en[i] * c.en[i])), 6) AS cos_sim
         |  FROM vn q JOIN vn c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS rank
         |  FROM scored
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e1_centroids" ->
      s"""WITH byd AS (
         |  SELECT label, i AS pos, sum(e[i::INT]) AS sx, count(*) AS n
         |  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
         |  CROSS JOIN range(1, 65) r(i)
         |  GROUP BY label, i
         |)
         |SELECT label, max(n) AS n_vectors,
         |  round(sqrt(sum((sx / n) * (sx / n))), 6) AS centroid_norm
         |FROM byd GROUP BY label ORDER BY label""".stripMargin,
    "x5_word_topk" ->
      s"""SELECT word, count(*) AS n
         |FROM (SELECT unnest($toksSql) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "p1_doc_pipeline" ->
      s"""WITH survivors AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)
         |), scored AS (
         |  SELECT doc_id, source, text,
         |    round(least(length(text)::DOUBLE / 1000.0, 1.0) * 0.4
         |        + least((CASE WHEN len($rawToksLowerSql) > 0
         |            THEN len(list_filter($rawToksLowerSql, x -> list_contains($stopListSql, x)))::DOUBLE
         |                 / len($rawToksLowerSql) ELSE 0.0 END) * 4.0, 1.0) * 0.3
         |        + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
         |            THEN len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE / length(text)
         |            ELSE 0.0 END) * 10.0) * 0.3, 6) AS q,
         |    ${langScores.map { case (c, e) => s"$e AS s_$c" }.mkString(",\n    ")},
         |    greatest(${langScores.map { case (c, _) => s"s_$c" }.mkString(", ")}) AS msc
         |  FROM documents
         |)
         |SELECT source, count(*) AS n_selected,
         |  round(avg(length(text)), 6) AS avg_len
         |FROM scored JOIN survivors USING (doc_id)
         |WHERE q >= 0.5
         |  AND (CASE ${langScores.reverse.map { case (c, _) => s"WHEN s_$c = msc THEN '$c'" }.mkString(" ")} END) = 'en'
         |GROUP BY source ORDER BY source""".stripMargin,
    "m6_media_dedup" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id,
         |    (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS media_type,
         |    md5('media:' || (doc_id // 4)::VARCHAR) AS content_md5,
         |    (((doc_id // 4) % 50 + 10) * 1024)::BIGINT AS payload_bytes
         |  FROM documents
         |), per_hash AS (
         |  SELECT media_type, content_md5, count(*) AS n_copies,
         |    min(payload_bytes) AS bytes
         |  FROM media GROUP BY media_type, content_md5
         |)
         |SELECT media_type,
         |  sum(n_copies)::BIGINT AS n_items,
         |  count(*) AS n_unique,
         |  (sum(n_copies) - count(*))::BIGINT AS n_dup_items,
         |  sum(n_copies * bytes)::BIGINT AS bytes_total,
         |  sum(bytes)::BIGINT AS bytes_after_dedup,
         |  round(1.0 - sum(bytes)::DOUBLE / sum(n_copies * bytes), 6) AS dedup_savings
         |FROM per_hash GROUP BY media_type ORDER BY media_type""".stripMargin,
    "m1_media_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  160 + (((ascii(substr(md5(text), 1, 1)) << 8) | ascii(substr(md5(text), 2, 1))) % 8) * 160 AS width,
         |  120 + (((ascii(substr(md5(text), 3, 1)) << 8) | ascii(substr(md5(text), 4, 1))) % 8) * 120 AS height,
         |  CASE WHEN ascii(substr(md5(text), 1, 1)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
         |  32 AS payload_len
         |FROM documents ORDER BY media_id""".stripMargin,
    "m2_media_features" ->
      """SELECT doc_id AS media_id, 16 AS feature_dim
        |FROM documents ORDER BY media_id""".stripMargin,
    "m5_interleaved" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS t FROM documents
         |), ins AS (
         |  SELECT doc_id,
         |    CAST(doc_id % ((CASE WHEN len(t) > 0
         |      THEN (len(t) - 1) // 64 + 1 ELSE 0 END) + 1) AS INT) AS insert_pos
         |  FROM toks
         |), starts AS (
         |  SELECT doc_id, t, unnest(range(0, len(t), 64)) AS st
         |  FROM toks WHERE len(t) > 0
         |), chunks AS (
         |  SELECT doc_id, CAST(st // 64 AS INT) AS chunk_id,
         |    CAST(least(64, len(t) - st) AS BIGINT) AS chunk_len,
         |    array_to_string(t[st + 1 : st + 64], ' ') AS chunk_text
         |  FROM starts
         |), textel AS (
         |  SELECT c.doc_id,
         |    CAST(c.chunk_id + CASE WHEN c.chunk_id >= i.insert_pos
         |      THEN 1 ELSE 0 END AS INT) AS seq_pos,
         |    'text' AS modality, c.chunk_len AS n_tokens,
         |    md5(c.chunk_text) AS fp
         |  FROM chunks c JOIN ins i USING (doc_id)
         |), mediael AS (
         |  SELECT d.doc_id, i.insert_pos AS seq_pos,
         |    CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS modality,
         |    (CASE d.doc_id % 3 WHEN 0 THEN 64 WHEN 1 THEN 128
         |      ELSE 256 END)::BIGINT AS n_tokens,
         |    md5(d.text) AS fp
         |  FROM documents d JOIN ins i USING (doc_id)
         |)
         |SELECT doc_id, seq_pos, modality, n_tokens, fp FROM (
         |  SELECT * FROM textel UNION ALL SELECT * FROM mediael)
         |ORDER BY doc_id, seq_pos""".stripMargin,
    "x30_c4_rules" ->
      s"""WITH tl AS (
         |  SELECT doc_id, $rawToksLowerSql AS toks FROM documents
         |), lns AS (
         |  SELECT doc_id,
         |    list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
         |      l -> (CASE WHEN doc_id % 7 = 0 AND l = 0 THEN 'javascript ' ELSE '' END) ||
         |           array_to_string(toks[l * 8 + 1 : l * 8 + 8], ' ') ||
         |           (['.', '!', '?', ''])[CAST((doc_id + l) % 4 AS INT) + 1]) ||
         |    (CASE WHEN doc_id % 11 = 0 THEN ['lorem ipsum dolor sit amet.'] ELSE []::VARCHAR[] END) ||
         |    (CASE WHEN doc_id % 13 = 0 THEN ['var page = { config: true };'] ELSE []::VARCHAR[] END) ||
         |    (CASE WHEN doc_id % 17 = 0 THEN ['this line mentions badword1 explicitly.'] ELSE []::VARCHAR[] END) AS lines
         |  FROM tl
         |), ev AS (
         |  SELECT doc_id, lines,
         |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$$')
         |      AND len(string_split(l, ' ')) >= 5
         |      AND NOT regexp_matches(lower(l), '\\bjavascript\\b')) AS kept_lines,
         |    len(list_filter(lines, l -> contains(lower(l), 'lorem ipsum'))) > 0 AS has_lorem,
         |    len(list_filter(lines, l -> contains(l, '{'))) > 0 AS has_brace,
         |    len(list_filter(lines, l -> regexp_matches(lower(l), 'badword1|badword2'))) > 0 AS has_badword
         |  FROM lns
         |)
         |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept_lines) AS BIGINT) AS n_kept,
         |  has_lorem, has_brace, has_badword,
         |  (len(kept_lines) >= 3 AND NOT has_lorem AND NOT has_brace
         |    AND NOT has_badword) AS kept,
         |  md5(coalesce(array_to_string(kept_lines, chr(10)), '')) AS clean_md5
         |FROM ev ORDER BY doc_id""".stripMargin,
    "x31_ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |tot AS (SELECT count(*)::DOUBLE AS n_total FROM toks),
         |freq AS (SELECT w, count(*) AS cf FROM toks GROUP BY w),
         |lm AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    round(sum(round(ln(cf / n_total) * 1e6)::BIGINT)::DOUBLE
         |          / (count(*) * 1e6), 6) AS avg_logprob
         |  FROM toks JOIN freq USING (w), tot GROUP BY doc_id
         |), bk AS (
         |  SELECT d.doc_id, d.source, lm.n_tokens, lm.avg_logprob,
         |    ntile(3) OVER (PARTITION BY d.source
         |                   ORDER BY lm.avg_logprob DESC, d.doc_id) AS bucket
         |  FROM lm JOIN documents d USING (doc_id)
         |)
         |SELECT doc_id, source, n_tokens, avg_logprob, bucket,
         |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |              ELSE 'tail' END AS bucket_name
         |FROM bk ORDER BY doc_id""".stripMargin,
    "x32_unimax_mix" ->
      s"""WITH cnt AS (
         |  SELECT lang, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang
         |), ranked AS (
         |  SELECT lang, n_tokens, n_tokens::DOUBLE * 1.0 AS cap,
         |    row_number() OVER (ORDER BY n_tokens::DOUBLE * 1.0, lang) AS i,
         |    sum(n_tokens::DOUBLE * 1.0) OVER (ORDER BY n_tokens::DOUBLE * 1.0, lang
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         |    count(*) OVER () AS n,
         |    sum(n_tokens) OVER ()::DOUBLE * 0.75 AS b
         |  FROM cnt
         |), flg AS (
         |  SELECT *, (p + (n - i) * cap <= b) AS sat FROM ranked
         |), kr AS (
         |  SELECT coalesce(max(CASE WHEN sat THEN i END), 0) AS k,
         |    coalesce(max(CASE WHEN sat THEN p END), 0.0) AS pk,
         |    max(b) AS bb, max(n) AS nn
         |  FROM flg
         |), lv AS (
         |  SELECT CASE WHEN nn > k THEN (bb - pk) / (nn - k)
         |              ELSE 1.7976931348623157e308 END AS level
         |  FROM kr
         |)
         |SELECT f.lang, f.n_tokens, f.cap,
         |  round(least(f.cap, lv.level), 6) AS alloc,
         |  round(round(least(f.cap, lv.level), 6) / f.n_tokens, 6) AS epochs,
         |  (f.cap <= lv.level) AS capped
         |FROM flg f, lv ORDER BY lang""".stripMargin,
    "x41_temperature_mix" ->
      s"""WITH cnt AS (
         |  SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM cnt
         |), w AS (
         |  SELECT t.temperature, c.source, c.n_tokens, tot.total,
         |    CAST(floor(CASE t.temperature
         |      WHEN 1 THEN c.n_tokens::DOUBLE / tot.total::DOUBLE
         |      WHEN 2 THEN sqrt(c.n_tokens::DOUBLE / tot.total::DOUBLE)
         |      ELSE sqrt(sqrt(c.n_tokens::DOUBLE / tot.total::DOUBLE))
         |    END * 1e6) AS BIGINT) AS w_micro
         |  FROM cnt c, tot, (SELECT unnest([1, 2, 4]) AS temperature) t
         |), p AS (
         |  SELECT temperature, source, n_tokens, total,
         |    CAST(floor(w_micro::DOUBLE * 1e6 /
         |      (sum(w_micro) OVER (PARTITION BY temperature))::DOUBLE)
         |      AS BIGINT) AS p_micro
         |  FROM w
         |)
         |SELECT temperature, source, n_tokens, p_micro,
         |  CAST(floor(p_micro::DOUBLE * total::DOUBLE / n_tokens::DOUBLE)
         |    AS BIGINT) AS epochs_micro
         |FROM p ORDER BY temperature, source""".stripMargin)
}
