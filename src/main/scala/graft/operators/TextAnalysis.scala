package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization counts, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions (codegen'd, no UDFs, no shuffles): at
  * 100 TB these run as map-only passes over the document scan, so
  * throughput is bounded by parquet decode, not by the operators.
  */
object TextAnalysis {

  /** Lowercased, whitespace-collapsed, trimmed canonical text. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens (empty strings dropped). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish sub-word proxy: runs of alphanumerics or single
    * punctuation marks (the pre-tokenizer shape BPE vocabularies use).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "it",
    "for", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Stopword ratio over whitespace tokens (0 when no tokens) — ONE
    * tokenization and ONE array pass per row. Token and stopword counts
    * accumulate together inside a single `aggregate` and the ratio is
    * formed in its finish lambda, so when the optimizer pushes a
    * quality predicate through a projection and alias-inlines this
    * expression, the row still pays one regex split (the staged
    * three-reference form re-tokenized 3× per row after inlining —
    * same hazard langId had, same kernel-shape fix). Split's empty-
    * string artifacts are counted out in the fold; values are
    * bit-identical to the filtered form.
    */
  def stopwordRatio(text: Column): Column =
    aggregate(
      split(lower(text), "\\s+"),
      typedlit(Seq(0L, 0L)),
      (acc, t) => array(
        element_at(acc, 1) + when(t =!= "", 1L).otherwise(0L),
        element_at(acc, 2) + when(t.isInCollection(stopwords), 1L).otherwise(0L)),
      acc => when(element_at(acc, 1) > 0,
        element_at(acc, 2).cast("double") / element_at(acc, 1).cast("double"))
        .otherwise(0.0))

  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0))).cast("double") / length(text))
      .otherwise(0.0)

  /** Mean token length — single-pass kernel (see [[stopwordRatio]]):
    * one split, counts and length-sum in one fold. length("") = 0, so
    * skipping split's empty artifacts in the count leaves the sum
    * untouched and values identical to the two-reference form.
    */
  def meanWordLength(text: Column): Column =
    aggregate(
      split(text, "\\s+"),
      typedlit(Seq(0L, 0L)),
      (acc, t) => array(
        element_at(acc, 1) + when(t =!= "", 1L).otherwise(0L),
        element_at(acc, 2) + length(t)),
      acc => when(element_at(acc, 1) > 0,
        element_at(acc, 2).cast("double") / element_at(acc, 1).cast("double"))
        .otherwise(0.0))

  /** Composite quality score in [0,1]: favors mid-length documents with
    * normal punctuation density and some (but not all) stopwords — the
    * usual heuristic pre-filter before model-based quality scoring.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 1000.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    round((lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.3), 6)
  }

  /** Per-group exact interpolated quantile WITHOUT an in-memory
    * percentile aggregator: Spark's `percentile` holds every group
    * value in executor memory (lethal when a group is a whole source
    * at corpus scale), so this computes the same quantile_cont value
    * with a window sort — rank each value within its group, pick the
    * two positional values the quantile interpolates between
    * (rn = floor/ceil((n-1)p) + 1), and lerp. The sort is a spillable
    * per-group shuffle, never a per-group array.
    *
    * Returns one row per group: (groupCol, n, threshold), threshold
    * rounded 6 dp. The arithmetic (lo + frac * (hi - lo)) is exactly
    * DuckDB's quantile_cont, so the oracle can replay it bit-for-bit.
    */
  def quantileThreshold(
      df: DataFrame, p: Double, groupCol: String,
      valueCol: String): DataFrame = {
    require(p >= 0 && p <= 1, s"quantile p must be in [0,1], got $p")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val k = (col("n") - 1) * lit(p)
    df
      // drop NULL values first: percentile()/quantile_cont ignore
      // nulls, but a window rank counts them (ascending NULLS FIRST),
      // which would shift the pick — or NULL the threshold outright
      // when the rank lands on a null row
      .where(col(valueCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .groupBy(groupCol)
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === floor(k) + 1, col(valueCol))).as("v_lo"),
        min(when(col("rn") === ceil(k) + 1, col(valueCol))).as("v_hi"))
      .select(col(groupCol), col("n"),
        round(col("v_lo") +
          ((col("n") - 1) * lit(p) - floor((col("n") - 1) * lit(p))) *
            (col("v_hi") - col("v_lo")), 6).as("threshold"))
  }

  /** Exact interpolated quantile for FEW, HUGE groups — the shape
    * [[quantileThreshold]] serializes on: a window partitioned by a
    * 3-value group column sorts each group in ONE task (measured: q19
    * at sf1 took 27.5 s against the buffering aggregate's 14.9 s —
    * memory-safe but parallelism-3). This variant brackets the target
    * rank with `percentile_approx` first (GK sketch, published rank
    * error <= n/accuracy, so a ±0.05-quantile band around p contains
    * the target with enormous margin at accuracy 10000), counts rows
    * strictly below the band EXACTLY (a map-side-combinable
    * aggregate), and window-sorts ONLY the band rows — 0.1%-ish of
    * each group — whose global rank is then n_below + band rank. Same
    * quantile_cont lerp as quantileThreshold, bit-for-bit the DuckDB
    * replay; if the band ever misses the target ranks (it cannot,
    * per the sketch bound, but belt-and-braces) the picked values are
    * NULL and raise_error makes the miss loud instead of silently
    * wrong. Three parallel scans + a tiny sort replace one
    * group-count-partitioned global sort.
    */
  def quantileThresholdBanded(
      df: DataFrame, p: Double, groupCol: String, valueCol: String,
      accuracy: Int = 10000): DataFrame = {
    require(p >= 0 && p <= 1, s"quantile p must be in [0,1], got $p")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val pLo = math.max(0.0, p - 0.05)
    val pHi = math.min(1.0, p + 0.05)
    val rows = df.where(v.isNotNull)
    val appx = rows.groupBy(groupCol).agg(
        percentile_approx(v, typedlit(Seq(pLo, pHi)), lit(accuracy))
          .as("_band"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        element_at(col("_band"), 1).as("_lo"),
        element_at(col("_band"), 2).as("_hi"))
    val joined = rows.join(broadcast(appx), Seq(groupCol))
    val below = joined.groupBy(groupCol)
      .agg(sum(when(v < col("_lo"), 1L).otherwise(0L)).as("n_below"))
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val k = (col("n") - 1) * lit(p)
    val picked = joined.where(v >= col("_lo") && v <= col("_hi"))
      .withColumn("_r", row_number().over(w))
      .join(broadcast(below), Seq(groupCol))
      .withColumn("_gr", col("_r") + col("n_below"))
      .groupBy(groupCol)
      .agg(max(col("n")).as("n"),
        min(when(col("_gr") === floor(k) + 1, v)).as("v_lo"),
        min(when(col("_gr") === ceil(k) + 1, v)).as("v_hi"))
    picked.select(col(groupCol), col("n"),
      when(col("v_lo").isNotNull && col("v_hi").isNotNull,
        round(col("v_lo") +
          ((col("n") - 1) * lit(p) - floor((col("n") - 1) * lit(p))) *
            (col("v_hi") - col("v_lo")), 6))
        .otherwise(raise_error(concat(lit(
          s"quantileThresholdBanded: the approx band missed the target rank for $groupCol="),
          col(groupCol).cast("string"))))
        .as("threshold"))
  }

  /** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
    * vocabulary-construction step of a training-data pipeline. Classic
    * BPE over the WORD-COUNT table: words become symbol strings, and
    * each step merges the globally most frequent adjacent symbol pair
    * (count desc, pair asc on ties — fully deterministic). Returns the
    * merge table (step, lhs, rhs, merged, pair_count), the artifact a
    * tokenizer trainer ships.
    *
    * Symbols are joined by TWO spaces with one space at each end
    * (" a  b  c "). That spacing is what makes a plain non-overlapping
    * replace of " l  r " -> " lr " EXACTLY classic greedy left-to-right
    * merging: the match consumes only the second space of the gap
    * before `l` and the first of the gap after `r`, so the very next
    * pair is still matchable and adjacent repeats merge like
    * subword-nmt's lookaround regex (" a  a  a  a " -> " aa  aa ", not
    * the alternate-merge a single-spaced replace would give). No
    * lookarounds needed, so Java regex (pattern literal-quoted) and
    * SQL replace() share the semantics and the oracle unrolls the same
    * steps.
    *
    * Scale shape: the corpus collapses to DISTINCT WORDS x counts in
    * one shuffle, and every iteration runs on that vocab table — pair
    * counting is an explode + one groupBy over |vocab| rows, never
    * corpus rows. The driver holds exactly ONE row per step (the
    * argmax pair), the same bounded-collect exception as k-means
    * centroids. The symbolized vocab is localCheckpoint'ed every
    * `checkpointEvery` steps (the Graph.connectedComponents pattern,
    * superseded checkpoints freed eagerly), so each step's job replays
    * at most `checkpointEvery - 1` pending regexp_replaces over the
    * last materialization — per-step cost is flat in the step index
    * (O(k) total recompute), where the unchecked-pointed loop was
    * O(k^2) with a k-deep plan and could not survive a realistic
    * 32k-merge vocabulary.
    */
  def bpeMerges(
      docs: DataFrame, steps: Int, textCol: String = "text",
      checkpointEvery: Int = 8): DataFrame = {
    require(steps > 0, "bpeMerges: steps must be positive")
    require(checkpointEvery > 0, "bpeMerges: checkpointEvery must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .select(explode(wsTokens(normalize(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit(" "), trim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" "))
          .as("sym"),
        col("cnt"))
      .persist()
    var vocab = base
    // the last checkpoint backing `vocab`'s lineage; superseded ones
    // are dead the moment the next materializes and are freed eagerly
    // (local checkpoints bypass the cache manager, see GraftShims)
    var ckpt: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    try {
      var step = 0
      var exhausted = false
      while (step < steps && !exhausted) {
        val syms = filter(split(col("sym"), " "), s => s =!= "")
        val pairs = when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            j => concat(element_at(syms, j), lit(" "), element_at(syms, j + 1))))
          .otherwise(array().cast("array<string>"))
        val top = vocab.select(col("cnt"), explode(pairs).as("pair"))
          .groupBy("pair").agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val c = top(0).getLong(1)
          val Array(l, r) = pair.split(" ", 2)
          merges += ((step, l, r, l + r, c))
          vocab = vocab.withColumn("sym",
            regexp_replace(col("sym"),
              java.util.regex.Pattern.quote(s" $l  $r "),
              java.util.regex.Matcher.quoteReplacement(s" ${l + r} ")))
          step += 1
          if (step % checkpointEvery == 0 && step < steps) {
            val next = vocab.localCheckpoint() // eager: materializes now
            ckpt.foreach(org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint)
            ckpt = Some(next)
            vocab = next
          }
        }
      }
      merges.result().toDF("step", "lhs", "rhs", "merged", "pair_count")
    } finally {
      base.unpersist()
      // the merge table lives on the driver; no returned plan reads the
      // vocab, so the final checkpoint is freed too
      ckpt.foreach(org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint)
    }
  }

  /** Apply [[bpeMerges]]' learned merge table to the per-source word
    * table and report the compression it buys: characters vs
    * post-merge symbols per source — the "is this tokenizer worth it
    * on this slice" check. The merge table is k driver rows; applying
    * it is k chained replaces over the vocab-scale (source, word)
    * table, never the corpus — with a localCheckpoint every 16 merges
    * so a large-k apply keeps a bounded expression chain instead of a
    * k-deep regexp_replace nest (the final checkpoint backs the lazy
    * result and is reclaimed by the ContextCleaner when the caller
    * drops it, same as Graph.connectedComponents' returned labels).
    */
  def bpeCompression(
      docs: DataFrame, steps: Int, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val merges = bpeMerges(docs, steps, textCol).orderBy("step").collect()
    var words = docs
      .select(col(sourceCol),
        explode(wsTokens(normalize(col(textCol)))).as("w"))
      .groupBy(sourceCol, "w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        concat(lit(" "), trim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" ")))
    var ckpt: Option[DataFrame] = None
    merges.zipWithIndex.foreach { case (m, i) =>
      words = words.withColumn("sym",
        regexp_replace(col("sym"),
          java.util.regex.Pattern.quote(s" ${m.getString(1)}  ${m.getString(2)} "),
          java.util.regex.Matcher.quoteReplacement(s" ${m.getString(3)} ")))
      if ((i + 1) % 16 == 0 && i + 1 < merges.length) {
        val next = words.localCheckpoint()
        ckpt.foreach(org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint)
        ckpt = Some(next)
        words = next
      }
    }
    val nSyms = size(filter(split(col("sym"), " "), s => s =!= ""))
    words.groupBy(sourceCol)
      .agg(sum(col("cnt") * length(col("w"))).as("n_chars"),
        sum(col("cnt") * nSyms).as("n_symbols"))
      .select(col(sourceCol), col("n_chars"), col("n_symbols"),
        round(col("n_symbols").cast("double") / col("n_chars").cast("double"), 6)
          .as("symbols_per_char"))
  }

  /** Marker-word language profiles (n-gram heuristic stand-in; the
    * synthetic corpus is keyword soup, so profiles are deterministic
    * token matches rather than real character n-grams).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreFromTokens(wsTokens(lower(text)), markers)

  private def langScoreFromTokens(toks: Column, markers: Seq[String]): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(markers))).cast("double") / size(toks))
      .otherwise(0.0)

  /** Predicted language = argmax marker score; ties break
    * deterministically to the greatest language code (lexicographic max
    * of the (score, code) pair — same rule an SQL max(struct) applies).
    *
    * Single-pass kernel: the token array is referenced EXACTLY ONCE in
    * the whole expression tree (one `aggregate` whose merge counts
    * every language's markers and whose finish computes the argmax
    * struct from the accumulator lambda variable). This matters because
    * the optimizer freely re-inlines aliased expressions — a pushed
    * Filter predicate substitutes the alias body once per reference
    * (PushPredicateThroughNonJoin has no cheapness guard, unlike
    * CollapseProject), and lambda HOF subtrees are not subexpression-
    * eliminated. The earlier per-language `size(filter(...))` form hit
    * ~15 regex splits per row whenever an optimizer rule inlined it;
    * this form costs one split per row under ANY inlining.
    */
  def langId(text: Column): Column = langIdFromTokens(wsTokens(lower(text)))

  /** [[langId]] over an already-staged token-array column. Staging is
    * no longer load-bearing (the kernel reads the array once) but keeps
    * plans readable when several stages share the tokens.
    */
  def langIdFromTokens(toks: Column): Column = {
    val codes = langMarkers.toSeq.sortBy(_._1)
    // acc(0) = total tokens, acc(i+1) = marker hits for codes(i)
    val init = typedlit(Seq.fill(codes.size + 1)(0L))
    aggregate(
      toks,
      init,
      (acc, t) => array(
        (element_at(acc, 1) + lit(1L)) +:
          codes.zipWithIndex.map { case ((_, markers), i) =>
            element_at(acc, i + 2) +
              when(t.isInCollection(markers), 1L).otherwise(0L)
          }: _*),
      acc => {
        val total = element_at(acc, 1)
        val scored = codes.zipWithIndex.map { case ((code, _), i) =>
          struct(
            when(total > 0, element_at(acc, i + 2).cast("double") / total)
              .otherwise(0.0).as("score"),
            lit(code).as("code"))
        }
        array_max(array(scored: _*))
      })
  }

  /** 128-bit content fingerprint of normalized text + a 60-bit integer
    * form (first 15 hex digits) for compact joins.
    */
  def fingerprintMd5(text: Column): Column = md5(normalize(text).cast("binary"))

  def fingerprint64(text: Column): Column =
    conv(substring(fingerprintMd5(text), 1, 15), 16, 10).cast("bigint")

  // --- repetition flags (Gopher-style quality rules) -------------------

  /** Per-document repetition fractions — the degenerate-text signals
    * repetition-heavy quality filters key on: fraction of the document
    * covered by its single most frequent word / bigram, and the
    * duplicate-trigram fraction (1 - distinct/total). Three
    * grouped-count passes sharing the one doc_id exchange the gram
    * core already pays; zero extra shuffle kinds. Documents too short
    * for an n-gram count their normalized text as the single gram
    * (fraction 1), matching the dedup family's small-doc rule.
    */
  def repetitionStats(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    def topFrac(grams: org.apache.spark.sql.DataFrame, out: String) =
      grams.groupBy(id, col("s")).agg(count(lit(1)).as("c"))
        .groupBy(id).agg((max(col("c")) / sum(col("c"))).as(out))
    val words = docs
      .select(id, explode(wsTokens(normalize(col(textCol)))).as("s"))
    val topWord = topFrac(words, "top_word_frac")
    // gram identity = the 60-bit kernel hash, not the gram string: the
    // count/countDistinct exchanges carry (id, long) rows and the gram
    // construction is window-free (the oracle counts the same hashes)
    val topBigram = topFrac(
      Dedup.gramHashRows(docs, 2, idCol, textCol)
        .select(id, col("h").as("s")), "top_bigram_frac")
    val dupTrigram = Dedup.gramHashRows(docs, 3, idCol, textCol)
      .groupBy(id)
      .agg((lit(1.0) - countDistinct(col("h")) / count(lit(1))).as("dup_3gram_frac"))
    docs.select(id)
      .join(topWord, Seq(idCol), "left")
      .join(topBigram, Seq(idCol), "left")
      .join(dupTrigram, Seq(idCol), "left")
      .select(id,
        round(coalesce(col("top_word_frac"), lit(0.0)), 6).as("top_word_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"),
        round(coalesce(col("dup_3gram_frac"), lit(0.0)), 6).as("dup_3gram_frac"))
  }

  // --- unigram language-model scoring ----------------------------------

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram distribution — the CCNet-style perplexity proxy: fluent,
    * typical documents score high; rare-token noise scores low.
    *
    * Shape: one token-frequency aggregate (vocab-sized), the corpus
    * token count as a one-row broadcast, then a hash join of the token
    * stream against the frequency table and one groupBy(doc). For
    * cross-engine determinism each term's ln(cf/N) is quantized to an
    * exact INTEGER number of micro-nats before the per-doc sum — long
    * addition commutes, so shuffle order can't move the result (sums
    * of raw doubles are order-dependent; the q25 integer-cents rule).
    */
  def unigramLogProb(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol),
      explode(wsTokens(normalize(col(textCol)))).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cf"))
    // n_total = sum of the vocab counts — derived from the (small)
    // frequency aggregate rather than a third scan of the token stream
    val total = freq.select(sum(col("cf")).cast("double").as("n_total"))
    val microNats = round(log(col("cf") / col("n_total")) * 1e6).cast("long")
    toks.join(freq, "w")
      .crossJoin(broadcast(total))
      .select(col(idCol), microNats.as("lq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lq")).as("slq"))
      .select(col(idCol), col("n_tokens"),
        round(col("slq").cast("double") / (col("n_tokens") * 1e6), 6)
          .as("avg_logprob"))
  }

  /** Gopher-style quality rule flags (Rae et al. 2021, appendix A1.1
    * "quality filtering heuristics", the deterministic subset): per
    * document — word count in [minWords, maxWords], mean word length
    * in [3, 10], fraction of words containing an alphabetic character
    * >= 0.8, at least 2 DISTINCT stopwords present, and
    * symbol-to-word ratio (# and ellipsis) < 0.1. Output carries each
    * rule flag plus the conjunction `kept`, so a pipeline can filter
    * on `kept` while a data card reports which rule rejects what.
    *
    * Shape: explode tokens once, every statistic is an aggregate of
    * the SAME grouped pass (one exchange on the doc id) — per-doc
    * array lambdas would re-tokenize per element under
    * CollapseProject (the shingles() trap), quadratic in doc length.
    * Zero-token docs rejoin with kept = false (word count 0).
    */
  def gopherFlags(
      docs: org.apache.spark.sql.DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol),
      explode(wsTokens(normalize(col(textCol)))).as("w"))
    val stats = toks.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_words"),
      round(sum(length(col("w"))).cast("double") / count(lit(1)), 6)
        .as("mean_word_len"),
      round(sum(when(col("w").rlike("[a-z]"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("frac_alpha_words"),
      countDistinct(when(col("w").isin(stopwords: _*), col("w")))
        .as("n_stop_distinct"),
      round(sum(when(col("w").rlike("#|\\.\\.\\."), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("symbol_word_ratio"))
    // flags evaluate on the COALESCED stats (a zero-token doc has
    // symbol ratio 0.0, which passes that one rule on either engine —
    // kept is still false via the word-count rule)
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("mean_word_len"), lit(0.0)).as("mean_word_len"),
        coalesce(col("frac_alpha_words"), lit(0.0)).as("frac_alpha_words"),
        coalesce(col("n_stop_distinct"), lit(0L)).as("n_stop_distinct"),
        coalesce(col("symbol_word_ratio"), lit(0.0)).as("symbol_word_ratio"))
      .withColumn("pass_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_alpha_words", col("frac_alpha_words") >= 0.8)
      .withColumn("pass_stopwords", col("n_stop_distinct") >= 2)
      .withColumn("pass_symbol_ratio", col("symbol_word_ratio") < 0.1)
      .withColumn("kept",
        col("pass_word_count") && col("pass_mean_word_len") &&
          col("pass_alpha_words") && col("pass_stopwords") &&
          col("pass_symbol_ratio"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its tokens are under a
    * TARGET unigram LM (the docs matching `targetPred` — the
    * high-quality exemplar set) than under the RAW corpus LM.
    *
    * log_weight(doc) = mean_t [ln p_t(t) - ln p_r(t)] — the log of
    * the per-token geometric-mean likelihood ratio, length-normalized
    * so long documents don't saturate the weight. Both LMs are
    * add-one smoothed over the shared corpus vocabulary, so
    * target-OOV tokens get finite mass. Resampling stays in log
    * space: the A-ES key -ln(u)/w orders identically as
    * ln(-ln u) - log_weight, so no exp() ever runs (and no
    * cross-engine exp ULP risk joins the accepted ln class).
    *
    * Determinism: per-token log-ratios are quantized to integer
    * micro-nats BEFORE the per-doc sum (the x13 rule). Docs with zero
    * tokens produce no rows (both engines agree by construction).
    *
    * Shape: the raw-LM frequency aggregate over the full token
    * stream, the target-LM aggregate over the target docs' stream
    * (targetPred evaluated ONCE PER DOC in a Filter — carrying it as
    * a flag column through the explode re-evaluates a doc-level
    * predicate per token row, which turned a 0.6 s query into 11 s at
    * sf0.1 when the predicate itself tokenizes), a vocab-sized left
    * join of the two, scalars on one broadcast row, then the token
    * stream joins the vocab table and one groupBy(doc) — the x13 cost
    * class plus the target-subset pass.
    */
  def dsirLogWeights(
      docs: org.apache.spark.sql.DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    def tokStream(d: org.apache.spark.sql.DataFrame) = d.select(col(idCol),
      explode(wsTokens(normalize(col(textCol)))).as("w"))
    val toks = tokStream(docs)
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cr"))
      .join(tokStream(docs.where(targetPred))
          .groupBy("w").agg(count(lit(1)).as("ct_t")),
        Seq("w"), "left")
      .select(col("w"), col("cr"), coalesce(col("ct_t"), lit(0L)).as("ct"))
    val scal = freq.select(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v"))
    val microNatRatio = round(
      (log((col("ct") + lit(1)) / (col("nt") + col("v"))) -
        log((col("cr") + lit(1)) / (col("nr") + col("v")))) * 1e6).cast("long")
    toks.join(freq, "w")
      .crossJoin(broadcast(scal))
      .select(col(idCol), microNatRatio.as("lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("slr"))
      .select(col(idCol), col("n_tokens"),
        round(col("slr").cast("double") / (col("n_tokens") * 1e6), 6)
          .as("log_weight"))
  }

  /** Interpolated bigram LM score (one order above [[unigramLogProb]] —
    * the KenLM-shaped perplexity quality signal): per-bigram
    * p = lambda * c(w1 w2)/c(w1) + (1-lambda) * c(w2)/N, averaged in
    * log space per document. c(w1) is the plain unigram count (not the
    * bigram-first-position count), so the conditional mass sums to
    * slightly under 1 — standard for a scoring heuristic, documented.
    *
    * Same determinism discipline as unigram: per-bigram log-probs are
    * quantized to integer micro-nats BEFORE the per-doc sum, so the
    * grouped aggregation is exact integer math — summation order
    * cannot flip the rounded average. Docs with < 2 tokens produce no
    * bigrams and are omitted (both engines agree by construction).
    *
    * Bigrams come from ONE posexplode + a lead() window — never from a
    * transform lambda over the token array: CollapseProject inlines
    * the tokenization into the lambda body, re-running it per element
    * (O(tokens^2) per doc — measured 20 s vs 2 s at sf0.1).
    */
  def bigramLogProb(
      docs: org.apache.spark.sql.DataFrame, lambda: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksPos = docs.select(col(idCol),
      posexplode(wsTokens(normalize(col(textCol)))).as(Seq("pos", "w")))
    val bgs = toksPos
      .withColumn("w2", lead("w", 1).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .where(col("w2").isNotNull)
      .select(col(idCol), col("w").as("w1"), col("w2"))
    val toks = toksPos.select(col(idCol), col("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("cf"))
    val bgf = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("cbg"))
    val total = uni.select(sum("cf").cast("double").as("n_total"))
    val p = lit(lambda) * (col("cbg").cast("double") / col("c1")) +
      lit(1.0 - lambda) * (col("c2").cast("double") / col("n_total"))
    val microNats = round(log(p) * 1e6).cast("long")
    bgs
      .join(bgf, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("cf").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cf").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col(idCol), microNats.as("lq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("lq").as("slq"))
      .select(col(idCol), col("n_bigrams"),
        round(col("slq").cast("double") / (col("n_bigrams") * 1e6), 6)
          .as("avg_logprob"))
  }

  // --- PII detection / redaction ---------------------------------------

  /** Conservative PII patterns (lowercase text): chosen for identical
    * semantics in Java regex and RE2-style engines — no lookaround, no
    * backreferences, explicit character classes only.
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val phoneRe = "[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe)).cast("bigint")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Re)).cast("bigint")
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe)).cast("bigint")

  /** All three PII classes replaced by placeholder tags. Order matters
    * and is fixed (email, then ip, then phone) so engines agree; a
    * map-only pass like everything else in this object.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** URL canonicalization for web-corpus dedup (the CommonCrawl-style
    * "same page fetched under many spellings" problem): lowercase,
    * strip the fragment, the query string, the scheme, a leading
    * "www.", and a trailing slash. A pure regexp_replace chain — fully
    * codegen'd, map-only, and every pattern is valid under both Java
    * regex and RE2 (no lookaround) so the oracle replays it exactly.
    * Order matters and is fixed: fragment before query before scheme,
    * because each strip exposes the next anchor.
    */
  def canonicalizeUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), "#.*$", ""),
            "\\?.*$", ""),
          "^https?://", ""),
        "^www\\.", ""),
      "/$", "")

  /** Embedded subset of the Mozilla Public Suffix List: the common
    * two-label ccTLD registration suffixes under which a SECOND-level
    * label is itself registrable (bbc.co.uk and amazon.co.uk are
    * different registrants). Deliberately static and small — the full
    * PSL is a moving external artifact; this subset covers the ccTLDs
    * a web crawl hits constantly, and an unlisted suffix degrades to
    * the last-two-labels heuristic, never to an error.
    */
  val publicSuffixes: Set[String] = Set(
    // UK / Ireland / Israel / South Africa
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "co.il", "org.il", "ac.il", "gov.il",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    // Oceania
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // East / South / Southeast Asia
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    "gen.in", "firm.in", "ind.in", "com.sg", "net.sg", "org.sg",
    "edu.sg", "gov.sg", "per.sg", "co.id", "or.id", "net.id", "web.id",
    "ac.id", "go.id", "co.th", "in.th", "or.th", "ac.th", "go.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.pk", "edu.pk", "gov.pk", "com.bd",
    // Türkiye / Middle East / Africa
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.eg", "com.sa", "com.ng", "com.ua", "in.ua",
    // Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "com.pe", "com.ve", "com.ec", "com.uy", "com.do",
    "com.gt", "com.py", "com.bo")

  /** Registrable-domain approximation from a CANONICAL url: the last
    * two dot-separated labels of the host (the part before the first
    * slash, with any `:port` suffix and trailing dot stripped) —
    * EXCEPT when those two labels are a known two-label public suffix
    * ([[publicSuffixes]]), where the registrable domain is the last
    * THREE labels (bbc.co.uk, not co.uk — a domain-cap stage must not
    * merge every UK site into one quota bucket). Numeric (IPv4-style)
    * hosts and hosts the two-label pattern can't match (single-label
    * like `localhost`, empty) keep the WHOLE host rather than
    * collapsing into a shared pseudo-domain: '1.2.3.4' and '5.6.3.4'
    * are unrelated hosts, not two pages of domain '3.4'. A static-
    * subset heuristic, not a live PSL lookup — documented as such;
    * good enough for per-domain corpus stats and blocking.
    */
  def registrableDomain(canonicalUrl: Column): Column = {
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(canonicalUrl, "/.*$", ""),
        ":[0-9]+$", ""),
      "\\.$", "")
    val twoLabel = regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)
    val threeLabel =
      regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$", 1)
    when(host.rlike("^[0-9.]+$") || twoLabel === lit(""), host)
      .otherwise(when(
        twoLabel.isInCollection(publicSuffixes) && threeLabel =!= lit(""),
        threeLabel)
        .otherwise(twoLabel))
  }

  // --- code-vs-prose detection ----------------------------------------

  /** Word-bounded code keywords. Deliberately excludes words common in
    * English prose ("if", "for", "while") so a keyword hit is a strong
    * code signal; valid under both Java regex and RE2 (no lookaround),
    * so the oracle replays the exact pattern.
    */
  val codeKeywordRe: String =
    "\\b(def|return|import|const|function|class|void|lambda|elif|struct)\\b"

  /** Punctuation that is dense in source code and sparse in prose. */
  val codeSymbolRe: String = "[{}();=<>\\[\\]]"
  val braceRe: String = "[{}]"

  /** Scalar code-likeness score: weighted symbol/keyword density per
    * 100 characters (keywords ×2, braces and semicolons ×1). Prose
    * scores ~0; real source code scores well above 1.0. A single
    * map-only expression (three codegen'd regexp_count kernels), so a
    * filter stage can apply it with no join and no shuffle — the
    * mixture-routing shape: split a 100 TB crawl into code-like and
    * prose-like streams in one scan.
    */
  def codeScore(text: Column): Column = {
    val len = length(text).cast("bigint")
    when(len <= 0, lit(0.0)).otherwise(round(
      (regexp_count(text, lit(codeKeywordRe)) * 2
        + regexp_count(text, lit(braceRe))
        + regexp_count(text, lit(";"))).cast("double") * 100.0 / len, 6))
  }

  /** Per-doc code-detection signal table: raw counts, symbol density,
    * [[codeScore]], and the `is_code` routing flag at `threshold`.
    * Counts are staged through one Project so each regexp kernel runs
    * once per row even after predicate pushdown.
    */
  def codeSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 1.0): DataFrame = {
    val t = col(textCol)
    docs
      .select(col(idCol), length(t).cast("bigint").as("n_chars"),
        regexp_count(t, lit(braceRe)).cast("bigint").as("n_braces"),
        regexp_count(t, lit(";")).cast("bigint").as("n_semis"),
        regexp_count(t, lit(codeKeywordRe)).cast("bigint").as("n_keywords"),
        regexp_count(t, lit(codeSymbolRe)).cast("bigint").as("_syms"))
      .select(col(idCol), col("n_chars"), col("n_braces"), col("n_semis"),
        col("n_keywords"),
        when(col("n_chars") <= 0, lit(0.0))
          .otherwise(round(col("_syms").cast("double") * 100.0
            / col("n_chars"), 6)).as("symbol_per_100_chars"),
        when(col("n_chars") <= 0, lit(0.0))
          .otherwise(round((col("n_keywords") * 2 + col("n_braces")
            + col("n_semis")).cast("double") * 100.0 / col("n_chars"), 6))
          .as("code_score"))
      .withColumn("is_code", col("code_score") >= threshold)
  }

  /** Default page-rejecting phrase list for [[c4Clean]] — a stand-in
    * for C4's "List of Dirty, Naughty ..." blocklist (the real list is
    * an external resource; the rule machinery is what matters here).
    */
  val c4Badwords: Seq[String] = Seq("badword1", "badword2")

  /** C4-style heuristic cleaning (Raffel et al. 2020 §2.2, the
    * deterministic line/page rules): keep only lines that end in
    * terminal punctuation, have at least `minWordsPerLine` words, and
    * do not contain the word "javascript"; reject the whole page when
    * it contains "lorem ipsum", a curly brace (code smell), a
    * blocklisted phrase, or fewer than `minKeptLines` surviving lines.
    *
    * Input: one row per document with an ordered array column of
    * lines. Output per doc: line counts, each page-rule flag, the
    * conjunction `kept`, and `clean_text` (newline-joined survivors)
    * — so a pipeline can filter on `kept` while a data card reports
    * which rule rejects what.
    *
    * Scale shape: every rule is a pure array expression over the row's
    * own lines (filter/exists — no explode, no shuffle, no UDF). At
    * 100 TB this is a map-only pass bounded by parquet decode, the
    * same cost class as [[qualityScore]].
    */
  def c4Clean(
      docsLines: DataFrame,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3,
      badwords: Seq[String] = c4Badwords,
      idCol: String = "doc_id", linesCol: String = "lines"): DataFrame = {
    // every per-line predicate below is value-identical to the C4 rule
    // it replaces but regex-free where a string op suffices: the line
    // rules run once per line of the corpus, and higher-order array
    // functions are interpreted (no codegen, no common-subexpression
    // elimination), so per-line regex cost is paid in full
    //   - terminal punctuation: last-char membership, not `[.!?"]$`
    //     (Java's $ also matches before a trailing newline, but lines
    //     are newline-free by construction — split products)
    //   - word count: split-by-space yields n_spaces+1 elements
    //     unconditionally, so compare space COUNT via length arithmetic
    //     instead of materializing a throwaway array per line
    //   - blocklist: the quoted alternation `b1|b2` unanchored is
    //     exactly contains-any; test each literal
    def lineKept(l: Column): Column =
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        length(l) - length(translate(l, " ", "")) + 1 >= minWordsPerLine &&
        !lower(l).rlike("\\bjavascript\\b")
    val keptLines = filter(col(linesCol), lineKept _)
    docsLines.select(
        col(idCol),
        col(linesCol),
        // one projection boundary: keptLines is consumed TWICE below
        // (size + array_join); as its own attribute the filter pass
        // runs once per row — CollapseProject keeps multi-use non-cheap
        // aliases, so the optimizer cannot re-inline it
        keptLines.as("_kept_lines"))
      .select(
        col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(col("_kept_lines")).cast("long").as("n_kept"),
        exists(col(linesCol), l => lower(l).contains("lorem ipsum"))
          .as("has_lorem"),
        exists(col(linesCol), l => l.contains("{")).as("has_brace"),
        exists(col(linesCol), l =>
          badwords.map(b => lower(l).contains(b.toLowerCase))
            .reduce(_ || _)).as("has_badword"),
        array_join(col("_kept_lines"), "\n").as("clean_text"))
      .withColumn("kept",
        col("n_kept") >= minKeptLines &&
          !col("has_lorem") && !col("has_brace") && !col("has_badword"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): score
    * every document with the corpus unigram LM ([[unigramLogProb]]),
    * then split each source's documents into `nBuckets` equal-depth
    * buckets by descending likelihood — bucket 1 ("head") is the most
    * LM-like text, the last ("tail") the least. CCNet trains its LM on
    * Wikipedia; here the corpus itself is the LM corpus, which keeps
    * the operator self-contained and the oracle exact.
    *
    * Output: (id, source, n_tokens, avg_logprob, bucket, bucket_name)
    * with bucket_name in head/middle/tail for nBuckets = 3 (plain
    * "b<k>" otherwise). Docs with zero tokens have no LM rows and drop
    * out (the x13 inner-join semantics).
    *
    * Scale shape: the LM pass is the x13 cost class (token exchange +
    * vocab join); the bucketing is one ntile window per source — an
    * exchange on source plus a per-source sort. At extreme scale a
    * full per-source sort is the bottleneck; the documented swap is
    * two-pass approximate quantiles (the x24 `quantileThreshold`
    * pattern) once exact equal-depth ranks stop mattering.
    */
  def perplexityBuckets(
      docs: DataFrame, nBuckets: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 0, "perplexityBuckets: nBuckets must be positive")
    val lm = unigramLogProb(docs, idCol, textCol)
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("avg_logprob").desc, col(idCol))
    val named = if (nBuckets == 3)
      when(col("bucket") === 1, "head")
        .when(col("bucket") === 2, "middle").otherwise("tail")
    else concat(lit("b"), col("bucket").cast("string"))
    lm.join(docs.select(col(idCol), col(sourceCol)), idCol)
      .withColumn("bucket", ntile(nBuckets).over(w))
      .withColumn("bucket_name", named)
  }

  /** Per-document character-level Shannon entropy (nats) of the
    * normalized text — the gibberish/compression quality signal
    * (low-entropy docs are boilerplate/repetition, near-uniform-random
    * docs are binary junk or encoded blobs; both are filtered before
    * training). Spaces of the normalized text count as symbols.
    *
    * Determinism: H = ln(n) - (Σ_c cnt_c·ln(cnt_c))/n, with each
    * cnt_c·ln(cnt_c) term quantized to integer micro-nats BEFORE the
    * sum (the x13/c5 discipline — ln runs on INTEGER counts only, so
    * both engines quantize the same value and summation order can
    * never flip the result).
    *
    * Scale shape: map-only — per row, sort the char array and fold it
    * ONCE, accumulating each run's cnt·ln(cnt) at run boundaries
    * (O(len·log len) sort + O(len) fold, independent of alphabet
    * size), so the corpus pass is bounded by parquet decode like x30;
    * no explode, no shuffle, no per-distinct-char rescans.
    */
  def charEntropy(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // regexp_extract_all, not split(_, ""): Java's zero-width split
    // keeps a trailing empty element under Spark's limit=-1, which
    // DuckDB's splitter does not produce. '.' is safe — normalize()
    // collapsed every newline into the space class already. coalesce:
    // a NULL text must count as an empty doc, not poison size() to -1.
    val chars = regexp_extract_all(
      normalize(coalesce(col(textCol), lit(""))), lit("."), lit(0))
    def quant(run: Column): Column = when(run > 0,
      round(run.cast("double") * log(run.cast("double")) * 1e6).cast("long"))
      .otherwise(lit(0L))
    // fold state: (cur run's char, its length so far, finished-runs'
    // Σ cnt·ln(cnt) in micro-nats, finished-run count); finish flushes
    // the final run. "" can never collide with a real element ('.'
    // never matches empty), so it is a safe pre-first-run sentinel.
    val zero = struct(lit("").as("cur"), lit(0L).as("run"),
      lit(0L).as("squ"), lit(0L).as("k"))
    def folded(cs: Column) = aggregate(array_sort(cs), zero,
      (a, c) => when(c === a.getField("cur"),
        struct(a.getField("cur").as("cur"),
          (a.getField("run") + 1L).as("run"),
          a.getField("squ").as("squ"), a.getField("k").as("k")))
        .otherwise(struct(c.as("cur"), lit(1L).as("run"),
          (a.getField("squ") + quant(a.getField("run"))).as("squ"),
          (a.getField("k") + when(a.getField("run") > 0, 1L).otherwise(0L)).as("k"))),
      a => struct(
        (a.getField("squ") + quant(a.getField("run"))).as("squ"),
        (a.getField("k") + when(a.getField("run") > 0, 1L).otherwise(0L)).as("k")))
    // STAGED selects, one expensive alias per step: lambda folds are
    // excluded from codegen subexpression elimination, so a flat
    // Project that mentions `chars`/`folded` per output column would
    // re-run the regex and the whole fold 3× per row (measured: 4.9 s
    // vs 1.3 s at sf0.1). CollapseProject keeps non-cheap aliases with
    // >1 use in their own Project, so the staging survives the
    // optimizer.
    val n = col("_chars_n")
    docs
      .select(col(idCol), chars.as("_chars"))
      .select(col(idCol), size(col("_chars")).as("_chars_n"),
        folded(col("_chars")).as("_folded"))
      .select(col(idCol), n.cast("long").as("n_chars_norm"),
        col("_folded").getField("k").as("n_distinct_chars"),
        when(n <= 0, 0.0).otherwise(
          round((round(log(n) * 1e6).cast("long") * n.cast("long")
            - col("_folded").getField("squ"))
            .cast("double") / (n.cast("long") * lit(1e6)), 6))
          .as("char_entropy_nats"))
  }

  /** [[charEntropy]] as explode + two codegen hash aggregates — the
    * documented alternative shape: the sorted-fold variant is map-only
    * but interpreted (lambda HOFs never enter whole-stage codegen),
    * this one pays a map-side-combined (doc, char) exchange to keep
    * every operator in Tungsten codegen. Same math, same quantization,
    * bit-identical output.
    */
  def charEntropyGrouped(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val chars = regexp_extract_all(
      normalize(coalesce(col(textCol), lit(""))), lit("."), lit(0))
    val cnts = docs.select(col(idCol), explode(chars).as("c"))
      .groupBy(col(idCol), col("c")).agg(count(lit(1)).as("cnt"))
    val agg = cnts.groupBy(col(idCol)).agg(
      sum("cnt").as("n"), count(lit(1)).as("k"),
      sum(round(col("cnt").cast("double") * log(col("cnt").cast("double")) * 1e6)
        .cast("long")).as("squ"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0L)).as("n_chars_norm"),
        coalesce(col("k"), lit(0L)).as("n_distinct_chars"),
        when(coalesce(col("n"), lit(0L)) <= 0, 0.0).otherwise(
          round((round(log(col("n")) * 1e6).cast("long") * col("n") - col("squ"))
            .cast("double") / (col("n") * lit(1e6)), 6))
          .as("char_entropy_nats"))
  }

  /** Hashed-feature linear quality classifier (the fastText /
    * FineWeb-Edu shape): each token hashes into one of `dim` feature
    * buckets, each bucket carries a fixed weight, and the document's
    * score is the mean bucket weight of its tokens — exactly how a
    * trained linear model is APPLIED at corpus scale (training happens
    * offline; the pipeline ships the weight table). Weights here are
    * derived deterministically from the bucket index (md5 → integer in
    * [-1000, 1000] milli-units) so the oracle can reproduce them; a
    * real deployment broadcasts its learned table and nothing else
    * changes.
    *
    * Determinism: per-token weights are INTEGER milli-units summed as
    * integers (order-free), divided and rounded once at the end — the
    * same discipline as x13's micro-nats.
    *
    * Scale shape: map-only array expressions per row (hash + weight
    * lookup are pure functions of the token), bounded by parquet
    * decode; no UDF, no shuffle, no weight-table join at all.
    */
  def classifierScore(
      docs: DataFrame, dim: Int = 1 << 16, threshold: Double = 0.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // one codegen'd kernel pass per document (r17): the former
    // expression form paid, PER TOKEN inside an interpreted
    // `aggregate` lambda, two md5-hex round-trips, a string concat
    // and a base-16 `conv` parse. ClassifierStatsMilli digests the
    // same bytes over reused buffers and returns [n_tokens,
    // sum_milli] — value-identical (same md5 chain), so the x34/x40
    // oracles that replay the chain in SQL are untouched.
    val stats = graft.functions.TextHashExpressions.classifierStatsMilli(
      normalize(coalesce(col(textCol), lit(""))), dim)
    val n = col("_cs").getItem(0)
    // clf_score = round(s / (n·1000), 6) computed EXACTLY in integer
    // math: micro = sgn(s)·((|s|·2000 + n) div (2n)) — half-away-from-
    // zero on exact integers, then ONE IEEE division by 1e6. The
    // round(double, 6) form hit a .5e-6 tie at sf0.1 (doc 2668:
    // s/(n·1000) lands where Spark's BigDecimal-HALF_UP-on-the-
    // shortest-string and DuckDB's binary rounding disagree by 1e-6) —
    // the same divergence class x40's mean already dodged with
    // floor-of-micros. |s| ≤ 1000·n keeps every intermediate ≪ 2^53.
    // Exact long division via pmod: a - pmod(a,b) is b-divisible, so
    // the double divide is exact (Spark's `/` is always floating).
    def ldiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val sMilli = col("_cs").getItem(1)
    val sgn = when(sMilli < 0, -1L).when(sMilli > 0, 1L).otherwise(0L)
    val micro = sgn * ldiv(abs(sMilli) * 2000L + n, n * 2L)
    docs
      .select(col(idCol), stats.as("_cs"))
      .select(col(idCol), n.as("n_tokens"),
        when(n <= 0, 0.0)
          .otherwise(micro.cast("double") / 1e6).as("clf_score"))
      .withColumn("kept", col("n_tokens") > 0 && col("clf_score") > threshold)
  }
}
