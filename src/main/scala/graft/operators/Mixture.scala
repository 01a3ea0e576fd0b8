package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture operators: deterministic sequence packing and
  * source-weighted mixture sampling — the two steps between a filtered
  * corpus and a token stream a trainer can actually consume.
  *
  * Both are pure DataFrame plans: packing is one window pass per block,
  * mixing is one aggregate + a broadcast rate table. Determinism comes
  * from 60-bit md5 hashes (never RNG), so results are reproducible
  * across runs, partitionings and engines — each has a DuckDB oracle.
  */
object Mixture {

  /** Concat-then-chunk sequence packing: within each block (default:
    * source), documents are laid out in deterministic hash order and
    * the concatenated token stream is cut every `budget` tokens. Emits
    * (id, block, n_toks, pack_id, pack_offset); a doc whose tokens
    * straddle a cut belongs to the pack where it starts, at
    * pack_offset tokens in — the standard pack-with-splitting layout
    * (documents are not reordered to fill fragments, so packs are
    * contiguous and the layout is one window pass, not a bin-packing
    * search).
    *
    * Scale: one shuffle on the block column; the running sum is a
    * single pass per partition. Blocks are independent, so
    * parallelism = |blocks| — at corpus scale use a composite block
    * (e.g. source x shard) to keep window partitions executor-sized.
    */
  def packSequences(
      docs: DataFrame, budget: Long, blockCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, "token budget must be positive")
    // null text = zero tokens (size(NULL) is NULL and would poison the
    // running sum for every later doc in the block)
    val toks = coalesce(
      size(TextAnalysis.wsTokens(TextAnalysis.normalize(col(textCol)))).cast("long"),
      lit(0L))
    val h = Dedup.hash60(col(idCol).cast("string"))
    val w = Window.partitionBy(col(blockCol)).orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(blockCol), toks.as("n_toks"), h.as("h"))
      .withColumn("cum_prev", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col(idCol), col(blockCol), col("n_toks"),
        floor(col("cum_prev") / budget).cast("long").as("pack_id"),
        (col("cum_prev") % budget).as("pack_offset"))
  }

  /** Context-window chunking: split each document's token stream into
    * chunks of `chunkTokens`, consecutive chunks overlapping by
    * `overlap` tokens — the preprocessing step that fits long
    * documents into a model's context window without losing boundary
    * context. Emits (id, chunk_id, chunk_len, chunk_text); token-less
    * docs produce no chunks. Pure per-row explode — no shuffle at all;
    * output size is input size x (1 + overlap/(chunk-overlap)).
    */
  def chunkDocuments(
      docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlap
    docs
      .select(col(idCol),
        TextAnalysis.wsTokens(TextAnalysis.normalize(col(textCol))).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(step))).as("start"))
      .select(col(idCol),
        (col("start") / step).cast("int").as("chunk_id"),
        least(lit(chunkTokens), size(col("toks")) - col("start")).as("chunk_len"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Deterministic corpus shuffle into training shards: shard =
    * hash(id) mod nShards, position = rank of hash within the shard.
    * The id->(shard, position) map is a pure function of the ids, so
    * reruns, resumed jobs and other engines lay out the corpus
    * identically — the reproducible stand-in for "shuffle the data
    * before training", and the layout a sharded exporter writes
    * (`partitionBy("shard")`, sort by position).
    *
    * Scale: one exchange on shard (the write needs it anyway); the
    * rank is one window pass per shard, and shards are sized by
    * nShards, a knob that grows with the corpus.
    */
  def shuffleShards(
      docs: DataFrame, nShards: Int, idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs
      .withColumn("h", Dedup.hash60(col(idCol).cast("string")))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("position", (row_number().over(w) - 1).cast("long"))
      .drop("h")
  }

  /** Length-bucketed batch assignment — the dynamic-batching layout
    * that minimizes padding waste: documents are bucketed by token
    * count (linear 32-token buckets), deterministically shuffled
    * within each bucket (60-bit hash order, the [[shuffleShards]]
    * discipline), and grouped into fixed-size batches. Since batch
    * members share a bucket, max_len - each_len < bucket width, so
    * padding waste per batch is bounded by width/max_len regardless of
    * the corpus's length distribution — vs unsorted batching where one
    * long doc pads the whole batch to its length.
    *
    * Emits one row per doc: (id, n_toks, bucket, batch_id, slot).
    * Scale shape: one shuffle (the per-bucket window) keyed on the
    * bucket id; everything else is per-row column math. Bucket count
    * grows with max document length, not corpus size; within-bucket
    * skew is bounded because a batch is a CONSECUTIVE run of the
    * hash order — at 1000-executor scale the window can be replaced
    * by the bucketed two-pass rank (the t14 pattern) if one bucket
    * dominates.
    */
  def lengthBatching(
      docs: DataFrame, batchSize: Int = 8, bucketTokens: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(bucketTokens > 0, "bucketTokens must be positive")
    val nToks = coalesce(
      size(TextAnalysis.wsTokens(col(textCol))).cast("long"), lit(0L))
    val w = Window.partitionBy(col("bucket")).orderBy(col("_h"), col(idCol))
    docs
      .select(col(idCol), nToks.as("n_toks"),
        Dedup.hash60(concat(lit("lenbatch:"), col(idCol).cast("string")))
          .as("_h"))
      // both engines compute the same IEEE quotient and floor it (the
      // cast truncates toward zero; counts are non-negative), so the
      // bucket id is engine-independent; log2-style bucketing was
      // rejected exactly because ln-ratio ULP drift can flip a ceil
      // across engines at power-of-two boundaries
      .withColumn("bucket",
        (col("n_toks").cast("double") / lit(bucketTokens.toDouble))
          .cast("long").cast("int"))
      .withColumn("_rn", row_number().over(w) - 1)
      .withColumn("batch_id", (col("_rn") / lit(batchSize)).cast("long"))
      .withColumn("slot", (col("_rn") % lit(batchSize)).cast("int"))
      .drop("_h", "_rn")
  }

  /** Deterministic train/valid/test assignment: bucket = 60-bit
    * hash("split:" || id) mod 1e6, and each named split owns the
    * cumulative-fraction range its order implies — (["train", .9],
    * ["valid", .05], ["test", .05]) maps buckets [0, 900k) / [900k,
    * 950k) / [950k, 1e6). A pure per-row projection: no shuffle, no
    * RNG, stable under reruns, resumes, repartitioning and engines —
    * the property a split MUST have so no document ever migrates
    * between train and eval as the corpus grows (hash-of-id, unlike
    * `randomSplit`, is immune to partition-order drift).
    *
    * Emits the input plus (split_bucket, split). Fractions must sum to
    * 1 within 1e-9 so every bucket lands in exactly one split.
    */
  /** Exclusive upper bucket bounds per split over [0, 1e6): cumulative
    * fractions rounded to integers, the LAST forced to exactly 1e6 so
    * float accumulation can never leave bucket 999999 unassigned.
    * Extracted (and property-tested) because an off-by-one here
    * silently leaks eval docs into train.
    */
  private[operators] def splitBounds(
      splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty, "hashSplit: need at least one split")
    require(splits.forall(_._2 > 0), "hashSplit: fractions must be > 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"hashSplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(c => math.round(c * 1e6))
    val bounds = splits.map(_._1).zip(cum.init :+ 1000000L)
    // a fraction below ~5e-7 rounds to a zero-width bucket range —
    // that split would silently receive zero documents, so fail fast
    val widths = bounds.map(_._2).zip(0L +: bounds.map(_._2).init)
    require(widths.forall { case (hi, lo) => hi > lo },
      s"hashSplit: a fraction is too small to own any bucket: $splits")
    bounds
  }

  def hashSplit(
      docs: DataFrame, splits: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    val bounds = splitBounds(splits)
    val bucket = pmod(
      Dedup.hash60(concat(lit("split:"), col(idCol).cast("string"))),
      lit(1000000L))
    val assign = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((name, hi), rest) =>
        when(col("split_bucket") < hi, name).otherwise(rest)
    }
    docs.withColumn("split_bucket", bucket).withColumn("split", assign)
  }

  /** Per-source token-budget sampling: keep documents, in deterministic
    * hash order within each source, while the source's running token
    * total stays within `budgetTokens` — the quota step that turns
    * "2B tokens of web, 500M of code" into a concrete document set.
    * Hash order makes the kept set a uniform sample of the source
    * (arrival order would bias toward old crawls) and reproducible.
    *
    * Emits (id, source, n_toks, cum_toks) for kept docs. The running
    * total accumulates over ALL docs in hash order (dropped ones
    * included) and cum_toks is monotone, so the kept set is exactly
    * the longest hash-order PREFIX that fits the budget — once one doc
    * crosses the line, no later doc is admitted. A greedy backfill
    * (skip the big doc, keep trying smaller ones) would fill tighter
    * but makes membership depend on every earlier drop; the prefix cut
    * keeps membership replayable from (hash, budget) alone.
    *
    * Scale: ONE shuffle on source + a single window pass — same shape
    * as [[packSequences]]; at corpus scale sources are few and large,
    * so the sort-within-source is the cost; it's the sort any
    * deterministic quota needs.
    */
  def tokenBudgetSample(
      docs: DataFrame, budgetTokens: Long, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "tokenBudgetSample: budget must be positive")
    val toks = coalesce(
      size(TextAnalysis.wsTokens(col(textCol))).cast("long"), lit(0L))
    val h = Dedup.hash60(concat(lit("budget:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("_h"), col(idCol))
    docs
      .select(col(idCol), col(sourceCol), toks.as("n_toks"), h.as("_h"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .where(col("cum_toks") <= budgetTokens)
      .drop("_h")
  }

  /** Source-weighted mixture sampling: down-sample each source so the
    * kept corpus approaches the relative `weight` per source while
    * retaining as much data as possible — the binding source (smallest
    * n_s/w_s) keeps everything and every other source keeps
    * w_s * T / n_s where T = min_s(n_s / w_s). Selection is
    * deterministic hash-mod over the id, so re-runs (and the oracle)
    * keep the identical rows.
    *
    * `weight` is a Column over the docs columns (typically a CASE on
    * the source column), so weights live in the pipeline config, not
    * in data.
    *
    * Scale: the rate table is one grouped count, |sources| rows,
    * broadcast back; the filter itself is per-row column math.
    */
  def sourceMix(
      docs: DataFrame, weight: Column, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    // weight must be strictly positive: a zero/negative/null weight
    // would make t_cap (min n_s/w) NaN or infinite and silently drop
    // EVERY row of EVERY source. Guarded in-plan (the rate table is
    // |sources| rows, so the check costs nothing) — fails the action
    // with a named error instead of returning an empty corpus.
    val guardedW = when(weight > 0.0, weight).otherwise(
      raise_error(format_string(
        "sourceMix: weight must be > 0 for source %s, got %s",
        col(sourceCol), coalesce(weight.cast("string"), lit("null")))))
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w", guardedW)
    val cap = counts.select(min(col("n_s").cast("double") / col("w")).as("t_cap"))
    val rates = counts.crossJoin(broadcast(cap))
      .select(col(sourceCol),
        (col("w") * col("t_cap") / col("n_s").cast("double")).as("rate"))
    docs.join(broadcast(rates), sourceCol)
      .where(pmod(Dedup.hash60(col(idCol).cast("string")), lit(1000000L))
        .cast("double") < col("rate") * lit(1000000.0))
      .drop("rate")
  }

  /** Source upsampling by repeat factor — the other half of mixture
    * control ([[sourceMix]] down-samples without repetition; this
    * REPEATS docs of under-represented sources). Each doc yields
    * floor(r) copies plus one more when its hash lottery clears the
    * fractional part frac(r) — so a source's expected output is
    * exactly r x its input, per doc, with no shuffle: the explode is
    * row-local and the `copy` index keeps repeats distinct for
    * downstream shard shuffling.
    *
    * `factor` is a per-row column (typically derived from the source);
    * r < 0 or null fails the action in-plan rather than silently
    * dropping rows. r in [0, 1) is legal (lottery-only — equivalent to
    * [[sourceMix]]'s hash-mod thinning for that source).
    */
  def sourceUpsample(
      docs: DataFrame, factor: Column,
      idCol: String = "doc_id"): DataFrame = {
    val guarded = when(factor >= 0.0, factor).otherwise(
      raise_error(format_string(
        "sourceUpsample: factor must be >= 0, got %s",
        coalesce(factor.cast("string"), lit("null")))))
    val nCopies = (floor(guarded) +
      when(pmod(Dedup.hash60(concat(lit("up:"), col(idCol).cast("string"))), lit(1000000L))
          .cast("double") < (guarded - floor(guarded)) * 1e6, 1)
        .otherwise(0)).cast("int")
    docs.withColumn("n_copies", nCopies)
      .where(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1), col("n_copies"))))
      .drop("n_copies")
  }

  /** UniMax-style token-budget allocation across languages (Chung et
    * al. 2023, "UniMax: Fairer and More Effective Language Sampling"):
    * spend a total token budget as UNIFORMLY as possible across
    * groups, capping each group at `epochCap` epochs of its own data —
    * big languages stop soaking up budget proportional to their size,
    * small ones never repeat past the epoch cap.
    *
    * UniMax's greedy loop (allocate the smallest language, recompute
    * the uniform share, repeat) is exactly the water-filling problem,
    * which has a closed distributed form: sort groups ascending by
    * cap c_i = epochCap x tokens_i, and with prefix sums P_i the
    * number of fully-capped groups is k = max{ i : P_i + (n-i)*c_i
    * <= B } (the test is monotone in i because c is sorted), giving
    * water level L = (B - P_k)/(n - k); each group receives
    * min(c_i, L). No driver loop, no iteration — one aggregate, one
    * window over |groups| rows, one broadcast-size reduction.
    *
    * `budget` defaults to `budgetFraction` x the corpus total. Output
    * per group: (group, n_tokens, cap, alloc, epochs, capped), with
    * alloc summing to the budget when the caps can hold it (else
    * every group saturates and the leftover is unallocated — reported
    * via `capped` all-true).
    *
    * Scale shape: one token-count aggregate (exchange on the group
    * col — the x29 cost class), then all remaining arithmetic runs on
    * |groups| rows (dozens of languages, never corpus-sized).
    */
  def unimaxAllocation(
      docs: DataFrame, budgetFraction: Double = 0.75,
      epochCap: Double = 1.0, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(budgetFraction > 0, "unimaxAllocation: budgetFraction must be positive")
    require(epochCap > 0, "unimaxAllocation: epochCap must be positive")
    val counts = docs
      .groupBy(col(groupCol))
      .agg(sum(size(TextAnalysis.wsTokens(TextAnalysis.normalize(col(textCol))))
        .cast("long")).as("n_tokens"))
      .withColumn("cap", col("n_tokens").cast("double") * epochCap)
    // everything below runs on |groups| rows: rank by cap, prefix-sum,
    // evaluate the monotone saturation test, reduce (k, P_k, B, n) to
    // one broadcast row, and apply min(cap, L) back on the group table
    val w = Window.orderBy(col("cap"), col(groupCol))
    val all = Window.partitionBy()
    val ranked = counts
      .withColumn("_i", row_number().over(w))
      .withColumn("_p", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", count(lit(1)).over(all))
      .withColumn("_b",
        sum(col("n_tokens")).over(all).cast("double") * budgetFraction)
      .withColumn("_sat",
        col("_p") + (col("_n") - col("_i")) * col("cap") <= col("_b"))
    val kRow = ranked
      .agg(
        max(when(col("_sat"), struct(col("_i").as("k"), col("_p").as("pk"))))
          .as("_kr"),
        max(col("_b")).as("b"),
        max(col("_n")).as("n"))
      .select(
        coalesce(col("_kr.k"), lit(0)).as("k"),
        coalesce(col("_kr.pk"), lit(0.0)).as("pk"),
        col("b"), col("n"))
    val level = when(col("n") > col("k"),
      (col("b") - col("pk")) / (col("n") - col("k")))
      .otherwise(lit(Double.MaxValue))
    ranked.crossJoin(broadcast(kRow))
      .withColumn("alloc", round(least(col("cap"), level), 6))
      .withColumn("epochs", round(col("alloc") / col("n_tokens"), 6))
      .withColumn("capped", col("cap") <= level)
      .select(col(groupCol), col("n_tokens"), col("cap"),
        col("alloc"), col("epochs"), col("capped"))
  }

  /** Temperature-scaled mixture table (the mT5 / multilingual-LM
    * formula): sampling share p_g(T) ∝ f_g^(1/T) where f_g is group
    * g's token fraction, for each requested temperature. T=1 is
    * proportional sampling; T→∞ is uniform; the table shows how hard
    * each temperature upsamples low-resource groups (epochs_micro > 1e6
    * means the group is seen more than once per corpus-sized budget).
    *
    * Temperatures are restricted to POWERS OF TWO so f^(1/T) is a
    * sqrt chain — IEEE 754 requires sqrt (and division) to be
    * correctly rounded, so Spark and any SQL oracle engine produce
    * bit-identical weights, where a libm `pow` may differ by an ULP
    * and flip a rounding boundary. Shares and epochs are emitted as
    * floored micro-unit integers off an op-for-op identical chain of
    * correctly-rounded double casts/multiplies/divides, the repo's
    * cross-engine determinism convention.
    *
    * Scale: one map-side token-count aggregate; everything after runs
    * on |groups| x |temperatures| rows with broadcast totals — no
    * second pass over the corpus.
    */
  def temperatureMix(
      docs: DataFrame, temperatures: Seq[Int] = Seq(1, 2, 4),
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    require(temperatures.nonEmpty &&
      temperatures.forall(t => t >= 1 && (t & (t - 1)) == 0),
      s"temperatureMix: temperatures must be powers of two, got $temperatures")
    @annotation.tailrec
    def root(c: Column, t: Int): Column = if (t <= 1) c else root(sqrt(c), t / 2)
    // the corpus collapses to |groups| rows here, so the total rides
    // an all-rows window instead of a scalar-broadcast cross join
    val counts = docs
      .groupBy(col(groupCol))
      .agg(sum(size(TextAnalysis.wsTokens(TextAnalysis.normalize(col(textCol))))
        .cast("long")).as("n_tokens"))
      .withColumn("_total", sum("n_tokens").over(Window.partitionBy()))
    val f = col("n_tokens").cast("double") / col("_total").cast("double")
    // floor, not round: round() on a double is the same HALF_UP-vs-
    // banker's boundary class x40 documents — a token distribution
    // whose weight lands micro-exactly on .5 could flip w_micro by 1
    // between engines. floor is boundary-free and the sqrt chain is
    // correctly rounded on both engines, so the floored integer is
    // bit-identical.
    val perT = temperatures.map { t =>
      counts
        .withColumn("temperature", lit(t))
        .withColumn("_w_micro", floor(root(f, t) * 1e6).cast("long"))
    }.reduce(_.unionByName(_))
    // integer micro-weights sum order-independently; the final double
    // divisions have exact-integer operands, so floor() is stable
    val wSum = Window.partitionBy("temperature")
    perT
      .withColumn("_w_sum", sum("_w_micro").over(wSum))
      .withColumn("p_micro",
        floor(col("_w_micro").cast("double") * 1e6 /
          col("_w_sum").cast("double")).cast("long"))
      .withColumn("epochs_micro",
        floor(col("p_micro").cast("double") * col("_total").cast("double") /
          col("n_tokens").cast("double")).cast("long"))
      .select(col("temperature"), col(groupCol), col("n_tokens"),
        col("p_micro"), col("epochs_micro"))
  }
}
