package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash),
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Hash functions are md5-derived (hash_k(s) = first 60 bits of
  * md5(k ++ ":" ++ s)) so every stage is reproducible across engines —
  * the DuckDB oracles recompute identical signatures arithmetically.
  *
  * Scale shape: signatures are map-only column expressions; the only
  * shuffles are the groupBy(signature/band) exchanges, which is the
  * theoretical minimum for dedup. Pairwise verification is always
  * blocked (band bucket or metadata block) — never an unblocked O(n²)
  * self-join.
  */
object Dedup {

  import TextAnalysis.normalize

  /** 60-bit deterministic hash of a string column, seeded. */
  def seededHash(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), s)), 1, 15), 16, 10)
      .cast("bigint")

  /** The house 60-bit hash (first 15 md5 hex digits as a BIGINT) —
    * DuckDB equivalent is OracleFragments.hash60. Single definition so
    * every shuffle/sample/fingerprint key uses the same scheme.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("bigint")

  /** Distinct word n-gram shingles of the normalized text, as an array
    * column. NOTE: the lambda re-evaluates the tokenization per
    * element (CollapseProject re-inlines it), so this form is for
    * small/config-side use — the data-path operators below use
    * [[shingleTable]], which tokenizes once per document.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(normalize(text), " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(normalize(text))))
  }

  /** baseHash derived from an existing [[hash60]] value: md5 hex
    * digits 1-8 (the 32-bit minhash base) are bits 59..28 of the
    * 60-bit value, so `(h >>> 28) % P` recovers [[baseHash]] EXACTLY —
    * one digest serves both hash schemes (property-tested against the
    * string forms in TrainingDataSpec).
    */
  def baseHashFromH60(h: Column): Column =
    shiftright(h, 28) % minhashP

  /** Positional gram-HASH rows: one row per (id, carry..., pos, h)
    * with h = [[hash60]] of the word n-gram at 0-based position pos —
    * the [[graft.functions.TokenGramHash60s]] kernel exploded. This is
    * the r16 data-path shape for the whole shingle family: the r15
    * form ([[gramRows]]) exploded tokens and re-assembled grams with a
    * `lead` window, paying an Exchange + Sort over every TOKEN row
    * before the first gram existed — at sf3 that corpus-wide sort was
    * d14's GC bimodality. Here gram hashes are emitted by a single
    * linear codegen kernel per document; the plan stays map-shaped
    * until the consumer's own aggregation exchange, and no gram string
    * or token row is ever materialized. Hash values are identical to
    * hash60 over [[gramRows]]' gram strings (the kernel digests the
    * same UTF-8 bytes), so every DuckDB oracle replays unchanged.
    */
  private[graft] def gramHashRows(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame =
    // arr lands in its OWN projection and the generator explodes the
    // attribute with the OUTER variant: the non-outer form invites
    // InferFiltersFromGenerate to push `size(gen) > 0 AND isnotnull
    // (gen)` below the projection, re-inlining the kernel into the
    // filter — THREE kernel evaluations per document (caught in the
    // r16 d14 plan audit). The null-row filter on the generator
    // OUTPUT restores inner-explode semantics (a null-text doc is
    // dropped, as before) at zero extra kernel cost.
    docs.select((Seq(col(idCol)) ++ carryCols.map(col) :+
      graft.functions.TextHashExpressions
        .tokenGramHash60s(TextAnalysis.normalize(col(textCol)), n)
        .as("arr")): _*)
      .select((Seq(col(idCol)) ++ carryCols.map(col) :+
        posexplode_outer(col("arr"))): _*)
      .where(col("col").isNotNull)
      .withColumnRenamed("col", "h")

  /** Gram-hash SET rows: one row per (id, carry..., DISTINCT h) with
    * the dedup done INSIDE the kernel (sorted per-doc distinct) — the
    * id is part of the key, so doc-local dedup IS the global
    * distinct-on-(id, h), and the posting stream leaves this operator
    * having never entered an Exchange.
    *
    * PRECONDITION: each doc id appears at most ONCE in `docs`. Every
    * framework-generated table satisfies this; a duplicate-id input
    * yields duplicate (id, h) postings, inflating any count built on
    * the table. Registry transformers that accept user DataFrames and
    * read set COUNTS off this table (eval_overlap) re-apply an
    * explicit distinct at their boundary — min-aggregates (minhash)
    * are duplicate-insensitive and need nothing.
    *
    * This is the r16 posture shift
    * for the whole shingle family: r15 paid a corpus-wide distinct
    * shuffle to build every set-shape gram table; now the first
    * exchange any dedup plan pays is its own aggregation/join — the
    * theoretical minimum.
    */
  private[graft] def gramHashSetRows(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select((Seq(col(idCol)) ++ carryCols.map(col) :+
      graft.functions.TextHashExpressions
        .tokenGramHash60sDistinct(TextAnalysis.normalize(col(textCol)), n)
        .as("arr")): _*)
      .select((Seq(col(idCol)) ++ carryCols.map(col) :+
        explode_outer(col("arr")).as("h")): _*)
      .where(col("h").isNotNull)

  /** DISTINCT (id, carry..., h, hb) gram-hash table — the staged-index
    * shape the LSH/jaccard family consumes (h = [[hash60]] for exact
    * overlap, hb = [[baseHash]] for minhash), built from one kernel
    * pass with hb derived arithmetically ([[baseHashFromH60]]) after
    * the dedup exchange. The distinct's exchange carries (id, long)
    * pairs — never strings — and nothing upstream of it shuffles.
    */
  private[graft] def hashedGramTable(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame =
    gramHashSetRows(docs, n, idCol, textCol, carryCols)
      .withColumn("hb", baseHashFromH60(col("h")))

  /** Shared n-gram STRING core: one row per (id, carry..., pos, gram,
    * n_grams) with pos = 0-based gram position and n_grams the per-doc
    * gram count (derived from the same window pass that assembles the
    * grams — no second count().over sweep). posexplode tokens (one
    * normalize+split per document), then n-gram assembly via window
    * `lead` over token position. Documents with fewer than n tokens
    * contribute their normalized text as the single gram at pos 0
    * (same semantics as [[shingles]]).
    *
    * r16: this window form is the REFERENCE implementation the specs
    * check the kernel against, and the entry point for callers that
    * need the gram text itself; every hash-consuming data path now
    * goes through [[gramHashRows]]/[[hashedGramTable]], which emit the
    * same hashes without the token-window Exchange + Sort.
    */
  private def gramRows(
      docs: DataFrame, n: Int,
      idCol: String, textCol: String, carryCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val carry = carryCols.map(col)
    val toks = docs.select(
      (Seq(col(idCol)) ++ carry :+
        posexplode(TextAnalysis.wsTokens(normalize(col(textCol))))): _*)
      .withColumnRenamed("col", "tok")
    val byDoc = Window.partitionBy(col(idCol))
    val ordered = byDoc.orderBy(col("pos"))
    val gram = concat_ws(" ",
      (0 until n).map(j => if (j == 0) col("tok") else lead(col("tok"), j).over(ordered)): _*)
    val grams = toks
      .withColumn("n_toks", count(lit(1)).over(byDoc))
      .withColumn("s", gram)
      .where(col("n_toks") >= n && col("pos") <= col("n_toks") - n)
      .select((Seq(col(idCol)) ++ carry ++ Seq(col("pos"), col("s"),
        (col("n_toks") - (n - 1)).cast("long").as("n_grams"))): _*)
    val small = docs
      .where(size(TextAnalysis.wsTokens(normalize(col(textCol)))) < n)
      .select((Seq(col(idCol)) ++ carry ++
        Seq(lit(0).as("pos"), normalize(col(textCol)).as("s"),
          lit(1L).as("n_grams"))): _*)
    grams.unionByName(small)
  }

  /** One row per (id, carry..., DISTINCT shingle) — the set shape the
    * minhash/jaccard family consumes.
    */
  def shingleTable(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame =
    gramRows(docs, n, idCol, textCol, carryCols)
      .drop("pos", "n_grams")
      .distinct()

  /** One row per (id, DISTINCT 60-bit gram hash). r15 moved the hash
    * BEFORE the dedup exchange so shuffle rows carried (id, long)
    * pairs instead of gram strings; r16 removes both the token-window
    * Exchange+Sort (the d14 sf3 GC floor) AND the dedup exchange
    * itself — the kernel emits each doc's sorted-distinct gram hashes
    * in one linear pass ([[gramHashSetRows]]), so this table is
    * map-shaped end to end. Differs from hashing distinct gram strings
    * only when two grams of ONE doc collide in 60 bits (merging two
    * postings) — the oracles dedup the same hashes, so both engines
    * see the same collisions at any scale.
    */
  def hashedShingleTable(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    gramHashSetRows(docs, n, idCol, textCol, Nil)
      .select(col(idCol), col("h"))

  /** Positional (ordered, NON-distinct) n-gram table: one row per
    * (id, pos, gram, n_grams) — the input shape for order-sensitive
    * fingerprinting (winnowing).
    */
  def shingleTablePos(
      docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    gramRows(docs, n, idCol, textCol, Nil)

  /** Per-doc n-gram novelty: the fraction of a doc's DISTINCT n-grams
    * that appear in no other document — the memorization-risk /
    * boilerplate-saturation signal (a crawl snapshot full of df>1
    * grams adds little new content; an all-unique doc is fresh). A
    * corpus-wide inverted-index pass like the d2 jaccard index, but
    * aggregate-only: grams travel as 60-bit hashes, document frequency
    * is one map-side-combined groupBy, and no candidate pair is ever
    * materialized — at 100 TB the exchanges carry (hash, count) rows,
    * never text. Every doc emits at least one gram (the small-doc
    * fallback normalizes to the whole text), so the fraction is always
    * well-defined and the join drops no docs.
    */
  def ngramNovelty(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    ngramNoveltyFromHashes(hashedShingleTable(docs, n, idCol, textCol), idCol)

  /** Novelty from an already-hashed `(id, h)` DISTINCT gram table. A
    * df=1 hash uniquely identifies its owning doc, so the document
    * frequency aggregate carries `first(id)` and the unique-gram count
    * becomes a DOC-scale groupBy — no gram-scale join back onto the
    * posting table (the r11 shape shuffled the full gram table a second
    * time to look up each gram's df; at crawl scale that second
    * exchange is the dominant cost of the whole query).
    */
  def ngramNoveltyFromHashes(
      grams: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val perDoc = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val uniq = grams.groupBy("h")
      .agg(count(lit(1)).as("df"), first(col(idCol)).as(idCol))
      .where(col("df") === 1)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniq, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        round(coalesce(col("n_unique"), lit(0L)).cast("double") /
          col("n_grams"), 6).as("novelty"))
  }

  /** Exact duplicate groups by content hash: one row per distinct
    * content, with group size and the surviving (minimum) doc id.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), md5(normalize(col(textCol)).cast("binary")).as("content_md5"))
      .groupBy("content_md5")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_docs"))

  /** Universal-hash family for MinHash: mh_k(s) = (a_k * h(s) + b_k)
    * mod P with h(s) = first 32 md5 bits mod P. One md5 per shingle
    * (instead of one per shingle per permutation); the k permutations
    * are integer arithmetic. P < 2^31 keeps every product inside
    * non-negative BIGINT range on any engine. Constants are fixed
    * (seed 42) so oracles can inline them as literals.
    */
  val minhashP: Long = 2147483647L // 2^31 - 1, prime
  val (minhashA, minhashB): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val rng = new scala.util.Random(42)
    val a = IndexedSeq.fill(64)(1L + rng.nextInt((minhashP - 1).toInt).toLong)
    val b = IndexedSeq.fill(64)(rng.nextInt(minhashP.toInt).toLong)
    (a, b)
  }

  /** 32-bit base shingle hash, reduced mod P. */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("bigint") % minhashP

  /** MinHash signatures in long form: (id, k, minhash), k < numHashes.
    *
    * Shape: explode shingles once, then numHashes codegen'd `min`
    * aggregates in ONE groupBy(doc) pass — no interpreted higher-order
    * functions in the hot path, one shuffle on the doc id (HOF lambdas
    * don't participate in whole-stage codegen; the first version was
    * 25x slower at sf0.1 for exactly that reason).
    */
  def minhashSignatures(
      docs: DataFrame, numHashes: Int, shingleSize: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // kernel-distinct grams feed the min aggregates directly (dups
    // could not change a min anyway; the in-kernel dedup just shrinks
    // the agg input) — the groupBy(id) is the plan's only shuffle
    minhashFromBaseHashes(
      gramHashSetRows(docs, shingleSize, idCol, textCol)
        .select(col(idCol), baseHashFromH60(col("h")).as("h")),
      numHashes, idCol)

  /** Signatures from an existing (id, s) shingle table — lets callers
    * that also need the shingles (e.g. LSH verify) tokenize once.
    */
  def minhashFromShingles(
      shingleTbl: DataFrame, numHashes: Int, idCol: String = "doc_id"): DataFrame =
    minhashFromBaseHashes(
      shingleTbl.select(col(idCol), baseHash(col("s")).as("h")),
      numHashes, idCol)

  /** Signatures from an already base-hashed `(id, h)` table (h =
    * [[baseHash]] of the shingle) — the entry point for a session-staged
    * shingle index, where the tokenize+hash pass ran once and was
    * materialized for every dedup-family consumer.
    */
  def minhashFromBaseHashes(
      hashed: DataFrame, numHashes: Int, idCol: String = "doc_id"): DataFrame = {
    require(numHashes <= 64, "at most 64 hash permutations are wired")
    val aggs = (0 until numHashes).map { k =>
      min((lit(minhashA(k)) * col("h") + lit(minhashB(k))) % minhashP).as(s"mh$k")
    }
    val wide = hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val kvs = explode(array((0 until numHashes).map(k =>
      struct(lit(k).as("k"), col(s"mh$k").as("minhash"))): _*))
    wide.select(col(idCol), kvs.as("kv"))
      .select(col(idCol), col("kv.k").as("k"), col("kv.minhash").as("minhash"))
  }

  /** LSH candidate pairs: signatures banded (rowsPerBand consecutive
    * hashes per band); docs sharing any full band collide. Returns
    * distinct (a_id, b_id) with a_id < b_id.
    */
  /** Banded signature keys: one row per (id, band, band_key), where the
    * band_key strings the band's (k, minhash) pairs in k order — the
    * equi-join key for LSH candidate generation (within one corpus via
    * [[lshCandidates]], or across corpora for incremental dedup).
    */
  def bandKeys(
      signatures: DataFrame, rowsPerBand: Int, idCol: String = "doc_id"): DataFrame =
    signatures
      .withColumn("band", (col("k") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      // sort_array makes the band key independent of collect_list order
      .agg(sort_array(collect_list(struct(col("k"), col("minhash")))).as("kv"))
      .withColumn("band_key",
        concat_ws(",", transform(col("kv"), x => concat_ws(":", x("k"), x("minhash")))))
      .select(col(idCol), col("band"), col("band_key"))

  def lshCandidates(
      signatures: DataFrame, rowsPerBand: Int, idCol: String = "doc_id"): DataFrame = {
    val bk = bandKeys(signatures, rowsPerBand, idCol)
    val a = bk.select(col(idCol).as("a_id"), col("band"), col("band_key"))
    val b = bk.select(col(idCol).as("b_id"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** Banded-minhash candidate pairs with exact shared-shingle
    * verification, from a prebuilt DISTINCT gram table `(id, h, hb)` —
    * the shared scaffold under LSH jaccard pairs (d4), containment
    * pairs (d17), and the `containment_dedup` stage. One row per
    * band-collision pair: (a_id, b_id, inter, a_sz, b_sz), inter = 0
    * for collisions with no shared shingle. Cost is bounded by band
    * collisions; the verify join runs on 60-bit hashes only.
    */
  def lshVerifiedPairsFromHashes(
      hashedGrams: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id"): DataFrame = {
    val sigs = minhashFromBaseHashes(
      hashedGrams.select(col(idCol), col("hb").as("h")), numHashes, idCol)
    val cands = lshCandidates(sigs, rowsPerBand, idCol)
    val ex = hashedGrams.select(col(idCol), col("h"))
    val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(ex.select(col(idCol).as("a_id"), col("h")), "a_id")
      .join(ex.select(col(idCol).as("b_id"), col("h")), Seq("b_id", "h"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    cands
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("sz").as("b_sz")), "b_id")
      .select(col("a_id"), col("b_id"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        col("a_sz"), col("b_sz"))
  }

  /** EXACT Jaccard self-join via prefix filtering (AllPairs, Bayardo
    * et al. 2007): order each doc's distinct gram hashes by ascending
    * global df (rarest first, hash tiebreak), keep only the prefix of
    * length |d| - ceil(t*|d|) + 1, and generate candidates from
    * prefix-gram collisions — any pair with J >= t MUST share a prefix
    * gram under a global token order, so the candidate set is lossless
    * while the join never touches the frequent tail where the
    * inverted-index blowup lives. Candidates are then verified on the
    * FULL posting sets (exact inter, union-normalized J, 6-dp rounded
    * like every Jaccard emit in this file). Output: (a_id, b_id,
    * jaccard_sim) for all pairs with J >= threshold — identical to the
    * uncapped inverted-index join, at a fraction of the exchange.
    */
  def exactJaccardPairsPrefix(
      ex: DataFrame, threshold: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"exactJaccardPairsPrefix: threshold in (0, 1], got $threshold")
    val exh = ex.select(col(idCol), col("h"))
    val dfTbl = exh.groupBy("h").agg(count(lit(1)).as("_df"))
    // ONE doc-level aggregation serves both the prefix table and the
    // verify arrays: collect each doc's (df, h) pairs, sort in-map
    // (array_sort on a 2-field struct = lexicographic (df, h) — the
    // same rarest-first global order the window shape produced), and
    // slice the AllPairs prefix off the sorted array. Replaces a
    // doc-partition window sort (exchange + sort over every gram row)
    // PLUS a second doc-level groupBy for the posting arrays with a
    // single exchange on the doc id; per-row array_sort of a ~doc-sized
    // array is cheaper than a partition-wide sort of the gram table.
    val docTbl = exh.join(dfTbl, "h")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_df"), col("h"))))
        .as("_sorted"), count(lit(1)).as("_sz"))
      .withColumn("_arr", expr("transform(_sorted, x -> x.h)"))
      // epsilon before ceil: when threshold*sz lands an ULP above an
      // exact integer (0.07*100 = 7.000000000000001), a bare ceil
      // shrinks the prefix by one and minimum-overlap true pairs are
      // silently missed — breaking the documented lossless guarantee
      // for thresholds that aren't exactly representable
      .withColumn("_preflen",
        (col("_sz") - ceil(lit(threshold) * col("_sz") - lit(1e-9)) +
          lit(1)).cast("int"))
      .select(col(idCol), col("_arr"), col("_sz"), col("_preflen"))
    val pre = docTbl
      .select(col(idCol), col("_sz"),
        posexplode(slice(col("_arr"), lit(1), col("_preflen"))))
      .select(col(idCol), col("col").as("h"),
        (col("pos") + 1).as("_r"), col("_sz"))
    // Candidate pruning on the prefix collisions — both filters are
    // CONSERVATIVE (epsilon-loosened toward keeping a pair), so the
    // candidate set stays lossless while shrinking ~an order of
    // magnitude (r14's shape verified 409k candidates for 256 true
    // pairs at sf0.1 — the 26M-row verify join behind d19's cost):
    //  - length filter (Bayardo 2007 §3.1): J >= t forces
    //    min(sz) >= t * max(sz);
    //  - positional filter (Xiao et al. 2008, PPJoin): the grams common
    //    to a pair appear in the SAME relative order in both docs'
    //    globally-sorted lists, so at the pair's minimal common gram
    //    (positions r_a, r_b — some prefix collision is at it) the
    //    overlap is at most 1 + min(sz_a - r_a, sz_b - r_b), which must
    //    reach minoverlap(t) = ceil(t/(1+t) * (sz_a + sz_b)). Keeping
    //    every collision that passes keeps the minimal-gram collision
    //    of every true pair, so the post-filter semijoin is lossless.
    val aSide = pre.select(col(idCol).as("a_id"), col("h"),
      col("_r").as("_ar"), col("_sz").as("_asz"))
    val bSide = pre.select(col(idCol).as("b_id"), col("h"),
      col("_r").as("_br"), col("_sz").as("_bsz"))
    val minOverlap = ceil(
      lit(threshold / (1.0 + threshold)) *
        (col("_asz") + col("_bsz")).cast("double") - lit(1e-9))
    val cands = aSide.join(bSide, "h")
      .where(col("a_id") < col("b_id"))
      .where(least(col("_asz"), col("_bsz")).cast("double") >=
        lit(threshold) * greatest(col("_asz"), col("_bsz")).cast("double")
          - lit(1e-9))
      .where(least(col("_asz") - col("_ar"), col("_bsz") - col("_br"))
        + lit(1) >= minOverlap)
      .select("a_id", "b_id").distinct()
    // Verify on COMPACT posting arrays: one array row per doc, exact
    // intersection computed in-map by array_intersect. The r14 shape
    // re-exploded every candidate against both full posting lists and
    // re-aggregated (exchange volume = sum of doc sizes over all
    // candidates); this shape's exchange is |cands| ids + |docs|
    // arrays — the same bytes the gram table already occupies — and
    // needs no intersection groupBy at all. docTbl is the SAME
    // aggregate the prefix table came from, so its exchange is reused.
    cands
      .join(docTbl.select(col(idCol).as("a_id"),
        col("_arr").as("_aarr"), col("_sz").as("a_sz")), "a_id")
      .join(docTbl.select(col(idCol).as("b_id"),
        col("_arr").as("_barr"), col("_sz").as("b_sz")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("_aarr"), col("_barr"))).cast("long"))
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"), 6)
          .as("jaccard_sim"))
      .where(col("jaccard_sim") >= threshold)
  }

  /** LSH band-configuration tuning report (the empirical S-curve): for
    * each rows-per-band setting over ONE set of K minhash signatures,
    * measure candidate volume, precision and recall against exact
    * Jaccard ground truth at `threshold` — the table consulted before
    * committing a (bands x rows) choice to a production dedup run.
    * More rows per band = fewer, higher-precision candidates; the
    * report shows where recall falls off the cliff.
    *
    * Ground truth is the EXACT pair set at J >= threshold via
    * [[exactJaccardPairsPrefix]] (lossless AllPairs prefix filtering —
    * no df cap, which would redefine the recall denominator; no
    * full inverted-index blowup either). For crawl-scale corpora pass
    * `sampleMod` > 1 to run the diagnostic on a deterministic 1/mod
    * doc slice — S-curve estimates from a hash sample are unbiased.
    * Candidates reuse one signature table across all configs; each
    * config adds only a band-key exchange and a pair-count aggregate.
    */
  def lshTuningReport(
      hashedGrams: DataFrame, numHashes: Int = 8,
      rowsPerBands: Seq[Int] = Seq(1, 2, 4, 8), threshold: Double = 0.5,
      sampleMod: Int = 1, idCol: String = "doc_id"): DataFrame = {
    require(rowsPerBands.nonEmpty && rowsPerBands.forall(r =>
      r >= 1 && numHashes % r == 0),
      s"lshTuningReport: each rowsPerBand must divide numHashes=$numHashes")
    val hg = if (sampleMod <= 1) hashedGrams
      else hashedGrams.where(
        pmod(hash60(col(idCol).cast("string")), lit(sampleMod.toLong)) === 0)
    // truth and sigs each feed every per-config branch plus the tally —
    // localCheckpoint so the exact-Jaccard join and the signature agg
    // run ONCE, not once per rows-per-band config
    val truth = exactJaccardPairsPrefix(
      hg.select(col(idCol), col("h")), threshold, idCol)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    val sigs = minhashFromBaseHashes(
      hg.select(col(idCol), col("hb").as("h")), numHashes, idCol)
      .localCheckpoint()
    // ONE banded pass for every swept config (r21, guide §2.4): each
    // signature row is exploded into its (rows_per_band, band)
    // coordinate for all swept r at once, so the sweep pays a single
    // band-key aggregation, one self-join and one distinct instead of
    // one of each per config (4 exchanges + 4 candidate joins -> 1 + 1
    // at the shipped sweep; keys shuffled are the same 15/doc either
    // way). Per-r candidate sets are identical — the join key carries
    // r, so collisions never cross configs.
    val banded = sigs
      .select(col(idCol), col("k"), col("minhash"),
        explode(typedlit(rowsPerBands)).as("r"))
      .withColumn("band", (col("k") / col("r")).cast("int"))
      .groupBy(col(idCol), col("r"), col("band"))
      .agg(sort_array(collect_list(struct(col("k"), col("minhash")))).as("kv"))
      .withColumn("band_key",
        concat_ws(",", transform(col("kv"), x => concat_ws(":", x("k"), x("minhash")))))
      .select(col(idCol), col("r"), col("band"), col("band_key"))
    val aSideB = banded.select(col("r"), col("band"), col("band_key"),
      col(idCol).as("a_id"))
    val bSideB = banded.select(col("r"), col("band"), col("band_key"),
      col(idCol).as("b_id"))
    val candCounts = aSideB.join(bSideB, Seq("r", "band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select(col("r").as("rows_per_band"), col("a_id"), col("b_id"))
      .distinct()
      .join(truth.withColumn("_t", lit(1L)), Seq("a_id", "b_id"), "left")
      .groupBy("rows_per_band")
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum("_t"), lit(0L)).as("n_hits"))
    // anchor row per swept r: a config with ZERO candidates must still
    // report (the old per-config scalar aggregate always emitted one)
    val perR = sigs.sparkSession.range(1)
      .select(explode(typedlit(rowsPerBands)).as("rows_per_band"))
      .join(candCounts, Seq("rows_per_band"), "left")
      .select(col("rows_per_band"),
        (lit(numHashes) / col("rows_per_band")).cast("int").as("n_bands"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    // the truth count rides an exploded tally so the tiny report rows
    // join on an equi-key instead of a scalar cross join
    val truthTally = truth
      .select(explode(array(rowsPerBands.map(lit(_)): _*)).as("rows_per_band"))
      .groupBy("rows_per_band").agg(count(lit(1)).as("n_true_pairs"))
    perR.join(truthTally, Seq("rows_per_band"), "left")
      .withColumn("n_true_pairs", coalesce(col("n_true_pairs"), lit(0L)))
      .select(col("rows_per_band"), col("n_bands"),
        col("n_candidates"), col("n_hits"), col("n_true_pairs"),
        when(col("n_candidates") > 0,
          floor(col("n_hits").cast("double") * 1e6 /
            col("n_candidates").cast("double")).cast("long"))
          .otherwise(lit(0L)).as("precision_micro"),
        when(col("n_true_pairs") > 0,
          floor(col("n_hits").cast("double") * 1e6 /
            col("n_true_pairs").cast("double")).cast("long"))
          .otherwise(lit(0L)).as("recall_micro"))
  }

  /** Containment-based duplicate REMOVAL: drop every doc whose distinct
    * shingles are >= `threshold` contained in a LARGER doc (ties on
    * size drop the larger id) — the quote/subset cleanup union-
    * normalized Jaccard dedup cannot express. Candidates come from the
    * banded minhash collisions, so recall at extreme size asymmetry is
    * bounded by the candidate generator (see d17's caveat; extreme
    * subsets are d15 dup-span territory). Returns the surviving docs.
    */
  def containmentDedup(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val st = hashedGramTable(docs, n, idCol, textCol)
    val pairs = lshVerifiedPairsFromHashes(st, numHashes, rowsPerBand, idCol)
      .withColumn("cont_a", col("inter").cast("double") / col("a_sz"))
      .withColumn("cont_b", col("inter").cast("double") / col("b_sz"))
    // a_id < b_id by construction, so the equal-size tie drops b
    val dropA = col("cont_a") >= threshold &&
      (col("a_sz") < col("b_sz"))
    val dropB = col("cont_b") >= threshold &&
      (col("b_sz") <= col("a_sz"))
    val losers = pairs
      .select(explode(array(when(dropA, col("a_id")),
        when(dropB, col("b_id")))).as(idCol))
      .where(col(idCol).isNotNull)
      .distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union > 0, inter.cast("double") / union.cast("double")).otherwise(0.0)
  }

  /** MinHash-banded near-duplicate CLUSTERS: band-collision candidates,
    * exact-Jaccard verification on candidates only, then transitive
    * closure via pointer-doubling connected components — the full d8
    * chain as one reusable operator. Returns (doc_id, cluster_id) for
    * every doc that appears in a verified pair.
    */
  def jaccardClusters(
      docs: DataFrame, n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardClustersFromHashes(
      hashedGramTable(docs, n, idCol, textCol),
      numHashes, rowsPerBand, threshold, idCol)

  /** [[jaccardClusters]] over a prebuilt DISTINCT gram table
    * `(id, h, hb)` — the session-staged-index entry point (lets the
    * cluster staging reuse the one materialized tokenize+hash pass
    * instead of re-deriving the gram window in every plan branch).
    */
  def jaccardClustersFromHashes(
      hashedGrams: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.1, idCol: String = "doc_id"): DataFrame =
    jaccardClustersFromPairs(
      lshVerifiedPairsFromHashes(hashedGrams, numHashes, rowsPerBand, idCol),
      threshold, idCol)

  /** [[jaccardClustersFromHashes]] over an ALREADY-VERIFIED pair
    * scaffold (the r21 session-staged pairs table) — the CC closure
    * without re-running band keys + candidate join + hash verify.
    */
  def jaccardClustersFromPairs(
      pairs: DataFrame, threshold: Double = 0.1,
      idCol: String = "doc_id"): DataFrame = {
    // inter > 0 keeps the pre-refactor semantics at threshold == 0:
    // lshVerifiedPairsFromHashes emits zero-intersection band
    // collisions (coalesced inter = 0), which were never edges here
    val edges = pairs
      .where(col("inter") > 0 &&
        col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double") >= threshold)
      .select("a_id", "b_id")
    Graph.connectedComponents(edges, "a_id", "b_id")
      .select(col("node").as(idCol), col("component").as("cluster_id"))
  }

  /** Soft deduplication: instead of DROPPING near-duplicates (d8/d10),
    * down-weight every member of a duplicate cluster to 1/|cluster| —
    * the SlimPajama-style alternative when duplicates carry signal
    * (popular pages) but must not dominate the training distribution.
    * Returns one row per INPUT doc: cluster size (1 for docs in no
    * verified cluster) and sampling weight = 1/size, so the corpus's
    * total effective mass counts each duplicate GROUP once.
    *
    * Scale shape: the cluster pass is [[jaccardClusters]] (banded
    * candidates + CC closure); the weighting adds one |clusters|-scale
    * count aggregate and a left join back to the doc ids — broadcast-
    * able, since verified-duplicate clusters are a small fraction of
    * any real corpus.
    */
  def softDedupWeights(
      docs: DataFrame, n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    softDedupWeightsFromClusters(docs,
      jaccardClusters(docs, n, numHashes, rowsPerBand, threshold, idCol, textCol),
      idCol)

  /** The weighting half of [[softDedupWeights]] over an already-computed
    * cluster table (`(idCol, cluster_id)`, the [[jaccardClusters]]
    * shape) — a pipeline that has materialized its clustering pass
    * reuses it here instead of re-running the LSH + closure.
    */
  def softDedupWeightsFromClusters(
      docs: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val sized = clusters.join(
      clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size")),
      "cluster_id")
    docs.select(col(idCol))
      .join(sized.select(col(idCol), col("cluster_id"), col("cluster_size")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        round(lit(1.0) / coalesce(col("cluster_size"), lit(1L)).cast("double"), 6)
          .as("weight"))
  }

  /** Incremental dedup flags: for each NEW document (isNew true), is it
    * an exact duplicate of the existing corpus, and how many verified
    * near-duplicate partners does it have there — the batch-vs-corpus
    * check a continuously-ingesting pipeline runs on every increment.
    *
    * Scale shape: the corpus side is touched only through its content
    * hashes and band keys (never pairwise with itself); candidates are
    * banded new x old, so cost is bounded by band collisions with the
    * increment — independent of corpus-internal duplication.
    */
  def incrementalDedupFlags(
      docs: DataFrame, isNew: Column, n: Int = 3, numHashes: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    incrementalDedupFlagsFromHashes(docs, isNew,
      hashedGramTable(docs, n, idCol, textCol),
      numHashes, rowsPerBand, threshold, idCol, textCol)

  /** [[incrementalDedupFlags]] over a prebuilt DISTINCT gram table
    * `(id, h, hb)` (h = [[hash60]] for exact-overlap verify, hb =
    * [[baseHash]] for the minhash signatures) — the session-staged-index
    * entry point. The r11 shape re-derived the full shingle window pass
    * in EVERY branch of the plan (signatures, both sides of the verify
    * join, sizes), making d11 the most expensive query on the board;
    * reading the staged table makes each branch a parquet scan.
    */
  def incrementalDedupFlagsFromHashes(
      docs: DataFrame, isNew: Column, hashedGrams: DataFrame,
      numHashes: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tagged = docs.withColumn("_is_new", isNew)
    val hashes = tagged.select(col(idCol), col("_is_new"),
      md5(normalize(col(textCol)).cast("binary")).as("content_md5"))
    val corpusMd5 = hashes.where(!col("_is_new"))
      .select(col("content_md5")).distinct()
      .withColumn("_in_corpus", lit(true))
    val exact = hashes.where(col("_is_new"))
      .join(corpusMd5, Seq("content_md5"), "left")
      .select(col(idCol),
        coalesce(col("_in_corpus"), lit(false)).as("is_exact_dup"))
    val sigs = minhashFromBaseHashes(
      hashedGrams.select(col(idCol), col("hb").as("h")), numHashes, idCol)
    val bk = bandKeys(sigs, rowsPerBand, idCol)
    val newIds = tagged.where(col("_is_new")).select(col(idCol))
    val oldIds = tagged.where(!col("_is_new")).select(col(idCol))
    val cands = bk.join(newIds, idCol).select(col(idCol).as("new_id"), col("band"), col("band_key"))
      .join(bk.join(oldIds, idCol)
        .select(col(idCol).as("old_id"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select("new_id", "old_id")
      .distinct()
    val ex = hashedGrams.select(col(idCol), col("h"))
    val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val near = cands
      .join(ex.select(col(idCol).as("new_id"), col("h")), "new_id")
      .join(ex.select(col(idCol).as("old_id"), col("h")), Seq("old_id", "h"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("new_id"), col("sz").as("a_sz")), "new_id")
      .join(sizes.select(col(idCol).as("old_id"), col("sz").as("b_sz")), "old_id")
      .where(col("inter").cast("double") /
        (col("a_sz") + col("b_sz") - col("inter")).cast("double") >= threshold)
      .groupBy("new_id").agg(count(lit(1)).as("n_near_dups"))
    exact
      .join(near.withColumnRenamed("new_id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("is_exact_dup"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
      .withColumn("kept", !col("is_exact_dup") && col("n_near_dups") === 0)
  }

  /** Corpus snapshot diff — the dataset-versioning/CDC step: classify
    * every id across two corpus versions as added / removed / changed /
    * unchanged. Emits (id, status, + the NEW side's carried columns,
    * old side's for removed rows).
    *
    * Scale shape: content is reduced to a 16-byte md5 per side BEFORE
    * the join, so the one full-outer shuffle carries (id, hash, carry
    * columns), never document text — the minimum any keyed diff needs.
    * No window, no skew risk beyond the id key itself.
    */
  def snapshotDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Seq("source")): DataFrame = {
    // presence is tracked by an explicit flag, NOT by the md5 being
    // null — md5(null text) is null, and inferring absence from it
    // would misreport a null-text row present in both versions as
    // added/removed; null-safe equality (<=>)  likewise keeps a
    // null-to-text edit classified 'changed'
    def sideHash(df: DataFrame, pfx: String): DataFrame =
      df.select(
        (col(idCol) +: lit(true).as(s"${pfx}_present") +:
          md5(col(textCol).cast("binary")).as(s"${pfx}_md5") +:
          carryCols.map(c => col(c).as(s"${pfx}_$c"))): _*)
    val o = sideHash(oldDocs, "old")
    val n = sideHash(newDocs, "new")
    val status = when(col("old_present").isNull, "added")
      .when(col("new_present").isNull, "removed")
      .when(!(col("old_md5") <=> col("new_md5")), "changed")
      .otherwise("unchanged")
    o.join(n, Seq(idCol), "full_outer")
      .select(
        (col(idCol) +: status.as("status") +:
          carryCols.map(c =>
            coalesce(col(s"new_$c"), col(s"old_$c")).as(c))): _*)
  }

  /** Pairwise n-gram Jaccard within a blocking key, via an inverted
    * shingle index: pairs sharing >= 1 shingle get their intersection
    * counted by a (block, shingle) equi-join + groupBy — codegen'd and
    * shuffle-parallel, vs. the quadratic array_intersect-per-pair
    * alternative. Requires threshold > 0 (zero-overlap pairs never
    * surface, which is exactly the pairs a positive threshold drops).
    *
    * `maxDfFraction`: optional stop-gram cap — shingles appearing in
    * more than ceil(fraction x corpus) documents are dropped from the
    * INVERTED INDEX ONLY (union sizes stay exact). A shingle with a
    * long posting list costs O(df²) join rows while contributing
    * almost no Jaccard discrimination, so at corpus scale one hot
    * shingle turns the index join quadratic; the cap bounds every
    * posting list. The similarity is then a documented underestimate
    * (intersection loses at most the capped shingles two docs share),
    * i.e. the cap can only DROP borderline pairs, never invent them.
    */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double, blockCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxDfFraction: Option[Double] = None): DataFrame = {
    // join/shuffle on a 60-bit hash of the shingle, not the string:
    // same result (both sides of the oracle hash identically), far
    // cheaper exchange keys; the (id, h) dedup is in-kernel, so the
    // posting table reaches the index join without its own exchange
    val ex = gramHashSetRows(docs, n, idCol, textCol, carryCols = Seq(blockCol))
      .select(col(blockCol).as("block"), col(idCol).as("id"),
        col("h").as("s"))
    ngramJaccardPairsFromIndex(
      ex, docs.select(count(lit(1)).as("n_docs")), threshold, maxDfFraction)
  }

  /** [[ngramJaccardPairs]] over a prebuilt hashed posting table
    * `(block, id, s)` (s = [[hash60]] of the DISTINCT shingle) — the
    * entry point for a session-staged shingle index. `nDocs` is a
    * one-row `(n_docs)` frame (the df-cap denominator; corpus count,
    * not posting count).
    */
  def ngramJaccardPairsFromIndex(
      ex: DataFrame, nDocs: DataFrame, threshold: Double,
      maxDfFraction: Option[Double] = None): DataFrame = {
    require(threshold > 0.0, "inverted-index jaccard requires threshold > 0")
    val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val index = maxDfFraction match {
      case None => ex
      case Some(f) =>
        // stop-gram removal via a broadcast sorted set, NOT a window
        // count over s: the window form shuffled EVERY posting of a
        // hot shingle to one reducer before the cap could drop it (the
        // skew harness measured 15x max/mean task reads on that df
        // exchange even on the unskewed gate corpus — at crawl scale a
        // boilerplate shingle owns a partition). Here df is a groupBy
        // with map-side partial aggregation (a hot shingle costs one
        // (hash, count) row per map task), the over-cap set is
        // |postings| / cap entries at MOST — broadcastable by
        // construction — and postings filter IN PLACE with the d12
        // binary-search kernel, so no posting row is ever exchanged on
        // the shingle key before the cap applies. The doc count rides
        // as a one-row broadcast (x6 corpus-stats pattern, no
        // driver-side job). df semantics (corpus-global, per distinct
        // (doc, shingle)) are unchanged.
        import graft.functions.VectorExpressions.sortedContains
        val stopGrams = ex.groupBy("s").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .where(col("df") > ceil(col("n_docs") * lit(f)))
          .agg(sort_array(collect_list(col("s"))).as("stop"))
        ex.crossJoin(broadcast(stopGrams))
          .where(!sortedContains(col("stop"), col("s")))
          .select("block", "id", "s")
    }
    val inter = index.select(col("block"), col("id").as("a_id"), col("s"))
      .join(index.select(col("block"), col("id").as("b_id"), col("s")), Seq("block", "s"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"), 6).as("jaccard_sim"))
      .where(col("jaccard_sim") >= threshold)
  }

  /** Train/eval contamination pairs: training documents sharing at
    * least `minShared` n-gram shingles with any document of the eval
    * split (`evalPred` over the docs columns selects the split). The
    * decontamination primitive every benchmark-clean training pipeline
    * needs — emitted as (train_id, eval_id, n_shared, overlap_frac)
    * with overlap_frac = shared / train's distinct shingles.
    *
    * Scale shape: inverted-index join on 60-bit shingle hashes, like
    * [[ngramJaccardPairs]] — but here join cost is bounded by the EVAL
    * side's posting lists (benchmark sets are small by construction),
    * so a corpus-hot shingle costs train_df x eval_df, not train_df².
    */
  def contaminationPairs(
      docs: DataFrame, n: Int, minShared: Long,
      evalPred: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    contaminationPairsFromHashes(
      hashedShingleTable(docs, n, idCol, textCol),
      docs, minShared, evalPred, idCol)

  /** [[contaminationPairs]] over a prebuilt hashed `(id, h)` DISTINCT
    * gram table — the session-staged-index entry point. `docs` supplies
    * only the eval-split predicate columns.
    */
  def contaminationPairsFromHashes(
      st: DataFrame, docs: DataFrame, minShared: Long,
      evalPred: Column, idCol: String = "doc_id"): DataFrame = {
    val tagged = st.join(docs.select(col(idCol), evalPred.as("is_eval")), idCol)
    val train = tagged.where(!col("is_eval"))
      .select(col(idCol).as("train_id"), col("h"))
    val evalSide = tagged.where(col("is_eval"))
      .select(col(idCol).as("eval_id"), col("h"))
    val sizes = train.groupBy("train_id").agg(count(lit(1)).as("sz"))
    train.join(evalSide, "h")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .join(sizes, "train_id")
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("sz").cast("double"), 6)
          .as("overlap_frac"))
  }

  /** Per-eval-doc n-gram contamination FRACTION — the decontamination
    * REPORT published alongside large-model evals (per-doc n-gram
    * overlap against the training corpus, thresholded to decide
    * drops). [[contaminationPairs]] answers "which (train, eval) pairs
    * overlap and by how much"; this answers the per-DOC question the
    * drop cutoff is applied to: for each eval doc, the fraction of its
    * distinct n-grams that occur anywhere in the train split.
    *
    * Scale shape: one gram-scale aggregation keyed on the 60-bit gram
    * hash (per-gram train flag via `max` — map-side combinable),
    * then an inner join of the eval rows back on the same key (the
    * hash partitioning is reused, no second exchange of the gram
    * table) and a doc-scale count. Nothing ever materializes
    * train x eval PAIRS, so cost is bounded by the gram table, not by
    * contamination volume — the shape that survives a contaminated-
    * corpus worst case where pair output explodes.
    *
    * `evalPred` is evaluated against the gram table's columns (id-
    * derived predicates — the d9 convention `hash60(id) % 20 = 0`).
    */
  def evalOverlapFromHashes(
      hashedGrams: DataFrame, evalPred: Column,
      idCol: String = "doc_id"): DataFrame = {
    val g = hashedGrams.select(col(idCol), col("h"), evalPred.as("is_eval"))
    val gramFlag = g.groupBy("h")
      .agg(max(when(!col("is_eval"), 1).otherwise(0)).as("in_train"))
    g.where(col("is_eval"))
      .join(gramFlag, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("in_train").as("n_overlap"))
      .select(col(idCol), col("n_grams"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_grams").cast("double"), 6)
          .as("overlap_frac"))
  }

  /** [[contaminationPairs]] with a Bloom prefilter on the train side —
    * the 100 TB shape. The exact inverted-index join must shuffle the
    * FULL train posting table (shingles x docs) even though only the
    * tiny fraction colliding with eval shingles can ever match; here a
    * Bloom filter built over the eval side's shingle hashes (benchmark
    * sets are small, so the sketch is a few MB) is broadcast and drops
    * non-colliding train postings BEFORE the exchange. False positives
    * only let extra postings through to the exact join, so the result
    * is bit-identical to [[contaminationPairs]] (up to within-doc
    * 60-bit gram-hash collisions: this form dedups (id, hash) via
    * [[hashedShingleTable]] so the exchange carries longs, and the
    * oracle dedups the same hashes) — the oracle replays the exact
    * semantics and the Bloom stays an invisible prefilter.
    *
    * One bounded departure from the pure-plan rule, inherent to Bloom
    * construction: building the sketch costs auxiliary actions over
    * the eval-side hashes (a sizing count + the sketch aggregate —
    * eval-sized, not corpus-sized; the eval posting table is cached
    * across the pair so the explode runs once). Membership itself is
    * Spark's own codegen'd `BloomFilterMightContain` catalyst
    * expression over the serialized sketch (the same expression the
    * engine's runtime bloom-join filter injects), so the prefilter
    * stays inside whole-stage codegen — no ScalaUDF, no broadcast
    * handle to leak; the sketch bytes ride the plan exactly like an
    * injected runtime filter's scalar-subquery result.
    */
  def bloomContaminationPairs(
      docs: DataFrame, n: Int, minShared: Long,
      evalPred: Column, fpp: Double = 0.01,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // shingle each side from ITS OWN filtered doc set: the sketch's
    // auxiliary actions (sizing count + bloom aggregate) then scan
    // only eval docs — shingling the whole corpus and filtering after
    // a tag join would re-run the corpus-wide explode once per action
    // and forfeit most of what the prefilter buys
    // localCheckpoint (eager) instead of persist/unpersist: the eval
    // explode runs ONCE and every consumer — the sizing count, the
    // bloom aggregate, AND the final join's lazy read — scans the
    // materialized blocks. A persist released before returning left
    // the final action re-deriving the explode (the r9 d14 residual);
    // holding a persist open had no release point on a lazy result.
    // The checkpoint is reclaimed by the ContextCleaner once the
    // caller drops the result — the Graph.connectedComponents /
    // bpeMerges precedent. The eval set (benchmark suites) is the
    // small side by construction at production scale, so executor-
    // local materialization without lineage is an acceptable trade.
    val evalSide = hashedShingleTable(docs.where(evalPred), n, idCol, textCol)
      .select(col(idCol).as("eval_id"), col("h"))
      .localCheckpoint()
    val bloomBytes = {
      // posting rows (not distinct hashes) as the size estimate: an
      // overshoot only makes the sketch larger, never less exact
      val nEval = math.max(1L, evalSide.count())
      val bloom = evalSide.stat.bloomFilter("h", nEval, fpp)
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val mightContain = org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftShims.expression(col("h"))))
    // Train side, one map-only corpus pass, ZERO corpus-scale
    // exchange (the r16 shape; r15 dedup'd the FULL posting table in a
    // corpus-wide shuffle before the bloom could drop anything — that
    // exchange was the d14 sf3 floor):
    //   - the kernel emits each doc's DISTINCT gram hashes (dedup
    //     in-kernel: id is part of the posting key, so doc-local
    //     dedup IS the global distinct), and runs ONCE per doc (the
    //     array lands in its own projection; size() and the OUTER
    //     explode read the attribute — the non-outer explode invites
    //     InferFiltersFromGenerate to re-inline the kernel into a
    //     pushed-down filter, tripling the per-doc work);
    //   - the denominator (per-doc DISTINCT gram count over the FULL
    //     set — the prefilter must not shrink overlap_frac) is
    //     size(arr): doc-local, and it rides the posting rows as a
    //     constant-per-doc column, so the old corpus-scale `sizes`
    //     aggregate + join are gone entirely (docs whose grams all
    //     fail the bloom can never reach the output — no shared gram,
    //     no pair — so dropping their sz rows with them is lossless);
    //   - the eval side is broadcast EXPLICITLY: it is small by
    //     construction (benchmark suites), and without the hint the
    //     optimizer has no reliable stats for either side of the join
    //     (kernel output vs checkpointed RDD) and at corpus scale may
    //     plan a shuffle of the train stream — the one exchange this
    //     shape exists to avoid. The plan's only shuffle is the
    //     pair-level groupBy, which is output-sized.
    import graft.functions.TextHashExpressions.tokenGramHash60sDistinct
    docs.where(!evalPred)
      .select(col(idCol).as("train_id"),
        tokenGramHash60sDistinct(TextAnalysis.normalize(col(textCol)), n)
          .as("arr"))
      .select(col("train_id"), size(col("arr")).cast("long").as("sz"),
        explode_outer(col("arr")).as("h"))
      .where(col("h").isNotNull && mightContain)
      .join(broadcast(evalSide), "h")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"), first(col("sz")).as("sz"))
      .where(col("n_shared") >= minShared)
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("sz").cast("double"), 6)
          .as("overlap_frac"))
  }

  /** 48-bit SimHash per doc (48 keeps every intermediate in
    * non-negative BIGINT range on all engines). Bit b of the signature
    * is set iff more than half the token hashes have bit b set
    * (2*ones_b > n, equivalent to the classic +/-1 balance > 0).
    *
    * Shape: explode tokens once, 48 codegen'd conditional-sum
    * aggregates in one groupBy(doc) pass; docs with zero tokens keep
    * signature 0 via the left join.
    */
  def simhashTable(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // per-token seeded hashes from the linear kernel (one digest per
    // token in place of a concat + md5-hex + conv chain per token);
    // OUTER explode of the projected attribute, as everywhere — a
    // token-less doc yields the empty array, emits no rows, and keeps
    // signature 0 via the left join exactly as before
    val toks = docs
      .select(col(idCol), graft.functions.TextHashExpressions
        .tokenSeededHash60s(TextAnalysis.normalize(col(textCol)), 0).as("arr"))
      .select(col(idCol), explode_outer(col("arr")).as("h"))
      .where(col("h").isNotNull)
    val oneAggs = (0 until 48).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"o$b")
    }
    val grouped = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), oneAggs: _*)
    val sig = (0 until 48).map { b =>
      when(col(s"o$b") * 2 > col("n_toks"), shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(col(idCol))
      .join(grouped.withColumn("simhash", sig).select(col(idCol), col("simhash")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs within a blocking key: hamming distance of
    * the 48-bit signatures <= maxHamming.
    *
    * Candidate generation is PIGEONHOLE BIT-SEGMENT BANDING, not a
    * block-wide self-join: the 48-bit signature is split into
    * maxHamming + 1 contiguous segments, and any pair within the
    * hamming budget must agree on at least one whole segment (at most
    * maxHamming bits differ, so some segment holds none of them). The
    * candidate join is an equi-join on (segment_id, segment_value,
    * block) — its bucket sizes scale with 2^segment_bits x block
    * cardinality instead of O(block_size²) — and candidates are then
    * verified with the exact popcount. Same output contract as the
    * naive join; the metadata block only tightens the key (correct at
    * any block cardinality, including blockCol with millions of
    * groups). At very loose budgets (maxHamming close to the signature
    * width) segments approach single bits and banding selectivity
    * fades — shrink the budget or widen the signature there.
    */
  def simhashPairs(
      docs: DataFrame, maxHamming: Int, blockCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigBits = 48
    require(maxHamming >= 0 && maxHamming < sigBits, s"0 <= maxHamming < $sigBits")
    val numSegments = maxHamming + 1
    val base = sigBits / numSegments
    val rem = sigBits % numSegments
    // first `rem` segments carry base+1 bits; offsets tile the 48 bits
    val widths = Seq.tabulate(numSegments)(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    val sigs = simhashTable(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(blockCol).as("block")), idCol)
    val segVals = offsets.zip(widths).map { case (off, w) =>
      shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1L))
    }
    // (id, sig, block, seg, segval): the 8-byte signature RIDES the
    // segment rows so the verify needs no join back to the signature
    // aggregation — referencing that subtree again would recompute the
    // 48-aggregate pass wherever exchange reuse doesn't fire
    val segs = sigs.select(col(idCol), col("simhash"), col("block"),
        posexplode(array(segVals: _*)))
      .select(col(idCol), col("simhash"), col("block"),
        col("pos").as("seg"), col("col").as("segval"))
    val a = segs.select(col("block"), col("seg"), col("segval"),
      col(idCol).as("a_id"), col("simhash").as("a_sig"))
    val b = segs.select(col("block"), col("seg"), col("segval"),
      col(idCol).as("b_id"), col("simhash").as("b_sig"))
    // A pair colliding in c segments would reach the output c times; the
    // r16 shape collapsed that with a pair-level distinct — an exchange
    // carrying every (pair x colliding-segment) duplicate (10.2M rows at
    // sf3, the d6 floor). Both full signatures ride the joined row, so
    // instead keep only the FIRST colliding segment: for the row at
    // segment `seg`, every earlier segment must differ between a_sig and
    // b_sig. Each qualifying pair then survives in exactly one segment's
    // row (each doc has one row per segment, and block is a join key),
    // and the distinct exchange disappears. Cost: numSegments-1 codegen'd
    // shift/mask compares per joined row — cheaper than shuffling the row.
    val firstCollision = offsets.zip(widths).zipWithIndex.map {
      case ((off, w), j) =>
        val mask = lit((1L << w) - 1L)
        when(col("seg") > j,
          shiftright(col("a_sig"), off).bitwiseAND(mask) =!=
            shiftright(col("b_sig"), off).bitwiseAND(mask))
          .otherwise(lit(true))
    }.reduce(_ && _)
    a.join(b, Seq("block", "seg", "segval"))
      .where(col("a_id") < col("b_id") && firstCollision)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** CCNet-style line-level boilerplate removal (Wenzek et al. 2020):
    * drop every line whose corpus-wide document frequency reaches
    * `minDocFreq` (headers, footers, nav chrome repeat across pages;
    * body text does not), then reassemble each document from its
    * surviving lines in original order.
    *
    * Input: one row per document with an ordered array column of lines.
    * Output: (id, n_lines, n_kept, clean_text) — the newline-rejoined
    * survivors ("" when everything was boilerplate).
    *
    * Scale shape: the frequency pass groups on the 60-bit line hash, so
    * the only corpus-wide shuffle carries (hash, id) pairs, never line
    * text. The boilerplate set it yields (df >= K) is tiny relative to
    * the corpus — a few thousand chrome lines even at crawl scale — so
    * it is aggregated into ONE sorted array, broadcast, and each
    * document's lines array is filtered IN PLACE with a binary-search
    * kernel (O(log |boilerplate|) per line). No explode of the probe
    * side, no per-document regroup shuffle, no collect_list: the first
    * form of this operator rebuilt documents from exploded rows and the
    * regroup + sorted-struct collect cost 18x the rest of the query.
    */
  def lineDedup(
      docs: DataFrame, minDocFreq: Int,
      idCol: String = "doc_id", linesCol: String = "lines"): DataFrame = {
    import graft.functions.VectorExpressions.sortedContains
    val boilerplate = docs
      .select(col(idCol), explode(col(linesCol)).as("line"))
      .select(col(idCol), hash60(col("line")).as("lh"))
      .distinct()
      .groupBy("lh").agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") >= minDocFreq)
      // one row holding the whole (small) set, sorted for binary search
      .agg(sort_array(collect_list(col("lh"))).as("boiler"))
    val kept = filter(col(linesCol),
      l => !sortedContains(col("boiler"), hash60(l)))
    docs
      .crossJoin(broadcast(boilerplate))
      .select(col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"))
  }

  /** Exact substring-level duplicate spans — the character-window
    * formulation of suffix-array training-data dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * every length-`winLen` character window of the raw text is hashed;
    * a window is duplicated iff its hash occurs at least `minOcc`
    * times corpus-wide (which catches cross-document copies AND
    * within-document repeats, like the suffix array does); per
    * document, duplicated windows whose coverage overlaps or touches
    * merge into maximal spans. Any duplicated substring of length >=
    * winLen is covered exactly — its windows collide at every
    * alignment — so the reported spans are the substrings a
    * remove-duplicated-spans pass would cut.
    *
    * Output: (id, span_start, span_end, span_len), 1-based inclusive
    * character positions, one row per maximal duplicated span.
    *
    * Scale shape: ONE corpus scan — the window stream (id, pos, h),
    * which carries no text past the hash projection, exchanges once on
    * the 60-bit hash and the corpus-wide occurrence count is a window
    * aggregate in place (the d2 inverted-index pattern); only rows
    * surviving `minOcc` (dup-fraction-sized) reach the per-doc islands
    * exchange. The h-exchange is O(total chars x 24 B) — the inherent
    * cost of exact substring dedup without a distributed suffix array
    * (Lee et al. build one; at extreme scale swap in the two-scan
    * variant that aggregates bare hashes and broadcasts the repeated
    * set back, trading a second scan for a 3x smaller shuffle, or run
    * the approximate winnowing pass (x10) first).
    */
  /** `keepFirst = false` (default) marks EVERY occurrence of a
    * corpus-duplicated run (the boilerplate stance the `dup_span_strip`
    * stage documents); `keepFirst = true` is the Lee et al. (2022)
    * suffix-array semantics — the FIRST occurrence corpus-wide (min
    * (id, pos) per window hash) is not a duplicate, so exactly one
    * copy of each repeated substring survives a strip built on these
    * spans. A run repeated WITHIN one doc keeps its first position
    * there too.
    */
  def dupSpans(
      docs: DataFrame, winLen: Int, minOcc: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text",
      keepFirst: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(winLen >= 2, s"winLen must be >= 2, got $winLen")
    // one row per window position, hashed by the Rabin-Karp kernel —
    // one O(len) pass per doc, no per-window substring strings (the
    // substr+md5 form of this pass cost 2.5 of d15's 3.3 s at sf0.1).
    // Docs shorter than winLen yield the empty array (they cannot
    // contain a length->=winLen duplicate); the null-filter on the
    // OUTER explode's output drops them. Outer + own projection, so
    // InferFiltersFromGenerate cannot re-inline the kernel into a
    // pushed-down `size(...) > 0` filter (the r16 triple-evaluation
    // finding — the non-outer form ran the O(len) kernel three times
    // per document).
    val wins = docs
      .select(col(idCol),
        graft.functions.TextHashExpressions
          .rollingWindowHashes(col(textCol), winLen).as("_arr"))
      .select(col(idCol), posexplode_outer(col("_arr")))
      .where(col("col").isNotNull)
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val byHash = Window.partitionBy(col("h"))
    val marked = wins.withColumn("occ", count(lit(1)).over(byHash))
    val dupWins =
      if (!keepFirst) marked.where(col("occ") >= minOcc).drop("occ")
      else marked
        // both aggregates share the byHash spec — one window exchange
        .withColumn("_first",
          min(struct(col(idCol).as("i"), col("pos").as("p"))).over(byHash))
        .where(col("occ") >= minOcc &&
          !(col(idCol) === col("_first.i") && col("pos") === col("_first.p")))
        .drop("occ", "_first")
    dupWins
      // windows at p1 < p2 cover contiguously iff p2 <= p1 + winLen
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + winLen, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (winLen - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }
}
