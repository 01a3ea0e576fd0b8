package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: random
  * hyperplane LSH — bucket by sign bits, search only within bucket (and
  * optionally neighboring probes). Hyperplanes are pseudo-random but
  * deterministic (seeded hash of (plane, dimension)), so signatures are
  * reproducible across runs and engines.
  *
  * All math in double (float arrays are cast up) with left-to-right
  * summation — deterministic and cross-engine comparable.
  */
object Similarity {

  /** Left-to-right dot product — native codegen'd kernel (same
    * accumulation order as the earlier `aggregate(zip_with(...))` fold,
    * so oracle hashes are unchanged; the kernel call JIT-compiles
    * instead of interpreting one pass per fold).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Unit-normalized double vector (all-zero stays all-zero, so the
    * pair dot degrades to cosine 0). Normalizing ONCE per vector makes
    * each candidate pair a single dot product instead of dot + two
    * norms — pairwise stages are the hot path, vectors are not.
    */
  def normalized(a: Column): Column =
    graft.functions.VectorExpressions.vectorNormalize(a)

  /** Cosine similarity (0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0.0 && nb > 0.0, d / (na * nb)).otherwise(0.0)
  }

  /** Sanity check for the broadcast-nested-loop paths: the QUERY side
    * is broadcast to every corpus partition, so a query set beyond the
    * session's broadcast threshold means the caller picked the wrong
    * operator — fail loudly before OOMing executors mid-stage. The
    * |queries| ≪ |corpus| contract is the operator's definition, not a
    * tunable; the corpus-scale paths are [[lshTopK]] and
    * `Clustering.ivfTopK`.
    *
    * Two layers: Catalyst's plan estimate first (no job). But WITHOUT
    * CBO stats a Filter keeps its child's size estimate — a 20-row
    * `vec_id < 20` slice of a 100×-scale table "estimates" at table
    * size (measured: the guard spuriously rejected every AnnTruth
    * query set at sf10) — so an over-limit ESTIMATE falls back to a
    * bounded TRUE row-count probe (`limit(cap + 1)`, early-out at the
    * cap) before rejecting. A false reject at scale is a correctness
    * bug in the guard; the probe job is bounded by the cap regardless
    * of corpus size. The row cap derives from the probe rows' MEASURED
    * width (an in-plan size expression per column — size(arr)*elem for
    * numeric arrays, length+20 for strings — max over the probed
    * rows), not from Catalyst defaultSize: ArrayType.defaultSize
    * assumes ONE element, so a 64-dim embedding schema "weighed" 8 B
    * and the old schema-derived width collapsed to the 1 KiB floor for
    * exactly the wide-array case it claimed to fix (r20 ADVICE). The
    * floor stays as a second margin for opaque nested types the
    * expression undercounts.
    */
  private[operators] def requireBroadcastableQueries(queries: DataFrame, op: String): Unit = {
    val conf = queries.sparkSession.conf
    val threshold =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    // threshold -1 disables AUTO broadcast but explicit broadcast()
    // hints still apply; guard against Spark's 8 GB hard hint limit then
    val limit = if (threshold > 0) threshold else 8L << 30
    val estimate = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimate > BigInt(limit)) {
      import org.apache.spark.sql.types._
      // Per-row width measured from the PROBED ROWS, not from
      // ArrayType.defaultSize (which assumes ONE element: a 64-dim
      // f64 embedding schema "weighs" 8 B, so the old schema-derived
      // width collapsed to the 1 KiB floor for exactly the wide-array
      // case it claimed to fix — r20 ADVICE). Variable-width columns
      // contribute an in-plan size expression; opaque nested types
      // fall back to defaultSize, with the 1 KiB floor kept as the
      // second margin for anything the expression undercounts.
      val rowBytes: Column = queries.schema.fields.map { f =>
        f.dataType match {
          case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
            coalesce(size(col(f.name)).cast("long"), lit(0L)) *
              lit(et.defaultSize.toLong) + lit(16L)
          case StringType =>
            coalesce(length(col(f.name)).cast("long"), lit(0L)) + lit(20L)
          case BinaryType =>
            coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + lit(16L)
          case dt => lit(dt.defaultSize.toLong)
        }
      }.reduceOption(_ + _).getOrElse(lit(8L))
      val capFloor = math.max(1L, limit / 1024L)
      val probeRow = queries
        .limit(math.min(capFloor + 1, Int.MaxValue.toLong).toInt)
        .agg(count(lit(1)), max(rowBytes)).head()
      val probed = probeRow.getLong(0)
      val measured = if (probeRow.isNullAt(1)) 0L else probeRow.getLong(1)
      val perRowBytes = math.max(1024L, measured)
      val cap = math.max(1L, limit / perRowBytes)
      require(probed <= cap,
        s"$op broadcasts the query side to every corpus partition, but the " +
          s"query set has >= $probed rows (cap $cap at ~$perRowBytes B/row " +
          s"measured from the probe rows for the $limit-byte broadcast limit; plan " +
          s"estimate $estimate bytes). " +
          "This operator is the |queries| << |corpus| baseline - use " +
          "lshTopK or Clustering.ivfTopK for large query sets, or raise " +
          "spark.sql.autoBroadcastJoinThreshold deliberately.")
    }
  }

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * queries x corpus is a broadcast nested-loop by design: the query
    * set is expected to be small (it is broadcast); the corpus streams
    * partition-local. For corpus-x-corpus all-pairs use the LSH variant.
    * Oversized query sides fail at plan time
    * ([[requireBroadcastableQueries]]).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireBroadcastableQueries(queries, "bruteForceTopK")
    val c = corpus.select(col(idCol).as("neighbor_id"), normalized(col(vecCol)).as("c_vec"))
    val q = queries.select(col(idCol).as("query_id"), normalized(col(vecCol)).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Int8-quantized top-k with exact rerank: score query x corpus on
    * symmetric per-vector int8 quantizations of the unit vectors
    * (approx_cos = int_dot * scale_q * scale_c), rank on the approx
    * score, and attach the exact cosine of the winners — the standard
    * memory-bound ANN layout (quantized corpus resident, float vectors
    * only touched for the k survivors).
    *
    * Same broadcast nested-loop shape as [[bruteForceTopK]]; the
    * difference is the per-pair kernel (int8 MAC vs double MAC) and
    * that a corpus partition streams 1/4 the bytes. The exact vectors
    * ride the corpus rows here (single pass); a disk-resident variant
    * would join them back post-rank instead.
    */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.{vectorDotInt8, vectorQuantScale, vectorQuantize}
    requireBroadcastableQueries(queries, "quantizedTopK")
    def prep(df: DataFrame, role: String): DataFrame =
      df.select(col(idCol).as(s"${role}_id"), normalized(col(vecCol)).as("en"))
        .select(col(s"${role}_id"), col("en").as(s"${role}_en"),
          vectorQuantScale(col("en")).as(s"${role}_scale"),
          vectorQuantize(col("en")).as(s"${role}_qv"))
    val c = prep(corpus, "neighbor")
    val q = prep(queries, "query")
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vectorDotInt8(col("query_qv"), col("neighbor_qv")) *
          col("query_scale") * col("neighbor_scale"), 6).as("approx_cos"),
        col("query_en"), col("neighbor_en"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      // exact rerank math only for the k survivors per query
      .select(col("query_id"), col("neighbor_id"), col("approx_cos"),
        round(dot(col("query_en"), col("neighbor_en")), 6).as("cos_sim"),
        col("rank"))
  }

  // hyperplane components live with the kernel (same md5 scheme as the
  // round-1 literal shipping — signatures are unchanged)
  private def planeComponent(p: Int, i: Int): Double =
    graft.functions.VectorOps.planeComponent(p, i)

  private def maxDims = graft.functions.VectorOps.maxDims

  /** Sign-bit LSH signature for one hash table: bit p = 1 iff
    * dot(vec, plane_{table*planes+p}) > 0. Supports up to `maxDims`
    * dimensions. Scalar form for one-off use; the bulk path is
    * `lshBuckets` (explode + grouped sums — interpreted per-plane folds
    * here made sf0.1 s2 take 6s warm / 30s cold for 2000 rows, mostly
    * plan-size pathology from 32x256 literal nodes per branch).
    */
  def lshSignature(vec: Column, numPlanes: Int, table: Int = 0): Column = {
    val v = asDouble(vec)
    val bits = (0 until numPlanes).map { p =>
      // ONE Literal node (typedlit), not a 256-child CreateArray
      val planeLit = typedlit(
        (0 until maxDims).map(i => planeComponent(table * numPlanes + p, i)))
      val proj = aggregate(
        zip_with(v, slice(planeLit, lit(1), size(v)), (x, h) => x * h),
        lit(0.0), (acc, t) => acc + t)
      when(proj > 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bulk (id, table, bucket) LSH table rows: ONE codegen'd kernel call
    * per row computes every table's sign-bit bucket (array<long>), then
    * posexplode emits (table=pos, bucket). Pure per-row map — no
    * shuffle, embarrassingly parallel at any scale. Bucket values are
    * identical to `lshSignature` (same plane scheme, same left-to-right
    * accumulation).
    */
  def lshBuckets(
      df: DataFrame, idCol: String, outIdName: String,
      planesPerTable: Int, numTables: Int,
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as(outIdName),
        posexplode(graft.functions.VectorExpressions.lshBuckets(
          col(vecCol), planesPerTable, numTables)))
      .select(col(outIdName), col("pos").cast("int").as("table"),
        col("col").as("bucket"))

  /** Approximate top-k via multi-table hyperplane LSH: candidates =
    * docs sharing a bucket with the query in ANY of `numTables` tables
    * (recall 1-(1-p^b)^L against single-probe p per plane), then exact
    * cosine rank over the (deduplicated) candidates. Recall vs
    * bruteForceTopK is asserted in tests.
    *
    * Scale shape: the corpus-side explode is numTables x corpus rows of
    * (table, bucket, id) — the vector payload stays on a single copy
    * and is re-joined only for surviving candidates.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      planesPerTable: Int = 4, numTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      multiProbe: Boolean = false): DataFrame = {
    val cBuckets = lshBuckets(corpus, idCol, "neighbor_id", planesPerTable, numTables, vecCol)
    val qBuckets0 = lshBuckets(queries, idCol, "query_id", planesPerTable, numTables, vecCol)
    // multi-probe: the QUERY side also visits every bucket at hamming
    // distance 1 (flip each sign bit) — recall of vectors that fell
    // just on the other side of one hyperplane, at planesPerTable extra
    // probes per table per query (query-side only: the corpus index
    // doesn't grow, which is the property that matters at scale)
    val qBuckets =
      if (!multiProbe) qBuckets0
      else qBuckets0.select(col("query_id"), col("table"),
        explode(array(col("bucket") +:
          (0 until planesPerTable).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val cands = cBuckets.join(broadcast(qBuckets), Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val cVec = corpus.select(col(idCol).as("neighbor_id"), normalized(col(vecCol)).as("c_vec"))
    val qVec = queries.select(col(idCol).as("query_id"), normalized(col(vecCol)).as("q_vec"))
    val scored = cands.join(cVec, "neighbor_id").join(broadcast(qVec), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked by a metadata
    * column (label): cosine >= threshold within a block.
    *
    * EXACT but block-quadratic: every within-block pair is scored, so
    * cost is O(sum block²) — fine when blocks are small and bounded,
    * wrong when block count is a fixed metadata cardinality and block
    * size grows with the corpus. The scale path is
    * [[cosineDupPairsLsh]]; this form stays as the exact baseline its
    * recall is measured against.
    */
  def cosineDupPairs(
      corpus: DataFrame, threshold: Double, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(blockCol).as("block"), col(idCol),
      normalized(col(vecCol)).as("vec"))
    val a = v.select(col("block"), col(idCol).as("a_id"), col("vec").as("a_vec"))
    val b = v.select(col("block"), col(idCol).as("b_id"), col("vec").as("b_vec"))
    a.join(b, "block")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_vec"), col("b_vec")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs at scale: candidates are
    * pairs sharing a sign-bit LSH bucket in ANY of `numTables` tables
    * (AND the metadata block), then the exact cosine >= threshold
    * verify — the [[Dedup.lshCandidates]] shape applied to vectors.
    *
    * Candidate bucket sizes scale with 2^planesPerTable x block
    * cardinality, so planesPerTable is the knob that grows with the
    * corpus (log n planes keeps buckets bounded) — unlike the fixed
    * metadata cardinality the all-pairs form leans on. Recall is
    * 1-(1-p^planes)^tables per pair (p = 1 - angle/pi): approximate by
    * construction, asserted against [[cosineDupPairs]] in spec; the
    * oracle reproduces the identical bucket math, so the output is
    * still exactly deterministic.
    *
    * Shuffles carry (id, table, bucket) keys only — vectors are
    * re-joined per surviving candidate, never exploded per table.
    */
  /** Per-vector cosine RANGE-SEARCH report over the LSH pair graph:
    * for each vector with at least one same-block neighbor at
    * cos >= threshold, the neighbor count, the best similarity and the
    * best neighbor id (ties at the 6-dp similarity break to the
    * smallest id — deterministic). Pair generation is exactly
    * [[cosineDupPairsLsh]]; pairs are symmetrized (each contributes a
    * neighbor to BOTH endpoints) and reduced per vector — the
    * "how crowded is this embedding's neighborhood" density signal
    * that semantic-dedup and diversity-sampling policies threshold on,
    * where top-k (s1/s2) answers a different question (k nearest
    * regardless of how near).
    *
    * Scale shape: everything up to the report is the cosineDupPairsLsh
    * plan (bucket-key shuffles, vectors joined back per candidate);
    * the report adds one id-keyed aggregation over the verified pairs.
    */
  def rangeSearchReport(
      corpus: DataFrame, threshold: Double, blockCol: String,
      planesPerTable: Int = 2, numTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = cosineDupPairsLsh(corpus, threshold, blockCol,
      planesPerTable, numTables, idCol, vecCol)
    val sym = pairs
      .select(col("a_id").as(idCol), col("b_id").as("nbr"), col("cos_sim"))
      .unionByName(pairs
        .select(col("b_id").as(idCol), col("a_id").as("nbr"), col("cos_sim")))
    // best-neighbor tie-break: (cos_sim desc, nbr asc) via row_number —
    // NOT max(struct(cos_sim, -nbr)): arithmetic negation assumes a
    // numeric id column, and idCol is a parameter (a string vec_id
    // would null out / fail analysis and silently degrade the
    // documented smallest-id tie-break). Both window functions share
    // the one id-keyed exchange the groupBy would have paid.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
    sym
      .withColumn("n_neighbors", count(lit(1)).over(w))
      .withColumn("_rn", row_number().over(
        w.orderBy(col("cos_sim").desc, col("nbr").asc)))
      .where(col("_rn") === 1)
      .select(col(idCol), col("n_neighbors"),
        col("cos_sim").as("best_sim"), col("nbr").as("best_id"))
  }

  def cosineDupPairsLsh(
      corpus: DataFrame, threshold: Double, blockCol: String,
      planesPerTable: Int = 2, numTables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets = lshBuckets(corpus, idCol, "id", planesPerTable, numTables, vecCol)
      .join(corpus.select(col(idCol).as("id"), col(blockCol).as("block")), "id")
    val cands = buckets
      .select(col("block"), col("table"), col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("block"), col("table"), col("bucket"), col("id").as("b_id")),
        Seq("block", "table", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    val v = corpus.select(col(idCol), normalized(col(vecCol)).as("vec"))
    cands
      .join(v.select(col(idCol).as("a_id"), col("vec").as("a_vec")), "a_id")
      .join(v.select(col(idCol).as("b_id"), col("vec").as("b_vec")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_vec"), col("b_vec")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split the vector into
    * `nSub` contiguous subspaces and give each its own codeword table.
    * Seeding: the sub-slices of the first `codebookSize` NORMALIZED
    * corpus vectors (ids < codebookSize), in id order — the
    * one-assignment-step analog of e2's seeded Lloyd, deterministic on
    * both engines. One bounded collect, same k×dims driver-resident
    * shape as `Clustering.seedCentroids`: PQ codebooks are
    * broadcast-resident by construction at ANY corpus scale (that is
    * the point of the method — the corpus holds only 4-bit codes;
    * codebook training touches a sample, never the corpus).
    */
  def pqCodebooks(
      corpus: DataFrame, nSub: Int, codebookSize: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Seq[(Int, Array[Double])]] = {
    val seeds = corpus.where(col(idCol) < codebookSize)
      .select(col(idCol).cast("int"), normalized(col(vecCol)))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val dims = seeds.head._2.length
    require(dims % nSub == 0,
      s"pqCodebooks: $dims dims not divisible into $nSub subspaces")
    val subDims = dims / nSub
    (0 until nSub).map { j =>
      seeds.toSeq.map { case (c, v) =>
        (c, v.slice(j * subDims, (j + 1) * subDims))
      }
    }
  }

  /** PQ + asymmetric distance (ADC) top-k over the codebooks from
    * [[pqCodebooks]]: the fourth ANN family next to brute force (s1),
    * LSH (s2/s4) and IVF (s3/s8) — the memory-bound workhorse when
    * even int8 vectors (s5) don't fit. Corpus vectors are encoded to
    * one codeword id per subspace (nSub·log₂k bits — 16×4 = 8 bytes
    * against 256 for f32×64, a 32× compression); each QUERY
    * precomputes a lookup table lut(j)(c) = ⟨q_subⱼ, codewordⱼ,c⟩, and
    * the approximate score is nSub table lookups per corpus row — no
    * float vector is touched until the shortlist's exact rerank.
    *
    * Encoding runs one compiled argmin kernel per subspace
    * ([[graft.functions.VectorNearestCentroid]] over the sub-slice) —
    * not k literal subtrees — and ties go to the lowest codeword id on
    * both engines. Search is the standard two-stage PQ retrieval: the
    * ADC score (on the ROUNDED value, 6 dp, neighbor-id tie-break —
    * the same cross-engine total order s5 uses) selects a shortlist of
    * `rerankDepth` candidates per query, and only those touch float
    * vectors for the exact-cosine rerank that produces the final
    * top-k. The shortlist is what makes coarse codebooks usable: ADC
    * only has to get the true neighbors into the top `rerankDepth`,
    * not rank them, and the exact pass pays k·rerankDepth dots per
    * query instead of |corpus|. Same broadcast-nested-loop shape as
    * [[bruteForceTopK]]: the query side must be small
    * ([[requireBroadcastableQueries]]); the corpus side streams codes.
    */
  /** PQ codes for a NORMALIZED vector column: one codeword id per
    * subspace via the compiled argmin kernel (ties -> lowest id).
    */
  def pqCodes(en: Column, codebooks: Seq[Seq[(Int, Array[Double])]]): Column = {
    val subDims = codebooks.head.head._2.length
    array(codebooks.indices.map { j =>
      graft.functions.VectorExpressions
        .nearestCentroidStruct(slice(en, j * subDims + 1, subDims), codebooks(j))
        .getField("cid")
    }: _*)
  }

  /** Per-query ADC lookup tables for a NORMALIZED vector column:
    * luts(j)(c) = ⟨en_subⱼ, codewordⱼ,c⟩ — nSub×|codebook| small dots,
    * computed once per query and carried on the broadcast side.
    */
  def pqLuts(en: Column, codebooks: Seq[Seq[(Int, Array[Double])]]): Column = {
    val subDims = codebooks.head.head._2.length
    array(codebooks.indices.map { j =>
      array(codebooks(j).map { case (_, cw) =>
        dot(slice(en, j * subDims + 1, subDims), typedlit(cw.toSeq))
      }: _*)
    }: _*)
  }

  /** The ADC kernel: sum over subspaces of the code-indexed LUT entry —
    * a pure table-lookup score, no float vector on the corpus side.
    * Native codegen expression (r18): the interpreted
    * `aggregate(zip_with(...))` fold it replaced allocated a zipped
    * array per scored row and ran both lambdas interpreted — on the
    * ADC scan that touches EVERY corpus row per query (the point of
    * PQ is that this scan is cheap), exactly the no-interpreted-
    * lambdas rule. Same left-to-right accumulation, same
    * fold-poisoning null semantics, byte-identical oracle.
    */
  def adcScore(codes: Column, luts: Column): Column =
    graft.functions.VectorExpressions.adcScore(codes, luts)

  /** The ADC stage of [[pqTopK]] alone: the rerankDepth-deep per-query
    * shortlist with its ADC rank and the exact cosine already computed
    * — shared by pqTopK and the s13 shortlist-depth S-curve, which
    * derives EVERY depth <= rerankDepth from one ranking pass (the
    * depth only gates which candidates reach the exact window).
    */
  def pqAdcShortlist(
      corpus: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[(Int, Array[Double])]],
      rerankDepth: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireBroadcastableQueries(queries, "pqAdcShortlist")
    val en = normalized(col(vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"), en.as("n_en"),
      pqCodes(en, codebooks).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), en.as("q_en"),
      pqLuts(en, codebooks).as("luts"))
    // the ADC ranking pass runs over NARROW rows — (ids, codes, score)
    // only. Carrying both 64-dim vectors through the per-query ranking
    // sort multiplied the sorted bytes ~8x for data the sort never
    // reads (measured at sf3: s13 11.2 s with the interpreted fold ->
    // 8.4 s native kernel -> 6.5 s after this narrowing); the vectors
    // rejoin below for only |queries| x rerankDepth rows.
    val scored = c.select(col("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q.select(col("query_id"), col("luts"))))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adcScore(col("codes"), col("luts")), 6).as("approx_cos"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val short = scored
      .withColumn("adc_rank", row_number().over(wAdc))
      .where(col("adc_rank") <= rerankDepth)
    // exact math only for the shortlist: the bounded shortlist
    // broadcasts against one pruned corpus pass (codes not recomputed
    // — column pruning drops the expression), queries stay broadcast
    c.select(col("neighbor_id"), col("n_en"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("q_en"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx_cos"),
        round(dot(col("q_en"), col("n_en")), 6).as("cos_sim"),
        col("adc_rank"))
  }

  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      codebooks: Seq[Seq[(Int, Array[Double])]],
      rerankDepth: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val shortlist =
      pqAdcShortlist(corpus, queries, codebooks, rerankDepth, idCol, vecCol)
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    shortlist
      .withColumn("rank", row_number().over(wExact))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_cos", "cos_sim", "rank")
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * CCMatrix/LASER criterion): a candidate pair (x, y) scores
    * cos(x, y) normalized by the average similarity of each side's
    * k-nearest neighborhood — `margin = cos(x,y) / ((avgNNₖ(x) +
    * avgNNₖ(y)) / 2)` — which suppresses hub vectors that are "close
    * to everything" and promotes pairs that stand out from their own
    * neighborhoods. The mined output is every forward-kNN pair with
    * its margin and a `mutual` flag (y's backward rank of x also ≤ k,
    * the high-precision subset).
    *
    * Scale shape: candidates are generated WITHIN coarse-quantizer
    * cells only (the same deterministic centroids as the IVF index),
    * so both corpora shuffle once on `cell` and the pair space is
    * |cell_src|×|cell_tgt| per cell, never |src|×|tgt| — the same
    * bounded-blocking posture as semantic dedup. Neighborhood stats
    * are therefore per-cell approximations of the global kNN, exactly
    * as a sharded production miner computes them.
    *
    * Cross-engine determinism: per-pair cosines are floored to
    * integer micro-units (the dot is computed bit-identically on both
    * engines — left-to-right fold), neighborhood sums are then exact
    * integer math, and the margin is a single IEEE division of exact
    * integers — no summation-order sensitivity anywhere.
    */
  def marginMining(
      src: DataFrame, tgt: DataFrame,
      centroids: Seq[(Int, Array[Double])], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.nearestCentroidStruct
    def side(df: DataFrame, role: String): DataFrame =
      df.select(
        col(idCol).as(s"${role}_id"),
        normalized(col(vecCol)).as(s"${role}_en"),
        nearestCentroidStruct(col(vecCol), centroids).getField("cid").as("cell"))
    // shuffle_hash: the blocked pair join on `cell` carries unit
    // vectors on both sides — sort-merge buffers each cell group's
    // ~1 KB rows; hashing one side measured 12.8x faster at sf3
    // (s22, SCALE.md r20). Strategy only — results identical.
    //
    // NOT screened (r21, measured): the PairScreen int8 screen that
    // pays off for the threshold consumers (contamination, dedup) and
    // the graph build was tried here and measured 2.3x SLOWER warm at
    // sf3 (4.9 -> 11.3 s isolated) — a dual-direction top-k consumer
    // ranks EVERY pair anyway, so the bound cut needs two full-frame
    // nth_value windows (which buffer whole partitions where
    // row_number streams) plus vector re-attach joins, and the i8 dot
    // saving cannot cover them. The windows here already rank NARROW
    // (src_id, tgt_id, cos_micro) rows — the dot is computed in-stage
    // with the join, before any exchange.
    val pairs = side(src, "src").hint("shuffle_hash").join(side(tgt, "tgt"), "cell")
      .select(col("src_id"), col("tgt_id"),
        floor(dot(col("src_en"), col("tgt_en")) * 1e6).cast("long")
          .as("cos_micro"))
    val wF = Window.partitionBy("src_id")
      .orderBy(col("cos_micro").desc, col("tgt_id"))
    val wB = Window.partitionBy("tgt_id")
      .orderBy(col("cos_micro").desc, col("src_id"))
    val ranked = pairs
      .withColumn("f_rank", row_number().over(wF))
      .withColumn("b_rank", row_number().over(wB))
    val fwd = ranked.where(col("f_rank") <= k)
      .groupBy("src_id")
      .agg(sum("cos_micro").as("f_sum"), count(lit(1)).as("f_n"))
    val bwd = ranked.where(col("b_rank") <= k)
      .groupBy("tgt_id")
      .agg(sum("cos_micro").as("b_sum"), count(lit(1)).as("b_n"))
    ranked.where(col("f_rank") <= k)
      .join(fwd, "src_id").join(bwd, "tgt_id")
      .select(
        col("src_id"), col("tgt_id"),
        (col("cos_micro").cast("double") / 1e6).as("cos_sim"),
        // 2·cos·f_n·b_n / (f_sum·b_n + b_sum·f_n): the ratio margin as
        // one division of exact integers (numerator promoted to double
        // left-to-right; every intermediate < 2^53). The denominator
        // can be <= 0 when a neighborhood's floored micro-cosines sum
        // non-positive (near-orthogonal/anti-correlated cells): the
        // ratio margin is undefined there — emit NULL rather than an
        // Infinity/sign-flipped value that would silently corrupt
        // downstream margin ranking (oracle mirrors the guard)
        when(
          (col("f_sum") * col("b_n") + col("b_sum") * col("f_n")) > 0,
          round(
            lit(2.0) * col("cos_micro") * col("f_n") * col("b_n") /
              (col("f_sum") * col("b_n") + col("b_sum") * col("f_n"))
                .cast("double"),
            6)).as("margin"),
        col("f_rank").as("rank"),
        (col("b_rank") <= k).as("mutual"))
  }
}
