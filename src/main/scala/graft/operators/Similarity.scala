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

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  // NOTE (measured, sf0.1): an unrolled element_at sum for fixed dims is
  // ~2x SLOWER than this HOF fold warm — 64 null-checked array accesses
  // lose to one interpreted pass over the materialized array. The
  // interpreted-lambda rule has this exception: a single tight fold over
  // an already-materialized numeric array is fine.

  def norm(a: Column): Column = sqrt(dot(a, a))

  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Unit-normalized double vector (all-zero stays all-zero, so the
    * pair dot degrades to cosine 0). Normalizing ONCE per vector makes
    * each candidate pair a single dot product instead of dot + two
    * norms — pairwise stages are the hot path, vectors are not.
    */
  def normalized(a: Column): Column = {
    val v = asDouble(a)
    val n = sqrt(aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), (acc, t) => acc + t))
    when(n > 0.0, transform(v, x => x / n)).otherwise(v)
  }

  /** Cosine similarity (0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0.0 && nb > 0.0, d / (na * nb)).otherwise(0.0)
  }

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * queries x corpus is a broadcast nested-loop by design: the query
    * set is expected to be small (it is broadcast); the corpus streams
    * partition-local. For corpus-x-corpus all-pairs use the LSH variant.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
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

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * plane p, dimension i — computed DRIVER-side (md5 of "hp<p>:<i>")
    * and shipped as literals, so signature evaluation is pure
    * arithmetic per row (the first version recomputed the md5 per row
    * per plane per dimension: 10M hashes at sf0.1).
    */
  private def planeComponent(p: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp$p:$i".getBytes("UTF-8"))
    val hex = digest.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16).toDouble / 5.764607523034235e17) - 1.0
  }

  private val maxDims = 256

  /** Sign-bit LSH signature for one hash table: bit p = 1 iff
    * dot(vec, plane_{table*planes+p}) > 0. Supports up to `maxDims`
    * dimensions (plane literals are pre-sliced to the vector size).
    */
  def lshSignature(vec: Column, numPlanes: Int, table: Int = 0): Column = {
    val v = asDouble(vec)
    val bits = (0 until numPlanes).map { p =>
      val plane = (0 until maxDims).map(i => planeComponent(table * numPlanes + p, i))
      val planeLit = array(plane.map(lit): _*)
      val proj = aggregate(
        zip_with(v, slice(planeLit, lit(1), size(v)), (x, h) => x * h),
        lit(0.0), (acc, t) => acc + t)
      when(proj > 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** All per-table signatures as an array of (table, bucket) structs. */
  def lshSignatures(vec: Column, planesPerTable: Int, numTables: Int): Column =
    array((0 until numTables).map(t =>
      struct(lit(t).as("table"), lshSignature(vec, planesPerTable, t).as("bucket"))): _*)

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
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = lshSignatures(col(vecCol), planesPerTable, numTables)
    val cBuckets = corpus.select(col(idCol).as("neighbor_id"), explode(sigs).as("tb"))
      .select(col("neighbor_id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val qBuckets = queries.select(col(idCol).as("query_id"), explode(sigs).as("tb"))
      .select(col("query_id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
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
}
