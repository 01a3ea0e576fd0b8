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

  /** Distinct word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(normalize(text), " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(normalize(text))))
  }

  /** Exact duplicate groups by content hash: one row per distinct
    * content, with group size and the surviving (minimum) doc id.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), md5(normalize(col(textCol)).cast("binary")).as("content_md5"))
      .groupBy("content_md5")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_docs"))

  /** MinHash signatures in long form: (id, k, minhash), k < numHashes.
    * minhash_k = min over shingles of seededHash(shingle, k).
    */
  def minhashSignatures(
      docs: DataFrame, numHashes: Int, shingleSize: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingles(col(textCol), shingleSize)
    val sig = transform(sequence(lit(0), lit(numHashes - 1)),
      k => struct(k.as("k"),
        array_min(transform(sh, s =>
          conv(substring(md5(concat(k.cast("string"), lit(":"), s)), 1, 15), 16, 10)
            .cast("bigint"))).as("minhash")))
    docs
      .select(col(idCol), explode(sig).as("kv"))
      .select(col(idCol), col("kv.k").as("k"), col("kv.minhash").as("minhash"))
  }

  /** LSH candidate pairs: signatures banded (rowsPerBand consecutive
    * hashes per band); docs sharing any full band collide. Returns
    * distinct (a_id, b_id) with a_id < b_id.
    */
  def lshCandidates(
      signatures: DataFrame, rowsPerBand: Int, idCol: String = "doc_id"): DataFrame = {
    // sort_array makes the band key independent of collect_list order
    val bandKeys = signatures
      .withColumn("band", (col("k") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(sort_array(collect_list(struct(col("k"), col("minhash")))).as("kv"))
      .withColumn("band_key",
        concat_ws(",", transform(col("kv"), x => concat_ws(":", x("k"), x("minhash")))))
      .select(col(idCol), col("band"), col("band_key"))
    val a = bandKeys.select(col(idCol).as("a_id"), col("band"), col("band_key"))
    val b = bandKeys.select(col(idCol).as("b_id"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union > 0, inter.cast("double") / union.cast("double")).otherwise(0.0)
  }

  /** Pairwise n-gram Jaccard within a blocking key: candidate pairs are
    * (blockCol-equal) docs; output pairs with similarity >= threshold.
    */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double, blockCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withShingles = docs.select(
      col(blockCol).as("block"), col(idCol), shingles(col(textCol), n).as("sh"))
    val a = withShingles.select(col("block"), col(idCol).as("a_id"), col("sh").as("a_sh"))
    val b = withShingles.select(col("block"), col(idCol).as("b_id"), col("sh").as("b_sh"))
    a.join(b, "block")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_sh"), col("b_sh")), 6).as("jaccard_sim"))
      .where(col("jaccard_sim") >= threshold)
  }

  /** 48-bit SimHash over whitespace tokens of normalized text (48 keeps
    * every intermediate in non-negative BIGINT range on all engines).
    */
  def simhash48(text: Column): Column = {
    val hashes = transform(TextAnalysis.wsTokens(normalize(text)),
      t => seededHash(t, 0))
    val bits = (0 until 48).map { b =>
      val balance = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(balance > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs within a blocking key: hamming distance of
    * the 48-bit signatures <= maxHamming.
    */
  def simhashPairs(
      docs: DataFrame, maxHamming: Int, blockCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = docs.select(
      col(blockCol).as("block"), col(idCol), simhash48(col(textCol)).as("sig"))
    val a = sigs.select(col("block"), col(idCol).as("a_id"), col("sig").as("a_sig"))
    val b = sigs.select(col("block"), col(idCol).as("b_id"), col("sig").as("b_sig"))
    a.join(b, "block")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
