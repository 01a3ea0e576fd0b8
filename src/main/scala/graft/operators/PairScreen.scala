package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compressed pre-screen for blocked pair joins (guide §2.3 "shuffle
  * keys and metadata instead of payloads", §8's lightweight-proxy
  * rule): the cell-blocked pair sites used to ship 512-byte f64 unit
  * vectors through their one exchange and pay a 64-dim f64 dot per
  * candidate pair. Shipping the existing s5/s10 int8 encoding
  * (array<tinyint> code + one double scale, ~90 B/row) instead cuts
  * the exchange ~6x and the per-pair multiply-accumulate from f64 to
  * i8; survivors of a CONSERVATIVE error bound are then re-scored
  * with the exact f64 dot, so results are provably identical.
  *
  * Bound derivation. [[graft.functions.VectorOps.quantize8]] encodes
  * x as q_i = floor(x_i/s + 0.5) with s = max|x|/127, so the residual
  * vector r = x - s*q has |r_i| <= s/2. For unit vectors a, b (the
  * only inputs these sites quantize; ||a||, ||b|| <= 1, all-zero
  * degenerates to 0) with approx = s_a*s_b*(q_a . q_b):
  *
  *   |a.b - approx| = |r_a.b + a.r_b - r_a.r_b|
  *                 <= ||r_a|| + ||r_b|| + ||r_a||*||r_b||
  *                 <= (s_a + s_b) * sqrt(d)/2 + s_a*s_b*d/4.
  *
  * [[margin]] absorbs everything sub-analytic: the 6-dp HALF_UP
  * rounding the consumers apply to the exact cosine (<= 5e-7) and the
  * few-ulp IEEE noise of evaluating approx and the bound themselves
  * (~1e-15). A pair the screen keeps is re-scored exactly; a pair it
  * drops satisfies round(dot, 6) < tau by the bound, so the screened
  * result equals the unscreened one value-for-value (the oracle SQL
  * is untouched — it replays the unscreened definition).
  */
object PairScreen {
  import graft.functions.VectorExpressions.{vectorDotInt8, vectorQuantScale, vectorQuantize}

  /** Slack absorbing 6-dp HALF_UP rounding (5e-7) + IEEE noise. */
  val margin: Double = 1e-6

  /** int8 code of an already-unit-normalized vector (~64 B). */
  def code(en: Column): Column = vectorQuantize(en)

  /** The matching dequantization scale (max|x|/127). */
  def scale(en: Column): Column = vectorQuantScale(en)

  /** Approximate cosine from two codes: exact int dot x both scales. */
  def approx(aCode: Column, aScale: Column,
      bCode: Column, bScale: Column): Column =
    vectorDotInt8(aCode, bCode).cast("double") * aScale * bScale

  /** Conservative |exact - approx| bound (see object doc); `dims` is
    * size(code) of either side.
    */
  def bound(aScale: Column, bScale: Column, dims: Column): Column = {
    val d = dims.cast("double")
    (aScale + bScale) * sqrt(d) * lit(0.5) +
      aScale * bScale * d * lit(0.25)
  }

  /** Screen predicate for a fixed threshold consumer that keeps pairs
    * with round(dot, 6) >= tau: true for every pair the exact filter
    * could keep (false only when the bound PROVES round(dot,6) < tau).
    */
  def mayReach(tau: Double, aCode: Column, aScale: Column,
      bCode: Column, bScale: Column): Column =
    approx(aCode, aScale, bCode, bScale) >=
      lit(tau - margin) - bound(aScale, bScale, size(aCode))
}
