package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r21 compressed pair screen: the error bound must be CONSERVATIVE
  * (never tighter than the true |exact - approx| gap — a pair wrongly
  * screened out silently changes dedup/audit results), and the screened
  * operators' exchanges must actually ship the int8 codes instead of
  * the f64 unit vectors (the optimization's whole point — a refactor
  * that reattaches the vector column upstream of the pair join would
  * silently restore the 512-byte exchange with results unchanged).
  */
class PairScreenSpec extends SparkSpec {

  test("int8 screen bound is conservative over adversarial unit vectors") {
    import spark.implicits._
    // deterministic pseudo-random vectors incl. adversarial shapes:
    // one dominant component (max scale), near-uniform, sparse, zero
    val rnd = new scala.util.Random(42)
    val dims = 64
    val vecs: Seq[(Long, Array[Float])] = (0L until 60L).map { i =>
      val v = new Array[Float](dims)
      i % 4 match {
        case 0 => (0 until dims).foreach(d => v(d) = rnd.nextFloat() * 2 - 1)
        case 1 => v(rnd.nextInt(dims)) = 1f; v(rnd.nextInt(dims)) = 0.01f
        case 2 => (0 until 4).foreach(_ => v(rnd.nextInt(dims)) = rnd.nextFloat())
        case 3 => () // all-zero: quantizes to zeros, exact cos is 0
      }
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val en = Similarity.normalized(col("embedding"))
    val side = df.select(col("vec_id"), en.as("en"),
      PairScreen.code(en).as("qv"), PairScreen.scale(en).as("qs"))
    val a = side.select(col("vec_id").as("a_id"), col("en").as("a_en"),
      col("qv").as("a_qv"), col("qs").as("a_qs"))
    val b = side.select(col("vec_id").as("b_id"), col("en").as("b_en"),
      col("qv").as("b_qv"), col("qs").as("b_qs"))
    val pairs = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(
        Similarity.dot(col("a_en"), col("b_en")).as("exact"),
        PairScreen.approx(col("a_qv"), col("a_qs"),
          col("b_qv"), col("b_qs")).as("approx"),
        PairScreen.bound(col("a_qs"), col("b_qs"), size(col("a_qv"))).as("bnd"))
      .collect()
    assert(pairs.length == 60 * 59 / 2)
    pairs.foreach { r =>
      val (exact, approx, bnd) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(exact - approx) <= bnd + 1e-12,
        s"bound violated: exact=$exact approx=$approx bnd=$bnd")
    }
    // and the screen predicate keeps every pair the exact filter keeps
    val tau = 0.3
    val kept = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .where(round(Similarity.dot(col("a_en"), col("b_en")), 6) >= tau)
      .where(!PairScreen.mayReach(tau, col("a_qv"), col("a_qs"),
        col("b_qv"), col("b_qs")))
      .count()
    assert(kept == 0, s"$kept exact-qualifying pairs screened out")
  }

  test("screened pair joins ship int8 codes through the exchange, not f64 vectors") {
    // s22's fraction-mode audit at fixture scale (the one screened
    // audit — s21's fixed-nprobe mode measured faster unscreened, see
    // semanticContamination): the ShuffledHashJoin's two child
    // exchanges must carry array<tinyint> codes and no array<double>
    // column (the sizing contract of the shuffle_hash hint is
    // |corpus|/partitions rows of ~90 B build side — see PairScreen
    // doc; a vector column here would sextuple it back)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType}
    val out = graft.SparkEntry.queries("s22_semantic_contamination_frac")(
      spark, "/root/testdata/sf0.001")
    out.queryExecution.toRdd.count()
    // descend through AQE query-stage leaves (collect stops at them)
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(deep)
    }
    val shj = deep(out.queryExecution.executedPlan)
      .collect { case j: ShuffledHashJoinExec => j }
    assert(shj.nonEmpty,
      s"pair join not SHJ:\n${out.queryExecution.executedPlan}")
    shj.foreach { j =>
      val types = (j.left.output ++ j.right.output).map(_.dataType)
      assert(types.exists {
        case ArrayType(ByteType, _) => true; case _ => false
      }, s"no int8 code column at the pair join:\n$j")
      assert(!types.exists {
        case ArrayType(DoubleType, _) => true; case _ => false
      }, s"f64 vector column crosses the pair exchange:\n$j")
    }
  }
}
