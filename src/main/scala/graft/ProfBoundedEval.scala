package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, PairScreen, Similarity}

/** Dev probe (r20 verdict item 3): the s21/s22 SCALE.md curves scale
  * the eval split WITH the corpus (`vec_id % 10 == 7`), so their
  * super-linear shape measures a fixture artifact — a production
  * decontamination audit has a BOUNDED eval set (benchmark suites are
  * fixed-size), making the corpus-scaling linear. This probe runs the
  * s22 fraction-mode audit with the eval side FROZEN to the sf0.1
  * split (vec_id % 10 == 7 AND vec_id < 100000 — the same rows at
  * every SF of the replicated fixture) so SCALE.md can record both
  * curves side by side. Timing-only (the bounded-eval variant is not
  * a registry query; the oracle gate keeps the registry definition).
  *
  * Usage: runMain graft.ProfBoundedEval <sfDir> [reps]
  */
object ProfBoundedEval {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables(spark, dir, "embeddings")
    val isEval = col("vec_id") % 10 === 7 && col("vec_id") < 100000L
    val train = e.where(!(col("vec_id") % 10 === 7)) // registry train split
    val evalSide = e.where(isEval)
    val cents = AuditQuantizer.centroids(spark, dir)
    val nprobe = Clustering.fractionNprobe(0.25, cents.size)
    val tau = 0.3
    val en = Similarity.normalized(col("embedding"))
    (1 to reps).foreach { _ =>
      val trainCells = Clustering.assign(train, cents).select(
        col("vec_id").as("train_id"), col("centroid_id").as("cell"),
        PairScreen.code(en).as("t_qv"), PairScreen.scale(en).as("t_qs"))
      val evalCells = evalSide.select(
          col("vec_id").as("eval_id"),
          PairScreen.code(en).as("e_qv"), PairScreen.scale(en).as("e_qs"),
          explode(graft.functions.VectorExpressions
            .topCentroidsStruct(col("embedding"), cents, nprobe)).as("pc"))
        .select(col("eval_id"), col("e_qv"), col("e_qs"), col("pc.cid").as("cell"))
      val cand = trainCells.hint("shuffle_hash").join(evalCells, Seq("cell"))
        .where(PairScreen.mayReach(tau,
          col("t_qv"), col("t_qs"), col("e_qv"), col("e_qs")))
        .select("train_id", "eval_id")
      val tv = train.select(col("vec_id").as("train_id"), en.as("t_en"))
      val ev = evalSide.select(col("vec_id").as("eval_id"), en.as("e_en"))
      val audit = cand.join(tv, "train_id").join(ev, "eval_id")
        .select(col("train_id"), col("eval_id"),
          round(Similarity.dot(col("t_en"), col("e_en")), 6).as("cos"))
        .where(col("cos") >= tau)
        .groupBy("train_id")
        .agg(count(lit(1)).as("n_eval_matches"), max(col("cos")).as("max_cos"))
        .orderBy("train_id")
      val t0 = System.nanoTime()
      val n = audit.queryExecution.toRdd.count()
      println(f"bounded_eval_s22 $dir: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
