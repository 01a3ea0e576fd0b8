package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, PairScreen, Similarity}

/** Dev probe: selectivity of the r21 int8 pair screen per consumer —
  * how many blocked pairs exist, how many the conservative bound
  * keeps (= rescore volume), and how many the exact filter keeps.
  * The keep/revert decision for each screened site is made from this
  * table (a screen only pays when kept << total).
  *
  * Usage: runMain graft.ProfScreen <sfDir> [tau]
  */
object ProfScreen {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tau = if (args.length > 1) args(1).toDouble else 0.3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables(spark, dir, "embeddings")
    val en = Similarity.normalized(col("embedding"))

    def stats(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val agg = pairs.select(
        count(lit(1)).as("total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("exact") >= tau, 1L).otherwise(0L)).as("qual"),
        sum(when(col("certain"), 1L).otherwise(0L)).as("certain"),
        round(avg(col("bnd")), 4).as("avg_bound")).head()
      println(s"SCREEN $name: total=${agg.getLong(0)} kept=${agg.getLong(1)} " +
        s"exact>=tau=${agg.getLong(2)} certain=${agg.getLong(3)} " +
        s"band=${agg.getLong(1) - agg.getLong(3)} avg_bound=${agg.getDouble(4)}")
    }

    // d13 shape: within-cell pairs, full corpus
    locally {
      val (_, _, cents) = CorpusQuantizer.get(spark, dir)
      val cells = Clustering.assign(e, cents).select(
        col("vec_id"), col("centroid_id").as("cell"), en.as("en"),
        PairScreen.code(en).as("qv"), PairScreen.scale(en).as("qs"))
      val a = cells.select(col("cell"), col("vec_id").as("a_id"),
        col("en").as("a_en"), col("qv").as("a_qv"), col("qs").as("a_qs"))
      val b = cells.select(col("cell"), col("vec_id").as("b_id"),
        col("en").as("b_en"), col("qv").as("b_qv"), col("qs").as("b_qs"))
      val pairs = a.hint("shuffle_hash").join(b, Seq("cell"))
        .where(col("a_id") < col("b_id"))
        .select(
          PairScreen.mayReach(tau, col("a_qv"), col("a_qs"),
            col("b_qv"), col("b_qs")).as("keep"),
          (PairScreen.approx(col("a_qv"), col("a_qs"), col("b_qv"), col("b_qs")) -
            PairScreen.bound(col("a_qs"), col("b_qs"), size(col("a_qv"))) >=
            lit(tau + PairScreen.margin)).as("certain"),
          round(Similarity.dot(col("a_en"), col("b_en")), 6).as("exact"),
          PairScreen.bound(col("a_qs"), col("b_qs"), size(col("a_qv"))).as("bnd"))
      stats("d13_within_cell", pairs)
    }

    // s21 shape: train x eval probes, nprobe 4
    locally {
      val cents = AuditQuantizer.centroids(spark, dir)
      val isEval = col("vec_id") % 10 === 7
      val train = e.where(!isEval)
      val evalSide = e.where(isEval)
      val trainCells = Clustering.assign(train, cents).select(
        col("vec_id").as("a_id"), col("centroid_id").as("cell"), en.as("a_en"),
        PairScreen.code(en).as("a_qv"), PairScreen.scale(en).as("a_qs"))
      val evalCells = evalSide.select(col("vec_id").as("b_id"), en.as("b_en"),
          PairScreen.code(en).as("b_qv"), PairScreen.scale(en).as("b_qs"),
          explode(graft.functions.VectorExpressions
            .topCentroidsStruct(col("embedding"), cents, 4)).as("pc"))
        .select(col("b_id"), col("b_en"), col("b_qv"), col("b_qs"),
          col("pc.cid").as("cell"))
      val pairs = trainCells.hint("shuffle_hash").join(evalCells, Seq("cell"))
        .select(
          PairScreen.mayReach(tau, col("a_qv"), col("a_qs"),
            col("b_qv"), col("b_qs")).as("keep"),
          (PairScreen.approx(col("a_qv"), col("a_qs"), col("b_qv"), col("b_qs")) -
            PairScreen.bound(col("a_qs"), col("b_qs"), size(col("a_qv"))) >=
            lit(tau + PairScreen.margin)).as("certain"),
          round(Similarity.dot(col("a_en"), col("b_en")), 6).as("exact"),
          PairScreen.bound(col("a_qs"), col("b_qs"), size(col("a_qv"))).as("bnd"))
      stats("s21_train_x_eval_np4", pairs)
    }
    spark.stop()
  }
}
