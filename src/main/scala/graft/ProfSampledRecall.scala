package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Similarity}

/** Measure what quantizer-training SAMPLING costs in recall — the first
  * question a 100 TB deployment asks of the sampled trainer ("how small
  * can the training sample be?"), answered the way the repo answers
  * every tuning question: a measured table, not a hand-wave.
  *
  * For the corpus at `sfDir`, trains the coarse quantizer twice at the
  * corpus-scaled k — once on the FULL corpus (sampleMod = 1) and once
  * on the production hash-sample (Clustering.trainSampleMod) — then
  * runs the ivfTuningReport harness over a persisted index built from
  * each, against the same brute-force ground truth, and prints
  * recall@5 / candidate volume / cells read per nprobe side by side,
  * plus the wall-clock of each training pass. Results go to SCALE.md.
  *
  * Usage: sbt "runMain graft.ProfSampledRecall /tmp/sf1"
  */
object ProfSampledRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables(spark, sfDir, "embeddings").localCheckpoint()
    val n = e.count()
    val (k, smod) = Clustering.quantizerConfig(n)
    println(s"corpus: $n vectors, k = $k cells, production sampleMod = $smod " +
      s"(~${n / math.max(1L, smod)} training vectors)")
    val q = e.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(e, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    for ((label, mod) <- Seq("full-corpus" -> 1L, "sampled" -> smod)) {
      val t0 = System.nanoTime()
      val cents = Clustering.trainCentroids(e, k, iterations = 1,
        sampleMod = mod)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val ix = TempDirs.fresh(s"recall_$label")
      Clustering.writeIvfIndex(e, cents, ix)
      val rep = Clustering.ivfTuningReport(spark, ix, q, cents, truth,
          k = 5, nprobes = Seq(1, 2, 4, 8))
        .orderBy("nprobe").collect()
      println(f"== $label (mod $mod): train pass $tTrain%.2f s")
      rep.foreach { r =>
        println(f"   nprobe ${r.getAs[Int]("nprobe")}%2d: " +
          f"recall ${r.getAs[Long]("recall_micro") / 1e6}%.3f  " +
          f"candidates ${r.getAs[Long]("n_candidates")}%7d  " +
          f"cells ${r.getAs[Long]("n_cells_read")}%4d")
      }
    }
    spark.stop()
  }
}
