package graft

import org.apache.spark.sql.SparkSession

/** Profile BPE merge learning's per-step cost: run bpeMerges at
  * increasing step counts over the documents table and print seconds
  * plus seconds-per-step. Flat sec/step across rows = per-step cost is
  * independent of the step index (the checkpointed-lineage claim in
  * SCALE.md); a growing column reproduces the O(k^2) unchecked-pointed
  * behavior.
  *
  * Usage: sbt "runMain graft.ProfBpe /root/testdata/sf0.1 8,16,32,64 [ckptEvery]"
  * (ckptEvery defaults to the operator's 8; pass a huge value to
  * reproduce the unchecked-pointed O(k^2) baseline for the A/B.)
  */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val stepCounts =
      (if (args.length > 1) args(1) else "8,16,32,64").split(",").map(_.trim.toInt)
    val ckptEvery = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    // warm: session/codegen/parquet-footer init off the first row
    operators.TextAnalysis.bpeMerges(docs, steps = 4).count()
    stepCounts.foreach { k =>
      val t0 = System.nanoTime()
      val n = operators.TextAnalysis
        .bpeMerges(docs, steps = k, checkpointEvery = ckptEvery).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"steps=$k%-4d merges=$n%-4d total=$secs%7.2f s  per-step=${secs / k}%.3f s")
    }
    spark.stop()
  }
}
