package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose d14's cost — eval-side + bloom build vs the
  * train-side kernel scan vs the full query.
  * Usage: runMain graft.ProfD14 [sfDir [reps]]
  */
object ProfD14 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf3"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextHashExpressions.tokenGramHash60sDistinct
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(what: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    (1 to reps).foreach { _ =>
      time("kernel-scan-count") {
        docs.select(col("doc_id"),
          tokenGramHash60sDistinct(
            operators.TextAnalysis.normalize(col("text")), 2).as("arr"))
          .select(explode_outer(col("arr")).as("h"))
          .where(col("h").isNotNull)
          .count()
      }
      time("normalize-only") {
        docs.select(length(operators.TextAnalysis.normalize(col("text")))
          .as("l")).agg(sum("l")).collect()(0)
      }
      time("eval+bloom-build") {
        val evalPred = operators.Dedup.hash60(col("doc_id").cast("string")) % 25 === 1
        val ev = operators.Dedup.hashedShingleTable(
          docs.where(evalPred), 2).localCheckpoint()
        val n = ev.count()
        val bloom = ev.stat.bloomFilter("h", math.max(1L, n), 0.01)
        s"$n eval postings, ${bloom.bitSize()} bits"
      }
      time("join-output-rows") {
        val evalPred = operators.Dedup.hash60(col("doc_id").cast("string")) % 25 === 1
        val ev = operators.Dedup.hashedShingleTable(
          docs.where(evalPred), 2)
          .select(col("doc_id").as("eval_id"), col("h"))
        val tr = docs.where(!evalPred)
          .select(col("doc_id").as("train_id"),
            tokenGramHash60sDistinct(
              operators.TextAnalysis.normalize(col("text")), 2).as("arr"))
          .select(col("train_id"), explode_outer(col("arr")).as("h"))
          .where(col("h").isNotNull)
        tr.join(broadcast(ev), "h").count()
      }
      time("join+pairagg") {
        val evalPred = operators.Dedup.hash60(col("doc_id").cast("string")) % 25 === 1
        val ev = operators.Dedup.hashedShingleTable(
          docs.where(evalPred), 2)
          .select(col("doc_id").as("eval_id"), col("h"))
        val tr = docs.where(!evalPred)
          .select(col("doc_id").as("train_id"),
            tokenGramHash60sDistinct(
              operators.TextAnalysis.normalize(col("text")), 2).as("arr"))
          .select(col("train_id"), explode_outer(col("arr")).as("h"))
          .where(col("h").isNotNull)
        tr.join(broadcast(ev), "h")
          .groupBy("train_id", "eval_id").agg(count(lit(1)).as("n"))
          .where(col("n") >= 12).count()
      }
      time("full-d14") {
        SparkEntry.queries("d14_bloom_contamination")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
