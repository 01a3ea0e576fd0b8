package graft

import org.apache.spark.sql.SparkSession

/** Profile one registry query in isolation: run it `reps` times in a
  * warm session, print per-rep seconds (read the LAST number; first rep
  * pays JIT/session warmup — see spark-perf-rules).
  *
  * Usage: sbt "runMain graft.ProfQuery s2_ann_lsh /root/testdata/sf0.1 3"
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name: $secs%.3f s ($n rows)")
      secs
    }
    println(f"$name warm: ${times.last}%.3f s")
    spark.stop()
  }
}
