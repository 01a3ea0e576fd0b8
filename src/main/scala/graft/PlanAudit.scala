package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for representative queries so the
  * pushdown/broadcast/codegen posture is inspectable per round.
  * Usage: runMain graft.PlanAudit [sfDir [queryName...]]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q2_filter_project", "q4_broadcast_join", "q5_multi_join",
        "t2_decom", "d3_minhash_sig", "q1_agg")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
