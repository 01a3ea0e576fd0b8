package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP scratch: cost split of the d15 window pass. Deleted before
  * commit.
  */
object ScratchHash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val winLen = 40
    def base = docs.select(col("doc_id"),
      explode(when(length(col("text")) >= winLen,
          sequence(lit(1), length(col("text")) - (winLen - 1)))
        .otherwise(array())).as("pos"),
      col("text"))
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val df = mk
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("explode only")(base.select(col("doc_id"), col("pos")))
    time("explode+substr")(base.select(col("doc_id"),
      col("text").substr(col("pos"), lit(winLen)).as("w")))
    time("explode+xxhash")(base.select(col("doc_id"),
      xxhash64(col("text").substr(col("pos"), lit(winLen))).as("h")))
    time("explode+md5conv")(base.select(col("doc_id"),
      operators.Dedup.hash60(col("text").substr(col("pos"), lit(winLen))).as("h")))
    spark.stop()
  }
}
