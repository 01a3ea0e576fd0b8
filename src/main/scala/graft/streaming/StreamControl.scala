package graft.streaming

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Bounded-run control for streaming queries — the Structured-Streaming
  * analog of the reference's `max_batches` early stop
  * (/root/reference/src/mdp/core/pipeline.py:142-144): write at most N
  * micro-batches, then stop the query cleanly.
  *
  * The count is enforced INSIDE the micro-batch loop (a foreachBatch
  * gate), exactly like the reference's synchronous `batches >= max`
  * check — not with a listener racing the trigger thread, where batch
  * N+1 can commit between the Nth progress event and `stop()`. A batch
  * past the budget is never written, so the sink reflects exactly N
  * batches no matter how the async stop interleaves.
  */
object StreamControl {

  /** Run `stream` through `writeBatch` for at most `maxBatches`
    * micro-batches, then stop. Returns the number of batches actually
    * written (< maxBatches if the source ran dry before `timeoutMs`).
    */
  def runMaxBatches(
      stream: DataFrame, maxBatches: Int,
      writeBatch: (DataFrame, Long) => Unit,
      timeoutMs: Long = 60000L): Int = {
    require(maxBatches > 0, "maxBatches must be positive")
    val seen = new AtomicInteger(0)
    val done = new CountDownLatch(1)
    val query = stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = seen.incrementAndGet()
        if (n <= maxBatches) writeBatch(batch, batchId)
        if (n >= maxBatches) done.countDown()
      }
      .start()
    try {
      done.await(timeoutMs, TimeUnit.MILLISECONDS)
    } finally {
      query.stop()
      query.awaitTermination()
    }
    math.min(seen.get(), maxBatches)
  }
}
