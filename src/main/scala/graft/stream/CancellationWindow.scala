package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's cancellation branch (A2 + A3,
  * `InvoicePipeline.scala:68-80`): per-batch distinct of cancelled invoice
  * keys, then an 8-minute window sliding every 1 minute counting
  * cancellations, emitted each slide.
  *
  * Structured Streaming subsumes the reference's hand-written inverse
  * reduce (`reduceByKeyAndWindow(_+_, _-_)`): windowed streaming
  * aggregation is incremental by design — each input row updates only the
  * windows it falls in, and the state store keeps one running count per
  * open window. With a watermark the state is also *bounded*: windows
  * older than the watermark are dropped, which the reference's DStream
  * checkpoint never did. The count is GLOBAL per window — faithful to
  * the reference, whose `map(_ => ("cancelled", 1))` collapses every
  * record onto one literal key before `reduceByKeyAndWindow` — so state
  * is O(open windows), independent of both input volume and key count.
  */
object CancellationWindow {

  /** Sliding-window counts over an event-time column. Same expression for
    * batch and streaming input (watermark is a no-op in batch). Output:
    * (w_start: "yyyy-MM-dd HH:mm:ss", n). */
  def slidingCounts(events: DataFrame, tsCol: String,
                    windowDur: String = "8 minutes", slide: String = "1 minute",
                    watermarkDelay: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    withWm
      .groupBy(window(col(tsCol), windowDur, slide))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("n"))
  }

  /** The reference's per-batch distinct (A2, `map(x=>(x._1,1)).reduceByKey`
    * at `InvoicePipeline.scala:68-71`): collapse duplicate lines of one
    * cancelled invoice *within a micro-batch*. Meant to run inside
    * `foreachBatch` (see [[Router]]) where "batch" is well-defined —
    * streaming `dropDuplicates` without watermark would dedup globally,
    * which is not the reference's semantics. */
  def perBatchDistinct(batch: DataFrame, keyCols: String*): DataFrame =
    batch.dropDuplicates(keyCols.head, keyCols.tail: _*)
}
