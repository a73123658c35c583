package graft.streaming

import graft.runtime.{Incremental, IncrementalSilver}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The full streaming deployment loop: each micro-batch is appended to
  * bronze (batch_id-partitioned) and immediately folded into silver via the
  * incremental user-scoped update, with the watermark persisted between
  * batches. This is the reference's "stream raw, batch cleanse every 10
  * minutes" cycle (README.md:53-54) collapsed into one foreachBatch —
  * checkpoint recovery gives at-least-once bronze appends, and the
  * incremental update's idempotent user-scope replace absorbs replays.
  */
object SilverLoop {

  def start(parsed: DataFrame, bronzeDir: String, silverDir: String,
            watermarkPath: String, checkpointDir: String,
            toSilver: DataFrame => DataFrame,
            availableNow: Boolean = false): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("30 seconds")
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Incremental.appendBatch(spark, bronzeDir, batch, batchId)
        val wm = Incremental.loadWatermark(spark, watermarkPath)
        IncrementalSilver.update(spark, bronzeDir, silverDir, wm,
            toSilver = toSilver)
          .foreach(w => Incremental.saveWatermark(spark, watermarkPath, w))
      }
      .start()
  }
}
