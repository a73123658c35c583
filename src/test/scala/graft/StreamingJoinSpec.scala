package graft

import graft.streaming.StreamingJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream attribution join: streamed == batch on the same rows,
  * across micro-batches with out-of-order arrival inside the lateness
  * bound, and the range predicate gives the state bounds (the join is
  * accepted in append mode — an unconstrained one would throw). */
object StreamingJoinSpec {
  case class Imp(user_id: Long, imp_id: Long,
                 imp_time: java.sql.Timestamp)
  case class Click(c_user_id: Long, click_id: Long,
                   click_time: java.sql.Timestamp)
}

class StreamingJoinSpec extends SparkSpec {
  import StreamingJoinSpec.{Click, Imp}
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
  private def ts(min: Long) =
    new java.sql.Timestamp(t0.getTime + min * 60000)

  test("streamed attribution == batch join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val imps = Seq(
      Imp(1L, 100L, ts(0)),   // clicked at +10 and +29 -> two rows
      Imp(1L, 101L, ts(20)),  // clicked at +29 (in range) only
      Imp(2L, 200L, ts(0)),   // click at +40 -> outside the window
      Imp(3L, 300L, ts(5)))   // never clicked
    val clicks = Seq(
      Click(1L, 9000L, ts(10)),
      Click(1L, 9001L, ts(29)),
      Click(2L, 9100L, ts(40)),
      Click(4L, 9200L, ts(1))) // user with no impression

    val impStream = MemoryStream[Imp]
    val clickStream = MemoryStream[Click]
    val q = StreamingJoin.attribute(impStream.toDF(), clickStream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_attr").start()
    // out-of-order across batches, inside the 10-min lateness bound
    impStream.addData(imps.take(2))
    clickStream.addData(clicks.take(1))
    q.processAllAvailable()
    clickStream.addData(clicks.drop(1))
    impStream.addData(imps.drop(2))
    q.processAllAvailable()
    // advance both watermarks far past every join range so all results
    // emit
    impStream.addData(Imp(99L, 999L, ts(300)))
    clickStream.addData(Click(99L, 9999L, ts(300)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_attr")
      .filter(col("user_id") =!= 99L)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    val batch = StreamingJoin.attributeBatch(
        imps.toDF(), clicks.toDF())
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((100L, 9000L), (100L, 9001L), (101L, 9001L)))
    assert(streamed == batch,
      s"missing ${(batch -- streamed)}, extra ${(streamed -- batch)}")
  }
}
