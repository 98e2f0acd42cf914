package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.operators.SparkTestSession
import java.sql.Timestamp

class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming gap segmentation == batch track decomposition") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingSessions.Obs]
    def ts(min: Int) = new Timestamp((min + 1440) * 60000L) // +1d: epoch == initial watermark
    // key 1: two segments split by a 2h gap; key 2: one segment
    val eventsSeq = Seq(
      StreamingSessions.Obs(1L, ts(0)), StreamingSessions.Obs(1L, ts(30)),
      StreamingSessions.Obs(1L, ts(200)), StreamingSessions.Obs(1L, ts(210)),
      StreamingSessions.Obs(2L, ts(5)))
    val withWm = input.toDS().withWatermark("ts", "0 seconds")
      .as[StreamingSessions.Obs]
    val segs = StreamingSessions.segments(spark, withWm, gapSeconds = 3600)
    val q = segs.writeStream.format("memory").queryName("segs_out")
      .outputMode("append").start()
    // batch 1: the data; batch 2: a far-future row advances the
    // watermark so event-time timeouts close the open segments
    input.addData(eventsSeq)
    q.processAllAvailable()
    input.addData(StreamingSessions.Obs(99L, ts(10000)))
    q.processAllAvailable()
    input.addData(StreamingSessions.Obs(99L, ts(20000)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("segs_out")
      .as[StreamingSessions.Segment].collect()
      .filter(_.key != 99L)
      .map(s => (s.key, s.seg_start.getTime / 60000 - 1440,
        s.seg_end.getTime / 60000 - 1440, s.n)).toSet
    assert(out === Set((1L, 0L, 30L, 2L), (1L, 200L, 210L, 2L),
      (2L, 5L, 5L, 1L)))
  }
}
