package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import java.sql.Timestamp

/** Streaming track/pass decomposition (SURVEY §2.10 x §2.8): the batch
  * gap-segmentation (`q_track_decompose`) as a
  * `flatMapGroupsWithState` session operator — per-key state holds the
  * open segment; a gap larger than `gapSeconds` (or an event-time
  * timeout) closes it and emits one segment row, the streaming
  * equivalent of the reference's pass decomposition over an unbounded
  * ephemeris feed.
  */
object StreamingSessions {

  final case class Obs(key: Long, ts: Timestamp)
  final case class OpenSegment(start: Long, end: Long, n: Long)
  final case class Segment(key: Long, seg_start: Timestamp,
                           seg_end: Timestamp, n: Long)

  /** events: streaming Dataset[Obs] with watermark already applied on
    * `ts`. Emits closed segments; the final open segment of each key
    * closes on the event-time timeout.
    */
  def segments(spark: SparkSession, events: Dataset[Obs],
               gapSeconds: Long): Dataset[Segment] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSegment, Segment](OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Obs], state: GroupState[OpenSegment]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open segment's end + gap: close it
            val s = state.get
            state.remove()
            Iterator.single(Segment(key, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            var cur = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
            sorted.foreach { o =>
              val t = o.ts.getTime
              if (cur == null) cur = OpenSegment(t, t, 1)
              else if (t - cur.end > gapSeconds * 1000L) {
                out += Segment(key, new Timestamp(cur.start),
                  new Timestamp(cur.end), cur.n)
                cur = OpenSegment(t, t, 1)
              } else cur = OpenSegment(cur.start, math.max(cur.end, t),
                cur.n + 1)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + gapSeconds * 1000L)
            }
            out.iterator
          }
      }
  }
}
