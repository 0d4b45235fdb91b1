package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.10 — extension beyond the
  * reference, which is batch-only). The relational operator layer is
  * plan-building over `DataFrame`, so the same select/filter/agg code runs
  * unchanged under `readStream`; this module adds the streaming-specific
  * pieces: watermarked event-time windows and custom keyed state.
  *
  * Scale notes: state lives in the state store partitioned by group key —
  * the same hash-shuffle contract as batch groupBy; watermark bounds state
  * size; AQE does not apply to streaming micro-batches, so shuffle
  * partition count is the static knob that must be sized to the cluster.
  */
object Streaming {

  /** Watermarked tumbling/sliding event-time window aggregation:
    * `readStream → withWatermark → groupBy(window, keys) → agg`. Works on
    * batch frames too (watermark is a no-op there) — used by the batch
    * oracle query `events_window_agg`. */
  def windowedAgg(events: DataFrame, tsCol: String, watermarkDelay: String,
      windowLen: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "windowedAgg: no aggregates")
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    src.groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  // ---- custom keyed state: sessionization -----------------------------
  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, events: Long, sum_value: Double)
  private final case class SessionBuf(start: Long, end: Long, n: Long,
      sum: Double)

  // Timestamp <-> epoch-micros (Timestamp.getTime is millis only — using
  // it directly truncates microseconds, which real event data carries)
  private def toMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives within `gapMs` (event-time timeout in
    * streaming; end-of-group in batch tests). State per user is O(1). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          // batch mode: the iterator holds the whole group — fold in
          // event-time order, emitting a session at every gap
          val sorted = it.toSeq.sortBy(e => toMicros(e.ts))
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var buf = state.getOption.orNull
          sorted.foreach { e =>
            val t = toMicros(e.ts)
            buf match {
              case null =>
                buf = SessionBuf(t, t, 1, e.value)
              case b if t - b.end <= gapUs =>
                buf = b.copy(end = t, n = b.n + 1, sum = b.sum + e.value)
              case b =>
                out += Session(user, fromMicros(b.start), fromMicros(b.end),
                  b.n, b.sum)
                buf = SessionBuf(t, t, 1, e.value)
            }
          }
          if (buf != null) {
            out += Session(user, fromMicros(buf.start), fromMicros(buf.end),
              buf.n, buf.sum)
            state.remove()
          }
          out.iterator
      }
  }

  /** Streaming reader over the events table schema (json/parquet dir) —
    * the entry point a production pipeline would use. */
  def readEventStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING").parquet(path)
}
