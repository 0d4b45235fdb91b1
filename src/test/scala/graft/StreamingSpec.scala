package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  import SparkFixture._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedAgg groups into event-time windows (batch parity path)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:40:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "click", 4.0)
    ).toDF("ts", "event_type", "value")
    val res = Streaming.windowedAgg(events, "ts", "10 minutes", "1 hour",
        Seq("event_type"), Seq(count(lit(1)).as("n"), sum(col("value")).as("s")))
      .select(col("window.start").cast("string"), col("n"), col("s"))
      .orderBy("n").collect()
    assert(res.length == 2)
    assert(res.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("windowedAgg runs as a real stream with watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String, Double)]
    val res = Streaming.windowedAgg(
      mem.toDF().toDF("ts", "event_type", "value"), "ts", "10 minutes",
      "1 hour", Seq("event_type"),
      Seq(count(lit(1)).as("n")))
    val q = res.select(col("window.start").as("w"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("graft_stream_test")
      .outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0))
      q.processAllAvailable()
      val rows = s.sql("select * from graft_stream_test").collect()
      assert(rows.length == 1 && rows(0).getLong(2) == 2L)
    } finally q.stop()
  }

  test("sessionize splits on gaps and aggregates per session") {
    val s = spark
    import s.implicits._
    val events = Seq(
      Streaming.Event(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Streaming.Event(1L, ts("2024-01-01 10:02:00"), "a", 2.0),
      Streaming.Event(1L, ts("2024-01-01 11:00:00"), "a", 4.0), // new session
      Streaming.Event(2L, ts("2024-01-01 09:00:00"), "b", 8.0)
    ).toDS()
    val res = Streaming.sessionize(events, gapMs = 10 * 60 * 1000)
      .collect().sortBy(r => (r.user_id, r.start.getTime))
    assert(res.length == 3)
    assert(res(0).events == 2 && res(0).sum_value == 3.0)
    assert(res(1).events == 1 && res(1).sum_value == 4.0)
    assert(res(2).user_id == 2L)
  }
}
