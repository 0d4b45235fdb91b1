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

  test("CountMin + HeavyHitters aggregate over a real stream (mergeable state)") {
    val s = spark
    import s.implicits._
    import graft.functions.Aggregators.{countMinUdaf, cmsEstimate, heavyHittersUdaf}
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val sketched = mem.toDF().toDF("w")
      .agg(countMinUdaf(4, 1024)($"w").as("cms"),
        heavyHittersUdaf(4)($"w").as("hh"))
    val q = sketched.writeStream.format("memory")
      .queryName("graft_cms_stream").outputMode("complete").start()
    try {
      // counts split ACROSS micro-batches: the final estimate proves the
      // sketch state merges batch-over-batch, not per-batch
      mem.addData(Seq.fill(30)("alpha") ++ Seq.fill(4)("beta"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(20)("alpha") ++ Seq.fill(3)("gamma"): _*)
      q.processAllAvailable()
      val r = s.sql("SELECT * FROM graft_cms_stream")
        .select(cmsEstimate($"cms", "alpha", 4, 1024).as("a"),
          cmsEstimate($"cms", "beta", 4, 1024).as("b"),
          element_at($"hh", 1).getField("_1").as("top"))
        .as[(Long, Long, String)].head()
      assert(r == ((50L, 4L, "alpha")))
    } finally q.stop()
  }

  test("incrementalAggStream: final state equals the batch aggState of " +
      "the full input however rows split across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Option[Double])]
    val (holder, q) = graft.ops.Incremental.incrementalAggStream(
      mem.toDF().toDF("k", "v"), Seq("k"), "v")
    try {
      assert(holder.finalized.isEmpty) // nothing folded yet
      mem.addData(("a", Some(1.5)), ("b", Some(2.0)))
      q.processAllAvailable()
      mem.addData(("a", Some(-0.25)), ("c", None)) // null value, new key
      q.processAllAvailable()
      mem.addData(("b", Some(10.0)), ("a", Some(4.0)))
      q.processAllAvailable()
      val full = Seq(("a", Some(1.5)), ("b", Some(2.0)),
        ("a", Some(-0.25)), ("c", None: Option[Double]),
        ("b", Some(10.0)), ("a", Some(4.0))).toDF("k", "v")
      val expect = graft.ops.Incremental.finalizeAggState(
        graft.ops.Incremental.aggState(full, Seq("k"), "v"), Seq("k"))
      val got = holder.finalized.get
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"got=${got.collect().toSeq} expect=${expect.collect().toSeq}")
      // the all-null key finalizes with n=1, null mean/min/max
      val c = got.filter(col("k") === "c").head()
      assert(c.getAs[Long]("n") == 1L && c.isNullAt(c.fieldIndex("mean")))
    } finally q.stop()
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

  test("batch sessionize plans as windows + groupBy, no per-group state op") {
    val s = spark
    import s.implicits._
    val events = Seq(
      Streaming.Event(1L, ts("2024-01-01 10:00:00"), "a", 1.0)).toDS()
    val plan = Streaming.sessionize(events, gapMs = 1000)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("FlatMapGroupsWithState"),
      "batch path must use the distributed window formulation")
  }

  test("streamingExactDedup drops same-content rows across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val deduped = graft.streaming.Streaming.streamingExactDedup(
      mem.toDF().toDF("ts", "text"), "text", "ts", "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("graft_sdedup_test").outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), "Hello  World"))
      q.processAllAvailable()
      // same normalized content, later batch — must be dropped
      mem.addData((ts("2024-01-01 10:05:00"), "hello world"))
      mem.addData((ts("2024-01-01 10:06:00"), "something else"))
      q.processAllAvailable()
      val rows = s.sql("select text from graft_sdedup_test").collect()
        .map(_.getString(0)).sorted
      assert(rows.toSeq == Seq("Hello  World", "something else"), rows.mkString("|"))
    } finally q.stop()
  }

  test("streaming sessionize keeps sessions open across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event]
    val sessions = Streaming.sessionizeStream(
      mem.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sess_test").outputMode("append").start()
    try {
      // batch 1: two events of an open user-1 session — must emit NOTHING
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:00:00"), "a", 1.0))
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:02:00"), "a", 2.0))
      q.processAllAvailable()
      assert(s.sql("select * from graft_sess_test").count() == 0,
        "open session flushed at micro-batch boundary")
      // batch 2: a gap within user 1 closes the first session (2 events,
      // sum 3.0) — proving it accumulated ACROSS batches 1 and 2
      mem.addData(Streaming.Event(1L, ts("2024-01-01 11:00:00"), "a", 4.0))
      q.processAllAvailable()
      val afterGap = s.sql("select * from graft_sess_test").collect()
      assert(afterGap.length == 1)
      assert(afterGap(0).getLong(3) == 2L && afterGap(0).getDouble(4) == 3.0)
      // advance the watermark past 11:00 + gap via another user; the open
      // user-1 session must then be emitted by event-time TIMEOUT
      mem.addData(Streaming.Event(2L, ts("2024-01-01 11:30:00"), "b", 8.0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(2L, ts("2024-01-01 12:30:00"), "b", 8.0))
      q.processAllAvailable()
      val u1 = s.sql(
        "select * from graft_sess_test where user_id = 1").collect()
      assert(u1.length == 2, s"expected both user-1 sessions, got ${u1.length}")
    } finally q.stop()
  }

  test("streaming sessionize merges out-of-order cross-batch arrivals") {
    // watermark delay > 0 admits an event in a later micro-batch whose ts
    // is BEFORE the buffered session end; it must extend the envelope,
    // never regress it (end = t unconditionally would fake a gap for the
    // next in-session event and split one session in two)
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event]
    val sessions = Streaming.sessionizeStream(
      mem.toDS().withWatermark("ts", "1 hour"), gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sess_ooo_test").outputMode("append").start()
    try {
      // batch 1: open session [10:00, 10:08]
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
        Streaming.Event(1L, ts("2024-01-01 10:08:00"), "a", 2.0))
      q.processAllAvailable()
      // batch 2: 10:04 arrives out of order (inside the envelope), then
      // 10:15 (7 min after the TRUE end 10:08 — in-session; 11 min after
      // the regressed end 10:04 — the buggy code would split here)
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:04:00"), "a", 4.0),
        Streaming.Event(1L, ts("2024-01-01 10:15:00"), "a", 8.0))
      q.processAllAvailable()
      // batch 3: a real gap closes the session
      mem.addData(Streaming.Event(1L, ts("2024-01-01 11:00:00"), "a", 16.0))
      q.processAllAvailable()
      val rows = s.sql("select * from graft_sess_ooo_test").collect()
      assert(rows.length == 1, s"expected ONE closed session, got ${rows.length}")
      assert(rows(0).getLong(3) == 4L && rows(0).getDouble(4) == 15.0,
        s"session must hold all 4 events (sum 15.0), got ${rows(0)}")
      assert(rows(0).getTimestamp(1) == ts("2024-01-01 10:00:00") &&
        rows(0).getTimestamp(2) == ts("2024-01-01 10:15:00"))
    } finally q.stop()
  }

  test("streaming near-dup LSH catches cross-batch near duplicates") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val hits = Streaming.streamingNearDupCandidates(
      mem.toDF().toDF("doc_id", "ts", "text"), "text", "doc_id", "ts",
      delayMs = 3600L * 1000)
    val q = hits.writeStream.format("memory").queryName("graft_ndup_test")
      .outputMode("append").start()
    try {
      // batch 1: the original doc — nothing to pair with yet
      mem.addData((1L, ts("2024-01-01 10:00:00"),
        "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      assert(s.sql("select * from graft_ndup_test").count() == 0)
      // batch 2: an exact dup (must pair with the batch-1 doc via state)
      // and an unrelated doc (must not pair with anything)
      mem.addData(
        (2L, ts("2024-01-01 10:05:00"),
          "the quick brown fox jumps over the lazy dog"),
        (3L, ts("2024-01-01 10:06:00"),
          "completely different content about spark engines here"))
      q.processAllAvailable()
      val pairs = s.sql("select distinct id_a, id_b from graft_ndup_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
      val j = s.sql("select max(jaccard) from graft_ndup_test").head().getDouble(0)
      assert(j == 1.0, s"exact dup must verify at jaccard 1.0, got $j")
    } finally q.stop()
  }

  test("lean signature-only near-dup state finds the same cross-batch pair") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    // exactVerify = false: state stores the 64-slot minhash signature
    // instead of the full shingle set; jaccard is the slot-match estimate
    val hits = Streaming.streamingNearDupCandidates(
      mem.toDF().toDF("doc_id", "ts", "text"), "text", "doc_id", "ts",
      delayMs = 3600L * 1000, exactVerify = false)
    val q = hits.writeStream.format("memory").queryName("graft_ndup_lean")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"),
        "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      mem.addData(
        (2L, ts("2024-01-01 10:05:00"),
          "the quick brown fox jumps over the lazy dog"),
        (3L, ts("2024-01-01 10:06:00"),
          "completely different content about spark engines here"))
      q.processAllAvailable()
      val pairs = s.sql("select distinct id_a, id_b from graft_ndup_lean")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
      // identical docs → identical signatures → estimate exactly 1.0
      val j = s.sql("select max(jaccard) from graft_ndup_lean").head().getDouble(0)
      assert(j == 1.0, s"identical signature must estimate 1.0, got $j")
      // a TRUE near-dup (1 of 60 tokens changed → shingle J = 55/61 ≈
      // 0.90) across batches: the slot-match estimate is DETERMINISTIC
      // (fixed hash family, fixed texts) and must clear the 0.8
      // threshold while staying below 1.0 — proving the estimator
      // discriminates rather than just flagging identical signatures
      val baseTokens = (0 until 60).map(i => s"tok$i")
      mem.addData((9L, ts("2024-01-01 10:07:00"), baseTokens.mkString(" ")))
      mem.addData((10L, ts("2024-01-01 10:08:00"),
        baseTokens.updated(30, "changed").mkString(" ")))
      q.processAllAvailable()
      val near = s.sql(
        "select jaccard from graft_ndup_lean where id_a = 9 and id_b = 10")
        .collect().map(_.getDouble(0))
      assert(near.nonEmpty, "near-dup pair (9,10) must collide in a band")
      assert(near.forall(j => j >= 0.6 && j < 1.0),
        s"estimate should straddle the true J≈0.9, got ${near.toSeq}")
      // the documented state-size bound: exact state grows linearly with
      // doc length (shingle count), lean state is a constant 64 slots —
      // measure both ends of the corpus distribution
      val nf = org.apache.spark.sql.graftnative.NativeFunctions
      val fn = org.apache.spark.sql.functions
      val stats = Tables(s, "/root/testdata/sf0.001").documents
        .select(fn.size(fn.array_distinct(nf.shingleHashes(
          graft.functions.TextFunctions.tokens(fn.col("text")), 3))).as("n"))
        .agg(fn.avg("n"), fn.max("n")).head()
      val (avgSh, maxSh) = (stats.getDouble(0), stats.getInt(1))
      info(f"shingles/doc at sf0.001: avg $avgSh%.1f, max $maxSh vs 64 " +
        f"constant slots (avg ratio ${avgSh / 64}%.2fx, max ${maxSh / 64.0}%.2fx)")
      // the win is the CAP: the longest docs already exceed the slot
      // count even on this deliberately short synthetic corpus
      assert(maxSh > 64, "longest doc should exceed the constant slot count")
    } finally q.stop()
  }

  test("streamStreamJoin attributes clicks to impressions across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val imps = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Streaming.streamStreamJoin(
      imps.toDF().toDF("ad", "its"), clicks.toDF().toDF("ad", "cts"),
      "ad", "ad", "its", "cts", delay = "5 minutes", within = "10 minutes")
    val q = joined.select($"l_ad", $"l_its", $"r_cts")
      .writeStream.format("memory").queryName("graft_ssj_test")
      .outputMode("append").start()
    try {
      // batch 1: two impressions, no clicks yet
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // batch 2: click on ad 1 inside the window (cross-batch match),
      // click on ad 2 an hour later (outside `within` — must NOT match)
      clicks.addData((1L, ts("2024-01-01 10:04:00")),
        (2L, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val rows = s.sql("select l_ad from graft_ssj_test").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
    } finally q.stop()
    // state cleanup contract: unbounded join (no time bound) is refused
    // by requiring the caller to pass `within` — nothing to assert here;
    // leftOuter variant emits the unmatched impression after watermark
    assertThrows[IllegalArgumentException] {
      Streaming.streamStreamJoin(imps.toDF().toDF("ad", "its"),
        clicks.toDF().toDF("ad", "cts"), "ad", "ad", "its", "cts",
        "5 minutes", "10 minutes", joinType = "fullOuter")
    }
  }

  test("cdcStream: last-writer-wins view, stale arrivals emit nothing") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.KeyedChange]
    val q = Streaming.cdcStream(mem.toDS())
      .writeStream.format("memory").queryName("graft_cdc_test")
      .outputMode("append").start()
    try {
      mem.addData(Streaming.KeyedChange(1L, 1.0, 1L, "U"))
      q.processAllAvailable()
      mem.addData(Streaming.KeyedChange(1L, 3.0, 3L, "U"))
      q.processAllAvailable()
      // stale out-of-order seq 2 — must NOT regress or emit
      mem.addData(Streaming.KeyedChange(1L, 9.0, 2L, "U"))
      q.processAllAvailable()
      // delete wins; then resurrect (separate micro-batches — within one
      // batch only the winning change emits)
      mem.addData(Streaming.KeyedChange(1L, 0.0, 4L, "D"))
      q.processAllAvailable()
      mem.addData(Streaming.KeyedChange(1L, 7.0, 5L, "U"))
      q.processAllAvailable()
      val rows = s.sql(
          "select value, deleted, seq from graft_cdc_test order by seq")
        .collect().map(r => (r.getDouble(0), r.getBoolean(1), r.getLong(2)))
        .toSeq
      assert(rows == Seq((1.0, false, 1L), (3.0, false, 3L),
        (0.0, true, 4L), (7.0, false, 5L)))
      // final streaming state == batch applyChangeLog on the same log
      val base = Seq.empty[(Long, Double)].toDF("key", "value")
      val log = Seq((1L, 1.0, 1L, "U"), (1L, 3.0, 3L, "U"),
        (1L, 9.0, 2L, "U"), (1L, 0.0, 4L, "D"), (1L, 7.0, 5L, "U"))
        .toDF("key", "value", "seq", "op")
      val batch = graft.ops.Cdc.applyChangeLog(base, log, Seq("key"),
        "seq", "op").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch == Seq((1L, 7.0)) && rows.last._1 == 7.0)
    } finally q.stop()
  }

  test("streaming funnel completes across micro-batches, emits EARLY at completion") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event]
    val res = Streaming.funnelStream(
      mem.toDS().withWatermark("ts", "0 seconds"),
      Seq("view", "click", "purchase"), horizonMs = 60 * 60 * 1000)
    val q = res.writeStream.format("memory")
      .queryName("graft_funnel_test").outputMode("append").start()
    try {
      // stages arrive in three separate micro-batches — state must carry
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:00:00"), "view", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:10:00"), "click", 0),
        Streaming.Event(1L, ts("2024-01-01 10:20:00"), "purchase", 0))
      q.processAllAvailable()
      assert(s.sql("select * from graft_funnel_test").count() == 0,
        "result emitted before the watermark cleared its completion ts")
      // watermark passes the COMPLETION ts (10:20) while still 30 min
      // short of the horizon (11:00) → the completed funnel emits NOW
      mem.addData(Streaming.Event(2L, ts("2024-01-01 10:30:00"), "view", 0))
      q.processAllAvailable()
      val early = s.sql("select * from graft_funnel_test").collect()
      assert(early.length == 1 && early(0).getLong(0) == 1L,
        "completed funnel must emit before its horizon closes")
      assert(early(0).getInt(1) == 3)
      assert(early(0).getSeq[Long](2).length == 3)
      // intra-horizon straggler after the early emit: absorbed by the
      // tombstone — must NOT open a fresh attempt or emit a second row
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:35:00"), "view", 0))
      q.processAllAvailable()
      // push the watermark past 10:00 + 1h: the tombstone clears silently
      mem.addData(Streaming.Event(2L, ts("2024-01-01 11:30:00"), "view", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(2L, ts("2024-01-01 11:40:00"), "view", 0))
      q.processAllAvailable()
      val rows = s.sql(
        "select * from graft_funnel_test where user_id = 1").collect()
      assert(rows.length == 1, s"identical-row-set law broken: ${rows.toSeq}")
      assert(rows(0).getInt(1) == 3 && rows(0).getSeq[Long](2).length == 3)
    } finally q.stop()
  }

  test("streaming funnel is exact under out-of-order arrival") {
    // the click lands in a batch BEFORE its qualifying view (view has the
    // earlier ts but arrives late, inside the watermark). A greedy
    // slot-filling state machine would reject the click forever; the
    // buffered walk recovers the exact batch answer.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event]
    val res = Streaming.funnelStream(
      mem.toDS().withWatermark("ts", "1 hour"),
      Seq("view", "click", "purchase"), horizonMs = 60 * 60 * 1000)
    val q = res.writeStream.format("memory")
      .queryName("graft_funnel_ooo_test").outputMode("append").start()
    try {
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:10:00"), "click", 0))
      q.processAllAvailable()
      // late-but-in-watermark view, ts BEFORE the click already seen
      mem.addData(Streaming.Event(1L, ts("2024-01-01 10:00:00"), "view", 0))
      q.processAllAvailable()
      // push the watermark (maxTs − 1h) past 10:00 + 1h
      mem.addData(Streaming.Event(2L, ts("2024-01-01 12:30:00"), "view", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(2L, ts("2024-01-01 12:40:00"), "view", 0))
      q.processAllAvailable()
      val rows = s.sql(
        "select * from graft_funnel_ooo_test where user_id = 1").collect()
      assert(rows.length == 1)
      assert(rows(0).getInt(1) == 2, "late early view must unlock the click")
    } finally q.stop()
  }

  test("streaming funnel admits a boundary event in the horizon's final sub-ms") {
    // stage-2 lands at exactly firstUs + horizon micros (5000.5ms + 1000ms),
    // AFTER an ms-floored timeout (6000ms) would have closed the funnel but
    // within the micros-precision cutoff walk() enforces. The ceiling-division
    // timeout keeps the state alive so the event completes the funnel instead
    // of opening a spurious fresh attempt.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def usTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event]
    val res = Streaming.funnelStream(
      mem.toDS().withWatermark("ts", "0 seconds"), Seq("a", "b"), horizonMs = 1000L)
    val q = res.writeStream.format("memory")
      .queryName("graft_funnel_boundary_test").outputMode("append").start()
    try {
      mem.addData(Streaming.Event(7L, usTs(5000500L), "a", 0))
      q.processAllAvailable()
      // two batches pinning the watermark at exactly 6000ms with no user-7
      // data: a floor-based timeout (6000 <= wm) would fire here
      mem.addData(Streaming.Event(50L, usTs(6000999L), "a", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(51L, usTs(6000999L), "a", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(7L, usTs(6000500L), "b", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(60L, usTs(3600L * 1000000L), "a", 0))
      q.processAllAvailable()
      mem.addData(Streaming.Event(61L, usTs(7200L * 1000000L), "a", 0))
      q.processAllAvailable()
      val rows = s.sql(
          "select stages_reached from graft_funnel_boundary_test where user_id = 7")
        .collect().map(_.getInt(0)).toSeq
      assert(rows == Seq(2), s"boundary event must complete the funnel, got $rows")
    } finally q.stop()
  }

  test("streamingWarcRecords: segment files landing in a dir parse " +
      "into records across micro-batches; corrupt file = visible " +
      "null-member row") {
    val s = spark
    val crlf = "\r\n"
    def rec(uri: String, payload: String): String =
      "WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
        s"WARC-Target-URI: $uri" + crlf +
        "Content-Length: " + payload.getBytes("UTF-8").length + crlf +
        crlf + payload + crlf + crlf
    def gz(x: String): Array[Byte] =
      org.apache.spark.sql.graftnative.GzipCompress
        .compute(x.getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_warc")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("s1.warc.gz"),
      gz(rec("http://a.ex/1", "one")) ++ gz(rec("http://a.ex/2", "two")))
    val q = Streaming.streamingWarcRecords(s, dir.toString, 4)
      .writeStream.format("memory").queryName("graft_warc_stream_test")
      .start()
    try {
      q.processAllAvailable()
      val n1 = s.sql("select count(*) from graft_warc_stream_test")
        .head().getLong(0)
      assert(n1 == 2L)
      // a late-arriving segment + a corrupt one land in batch 2
      java.nio.file.Files.write(dir.resolve("s2.warc.gz"),
        gz(rec("http://a.ex/3", "three")))
      java.nio.file.Files.write(dir.resolve("bad.warc.gz"),
        Array[Byte](0x1f, 0x8b.toByte, 8, 0) ++ "junk".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = s.sql("select target_uri, member_idx, " +
          "cast(payload as string) from graft_warc_stream_test")
        .collect()
      assert(rows.length == 4) // 3 records + 1 null-member corrupt row
      val uris = rows.filter(!_.isNullAt(0)).map(_.getString(0)).toSet
      assert(uris ==
        Set("http://a.ex/1", "http://a.ex/2", "http://a.ex/3"))
      assert(rows.count(_.isNullAt(1)) == 1) // the corrupt file, visible
    } finally q.stop()
  }
}
