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
  // NOT private: the state-store encoder's generated code must be able to
  // call the accessors (janino can't resolve methods on a private class)
  final case class SessionBuf(start: Long, end: Long, n: Long, total: Double)

  // Timestamp <-> epoch-micros (Timestamp.getTime is millis only — using
  // it directly truncates microseconds, which real event data carries)
  private def toMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization. Dispatches on execution mode:
    *  - batch → the fully-distributed window formulation
    *    ([[sessionizeBatch]]) — no per-group in-memory sort, spill-safe
    *    for hot keys (a user with 10⁸ events at 100 TB);
    *  - streaming → [[sessionizeStream]] with event-time timeout, so
    *    sessions spanning micro-batches stay open in state instead of
    *    being flushed at every batch boundary. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (events.isStreaming) sessionizeStream(events, gapMs)
    else sessionizeBatch(events.toDF(), "user_id", "ts", "value", gapMs)
      .as[Session]
  }

  /** Distributed batch sessionization: lag-gap flag → running sum
    * (session id) → groupBy. Three window passes over a per-user
    * partitioned sort — Spark's SortExec spills, so a hot user never has
    * to fit in one task's heap. Gap comparison in epoch micros (event
    * data carries sub-millisecond timestamps). Output columns:
    * (userCol, start, end, events, sum_value). */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    events
      .withColumn("__brk",
        when(us - lag(us, 1).over(w) > gapMs * 1000L, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sess"))
      .agg(min(col(tsCol)).as("start"), max(col(tsCol)).as("end"),
        count(lit(1)).as("events"), sum(col(valueCol)).as("sum_value"))
      .drop("__sess")
  }

  /** Streaming sessionization with `flatMapGroupsWithState` +
    * `EventTimeTimeout`: closed sessions are emitted as soon as a gap is
    * observed inside a micro-batch; the open session stays in state with
    * a timeout at `end + gap`, and is emitted only when the watermark
    * passes that point — sessions spanning micro-batches are NOT split.
    * Caller must `withWatermark(tsCol, delay)` upstream. State per user
    * is O(1); each invocation only sees the micro-batch's increment. */
  def sessionizeStream(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            Iterator.single(Session(user, fromMicros(b.start),
              fromMicros(b.end), b.n, b.total))
          } else {
            // micro-batch increment only — small by construction
            val sorted = it.toArray.sortBy(e => toMicros(e.ts))
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var buf = state.getOption.orNull
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              buf match {
                case null =>
                  buf = SessionBuf(t, t, 1, e.value)
                case b if t > b.end + gapUs =>
                  // gap past the session envelope: close it, start fresh
                  out += Session(user, fromMicros(b.start), fromMicros(b.end),
                    b.n, b.total)
                  buf = SessionBuf(t, t, 1, e.value)
                case b if t >= b.start - gapUs =>
                  // in-session: t falls within gap of the [start, end]
                  // envelope. A cross-batch out-of-order arrival (allowed
                  // whenever watermark delay > 0) may land BEFORE the
                  // buffered end — extend the envelope in either
                  // direction, never regress it (end = t unconditionally
                  // would shrink the session and fake a gap for the next
                  // in-session event).
                  buf = b.copy(start = math.min(b.start, t),
                    end = math.max(b.end, t), n = b.n + 1,
                    total = b.total + e.value)
                case b =>
                  // straggler older than start − gap: it belongs to an
                  // already-emitted earlier session — emit as its own
                  // single-event session rather than corrupting the open
                  // one (within-batch order is sorted, so only the head
                  // of a batch can land here)
                  out += Session(user, fromMicros(t), fromMicros(t), 1,
                    e.value)
              }
            }
            if (buf != null) {
              state.update(buf)
              // timeout when the watermark passes session end + gap
              state.setTimeoutTimestamp(
                math.floorDiv(buf.end, 1000L) + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup for an ingest pipeline: rows keyed by the
    * normalized 256-bit content key ([[graft.functions.TextFunctions
    * .contentKey]], same key as the batch `Dedup.exactDedup`), deduped
    * with `dropDuplicatesWithinWatermark` — the state store holds one
    * entry per distinct key only within the watermark horizon, so state
    * is bounded by ingest rate × `delay`, not by corpus size. Batch
    * callers use `Dedup.exactDedup`. */
  def streamingExactDedup(events: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame = {
    require(events.isStreaming,
      "streamingExactDedup: batch frames use Dedup.exactDedup")
    events
      .withColumn("__key",
        graft.functions.TextFunctions.contentKey(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")
  }

  // ---- streaming near-dup dedup (banded MinHash-LSH over keyed state) --
  // state classes public for the janino-generated state-store encoder
  final case class BucketDoc(id: Long, sh: Array[Long], tsUs: Long)
  final case class BucketState(docs: Array[BucketDoc])
  final case class NearDupHit(id_a: Long, id_b: Long, jaccard: Double,
      ts: java.sql.Timestamp)

  /** Streaming near-dup candidate detection: the batch LSH shape
    * ([[graft.ops.Dedup.nearDupPairs]]) re-expressed over keyed state.
    * Each doc is shingle-hashed and minhash-banded EXACTLY as in batch
    * (same native expressions, same band keys — a doc pair collides here
    * iff it collides in the batch pipeline); the stream is then keyed by
    * (band, bucket) and each bucket's docs within the watermark horizon
    * live in `flatMapGroupsWithState`. A new arrival is verified (exact
    * distinct-shingle Jaccard, identical to the batch verify's
    * array_intersect/array_union semantics) against the bucket's stored
    * docs and emits a [[NearDupHit]] per match — so near-dups are caught
    * ACROSS micro-batches, not just within one.
    *
    * Scale design: state is partitioned by the (band, bucket) hash — the
    * same shuffle contract as the batch self-join — and bounded by the
    * watermark: `EventTimeTimeout` drops a bucket once the watermark
    * passes its newest doc + delay, so state ≈ ingest-rate × horizon ×
    * bands, independent of corpus size. A pair colliding in several bands
    * emits once per band (same as the batch pipeline pre-dropDuplicates);
    * route the output through `dropDuplicatesWithinWatermark("id_a",
    * "id_b")` for exactly-once pairs.
    *
    * State-size knob (`exactVerify`): the default stores each doc's full
    * distinct-shingle set per (band, bucket) — exact Jaccard, what the
    * batch oracle can check — which multiplies state by `bands` × the
    * per-doc shingle count. `exactVerify = false` stores only the
    * `numHashes`-slot minhash signature and verifies with the standard
    * MinHash estimator (matching-slot fraction, unbiased for Jaccard):
    * state per doc becomes a CONSTANT `numHashes` longs instead of
    * growing linearly with doc length. On the short synthetic sf0.001
    * docs that is roughly break-even (measured 53.9 avg / 97 max
    * shingles per doc vs 64 slots → 0.84× avg, 1.5× for the longest);
    * on a real web corpus (hundreds–thousands of shingles per doc) the
    * shrink is 10-100×, which is the 100-TB-streaming story. Cost: the
    * estimator's σ = √(J(1−J)/numHashes) ≈ 0.05 at J=0.8, k=64. Both
    * variants band identically, so they see the SAME candidate pairs. */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String,
      idCol: String, tsCol: String, delayMs: Long, numHashes: Int = 64,
      bands: Int = 16, shingleN: Int = 3, minJaccard: Double = 0.8,
      exactVerify: Boolean = true)
      : Dataset[NearDupHit] = {
    require(docs.isStreaming,
      "streamingNearDupCandidates: batch frames use Dedup.nearDupPairs")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    // zero-token docs carry no similarity features and are excluded
    // from candidacy (the batch nearDupPairs r16 contract — the
    // kernel's constant empty-input fallback shingle would otherwise
    // cross-match every zero-token doc in a band bucket)
    val sigd = docs
      .withWatermark(tsCol, s"$delayMs milliseconds")
      .select(col(idCol).as("id"), col(tsCol).as("ts"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col("id"), col("ts"),
        nf.shingleHashes(col("__tk"), shingleN).as("sh"))
      .select(col("id"), col("ts"), col("sh"),
        nf.minhashFromLongs(col("sh"), numHashes).as("sig"))
    // what rides the shuffle and lives in state: full shingle sets for
    // the exact verify, or just the k-slot signature for the lean one
    val payload = if (exactVerify) col("sh") else col("sig")
    val exploded = sigd
      .select(col("id"), col("ts"), payload.as("pl"), posexplode(
        graft.ops.Dedup.bandKeys(col("sig"), bands, r)))
      .select(col("pos").as("band"), col("col").as("key"), col("id"),
        col("pl"), col("ts"))
      .as[(Int, Long, Long, Array[Long], java.sql.Timestamp)]
    exploded.groupByKey(x => (x._1, x._2))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var all = state.getOption.map(_.docs)
              .getOrElse(Array.empty[BucketDoc])
            // deterministic processing order inside the micro-batch
            val incoming = it.toArray.sortBy(x => (toMicros(x._5), x._3))
            val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
            incoming.foreach { case (_, _, id, pl, ts) =>
              if (!all.exists(_.id == id)) { // band self-duplicates
                val dSet = if (exactVerify) pl.toSet else null
                all.foreach { e =>
                  if (e.id != id) {
                    val j =
                      if (exactVerify) {
                        val eSet  = e.sh.toSet
                        val inter = dSet.intersect(eSet).size
                        val union = (dSet ++ eSet).size
                        if (union == 0) 0.0 else inter.toDouble / union
                      } else {
                        // MinHash estimate: fraction of matching slots
                        var m = 0; var k = 0
                        while (k < numHashes) {
                          if (e.sh(k) == pl(k)) m += 1; k += 1
                        }
                        m.toDouble / numHashes
                      }
                    if (j >= minJaccard) {
                      val (a, b) = if (e.id < id) (e.id, id) else (id, e.id)
                      out += NearDupHit(a, b, j, ts)
                    }
                  }
                }
                all = all :+ BucketDoc(id, pl, toMicros(ts))
              }
            }
            state.update(BucketState(all))
            // drop the bucket when the watermark passes newest + delay
            state.setTimeoutTimestamp(
              math.floorDiv(all.map(_.tsUs).max, 1000L) + delayMs)
            out.iterator
          }
      }
  }

  /** Watermarked stream-stream equi-join with a time bound (the
    * impression×click attribution shape). The right event must land in
    * `[leftTs, leftTs + within]`; both sides carry watermarks so the
    * state store can discard rows once the watermark passes the bound —
    * without the time constraint a stream-stream join's state grows
    * without limit. Inner and leftOuter supported (outer emission waits
    * for the watermark, per Structured Streaming semantics). State is
    * hash-partitioned by the join key — the same shuffle contract as a
    * batch join, so a 1000-executor cluster shards it linearly. Column
    * names are prefixed `l_`/`r_` to keep the two event schemas apart. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      delay: String, within: String, joinType: String = "inner")
      : DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"streamStreamJoin: unsupported join type $joinType")
    val l = left.withWatermark(leftTs, delay)
      .select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.withWatermark(rightTs, delay)
      .select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    l.join(r,
      col(s"l_$leftKey") === col(s"r_$rightKey") &&
        col(s"r_$rightTs") >= col(s"l_$leftTs") &&
        col(s"r_$rightTs") <= col(s"l_$leftTs") + expr(s"INTERVAL $within"),
      joinType)
  }

  /** Streaming reader over the events table schema (json/parquet dir) —
    * the entry point a production pipeline would use. */
  def readEventStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING").parquet(path)

  /** Streaming `.warc.gz` ingest: segment files LANDING in `dir` parse
    * into records as they arrive — the live half of the crawl story
    * (a fetcher drops finished segments; this side feeds them straight
    * into the streaming dedup/quality tier). One row per record, the
    * exact [[graft.ops.Web.warcRecordsGzip]] contract keyed by file
    * path; the whole pipeline below the source is STATELESS (kernel
    * projections + posexplodes, the zero-shuffle batch shape), so it
    * composes with watermarks, `streamingExactDedup` and
    * `streamingNearDupCandidates` downstream unchanged.
    *
    * Unit = one whole FILE per cell (the binaryFile source's grain) —
    * right for live arrivals, whose segments are individually bounded;
    * BACKFILLING a 100 TB archive is the batch chunked reader's job
    * ([[graft.sources.WarcFiles.warcRecordsGzipFiles]]).
    * `maxFilesPerTrigger` bounds per-micro-batch memory (cells ×
    * decompressed size); corrupt files surface as their null-member
    * row, never a dropped file. */
  def streamingWarcRecords(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    require(maxFilesPerTrigger >= 1,
      "streamingWarcRecords: maxFilesPerTrigger must be >= 1")
    val src = spark.readStream.format("binaryFile")
      // the binaryFile source's own fixed schema — a streaming file
      // source requires it stated explicitly
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length LONG, content BINARY")
      .option("pathGlobFilter", "*.warc.gz")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)
    graft.ops.Web.warcRecordsGzip(
      src.select(col("path"), col("content")), "path", "content")
  }

  // ---- custom keyed state: CDC upsert view ----------------------------
  final case class KeyedChange(key: Long, value: Double, seq: Long,
      op: String)
  // NOT private (state-store codegen needs the accessors, like SessionBuf)
  final case class KeyState(seq: Long, value: Double, deleted: Boolean)
  final case class KeyUpdate(key: Long, value: Double, deleted: Boolean,
      seq: Long)

  /** Streaming CDC materialized view — the incremental twin of
    * [[graft.ops.Cdc.applyChangeLog]]: keyed state holds each key's
    * winning (max-seq) change; a micro-batch emits one [[KeyUpdate]] per
    * key whose winner CHANGED. Out-of-order deliveries are absorbed by
    * the same last-writer-wins law the batch operator pins
    * (CdcLawSpec): a stale lower-seq arrival never regresses state and
    * emits nothing, a delete wins by seq and emits `deleted = true`, an
    * upsert after a delete resurrects. No watermark/timeout: the state
    * IS the view, bounded by live-key cardinality (the same bound as
    * the table it materializes), hash-sharded by key across the
    * cluster's state stores. */
  def cdcStream(changes: Dataset[KeyedChange]): Dataset[KeyUpdate] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedChange], state: GroupState[KeyState]) =>
          // winner of this batch's increment (max seq; arrival order
          // within equal seq is undefined — real changelogs have unique
          // (key, seq))
          val inc = it.maxBy(_.seq)
          val cur = state.getOption
          if (cur.exists(_.seq >= inc.seq)) Iterator.empty
          else {
            val next = KeyState(inc.seq, inc.value,
              inc.op == graft.ops.Cdc.Delete)
            state.update(next)
            Iterator.single(
              KeyUpdate(key, next.value, next.deleted, next.seq))
          }
      }
  }

  // ---- custom keyed state: funnel -------------------------------------
  // evts: (epoch-micros, stage index) — funnel-relevant events only.
  // done = result already emitted early; the buffer is dropped and the
  // empty tombstone absorbs intra-horizon stragglers until the horizon
  // timeout clears it (state residency shrinks from the event buffer to
  // ~16 bytes the moment the funnel completes)
  final case class FunnelBuf(firstUs: Long, evts: List[(Long, Int)],
      done: Boolean = false)
  final case class FunnelResult(user_id: Long, stages_reached: Int,
      stage_ts: Seq[Long])

  /** Streaming funnel over a bounded attribution horizon — the streaming
    * twin of [[graft.ops.Events.funnel]] with EXACT batch semantics: each
    * user's funnel-relevant events are buffered in keyed state until the
    * watermark passes `firstEvent + horizon`, then the SAME greedy
    * strictly-ordered walk runs over the sorted buffer and one final row
    * emits. Buffering (rather than incremental slot-filling) is what
    * makes out-of-order arrivals exact: a late early `view` can still
    * improve stage 1 and unlock a click that a streaming-greedy state
    * machine would have already rejected.
    *
    * State bound: funnel-stage events per user per horizon (skinny
    * 12-byte pairs), discarded at timeout — the horizon IS the state
    * knob, the same contract as the LSH bucket state. Events arriving
    * after the user's funnel closed open a fresh attempt (a second
    * conversion window), which matches how attribution horizons are
    * operated. `stage_ts` holds epoch-micros of the reached prefix
    * (length = `stages_reached`).
    *
    * EARLY EMIT: a COMPLETED funnel emits as soon as the watermark
    * passes its completion timestamp instead of waiting out the full
    * horizon — provably final, because every later-admitted event has
    * event time above the watermark ≥ the completion time, and the
    * greedy earliest-completion walk is invariant under adding events at
    * or after its final slot. The buffer is then dropped; a `done`
    * tombstone (no events) holds the horizon window so intra-horizon
    * stragglers are absorbed exactly as the buffering path would have
    * (they cannot change the emitted result and must not open a fresh
    * attempt), keeping the emitted row set IDENTICAL to the
    * timeout-only implementation while completed funnels stop paying
    * buffer residency for the rest of their horizon. */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
      horizonMs: Long): Dataset[FunnelResult] = {
    require(stages.nonEmpty, "funnelStream: no stages")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .filter(e => stageIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelBuf]) =>
          def walk(b: FunnelBuf): FunnelResult = {
            val horizonUs = horizonMs * 1000L
            val slots = Array.fill[Long](stages.size)(-1L)
            b.evts.filter(_._1 <= b.firstUs + horizonUs)
              .sortBy(identity).foreach { case (ts, si) =>
                if (slots(si) < 0 &&
                    (si == 0 || (slots(si - 1) >= 0 && ts > slots(si - 1))))
                  slots(si) = ts
              }
            val reached = slots.takeWhile(_ >= 0)
            FunnelResult(user, reached.length, reached.toSeq)
          }
          // ceiling division to ms: the timeout must never precede the
          // micros-precision horizon cutoff (firstUs + horizonMs*1000),
          // else a boundary event in the final sub-millisecond opens a
          // spurious fresh attempt instead of completing this funnel
          def horizonTimeoutMs(firstUs: Long): Long =
            math.floorDiv(firstUs + 999L, 1000L) + horizonMs
          def ceilMs(us: Long): Long = math.floorDiv(us + 999L, 1000L)
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val b = state.get
            if (b.done) { // tombstone: result emitted early; horizon over
              state.remove()
              Iterator.empty
            } else {
              val res = walk(b)
              if (res.stages_reached == stages.size &&
                  wm < horizonTimeoutMs(b.firstUs)) {
                // early completion timeout (set below when the funnel
                // completed before its completion ts cleared the
                // watermark): emit now, tombstone out the horizon
                state.update(FunnelBuf(b.firstUs, Nil, done = true))
                state.setTimeoutTimestamp(horizonTimeoutMs(b.firstUs))
                Iterator.single(res)
              } else {
                state.remove()
                // only funnels that STARTED (stage-1 event seen) emit
                if (b.evts.exists(_._2 == 0)) Iterator.single(res)
                else Iterator.empty
              }
            }
          } else state.getOption match {
            case Some(b) if b.done =>
              // stragglers for an already-emitted funnel: provably unable
              // to change the result (event time ≥ watermark ≥ completion
              // ts) and must not open a fresh attempt inside the horizon —
              // absorb them, exactly like the buffering path would
              if (horizonTimeoutMs(b.firstUs) <= wm) state.remove()
              Iterator.empty
            case prev =>
              val inc = it.map(e => (toMicros(e.ts), stageIdx(e.event_type)))
                .toList
              val buf = prev match {
                case Some(b) => FunnelBuf(
                  math.min(b.firstUs, inc.map(_._1).min), b.evts ::: inc)
                case None => FunnelBuf(inc.map(_._1).min, inc)
              }
              val timeoutMs = horizonTimeoutMs(buf.firstUs)
              val res = walk(buf)
              val complete = res.stages_reached == stages.size
              if (complete && ceilMs(res.stage_ts.last) <= wm) {
                // EARLY EMIT: completion ts already under the watermark —
                // no admissible future event can improve the walk
                if (timeoutMs <= wm) state.remove()
                else {
                  state.update(FunnelBuf(buf.firstUs, Nil, done = true))
                  state.setTimeoutTimestamp(timeoutMs)
                }
                Iterator.single(res)
              } else if (timeoutMs <= wm) {
                // horizon already closed (stragglers past the watermark):
                // finalize now — setTimeoutTimestamp below the watermark
                // would throw
                state.remove()
                if (buf.evts.exists(_._2 == 0)) Iterator.single(res)
                else Iterator.empty
              } else {
                state.update(buf)
                // a completed funnel just waiting for its completion ts to
                // clear the watermark wakes at that moment, not at the
                // horizon — the timeout branch finishes the early emit
                state.setTimeoutTimestamp(
                  if (complete)
                    math.max(ceilMs(res.stage_ts.last), wm + 1L)
                  else timeoutMs)
                Iterator.empty
              }
          }
      }
  }
}
