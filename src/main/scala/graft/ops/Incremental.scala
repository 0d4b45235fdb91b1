package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Incremental AGGREGATE maintenance for append-only tables — the
  * materialized-view refresh primitive: keep a small per-group STATE
  * frame, fold each arriving batch into it, and finalize on demand.
  * At 100 TB this is the difference between "yesterday's state + last
  * hour's delta" and re-scanning the whole history per refresh — the
  * refresh cost is O(delta + state), independent of table age. The
  * batch-side complement to the streaming CDC materialized view
  * (`streaming/Streaming.scala`): same algebra, driver-scheduled.
  *
  * The state is a commutative monoid per group — (n, sum_micro, min,
  * max) under (+, +, min, max) — so merging is associative, order-free,
  * and partition-free: state(A) ⊕ state(B) = state(A ∪ B) exactly (the
  * law the unit pins and the oracle replays end-to-end). Sums ride
  * exact BIGINT micros (round(value·10⁶) per ROW at scan time, the
  * repo-wide micro convention), so incremental and full recompute agree
  * bit-for-bit — a double running sum would drift with merge order.
  * APPEND-ONLY by contract: min/max (and sums without a retraction
  * log) cannot un-see a deleted row; deletes need the CDC/SCD2 path
  * (`ops/Cdc.scala`).
  *
  * Null values contribute to `n` (the row arrived) but not to the
  * numeric fields; all-null groups finalize with null mean/min/max.
  */
object Incremental {

  private val stateCols = Seq("n", "n_vals", "sum_micro", "min", "max")

  /** Build the mergeable per-group state of a batch: one partial-
    * aggregated shuffle, output is GROUP-cardinality. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame = {
    require(keys.nonEmpty, "aggState: no group keys")
    val v = col(valueCol).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(v).as("n_vals"),
        coalesce(sum(round(v * lit(1000000.0)).cast("long")), lit(0L))
          .as("sum_micro"),
        min(v).as("min"),
        max(v).as("max"))
  }

  /** Fold a batch's state into the standing state: union + one
    * group-cardinality re-aggregation. New keys appear, untouched keys
    * pass through — `merge(state, aggState(delta))` IS the refresh. */
  def mergeAggState(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeAggState: no group keys")
    val cols = keys ++ stateCols
    state.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("n_vals")).as("n_vals"),
        sum(col("sum_micro")).as("sum_micro"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }

  /** Render the state as the user-facing aggregate:
    * (keys…, n, sum_micro, mean 6dp, min, max). */
  def finalizeAggState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select((keys.map(col) :+ col("n") :+ col("sum_micro") :+
      when(col("n_vals") > 0L,
        round(col("sum_micro").cast("double") / lit(1000000.0) /
          col("n_vals").cast("double"), 6)).as("mean") :+
      col("min") :+ col("max")): _*)

  /** Driver-managed standing state refreshed per micro-batch — the
    * STREAMING face of the same monoid: `state ⊕ aggState(batch)` per
    * `foreachBatch`. Because the state is a commutative monoid, the
    * fold is exact under ANY split of the input across micro-batches
    * (the StatsLawSpec split-invariance law) — final state ≡ batch
    * [[Incremental.aggState]] over the full input, pinned by the
    * MemoryStream unit. Each refresh eagerly `localCheckpoint`s the
    * merged state (a GROUP-cardinality frame) so the plan never grows
    * with batch count — the pageRank iterate-checkpoint discipline;
    * the predecessor's checkpoint blocks are freed after the new one
    * materializes. `update` is also directly usable as the
    * driver-scheduled batch refresh loop (same algebra, no stream). */
  final class StreamingAggState(keys: Seq[String], valueCol: String) {
    @volatile private var state: Option[DataFrame] = None
    private var prev: Option[DataFrame] = None

    /** Fold one batch in (thread-safe: foreachBatch serializes calls). */
    def update(batch: DataFrame): Unit = synchronized {
      val delta = aggState(batch, keys, valueCol)
      val next = state match {
        case None => delta
        case Some(st) => mergeAggState(st, delta, keys)
      }
      val cp = next.localCheckpoint(true)
      prev.foreach(_.unpersist())
      prev = state
      state = Some(cp)
    }

    /** The raw monoid state (None before the first batch). */
    def current: Option[DataFrame] = state

    /** User-facing aggregate view of the standing state. */
    def finalized: Option[DataFrame] =
      state.map(finalizeAggState(_, keys))
  }

  /** Attach an incremental-agg maintainer to a STREAMING DataFrame:
    * starts a foreachBatch query folding every micro-batch into the
    * returned [[StreamingAggState]]. Caller owns the query lifecycle
    * (`processAllAvailable`/`stop`) and reads `state.finalized` at any
    * refresh point. */
  def incrementalAggStream(stream: DataFrame, keys: Seq[String],
      valueCol: String)
      : (StreamingAggState, org.apache.spark.sql.streaming.StreamingQuery) = {
    val holder = new StreamingAggState(keys, valueCol)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        holder.update(batch)
      }
      .start()
    (holder, q)
  }
}
