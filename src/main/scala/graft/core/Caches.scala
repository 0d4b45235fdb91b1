package graft.core

import org.apache.spark.sql.DataFrame

/** Lifetime tracker for persisted intermediates. Multi-step operators
  * (LSH dedup, label propagation) persist frames that are consumed by
  * several downstream joins; the RESULT frame is lazy, so the operator
  * cannot unpersist them itself without forfeiting the reuse. Callers
  * that run many such operators in one long-lived session pass a handle
  * and `release()` it after their terminal action; callers that don't
  * care (one query, session exits) use the default [[CacheHandle.unmanaged]]
  * sink, which keeps today's leave-it-to-session-teardown behavior without
  * accumulating references.
  *
  * Why thunks as well as frames: `Dataset.unpersist` cannot free
  * `localCheckpoint` blocks (they live at the RDD level), so operators
  * that truncate lineage register an RDD-level release thunk instead. */
final class CacheHandle(record: Boolean = true) {
  private val releases =
    scala.collection.mutable.ArrayBuffer[Boolean => Unit]()

  /** Register a persisted frame for later release; returns it unchanged. */
  def track(df: DataFrame): DataFrame = synchronized {
    if (record) releases += (b => df.unpersist(b))
    df
  }

  /** Register an arbitrary release action (receives the blocking flag). */
  def trackRelease(f: Boolean => Unit): Unit = synchronized {
    if (record) releases += f
  }

  /** Run every registered release and forget them. */
  def release(blocking: Boolean = false): Unit = synchronized {
    releases.foreach(_(blocking))
    releases.clear()
  }

  /** Number of currently tracked (un-released) resources. */
  def size: Int = synchronized(releases.size)
}

object CacheHandle {
  /** No-op sink: tracked frames are not recorded (and so never released
    * here) — cache lifetime falls to SparkSession teardown. */
  val unmanaged: CacheHandle = new CacheHandle(record = false)

  /** Eagerly `localCheckpoint` a SMALL frame and return it with an
    * RDD-level release thunk. Truncating the lineage makes the frame
    * independent of upstream caches, so unpersisting those cannot force
    * a recompute (Spark's non-cascading uncache still re-plans dependent
    * cache entries and discards their buffers). Driver-side RDD-id
    * snapshot — call from one thread at a time. Production note: local
    * checkpoints don't survive executor loss; a cluster job that must
    * would `setCheckpointDir` and use reliable `checkpoint` instead. */
  def checkpointSmall(df: DataFrame): (DataFrame, Boolean => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck0 = df.localCheckpoint(eager = true)
    // Cap pathological size ESTIMATES: localCheckpoint copies the
    // checkpointed plan's estimated stats into the new LogicalRDD, and
    // join estimates MULTIPLY — so iterated self-join loops (connected
    // components, BFS, label prop, k-means) square the BigInt estimate
    // every round until the driver burns minutes per round in
    // BigInteger multiplies during join-size estimation (flat 0.4 s
    // rounds explode ×2.5/round past ~17 iterations — measured, see
    // StatsReset). No REAL size exceeds Long.MaxValue bytes; anything
    // above it is inflation, and stripping it only flips broadcast
    // decisions that the inflated estimate had already forced off.
    val ck =
      if (ck0.queryExecution.optimizedPlan.stats.sizeInBytes >
          BigInt(Long.MaxValue))
        org.apache.spark.sql.graftnative.StatsReset.resetStats(ck0)
      else ck0
    val fresh = sc.getPersistentRDDs.keySet.diff(before)
    (ck, b => fresh.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(b))))
  }
}
