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
  * accumulating references. */
final class CacheHandle(record: Boolean = true) {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Register a persisted frame for later release; returns it unchanged. */
  def track(df: DataFrame): DataFrame = synchronized {
    if (record) frames += df
    df
  }

  /** Unpersist every tracked frame and forget them. */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking))
    frames.clear()
  }

  /** Number of currently tracked (un-released) frames. */
  def size: Int = synchronized(frames.size)
}

object CacheHandle {
  /** No-op sink: tracked frames are not recorded (and so never released
    * here) — cache lifetime falls to SparkSession teardown. */
  val unmanaged: CacheHandle = new CacheHandle(record = false)
}
