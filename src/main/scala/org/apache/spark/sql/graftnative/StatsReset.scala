package org.apache.spark.sql.graftnative

import org.apache.spark.sql.DataFrame

/** Strip a DataFrame's propagated size-estimate statistics by rebuilding
  * it over the same physical RDD (no recompute, no data movement — the
  * new `LogicalRDD` simply carries no `originStats`, so its size
  * estimate falls back to the session default).
  *
  * Why this exists: Catalyst's `sizeInBytes` estimate is a `BigInt`,
  * and a join's estimate MULTIPLIES its children's. `Dataset
  * .localCheckpoint`/`checkpoint` copy the checkpointed plan's
  * estimated stats into the replacement `LogicalRDD` (`originStats`),
  * so an ITERATED self-join loop — connected components, BFS, label
  * propagation, k-means — SQUARES the estimate every round even though
  * each round's data and plan are constant. After ~18 rounds the
  * estimate holds millions of bits and the driver spends minutes per
  * round inside `BigInteger.multiplyToomCook3` during join-size
  * estimation (measured: rounds flat at 0.4 s through 17, then ×2.5
  * per round — 152 s at round 24 — on a constant 5000-row frame;
  * stack-sampled to BigInteger multiply under stats estimation).
  * `CacheHandle.checkpointSmall` calls this whenever a checkpointed
  * frame's estimate exceeds the cap — which only pathological
  * estimate INFLATION can produce, never a real size. */
object StatsReset {
  def resetStats(df: DataFrame): DataFrame = {
    val cds = df
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]]
    cds.sparkSession
      .internalCreateDataFrame(cds.queryExecution.toRdd, cds.schema)
  }
}
