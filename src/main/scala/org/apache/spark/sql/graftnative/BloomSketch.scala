// Shim package (see NativeExpressions.scala) — reaches Spark's internal
// bloom-filter aggregate/probe expressions, the same kernels the engine's
// own runtime row-level filtering plans.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Distributed bloom-filter build + scan-side probe, on Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions (the
  * machinery behind `spark.sql.optimizer.runtime.bloomFilter`). Both sides
  * key on `xxhash64(key)`, exactly as the engine's injected runtime
  * filters do, so build and probe always hash identically.
  *
  * Scale shape: the build is a partial/merge aggregate — each partition
  * fills a local sketch, merges are bitwise ORs, and ONLY the final
  * serialized sketch (numBits/8 bytes) reaches the driver. The probe is a
  * foldable binary literal inside whole-stage codegen: zero shuffle, zero
  * per-row allocation, broadcast once per executor like any literal.
  */
object BloomSketch {

  /** Optimal sketch size in bits for `expectedItems` keys at `fpp`. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    BloomFilter.optimalNumOfBits(expectedItems, fpp)

  /** Build a bloom filter of `key` over `df` (distributed aggregate) and
    * return the serialized sketch. The single driver-side value is the
    * sketch itself — that is the point: it is the broadcastable stand-in
    * for a deny-list too large to broadcast as a hash table. */
  def buildBytes(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    require(expectedItems > 0, "bloom build: expectedItems must be > 0")
    require(fpp > 0 && fpp < 1, s"bloom build: fpp out of range: $fpp")
    val child = XxHash64(Seq(ExpressionUtils.expression(key)), 42L)
    val agg = new BloomFilterAggregate(child,
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    df.select(ExpressionUtils.column(agg.toAggregateExpression()))
      .head.getAs[Array[Byte]](0)
  }

  /** Scan-side membership probe: true ⇒ key MAY be in the sketch (false
    * positives at the build fpp), false ⇒ key is DEFINITELY absent. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ExpressionUtils.expression(key)), 42L)))
}
