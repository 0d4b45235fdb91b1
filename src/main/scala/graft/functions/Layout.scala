package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout functions: Z-order (Morton) clustering for multi-dimension
  * data skipping. Sorting a table by the bit-interleave of two key columns
  * co-locates rows that are close in BOTH dimensions, so parquet row-group
  * min/max statistics prune scans filtered on either key — the standard
  * lakehouse `OPTIMIZE ... ZORDER BY` technique, here as a pure codegen'd
  * column expression (shift/mask arithmetic only, no UDF).
  */
object Layout {

  // the classic parallel-bit "spread" ladder: x's low 32 bits end up in
  // the even bit positions of a 64-bit value (5 mask-shift rounds)
  private val spreadMasks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  private def spread(c: Column): Column =
    spreadMasks.foldLeft(c.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 64-bit Morton code of two non-negative dimension values (each must
    * fit in 32 bits — mask or bucket wider domains first). `a` takes the
    * even bits, `b` the odd bits. Deterministic integer arithmetic an
    * independent engine reproduces exactly. */
  def zorderValue(a: Column, b: Column): Column =
    spread(a.cast(LongType))
      .bitwiseOR(shiftleft(spread(b.cast(LongType)), 1))

  /** Rewrite a frame into Z-order: range-partition + sort by the Morton
    * code of the two cluster keys, ready for a parquet write where every
    * file covers a small rectangle of the (a, b) key space. `repartition
    * ByRange` keeps output files balanced by z-value quantiles (sampled),
    * and the in-partition sort makes row-group stats tight on BOTH keys.
    *
    * `normalize` (default) first rank-buckets each dimension into 2^16
    * exact-percentile buckets ([[graft.ops.Agg.AggDataFrame.rankBuckets]]
    * — a distinct-value broadcast join, never a global row sort). Raw
    * interleaving lets the wider domain's high bits dominate the curve
    * (measured on orders sf0.001: custkey spans 0-150 vs orderkey
    * 0-1500 — raw z-order tightened per-file orderkey ranges 6× but left
    * custkey ranges untouched); rank normalization gives both dimensions
    * equal bit-weight regardless of their value ranges. */
  def zorderBy(df: DataFrame, a: String, b: String,
      partitions: Int, normalize: Boolean = true): DataFrame = {
    require(partitions > 0, "zorderBy: partitions must be > 0")
    import graft.ops.Agg.AggDataFrame
    val pre =
      if (normalize)
        df.rankBuckets(a, 1 << 16, "__za").rankBuckets(b, 1 << 16, "__zb")
      else df.withColumn("__za", col(a)).withColumn("__zb", col(b))
    pre.withColumn("__z", zorderValue(col("__za"), col("__zb")))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__za", "__zb", "__z")
  }
}
