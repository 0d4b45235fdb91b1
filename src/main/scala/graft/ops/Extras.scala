package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.TypeWidening

/** Remaining SURVEY §2 surface: multi-frame joins, grouped sort,
  * FrameColumn-cell aggregation, struct join keys. */
object Extras {

  /** reference `Iterable<DataFrame>.joinOrNull` fold (`join.kt:96-100`):
    * left-join every frame onto the first by shared keys. */
  def joinAll(frames: Seq[DataFrame], keys: Seq[String],
      how: String = "left"): DataFrame = {
    require(frames.nonEmpty, "joinAll: no frames")
    frames.reduce((a, b) => a.join(b, keys, how))
  }

  /** reference grouped `sortBy` (`sort.kt:115-122`): rows sorted within
    * each group, groups co-located. Cluster shape: one shuffle on the keys
    * then an executor-local sort — never a global sort. */
  def sortWithinGroups(df: DataFrame, keys: Seq[String], order: Seq[Column])
      : DataFrame =
    df.repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col) ++ order: _*)

  /** reference `aggregateColumn` (`api/aggregate.kt:8-12`): transform the
    * cells of a FrameColumn (array-of-struct) in place via higher-order
    * functions — no explode/regroup round-trip. */
  def mapFrameColumn(df: DataFrame, groupsCol: String,
      f: Column => Column): DataFrame =
    df.withColumn(groupsCol, transform(col(groupsCol), f))

  /** Aggregate over a FrameColumn's cells (e.g. sum of a field) without
    * ungrouping. */
  def aggFrameColumn(df: DataFrame, groupsCol: String, field: String,
      as: String): DataFrame =
    df.withColumn(as, aggregate(col(groupsCol), lit(0.0),
      (acc, row) => acc + row.getField(field).cast("double")))

  /** reference nested `ColumnGroup` join keys (`join.kt:120-137`): joining
    * on a struct column compares all leaf fields pairwise — Spark's struct
    * equality has exactly those semantics, so a using-join on the struct
    * column is the whole implementation. */
  def joinOnStruct(left: DataFrame, right: DataFrame, structCol: String,
      how: String = "inner"): DataFrame =
    left.join(right, Seq(structCol), how)

  /** Union any number of frames with widening (reference `concat`). */
  def concatAll(frames: Seq[DataFrame]): DataFrame =
    TypeWidening.unionByNameWide(frames)
}
