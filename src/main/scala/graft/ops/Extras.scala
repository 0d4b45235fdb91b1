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

  /** Bucketized range (interval) join, beyond the reference — the other
    * join shape Spark cannot plan distributively: `point BETWEEN lo AND
    * hi` alone is an inequality-only condition, which Catalyst executes
    * as a broadcast nested loop (or a cartesian product when neither
    * side fits) — O(|P|·|I|) work at 100 TB. Bucketizing turns it into
    * an EQUI-join: each interval explodes to the fixed-width buckets it
    * covers, each point computes its single bucket, the join hash-
    * partitions on (keys, bucket), and exact half-open containment
    * [lo, hi) is re-checked post-join. A point lies in exactly ONE
    * bucket, so no dedup pass is needed — a multi-bucket interval meets
    * each point only in the point's own bucket.
    *
    * `bucketWidth` trades interval fanout (~len/width + 1 rows each)
    * against in-bucket selectivity; pick it near the median interval
    * length. Empty/inverted intervals (hi <= lo) match nothing and are
    * dropped before the explode (Spark's `sequence` would otherwise
    * count DOWN for them). Output carries all point columns then all
    * interval columns; shared `keys` names appear twice — select/alias
    * downstream. */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be > 0")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast("long")
    val pt = points.withColumn("__bucket", bucket(col(pointCol)))
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(
        sequence(bucket(col(startCol)), bucket(col(endCol)))))
    val cond = keys.map(k => pt(k) === iv(k))
      .foldLeft(pt("__bucket") === iv("__bucket") &&
        pt(pointCol) >= iv(startCol) && pt(pointCol) < iv(endCol))(_ && _)
    pt.join(iv, cond)
      .select(points.columns.map(pt(_)) ++
        intervals.columns.map(iv(_)): _*)
  }

  /** As-of join (time-series enrich, beyond the reference — a staple of
    * training-data pipelines): for every left row, attach the NEAREST
    * right row per key — backward (latest `rightTs <= leftTs`, the
    * default) or forward (earliest `rightTs >= leftTs`), optionally
    * bounded by `toleranceUs` (a match farther than the tolerance
    * yields nulls, pandas `merge_asof` semantics — a year-old profile
    * should NOT enrich today's event just because nothing newer
    * exists). The tolerance gap is measured in epoch micros, so both
    * ts columns must be TIMESTAMP-typed when a tolerance is given;
    * direction/no-tolerance calls accept any mutually comparable
    * ordering type.
    *
    * Scale shape: tag and union both sides, ONE shuffle on the key, then
    * a running last_value over the time-ordered union — never the
    * range-condition join Spark would execute as a broadcast nested loop
    * or exploded inequality join. O((|L|+|R|) log) per key, no fanout;
    * the tolerance rides the same window (the matched timestamp fills
    * alongside the payload, one comparison at the end — no extra pass).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    toleranceUs.foreach(t => require(t > 0,
      s"asofJoin: toleranceUs must be > 0, got $t"))
    val lTagged = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts",
        lit(null).cast(right.schema(rightTs).dataType))
      .withColumns(payload.map(p => p -> lit(null).cast(
        right.schema(p).dataType)).toMap)
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+
        col(rightTs).as("__rts")) ++
        payload.map(col) :+ lit(0).as("__side"): _*)
    val unioned = TypeWidening.unionByNameWide(Seq(lTagged, rTagged))
    // right rows (side 0) sort before left rows at the same timestamp
    // in BOTH directions, so an exact-tie right row IS visible to the
    // left row (<=/>= inclusive semantics)
    val order =
      if (forward) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = (payload :+ "__rts").foldLeft(unioned) { (d, p) =>
      d.withColumn(p, last(when(col("__side") === 0, col(p)), true).over(w))
    }
    val withinTol = toleranceUs match {
      case None => lit(true)
      case Some(t) =>
        val gap =
          if (forward) unix_micros(col("__rts")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__rts"))
        col("__rts").isNotNull && gap <= t
    }
    val masked = payload.foldLeft(filled) { (d, p) =>
      d.withColumn(p, when(withinTol, col(p)))
    }
    masked.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }
}
