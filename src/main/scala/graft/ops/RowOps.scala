package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level operator surface (SURVEY §2.3, §2.4): filtering, slicing,
  * conditional update, null handling, binning, sorting. Everything compiles
  * to vanilla Column expressions, so Catalyst pushes filters to the scan and
  * keeps the whole pipeline in whole-stage codegen.
  */
object RowOps {

  /** Per-key sort spec (reference `api/sort.kt:124-148`: `desc`,
    * `nullsLast` flags per key; default asc nulls-first, `sort.kt:81`). */
  final case class SortKey(name: String, desc: Boolean = false,
      nullsLast: Boolean = false) {
    def toColumn: Column = (desc, nullsLast) match {
      case (false, false) => col(name).asc_nulls_first
      case (false, true)  => col(name).asc_nulls_last
      case (true, false)  => col(name).desc_nulls_first
      case (true, true)   => col(name).desc_nulls_last
    }
  }

  implicit final class RichDataFrame(private val df: DataFrame)
      extends AnyVal {

    // ---- filtering ----------------------------------------------------
    /** reference `api/filter.kt` — `filter {rowPred}`; predicate is a
      * Column so it vectorizes + pushes down (the reference's `filterFast`
      * is the *default* here). */
    def filterRows(pred: Column): DataFrame = df.filter(pred)
    /** reference `api/drop.kt` — drop rows matching. */
    def dropRows(pred: Column): DataFrame = df.filter(!coalesce(pred, lit(false)))

    /** reference `api/dropNulls.kt` — any/all-null row drop on selection. */
    def dropNulls(cols: Seq[String] = Nil, whereAllNull: Boolean = false)
        : DataFrame = {
      val cs = if (cols.isEmpty) df.columns.toSeq else cols
      df.na.drop(if (whereAllNull) "all" else "any", cs)
    }

    /** reference `api/dropNa.kt` — null OR NaN (NaN only meaningful on
      * float/double columns). */
    def dropNa(cols: Seq[String] = Nil, whereAllNa: Boolean = false)
        : DataFrame = {
      val cs = if (cols.isEmpty) df.columns.toSeq else cols
      def bad(c: String): Column = df.schema(c).dataType match {
        case FloatType | DoubleType => col(c).isNull || isnan(col(c))
        case _                      => col(c).isNull
      }
      val conds = cs.map(bad)
      val drop  = if (whereAllNa) conds.reduce(_ && _) else conds.reduce(_ || _)
      df.filter(!drop)
    }

    // ---- dedup --------------------------------------------------------
    /** reference `api/distinctBy.kt` — keep FIRST row per key. Spark has no
      * stable "first" without an order, so an explicit tiebreak ordering
      * makes the result deterministic and cluster-safe (window, one
      * shuffle on the key). */
    def distinctByFirst(keys: Seq[String], order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    // ---- update / null fill -------------------------------------------
    /** reference `api/update.kt` — conditional cell rewrite keeping the
      * original value where the predicate fails. */
    def updateWhere(colName: String, pred: Column, value: Column): DataFrame =
      df.withColumn(colName, when(pred, value).otherwise(col(colName)))

    /** reference `update(...).at(indices)` — positional cell rewrite;
      * small-data utility built on the scale-safe row number. */
    def updateAt(colName: String, indices: Seq[Long], order: Seq[Column],
        value: Column): DataFrame =
      addRowNumber(order, "__rn")
        .withColumn(colName,
          when(col("__rn").isin(indices: _*), value).otherwise(col(colName)))
        .drop("__rn")

    /** reference `update(...).notNull{}` — rewrite only non-null cells. */
    def updateNotNull(colName: String, value: Column): DataFrame =
      df.withColumn(colName,
        when(col(colName).isNotNull, value).otherwise(col(colName)))

    /** reference `api/fillNulls.kt` — null-only rewrite sugar. */
    def fillNullsWith(colName: String, value: Column): DataFrame =
      df.withColumn(colName, coalesce(col(colName), value))

    /** reference `api/nullToZero.kt` — type-dispatched zero fill. */
    def nullToZero(cols: Seq[String]): DataFrame = {
      cols.foldLeft(df) { (d, c) =>
        d.schema(c).dataType match {
          case _: NumericType =>
            d.withColumn(c, coalesce(col(c), lit(0).cast(d.schema(c).dataType)))
          case _ => d
        }
      }
    }

    // ---- scalar helpers -----------------------------------------------
    /** reference `api/between.kt` — inclusive by default; `strict` gives
      * the exclusive variant. */
    def betweenRows(c: String, lower: Any, upper: Any,
        includeBoundaries: Boolean = true): DataFrame =
      if (includeBoundaries) df.filter(col(c).between(lower, upper))
      else df.filter(col(c) > lower && col(c) < upper)

    /** reference `api/digitize.kt` — numpy-style binning: index of the bin
      * each value falls into, bins ascending. Pure `when` chain → codegen. */
    def digitize(c: String, bins: Seq[Double], right: Boolean = false,
        as: String = "bin"): DataFrame = {
      val v = col(c)
      val expr = bins.zipWithIndex.foldRight(lit(bins.length)) {
        case ((b, i), acc) =>
          when(if (right) v <= b else v < b, lit(i)).otherwise(acc)
      }
      df.withColumn(as, expr)
    }

    // ---- ordering / slicing -------------------------------------------
    /** reference `api/sort.kt` — multi-key sort with per-key desc /
      * nullsLast flags; reference default is nulls-first asc.
      * (`sortWith(comparator)` — `sort.kt:35-40` — is deliberately NOT
      * provided: an opaque JVM comparator cannot be range-partitioned, so
      * it has no faithful distributed translation; express the ordering
      * as sort-key expressions instead.) */
    def sortByKeys(keys: SortKey*): DataFrame =
      df.orderBy(keys.map(_.toColumn): _*)

    /** reference `Operations.kt:114-124` `addRowNumber` — contiguous
      * 0-based ids. Scale-safe: range-partition + sort on the order keys,
      * then `zipWithIndex` (per-partition counts collected once, offsets
      * applied distributed) — never a single-partition global window. With
      * no order keys, numbers current partition order (reference frame
      * order analogue). */
    def addRowNumber(order: Seq[Column] = Nil, as: String = "row_number")
        : DataFrame = {
      val sorted =
        if (order.isEmpty) df
        else df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
      val schema = StructType(sorted.schema.fields :+
        StructField(as, LongType, nullable = false))
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
      sorted.sparkSession.createDataFrame(rdd, schema)
    }

    /** reference `DataFrame.kt:186` `shuffled()` — random permutation;
      * seeded for reproducibility. */
    def shuffled(seed: Long = 42L): DataFrame = df.orderBy(rand(seed))

    /** reference `api/chunked.kt` — n-row chunk id (pairs with groupBy to
      * reproduce the FrameColumn-of-chunks shape). Built on the scale-safe
      * `addRowNumber`, so no single-partition window. */
    def chunked(size: Int, order: Seq[Column] = Nil, as: String = "chunk")
        : DataFrame = {
      require(size > 0, "chunked: size must be positive")
      addRowNumber(order, "__rn")
        .withColumn(as, col("__rn") / size cast LongType).drop("__rn")
    }

    /** Sequence packing for training batches: assign each document to a
      * pack of ≈`capacity` total tokens. Deterministic greedy contiguous
      * packing — docs are sharded by `idCol mod shards`, ordered by id
      * within the shard, and doc d joins pack ⌊preSum(d)/capacity⌋ (the
      * cumulative token count BEFORE d), so a pack closes once it
      * crosses the capacity; `pack_id = bin·shards + shard` is globally
      * unique. Every step is integer arithmetic on a closed formula, so
      * an independent engine reproduces the exact assignment (oracle
      * `text_pack_sequences`). Scale shape: the window sorts within
      * hash-sized shards — `shards` sized to the cluster bounds both
      * parallelism and per-task sort size; no global sort anywhere. */
    def packSequences(idCol: String, tokCol: String, capacity: Long,
        shards: Int, as: String = "pack_id"): DataFrame = {
      require(capacity > 0 && shards > 0)
      val shard = pmod(col(idCol), lit(shards.toLong))
      val w = Window.partitionBy(shard).orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__pre", coalesce(sum(col(tokCol)).over(w), lit(0L)))
        .withColumn(as,
          (floor(col("__pre") / capacity).cast(LongType) * shards +
            shard).cast(LongType))
        .drop("__pre")
    }

    /** reference `api/duplicate.kt` — replicate each row n times. */
    def duplicateRows(n: Int): DataFrame =
      df.withColumn("__dup", explode(lit((1 to n).toArray))).drop("__dup")

    /** reference `api/append.kt` — append literal rows via a literal frame
      * union (caller builds the frame with the session). */
    def appendRows(other: DataFrame): DataFrame =
      graft.core.TypeWidening.unionByNameWide(Seq(df, other))

    /** Drop rows whose `valueCols` all equal the PREVIOUS row's within
      * the (keys, order) sequence — state-change compression for
      * sensor/status streams (keep transitions, drop steady-state
      * repeats). NULL-safe: null ≡ null counts as a repeat (`<=>`), so
      * a run of nulls collapses like any other run; the first row per
      * key always survives. Callers supply a TOTAL order — ties would
      * make "previous" nondeterministic. ONE hash shuffle (the lag
      * window); filter is scan-side after it. */
    def dropConsecutiveRepeats(keys: Seq[String], orderCols: Seq[String],
        valueCols: Seq[String]): DataFrame = {
      require(keys.nonEmpty, "dropConsecutiveRepeats: partition keys")
      require(orderCols.nonEmpty && valueCols.nonEmpty,
        "dropConsecutiveRepeats: need order and value columns")
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(orderCols.map(col): _*)
      val repeat = valueCols.map(c =>
        lag(col(c), 1).over(w) <=> col(c)).reduce(_ && _)
      val first = row_number().over(w) === 1
      df.withColumn("__keep", first || !repeat)
        .where(col("__keep")).drop("__keep")
    }
  }
}
