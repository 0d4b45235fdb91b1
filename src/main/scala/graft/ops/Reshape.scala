package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshape surface (SURVEY §2.7): pivot, gather/melt, split, merge,
  * mergeRows, lock-step multi-column explode, union-with-widening.
  * All plan-building; the only job triggered here is `pivot` when the
  * distinct key set is not supplied (Spark computes it — callers on big
  * data pass `values` explicitly, same as the reference's sorted key set).
  */
object Reshape {

  implicit final class ReshapableDataFrame(private val df: DataFrame) {

    // ---- pivot family --------------------------------------------------
    /** reference `api/pivot.kt` — wide pivot with explicit value list for
      * deterministic column order (and to skip the distinct-scan job);
      * `default` back-fills holes (reference `default(value)`,
      * `pivot.kt:46-53`). */
    def pivotAgg(rows: Seq[String], key: String, values: Seq[Any],
        aggs: Seq[Column], default: Option[Any] = None): DataFrame = {
      val wide = df.groupBy(rows.map(col): _*).pivot(key, values)
        .agg(aggs.head, aggs.tail: _*)
      default.fold(wide) { d =>
        val pivotCols = wide.columns.filterNot(rows.contains).toSeq
        pivotCols.foldLeft(wide)((w, c) =>
          w.withColumn(c, coalesce(col(s"`$c`"), lit(d))))
      }
    }

    /** Multi-column pivot (reference pivots on several key columns at
      * once, `api/pivot.kt:15-56`): the composite key is the `sep`-joined
      * values, producing `k1<sep>k2` output columns — the flat-name
      * rendering of the reference's nested result paths. */
    def pivotAggMulti(rows: Seq[String], keys: Seq[String],
        values: Seq[Seq[Any]], aggs: Seq[Column], sep: String = "_")
        : DataFrame = {
      require(keys.nonEmpty && values.forall(_.length == keys.length),
        "pivotAggMulti: each value tuple must match the key columns")
      val combined = concat_ws(sep, keys.map(col): _*)
      val vals = values.map(_.mkString(sep))
      df.withColumn("__pk", combined)
        .groupBy(rows.map(col): _*).pivot("__pk", vals)
        .agg(aggs.head, aggs.tail: _*)
    }

    /** reference nested pivot result paths
      * (`impl/aggregation/aggregatePivot.kt:44-54`): with several
      * aggregates per pivot key the reference emits ColumnGroups —
      * default path = `pivotValue.{agg1,agg2}` ("separate"); with
      * `groupByValue` the nesting flips to `agg.{value1,value2}`.
      * Implemented as the flat Spark pivot (one shuffle, codegen'd)
      * followed by a zero-cost struct regroup projection. `default`
      * back-fills holes before regrouping (`pivot.kt:46-53`). */
    def pivotAggNested(rows: Seq[String], key: String, values: Seq[Any],
        aggs: Seq[(String, Column)], groupByValue: Boolean = false,
        default: Option[Any] = None): DataFrame = {
      require(aggs.nonEmpty, "pivotAggNested: no aggregates")
      val aliased = aggs.map { case (n, c) => c.as(n) }
      val wide = df.groupBy(rows.map(col): _*).pivot(key, values)
        .agg(aliased.head, aliased.tail: _*)
      // Spark names multi-agg pivot columns `{value}_{aggName}`
      // (single-agg: just `{value}`)
      def flat(v: Any, an: String): Column = {
        val name = if (aggs.size == 1) s"$v" else s"${v}_$an"
        val c = col(s"`$name`")
        // cast the fill literal to the column's own type: a 0.0 default
        // must not widen a long count column to double
        default.fold(c)(d =>
          coalesce(c, lit(d).cast(wide.schema(name).dataType)))
      }
      val nested: Seq[Column] =
        if (groupByValue)
          aggs.map { case (an, _) =>
            struct(values.map(v => flat(v, an).as(v.toString)): _*).as(an) }
        else
          values.map(v =>
            struct(aggs.map { case (an, _) => flat(v, an).as(an) }: _*)
              .as(v.toString))
      wide.select(rows.map(col) ++ nested: _*)
    }

    /** reference `pivot.matches(yes,no)` — boolean presence matrix
      * (`GroupedPivotAggregations.kt:36-37`). */
    def pivotMatches(rows: Seq[String], key: String, values: Seq[Any])
        : DataFrame = {
      val wide = df.groupBy(rows.map(col): _*)
        .pivot(key, values).agg(count(lit(1)))
      values.map(_.toString).foldLeft(wide) { (d, c) =>
        d.withColumn(c, coalesce(col(s"`$c`") > 0, lit(false)))
      }
    }

    /** reference `pivot.frames()` — cell = the group's rows themselves
      * (`FrameColumn` → array-of-struct, sorted for determinism). */
    def pivotFrames(rows: Seq[String], key: String, values: Seq[Any],
        payload: Seq[String]): DataFrame =
      df.groupBy(rows.map(col): _*).pivot(key, values)
        .agg(sort_array(collect_list(struct(payload.map(col): _*))))

    // ---- gather (melt / unpivot) ----------------------------------------
    /** reference `api/gather.kt` — selected columns → (key, value) rows.
      * Null values dropped by default, like the reference. Uses the native
      * `stack` generator (codegen'd, no shuffle). Gathering ColumnGroups
      * (struct columns, `gather.kt:40-71`) emits struct-typed `value`
      * cells: the struct schemas are widened field-by-field and each
      * input is REBUILT to the widened shape (`alignColumn`), so groups
      * with overlapping-but-unequal fields gather losslessly. */
    def gather(cols: Seq[String], keyName: String = "key",
        valueName: String = "value", dropNulls: Boolean = true,
        where: Option[Column => Column] = None,
        mapNames: Option[Column => Column] = None,
        mapValues: Option[Column => Column] = None,
        explodeMany: Boolean = true): DataFrame = {
      require(cols.nonEmpty, "gather: empty column selection")
      val keep = df.columns.filterNot(cols.toSet).toSeq
      require(!keep.contains(keyName) && !keep.contains(valueName),
        s"gather: output names ($keyName, $valueName) clash with kept columns")
      val valueType = cols.map(c => df.schema(c).dataType)
        .reduce(graft.core.TypeWidening.widen)
      val pairs: Seq[Column] = lit(cols.size) +: cols.flatMap(c =>
        Seq(lit(c), graft.core.TypeWidening.alignColumn(
          col(c), df.schema(c).dataType, valueType)))
      // reference gather explodes Many (list) cells into one row per
      // element (`gather.kt:72-73` — `.explode(valuesColumn)`); the
      // null/where/map hooks then apply per ELEMENT. Implemented as ONE
      // generator over concat'ed (key, element) structs — `stack` is
      // unusable here because its type check is strict about array
      // containsNull while SimplifyCasts strips the normalizing cast.
      val stacked = valueType match {
        case ArrayType(elemType, _) if explodeMany =>
          val branches = cols.map { c =>
            val aligned = graft.core.TypeWidening.alignColumn(
              col(c), df.schema(c).dataType, valueType)
            val mapped = transform(aligned,
              x => struct(lit(c).as(keyName), x.as(valueName)))
            if (dropNulls) coalesce(mapped, array())
            else coalesce(mapped, array(struct(lit(c).as(keyName),
              lit(null).cast(elemType).as(valueName))))
          }
          df.select((keep.map(col) :+
              explode(concat(branches: _*)).as("__kv")): _*)
            .select((keep.map(col) :+
              col(s"__kv.$keyName").as(keyName) :+
              col(s"__kv.$valueName").as(valueName)): _*)
        case _ =>
          df.select((keep.map(col) :+ stack(pairs: _*)
            .as(Seq(keyName, valueName))): _*)
      }
      // reference gather hooks (`gather.kt:15-18`): value filter, key
      // rename, value transform — plain post-stack expressions
      val filtered =
        if (dropNulls) stacked.filter(col(valueName).isNotNull) else stacked
      val whereApplied =
        where.fold(filtered)(f => filtered.filter(f(col(valueName))))
      val named = mapNames.fold(whereApplied)(f =>
        whereApplied.withColumn(keyName, f(col(keyName))))
      mapValues.fold(named)(f => named.withColumn(valueName, f(col(valueName))))
    }

    // ---- split ----------------------------------------------------------
    /** reference `api/split.kt` — one string column → N columns; ragged
      * splits padded with null; auto names `splitted$i`. `n` must be given
      * (a distributed engine can't know max parts without a scan). */
    def splitInto(c: String, pattern: String, n: Int,
        names: Seq[String] = Nil): DataFrame = {
      val parts = split(col(c), pattern)
      val outNames =
        if (names.nonEmpty) names else (1 to n).map(i => s"splitted$i")
      outNames.zipWithIndex.foldLeft(df) { case (d, (nm, i)) =>
        // try_element_at: ragged rows pad with null instead of throwing
        // under ANSI mode (Spark 4 default)
        d.withColumn(nm, try_element_at(parts, lit(i + 1)))
      }
    }

    /** reference `split(col).by { (C)->List }.intoMany`
      * (`api/split.kt:11-114`): custom splitter — any ARRAY-producing
      * expression over the column, not just a string pattern. `n = 0`
      * auto-sizes with one cheap max-`size` scan (an aggregate over the
      * splitter output only — column-pruned, no data movement), mirroring
      * the reference's scan-all-rows sizing; pass `n` explicitly to skip
      * that extra job at scale. */
    def splitIntoBy(c: String, f: Column => Column, n: Int = 0,
        names: Seq[String] = Nil): DataFrame = {
      val parts = f(col(c))
      val width =
        if (n > 0) n
        else {
          val row = df.select(max(size(parts))).head()
          if (row.isNullAt(0)) 0 else row.getInt(0)
        }
      require(width > 0,
        s"splitIntoBy($c): splitter produced no parts (empty input?) - " +
          "pass n explicitly")
      val outNames =
        if (names.nonEmpty) names else (1 to width).map(i => s"splitted$i")
      outNames.zipWithIndex.foldLeft(df) { case (d, (nm, i)) =>
        d.withColumn(nm, try_element_at(parts, lit(i + 1)))
      }
    }

    /** reference `split(col).intoRows()` — one column → N rows. */
    def splitIntoRows(c: String, pattern: String, as: String): DataFrame =
      df.withColumn(as, explode(split(col(c), pattern)))

    // ---- merge ----------------------------------------------------------
    /** reference `api/merge.kt` — N columns → 1 list column. */
    def mergeIntoArray(cols: Seq[String], as: String): DataFrame = {
      val t = cols.map(c => df.schema(c).dataType)
        .reduce(graft.core.TypeWidening.widen)
      df.withColumn(as, array(cols.map(c => col(c).cast(t)): _*))
        .drop(cols: _*)
    }
    /** reference `merge(...).by(sep)` — N columns → joined string. */
    def mergeIntoString(cols: Seq[String], sep: String, as: String)
        : DataFrame =
      df.withColumn(as, concat_ws(sep, cols.map(col): _*)).drop(cols: _*)
    /** reference `merge(...).into` struct form. */
    def mergeIntoStruct(cols: Seq[String], as: String): DataFrame =
      df.withColumn(as, struct(cols.map(col): _*)).drop(cols: _*)

    /** reference `api/mergeRows.kt` — inverse of explode: group by the
      * OTHER columns, collapse selected ones into sorted lists (sorted for
      * determinism; the reference preserves encounter order, which is not
      * stable on a cluster). Default dropNulls=false matches the reference
      * (`mergeRows.kt:13`); nulls are kept by collecting single-field
      * structs (collect_list drops bare nulls) and unwrapping, sorted
      * nulls-first via struct ordering. */
    def mergeRows(collapse: Seq[String], dropNulls: Boolean = false)
        : DataFrame = {
      val keys = df.columns.filterNot(collapse.toSet).toSeq
      val aggs = collapse.map { c =>
        if (dropNulls) array_sort(collect_list(col(c))).as(c)
        else transform(sort_array(collect_list(struct(col(c).as("v")))),
          s => s.getField("v")).as(c)
      }
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    // ---- explode ----------------------------------------------------------
    /** reference `api/explode.kt` — MULTI-column lock-step explode: rows
      * expand to the max cell size across the selected array columns,
      * shorter arrays padded with null (`arrays_zip` has exactly these
      * semantics); empty/null cells keep the row with nulls unless
      * dropEmpty. */
    def explodeLockstep(cols: Seq[String], dropEmpty: Boolean = true)
        : DataFrame = {
      require(cols.nonEmpty)
      // A null cell must pad with nulls, not null the whole zip (reference
      // explode.kt expands to the max size across columns): coalesce each
      // input to a typed empty array first.
      val zipped = arrays_zip(cols.map(c =>
        coalesce(col(c), array().cast(df.schema(c).dataType)).as(c)): _*)
      val ex     = if (dropEmpty) explode(zipped) else explode_outer(zipped)
      val others = df.columns.filterNot(cols.toSet).toSeq
      df.withColumn("__z", ex)
        .select((others.map(col) ++
          cols.map(c => col("__z").getField(c).as(c))): _*)
    }

    // ---- union ----------------------------------------------------------
    /** reference `api/union.kt` — alignment by name + type widening. */
    def unionWide(other: DataFrame): DataFrame =
      graft.core.TypeWidening.unionByNameWide(Seq(df, other))

    /** reference `api/transpose.kt` — single row → (name, value) frame.
      * Driver-side by design (operates on one row). */
    def transposeRow(): DataFrame = {
      val rows = df.take(1)
      require(rows.nonEmpty,
        "transposeRow: input has no rows - nothing to transpose")
      val row = rows.head
      val spark = df.sparkSession
      import spark.implicits._
      df.columns.toSeq.map(c =>
        (c, Option(row.getAs[Any](c)).map(_.toString).orNull))
        .toDF("name", "value")
    }
  }
}
