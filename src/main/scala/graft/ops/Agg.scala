package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grouping & aggregation surface (SURVEY §2.6).
  *
  * Everything is a single `groupBy(...).agg(...)` plan — Catalyst plans the
  * partial/final split the reference hand-rolls in its TwoStepAggregator
  * (`impl/aggregation/aggregators/TwoStepAggregator.kt`), giving map-side
  * combine and spill for free. No collects, no per-group driver loops.
  */
object Agg {

  // ---- aggregate expression builders ---------------------------------

  /** Reference-exact "std": √Σ(x−μ)² — NO division by n or n−1
    * (reference `api/std.kt:58-64` `stdMean`). Expressed as
    * √(var_pop(x)·n), which is algebraically IDENTICAL (var_pop =
    * Σ(x−μ)²/n) but numerically stable: Spark's var_pop accumulates
    * central moments with a Welford-style merge, so a column with
    * mean ≫ std (prices, ids) never hits the catastrophic cancellation
    * the naive √(Σx² − (Σx)²/n) form suffers — that form loses all
    * significant digits (and can go √negative → NaN) once
    * (σ/μ)² < double epsilon × n. Still ONE aggregation pass, still
    * inside whole-stage codegen. Null xs are ignored (reference skips
    * nulls; var_pop and count both skip nulls). */
  def stdRef(c: Column): Column = {
    val x = c.cast(DoubleType)
    sqrt(var_pop(x) * count(x))
  }

  /** Sane stddev for real use; ship both (SURVEY §7.3). */
  def stdSamp(c: Column): Column = stddev_samp(c)

  /** Exact median — sorted middle / mean of the two middles (reference
    * `api/median.kt:20-30`); Spark `median` is the exact percentile(0.5),
    * matching. Never percentile_approx. */
  def medianExact(c: Column): Column = median(c)

  /** Reference mean semantics (`api/mean.kt:11-37`): nulls always skipped;
    * `skipNa=true` also skips NaN; `skipNa=false` lets any NaN poison the
    * result; empty/all-skipped group → NaN (not null). */
  def meanRef(c: Column, skipNa: Boolean = false): Column = {
    val x = c.cast(DoubleType)
    val base =
      if (skipNa) avg(when(!isnan(x), x))
      else avg(x) // Spark avg ignores null, propagates NaN — matches
    coalesce(base, lit(Double.NaN))
  }

  /** Conditional count (reference `count(predicate)`,
    * `GroupByAggregations.kt:30-31`). */
  def countWhere(pred: Column): Column = count_if(pred)

  implicit final class AggDataFrame(private val df: DataFrame) {

    // ---- groupBy + aggregate DSL ------------------------------------
    /** reference `groupBy(keys).aggregate { ... }` — multi-agg in one
      * shuffle. Aliases are the caller's (`into` names). */
    def groupAgg(keys: Seq[String], aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "groupAgg: no aggregates")
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    /** Frame-level aggregation (reference `DataFrameAggregations.kt`):
      * one-row result, no grouping. */
    def aggAll(aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "aggAll: no aggregates")
      df.agg(aggs.head, aggs.tail: _*)
    }

    // ---- hierarchical subtotals (beyond parity) -----------------------
    /** Rollup / cube / grouping-sets multi-agg. The reference has none of
      * these (SURVEY §2.6 "Not present"); a report that needs per-group,
      * per-key and grand totals must run the aggregation N times and
      * concat. Here Catalyst's Expand operator emits each input row once
      * per grouping set inside a SINGLE shuffle, so subtotal hierarchies
      * cost one pass over the data regardless of depth — at 100 TB that is
      * the difference between one scan and |sets| scans. Grouped-out key
      * columns come back null; `grouping_id()` disambiguates a subtotal
      * null from a data null. */
    def rollupAgg(keys: Seq[String], aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "rollupAgg: no aggregates")
      df.rollup(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    def cubeAgg(keys: Seq[String], aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "cubeAgg: no aggregates")
      df.cube(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    def groupingSetsAgg(sets: Seq[Seq[String]], keys: Seq[String],
        aggs: Seq[Column]): DataFrame = {
      require(aggs.nonEmpty, "groupingSetsAgg: no aggregates")
      df.groupingSets(sets.map(_.map(col)), keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    }

    // ---- per-column batch aggregates (`For` variants) ----------------
    /** reference `sumFor(cols)` — sum each selected column, keeping its
      * name. Spark widens Int→Long, BigDecimal stays decimal, matching the
      * reference's NumbersAggregator widening. */
    def sumFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => sum(col(c)).as(c)))
    def meanFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => avg(col(c)).as(c)))
    def minFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => min(col(c)).as(c)))
    def maxFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => max(col(c)).as(c)))
    def stdForRef(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => stdRef(col(c)).as(c)))
    def medianFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => medianExact(col(c)).as(c)))
    /** Exact multi-percentile per group (linear interpolation, R-7 — the
      * same definition DuckDB's `quantile_cont` uses), one column per
      * requested p. Exact percentile sorts within each group; at scale
      * prefer `approx_percentile` when a bounded error is acceptable —
      * this is the ground-truth variant the approximation is judged
      * against. */
    def percentilesFor(keys: Seq[String], c: String,
        ps: Seq[Double]): DataFrame = {
      require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
        "percentilesFor: percentages must be in [0,1]")
      groupAgg(keys, ps.map(p =>
        round(percentile(col(c), lit(p)), 6)
          .as(s"p${math.round(p * 100)}")))
    }

    // ---- row-expression aggregates (`Of` variants) -------------------
    /** reference `sumOf { rowExpr }` / `minOf` / `maxOf` / `meanOf`
      * (`GroupByAggregations.kt`): aggregate an arbitrary row expression
      * per group. */
    def sumOf(keys: Seq[String], expr: Column, as: String): DataFrame =
      groupAgg(keys, Seq(sum(expr).as(as)))
    def minOf(keys: Seq[String], expr: Column, as: String): DataFrame =
      groupAgg(keys, Seq(min(expr).as(as)))
    def maxOf(keys: Seq[String], expr: Column, as: String): DataFrame =
      groupAgg(keys, Seq(max(expr).as(as)))
    def meanOf(keys: Seq[String], expr: Column, as: String): DataFrame =
      groupAgg(keys, Seq(avg(expr).as(as)))

    // ---- skew-safe two-phase aggregation -----------------------------
    /** Salted sum/count for skewed keys: phase 1 aggregates on
      * (keys, salt) spreading one hot key over `saltBuckets` reducers,
      * phase 2 merges partials on the keys alone. Algebraic aggregates
      * only (sum/count compose); the second shuffle moves `buckets` rows
      * per key, not the raw data. AQE skew-join handles join-side skew;
      * this handles aggregation-side skew it can't. */
    def sumForSalted(keys: Seq[String], cols: Seq[String],
        saltBuckets: Int = 16): DataFrame = {
      require(saltBuckets > 1, "saltBuckets must be > 1")
      val salted = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(saltBuckets)))
      val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
        .agg(count(lit(1)).as("__cnt"),
          cols.map(c => sum(col(c)).as(c)): _*)
      partial.groupBy(keys.map(col): _*)
        .agg(sum(col("__cnt")).as("count"),
          cols.map(c => sum(col(c)).as(c)): _*)
    }

    /** Rank-based bucketing for curriculum/length sampling: bucket(x) =
      * ⌊n · |{rows with score < x}| / N⌋ — every row tagged with its
      * exact percentile bucket WITHOUT a global sort of the data. Shape:
      * one groupBy on the score (distinct values only), a window over
      * that SMALL distinct-value relation to get cumulative counts, and
      * a broadcast-friendly join back — the 100-TB version of what
      * `ntile` does with a single-partition global sort. Integer
      * arithmetic end to end (counts, not interpolated quantiles), so
      * any engine reproduces it bit-for-bit; ties share a bucket by
      * construction. Intended for discrete/integer scores (token
      * counts, rounded quality); a continuous score should be rounded
      * or bucketed upstream so the distinct-value relation stays small. */
    def rankBuckets(c: String, n: Int, as: String = "bucket"): DataFrame = {
      require(n > 0)
      import org.apache.spark.sql.expressions.Window
      val counts = df.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      // global window is safe HERE: it runs over distinct score values,
      // not rows (the same bounded-relation argument as transpose)
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      val less = counts
        .withColumn("__less", coalesce(sum(col("__cnt")).over(w), lit(0L)))
        .withColumn("__total", sum(col("__cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col(c).as("__key"), col("__less"), col("__total"))
      // null-safe join key: a null score is a legitimate rank position
      // (sorted first), and an EqualTo join would silently DROP those rows
      df.join(broadcast(less), col(c) <=> col("__key"))
        .withColumn(as,
          floor(col("__less") * n / col("__total")).cast(IntegerType))
        .drop("__key", "__less", "__total")
    }

    // ---- argmin / argmax whole-row (`minBy`/`maxBy`) -----------------
    /** reference `maxBy(ord)` returns the whole argmax ROW per group
      * (`api/minmaxBy.kt:7-55`). One shuffle: max_by over the packed row
      * struct; ties broken deterministically by the full struct ordering of
      * (ord, payload). */
    def maxByRow(keys: Seq[String], ord: String): DataFrame =
      argRow(keys, ord, greatest = true)
    def minByRow(keys: Seq[String], ord: String): DataFrame =
      argRow(keys, ord, greatest = false)

    private def argRow(keys: Seq[String], ord: String, greatest: Boolean)
        : DataFrame = {
      val payload = df.columns.filterNot(keys.toSet).toSeq
      val packed  = struct((ord +: payload.filterNot(_ == ord)).map(col): _*)
      val agg     =
        if (greatest) max(packed).as("__arg") else min(packed).as("__arg")
      df.groupBy(keys.map(col): _*).agg(agg)
        .select(keys.map(col) ++
          payload.map(c => col("__arg").getField(c).as(c)): _*)
    }

    // ---- collect (`values`) ------------------------------------------
    /** reference `values(sel)` — per-group value lists (`Many` cells).
      * Sorted for cluster determinism (documented deviation from
      * encounter order). */
    def valuesFor(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => array_sort(collect_list(col(c))).as(c)))

    /** Distinct count helper (reference `ndistinct`). */
    def nunique(keys: Seq[String], cols: Seq[String]): DataFrame =
      groupAgg(keys, cols.map(c => count_distinct(col(c)).as(c)))

    // ---- grouped frames (`FrameColumn` representation) ---------------
    /** reference `groupBy` result shape (`api/groupBy.kt:61`): keys frame +
      * a "groups" column whose cells are the group's rows — here an
      * array-of-struct, sorted for determinism. */
    def toGroupedFrames(keys: Seq[String], groupsCol: String = "groups")
        : DataFrame = {
      val payload = df.columns.filterNot(keys.toSet).toSeq
      df.groupBy(keys.map(col): _*)
        .agg(sort_array(collect_list(struct(payload.map(col): _*)))
          .as(groupsCol))
    }

    /** Inverse: splice a groups column back to rows (reference
      * `GroupedDataFrame.ungroup()`). */
    def ungroupFrames(groupsCol: String = "groups"): DataFrame = {
      val elem = df.schema(groupsCol).dataType match {
        case ArrayType(s: StructType, _) => s
        case other => sys.error(s"ungroupFrames: $groupsCol is $other")
      }
      val others = df.columns.filterNot(_ == groupsCol).toSeq
      df.withColumn("__g", explode(col(groupsCol)))
        .select(others.map(col) ++
          elem.fieldNames.toSeq.map(f => col("__g").getField(f).as(f)): _*)
    }

    // ---- describe ----------------------------------------------------
    /** reference `describe(cols)` (`api/describe.kt:13-64`): one row per
      * column — name, count, nulls, unique, top (mode), freq, mean, min,
      * max. Two aggregation passes total (all columns at once): one for
      * the scalar stats, one stacked pass for mode+freq. The mode
      * tie-break is DETERMINISTIC: among equally-frequent values, the
      * lexicographically smallest string rendering wins — engine-portable
      * (the reference's first-encountered tie-break is iteration-order
      * dependent, `api/describe.kt:44`). */
    def describeAll(cols: Seq[String] = Nil): DataFrame = {
      val cs = if (cols.isEmpty) df.columns.toSeq else cols
      // exact-name references: a plain col(name) PARSES backticks/dots,
      // so an exotic column name would break (or redirect) the lookup
      def v0(c: String) = graft.core.SchemaOps.colAt(Seq(c))
      val statRow = df.agg(
        count(lit(1)).as("__n"),
        cs.flatMap { c =>
          val v = v0(c)
          Seq(
            count(v).as(s"__count_$c"),
            count_distinct(v).as(s"__unique_$c"),
            (df.schema(c).dataType match {
              case _: NumericType => avg(v.cast(DoubleType))
              case _              => lit(null).cast(DoubleType)
            }).as(s"__mean_$c"),
            min(v).cast(StringType).as(s"__min_$c"),
            max(v).cast(StringType).as(s"__max_$c"))
        }: _*)
      // mode+freq for ALL columns in one shuffle: unpivot to (column,
      // value) rows, count per value, then pick (max count, min value) per
      // column. Built with the Column API (explode of name/value structs),
      // not string SQL — a column name containing quotes or backticks is
      // data here, never parsed.
      val modes = df
        .select(explode(array(cs.map(c =>
          struct(lit(c).as("column"),
            v0(c).cast(StringType).as("__value"))): _*)).as("__kv"))
        .select(col("__kv.column").as("column"),
          col("__kv.__value").as("__value"))
        .where(col("__value").isNotNull)
        .groupBy("column", "__value").agg(count(lit(1)).as("__cnt"))
        .groupBy("column")
        .agg(min_by(struct(col("__value"), col("__cnt")),
          struct(-col("__cnt"), col("__value"))).as("__m"))
        .select(col("column"), col("__m.__value").as("__top"),
          col("__m.__cnt").as("__freq"))
      val rows = cs.map { c =>
        def s0(p: String) = graft.core.SchemaOps.colAt(Seq(p + c))
        statRow.select(
          lit(c).as("column"),
          s0("__count_").as("count"),
          (col("__n") - s0("__count_")).as("nulls"),
          s0("__unique_").as("unique"),
          s0("__mean_").as("mean"),
          s0("__min_").as("min"),
          s0("__max_").as("max"))
      }
      rows.reduce(_ union _)
        .join(broadcast(modes), Seq("column"), "left")
        .select(col("column"), col("count"), col("nulls"), col("unique"),
          col("__top").as("top"), col("__freq").as("freq"),
          col("mean"), col("min"), col("max"))
    }

    // ---- correlation matrix -----------------------------------------
    /** reference `corr(sel)` (`api/corr.kt:6-30`): full Pearson matrix of
      * the numeric columns. ONE aggregation pass computes all n² pairs,
      * then an unpivot+pivot reshapes the single row into the matrix —
      * no per-pair jobs. */
    def corrMatrix(cols: Seq[String] = Nil): DataFrame = {
      val cs = if (cols.nonEmpty) cols
        else df.schema.fields
          .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
      require(cs.nonEmpty, "corrMatrix: no numeric columns")
      val pairs = for { a <- cs; b <- cs } yield
        corr(col(a).cast(DoubleType), col(b).cast(DoubleType))
          .as(s"${a}__$b")
      val one = df.agg(pairs.head, pairs.tail: _*)
      val stackArgs: Seq[Column] = lit(cs.size * cs.size) +:
        (for { a <- cs; b <- cs
               e <- Seq(lit(a), lit(b), col(s"${a}__$b")) } yield e)
      val long = one.select(stack(stackArgs: _*).as(Seq("column", "var2", "value")))
      long.groupBy("column").pivot("var2", cs).agg(first(col("value")))
    }
  }

  /** Exact WEIGHTED percentile per group (lower/"type-1" rule, no
    * interpolation): the smallest value whose cumulative weight reaches
    * p — weighted median at pMicro = 500000. The aggregate behind
    * "median document length in TOKENS" (each doc weighs its tokens):
    * the unweighted median answers a different question the moment
    * weights vary.
    *
    * Exactness: the threshold test is pure BIGINT — cumw·10⁶ ≥
    * pMicro·total — so the picked row is engine-independent (exact while
    * total weight ≤ ~9·10¹² per group); the returned value is a data
    * value, never an interpolation. Ties in the value are safe: the
    * cumulative frame is RANGE (all peers of a value accumulate
    * together), so tie order can't move the threshold crossing. Rows
    * with null value or null/≤0 weight drop.
    *
    * Scale shape: ONE hash shuffle on the keys; the RANGE window and the
    * final min-aggregate share its partitioning. Weights must be
    * integers — scale fractional weights to micro units upstream. */
  def weightedPercentile(df: DataFrame, keys: Seq[String],
      valueCol: String, weightCol: String, pMicro: Long,
      as: String = "wpct"): DataFrame = {
    require(keys.nonEmpty, "weightedPercentile: partition keys required")
    require(pMicro >= 0L && pMicro <= 1000000L,
      "weightedPercentile: pMicro in [0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val clean = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0L)
    val wCum = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    clean
      .withColumn("__cum", sum(col(weightCol)).over(wCum))
      .withColumn("__tot", sum(col(weightCol)).over(wAll))
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("__cum") * lit(1000000L) >=
        lit(pMicro) * col("__tot"), col(valueCol))).as(as))
  }

  /** Join/aggregation SKEW diagnostics for a key: the report a pipeline
    * owner reads BEFORE reaching for [[saltedAggregate]] /
    * `Joins.saltedJoin` — the top-`topK` heaviest key values with their
    * absolute and relative weight. Columns: (rank, key, cnt,
    * share_micro = 10⁶·cnt/total, x_median_micro = 10⁶·cnt/median
    * per-key count). A healthy key shows x_median ≈ 10⁶; a key whose
    * top entry reads 10⁹ (1000× the median) is the one that strands a
    * 100 TB shuffle on one task, and its x_median is exactly the salt
    * fan-out that would level it.
    *
    * Scale shape: ONE partial-aggregated count shuffle over the data
    * (the same cost the skewed join itself would pay on its build
    * side); the median of per-key counts is an exact-percentile
    * aggregate over the KEY-cardinality frame; top-k plans as
    * TakeOrderedAndProject — per-partition heaps, never a global sort.
    * Ties break on the key string ascending. */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 20)
      : DataFrame = {
    require(keys.nonEmpty, "skewReport: no key columns")
    require(topK >= 1, "skewReport: topK must be >= 1")
    val keyStr = concat_ws("\u0001",
      keys.map(k => coalesce(col(k).cast("string"), lit("\u0000"))): _*)
    val counts = df.select(keyStr.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("__total"),
      percentile(col("cnt"), lit(0.5)).as("__med"))
    val top = counts.crossJoin(broadcast(stats))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank",
        row_number().over(Window.partitionBy()
          .orderBy(col("cnt").desc, col("key").asc)).cast(LongType))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt") * lit(1000000.0) / col("__total"))
          .cast(LongType).as("share_micro"),
        round(col("cnt") * lit(1000000.0) / col("__med"))
          .cast(LongType).as("x_median_micro"))
  }

  /** Per-group TRIMMED MEAN: drop the ⌊n·trimFrac⌋ lowest and highest
    * values of `valueCol` in each group, average the rest — the
    * outlier-robust location estimate between mean (trimFrac 0) and
    * median (→ 0.5), standard for latency/price/score rollups where a
    * handful of corrupt rows shouldn't move the metric. Output: one row
    * per group (keys…, n, n_trimmed, trimmed_mean 6dp).
    *
    * Ties are a non-issue by construction: trimming drops the k lowest
    * ROWS in value order — whichever of several equal values the
    * row_number picks, the surviving multiset is identical, so the mean
    * is deterministic even though the row choice isn't.
    *
    * Scale shape: the rank window and the final aggregation partition
    * identically → Catalyst plans ONE hash Exchange; per-group state is
    * the window sort (spillable), the documented window-op bound. Null
    * values drop before ranking (no position on the value axis). */
  def trimmedMeanBy(df: DataFrame, keys: Seq[String], valueCol: String,
      trimFrac: Double): DataFrame = {
    require(keys.nonEmpty, "trimmedMeanBy: partition keys required")
    require(trimFrac >= 0.0 && trimFrac < 0.5,
      s"trimmedMeanBy: trimFrac must be in [0, 0.5), got $trimFrac")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val ranked = df.where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w).cast(LongType))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k", floor(col("__n") * lit(trimFrac)))
    ranked
      .where(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_trimmed"),
        round(avg(col(valueCol)), 6).as("trimmed_mean"))
  }

  /** GINI CONCENTRATION of a weight across groups: ONE row
    * (n_groups, total, gini_nano) measuring how unequally `weightCol`
    * mass is spread over `groupCol` levels — 0 = perfectly balanced,
    * →1 = one group holds everything. The corpus-mixture governance
    * number: "how concentrated is our token budget across sources?"
    * (compare before/after [[graft.ops.Sampling.temperatureMixture]]).
    *
    * Formula (sorted ascending totals x_1…x_n):
    * G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n. Σ(i·x_i) rides exact 38-digit
    * decimals (rank·weight products overflow longs at ~10⁵ groups ×
    * 10¹⁴ tokens); equal totals in any order give the same sum, so the
    * rank tie-break is value-order-free. Final division is one double
    * op rounded to integer nanos, both engines replaying it.
    *
    * Scale shape: one group-key count shuffle over the data (map-side
    * partials); ascending ranks over the group frame ride
    * [[graft.ops.Series.globalCumSum]] (bucketed two-level scan — no
    * unpartitioned window at ANY group cardinality). Rank ties are safe
    * without a unique order key here: equal totals land in the same
    * cumsum bucket by construction (bucket choice compares only the
    * value), they receive distinct consecutive ranks in arbitrary
    * order, and Σ(i·x_i) over a tie class is x·Σi — invariant under
    * that order. Null group is a real level; null weights count 0. */
  def giniConcentration(df: DataFrame, groupCol: String,
      weight: Column): DataFrame = {
    val g = df.groupBy(coalesce(col(groupCol).cast("string"), lit("(null)"))
        .as("g"))
      .agg(coalesce(sum(weight), lit(0L)).cast(LongType).as("x"))
    val dec = DecimalType(38, 0)
    graft.ops.Series.globalCumSum(g.withColumn("__one", lit(1L)),
        "x", Seq("__one"))
      .withColumn("__i", col("cum___one"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("x")), lit(0L)).as("total"),
        coalesce(sum(col("__i").cast(dec) * col("x").cast(dec)),
          lit(0L).cast(dec)).as("__ix"))
      .select(col("n_groups"), col("total"),
        // nullif-guarded: an empty/zero-weight input yields null gini
        // instead of an ANSI divide-by-zero
        round((lit(2.0) * col("__ix").cast(DoubleType) /
          nullif(col("n_groups").cast(DoubleType) *
            col("total").cast(DoubleType), lit(0.0))
          - (col("n_groups") + lit(1L)).cast(DoubleType) /
            nullif(col("n_groups").cast(DoubleType), lit(0.0))) * lit(1e9))
          .cast(LongType).as("gini_nano"))
  }

  /** Quantile normalization of `valueCol` ACROSS groups — map every
    * group's score distribution onto the corpus-global one, so a
    * quality score of "top 10% within source A" and "top 10% within
    * source B" become the SAME number before mixing (per-source
    * classifiers drift; mixing raw scores over-samples whichever
    * source scores generously — the cross-source calibration step of
    * every corpus-mixing pipeline). Appends `value_norm` (6dp): the
    * global R-7 quantile at the row's within-group percent-rank
    * position, linearly interpolated on a `gridPoints`-point global
    * percentile grid. Ties share a position (and thus a normalized
    * value); a single-row group maps to the global minimum (its
    * percent_rank is 0 — document, don't surprise). Null values pass
    * through with null norm and never distort the ranks; an
    * all-null/empty input returns the frame with a null column.
    *
    * Exactness: the grid is ONE exact `percentile` aggregate (the
    * `agg_percentiles` machinery, = DuckDB `quantile_cont`); position
    * arithmetic and interpolation are mirrored double ops any engine
    * replays bit-for-bit from the same grid.
    *
    * Scale shape: one aggregate for the grid (exact percentile
    * buffers values — the documented cost; at petabyte scale swap in
    * approx_percentile, the [[graft.ops.Similarity]] normStats
    * pattern), one driver collect of gridPoints+1 doubles
    * (planner-scale), one partitioned rank window per group (parallel
    * across groups), and a scan-side broadcast-literal interpolation.
    * The null split rejoins by UNION, never a join. */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
      gridPoints: Int = 1000): DataFrame = {
    require(gridPoints >= 2 && gridPoints <= 100000,
      s"quantileNormalize: gridPoints in [2, 100000], got $gridPoints")
    val v = col(valueCol).cast(DoubleType)
    val nn = df.where(v.isNotNull)
    val gridRow = nn.agg(
      percentile(v, lit((0 to gridPoints).map(_.toDouble / gridPoints)
        .toArray)).as("g")).head()
    if (gridRow.isNullAt(0))
      return df.withColumn("value_norm", lit(null).cast(DoubleType))
    val grid = gridRow.getSeq[Double](0).toArray
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(v)
    val pos = percent_rank().over(w) * lit(gridPoints.toDouble)
    val lo = floor(pos).cast(IntegerType)
    val frac = pos - floor(pos)
    val arr = lit(grid)
    val gLo = element_at(arr, lo + 1)
    val gHi = element_at(arr, least(lo + lit(2), lit(gridPoints + 1)))
    nn.withColumn("value_norm", round(gLo + frac * (gHi - gLo), 6))
      .unionByName(df.where(v.isNull)
        .withColumn("value_norm", lit(null).cast(DoubleType)))
  }
}
