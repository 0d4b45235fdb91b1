package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window/series surface (SURVEY §2.9). The reference's row-cursor idioms
  * (`prev()`/`next()`/`diff`/`movingAverage`, `DataRow.kt:97-98`,
  * `api/row/diff.kt`, `api/row/movingAverage.kt`) are inherently sequential;
  * the distributed translation is Spark `Window` — partition by group keys
  * so each partition's state stays executor-local.
  */
object Series {

  /** Partitioned window spec. Partition keys are REQUIRED: an empty
    * partition would silently move every row to one task — fatal at scale
    * (VERDICT r1 #7). For genuinely global series on small frames, opt in
    * explicitly with [[globalSpec]]. */
  def spec(partition: Seq[String], order: Seq[Column]): WindowSpec = {
    require(partition.nonEmpty,
      "Series.spec: empty partition keys build a single-partition global " +
        "window; pass keys, or use Series.globalSpec for small frames")
    Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
  }

  /** Single-partition global window — small-data utility only. */
  def globalSpec(order: Seq[Column]): WindowSpec =
    Window.orderBy(order: _*)

  implicit final class SeriesDataFrame(private val df: DataFrame)
      extends AnyVal {

    /** reference `api/row/diff.kt` — current − previous, 0 for first row. */
    def diff(c: String, partition: Seq[String], order: Seq[Column],
        as: String): DataFrame = {
      val w = spec(partition, order)
      df.withColumn(as, col(c) - coalesce(lag(col(c), 1).over(w), col(c)))
    }

    /** reference `api/row/movingAverage.kt` — trailing k-row mean with the
      * same shrinking-head-window semantics (`rowsBetween(-(k-1), 0)`). */
    def movingAverage(c: String, k: Int, partition: Seq[String],
        order: Seq[Column], as: String): DataFrame = {
      val w = spec(partition, order).rowsBetween(-(k - 1), 0)
      df.withColumn(as, avg(col(c)).over(w))
    }

    /** reference `DataRow.prev()/next()` — adjacent-row access. */
    def withPrev(c: String, partition: Seq[String], order: Seq[Column],
        as: String): DataFrame =
      df.withColumn(as, lag(col(c), 1).over(spec(partition, order)))
    def withNext(c: String, partition: Seq[String], order: Seq[Column],
        as: String): DataFrame =
      df.withColumn(as, lead(col(c), 1).over(spec(partition, order)))

    /** reference `DataRow.neighbours(relativeIndices)` — arbitrary
      * offsets, one column per offset (`<c>_m2`, `<c>_p1`, ...). */
    def withNeighbours(c: String, offsets: Seq[Int], partition: Seq[String],
        order: Seq[Column]): DataFrame = {
      val w = spec(partition, order)
      offsets.foldLeft(df) { (d, o) =>
        val name = if (o < 0) s"${c}_m${-o}" else s"${c}_p$o"
        val e    = if (o < 0) lag(col(c), -o) else lead(col(c), o)
        d.withColumn(name, e.over(w))
      }
    }

    /** Time-based trailing moving average: mean of `c` over rows whose
      * event time falls in [t − windowUs, t] within the partition — the
      * RANGE-frame sibling of the row-count [[movingAverage]], for event
      * streams where "last hour" matters and row counts don't. Ordering
      * by epoch micros makes the frame bound exact integer arithmetic
      * (no interval/timezone drift), and RANGE semantics include ALL
      * rows tied on the same timestamp in both Spark and any SQL oracle,
      * so results are deterministic even with duplicate event times.
      * Same partitioned-window scale shape as the rest of the family:
      * one hash shuffle, per-partition sort, SortExec spills. */
    def movingAverageByTime(c: String, tsCol: String, windowUs: Long,
        partition: Seq[String], as: String): DataFrame = {
      val w = spec(partition, Seq(unix_micros(col(tsCol))))
        .rangeBetween(-windowUs, 0)
      df.withColumn(as, avg(col(c)).over(w))
    }

    /** Running (cumulative) aggregate over the partition. */
    def runningSum(c: String, partition: Seq[String], order: Seq[Column],
        as: String): DataFrame = {
      val w = spec(partition, order)
        .rowsBetween(Window.unboundedPreceding, 0)
      df.withColumn(as, sum(col(c)).over(w))
    }

    /** Per-partition 1-based row number (grouped `addRowNumber`). */
    def rowNumberIn(partition: Seq[String], order: Seq[Column], as: String)
        : DataFrame =
      df.withColumn(as, row_number().over(spec(partition, order)))
  }

  /** Per-group standardization (z-score): z = (x − μ_g) / σ_g with the
    * POPULATION stddev over an unbounded partition window — the
    * StandardScaler-per-key feature step and the basis of per-entity
    * anomaly flagging (|z| > k). ONE hash shuffle on the keys, no
    * aggregate+join round trip; constant groups (σ = 0) yield null, not
    * ±Infinity. */
  def standardizeBy(df: DataFrame, c: String, partition: Seq[String],
      as: String): DataFrame = {
    require(partition.nonEmpty,
      "standardizeBy: empty partition keys = one global window task")
    val w = Window.partitionBy(partition.map(col): _*)
    df.withColumn(as,
      (col(c) - avg(col(c)).over(w)) /
        nullif(stddev_pop(col(c)).over(w), lit(0.0)))
  }

  /** Per-group winsorization: clip `c` to its group's [lo, hi] exact
    * percentiles (R-7 interpolation — DuckDB `quantile_cont` parity,
    * same as `percentilesFor`) — the outlier-capping data-cleaning step
    * that keeps rows (unlike a filter) while bounding the tails feature
    * scaling/aggregates see. Bounds round to 6dp BEFORE clipping so the
    * clip decision is engine-independent; in-range values pass through
    * EXACT (no arithmetic touches them). Same one-shuffle window shape
    * as [[standardizeBy]]: percentiles are window aggregates over the
    * unbounded partition, no aggregate+join round trip. Adds `{c}_w`. */
  def winsorizeBy(df: DataFrame, c: String, partition: Seq[String],
      lo: Double, hi: Double): DataFrame = {
    require(partition.nonEmpty,
      "winsorizeBy: empty partition keys = one global window task")
    require(lo >= 0 && hi <= 1 && lo < hi,
      "winsorizeBy: need 0 <= lo < hi <= 1")
    val w = Window.partitionBy(partition.map(col): _*)
    val qlo = round(percentile(col(c), lit(lo)).over(w), 6)
    val qhi = round(percentile(col(c), lit(hi)).over(w), 6)
    df.withColumn(s"${c}_w", least(greatest(col(c), qlo), qhi))
  }

  /** Per-group ROBUST z-score: (x − median) / (1.4826·MAD), the
    * outlier-resistant alternative to [[standardizeBy]] (one wild value
    * drags a mean/σ z-score; the median/MAD version shrugs it off —
    * the standard data-QC scoring for heavy-tailed metrics). MAD =
    * median(|x − median|), both medians exact R-7; 1.4826 is the normal
    * consistency constant, so thresholds transfer from σ-land. MAD = 0
    * (over half the group tied) yields null, never ±Inf. Two window
    * passes over the SAME partitioning — Spark reuses the single hash
    * shuffle; rounding at 6dp happens on the OUTPUT (median/MAD are
    * interpolated doubles, the ratio mirrors engine-for-engine). Adds
    * `{c}_rz`. */
  def robustZBy(df: DataFrame, c: String, partition: Seq[String])
      : DataFrame = {
    require(partition.nonEmpty,
      "robustZBy: empty partition keys = one global window task")
    val w = Window.partitionBy(partition.map(col): _*)
    val med = percentile(col(c), lit(0.5)).over(w)
    val dev = abs(col(c) - med)
    val withDev = df.withColumn("__med", med).withColumn("__dev", dev)
    val mad = percentile(col("__dev"), lit(0.5)).over(w)
    withDev
      .withColumn(s"${c}_rz",
        round((col(c) - col("__med")) /
          nullif(lit(1.4826) * mad, lit(0.0)), 6))
      .drop("__med", "__dev")
  }

  /** Per-key exponential moving average with a BOUNDED window (the
    * K-term truncation of EWMA): smoothed_t =
    * Σ_{j<K} (1−α)^j·x_{t−j} / Σ_{j<K, t−j exists} (1−α)^j — truncated
    * tail, head-normalized (the first rows average over what exists, so
    * the series starts unbiased instead of anchored to x_0). The
    * metrics-smoothing/trend primitive `movingAverage` can't express
    * (recency-weighted, smooth decay).
    *
    * Determinism without libm: the weights (1−α)^j are built by
    * repeated MULTIPLICATION at plan time (j ≤ K literals — no pow),
    * and the weighted sum is a FIXED-ORDER expression tree over the K
    * lags, so every engine computes bit-identical doubles; output
    * rounds 6dp. Scale shape: K lag() calls over ONE window spec = one
    * hash shuffle on the keys + per-key sort, identical to
    * [[movingAverage]]; K is a literal, the expression stays in
    * whole-stage codegen. Nulls inside the window simply drop out of
    * both sums (their weight joins the missing-head handling). */
  def ewmaBy(df: DataFrame, c: String, partition: Seq[String],
      orderCols: Seq[String], alpha: Double, k: Int, as: String): DataFrame = {
    require(partition.nonEmpty,
      "ewmaBy: empty partition keys = one global window task")
    require(orderCols.nonEmpty, "ewmaBy: need an ordering (make it TOTAL " +
      "— add a tiebreak column, or lag() peers are engine-dependent)")
    require(alpha > 0 && alpha < 1, "ewmaBy: alpha must be in (0,1)")
    require(k >= 1, "ewmaBy: k must be >= 1")
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val weights = Iterator.iterate(1.0)(_ * (1.0 - alpha)).take(k).toSeq
    val terms = weights.zipWithIndex.map { case (wt, j) =>
      val x = if (j == 0) col(c) else lag(col(c), j).over(w)
      (when(x.isNotNull, x * lit(wt)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn(as,
      when(den > 0, round(num / den, 6)).otherwise(lit(null).cast("double")))
  }

  /** Time-series resample with gap fill (beyond the reference — the
    * downsample-and-regularize step every metrics/feature pipeline needs):
    * bucket each series into fixed `bucketUs`-micros intervals, aggregate
    * `valueCol` per bucket (mean + event count), then materialize the
    * MISSING buckets between each series' first and last bucket and
    * forward-fill the value from the most recent non-empty bucket. Empty
    * buckets report `n_events` = 0 and a forward-filled value (null until
    * the first observation).
    *
    * Scale shape: the raw events shuffle once on (key, bucket) with full
    * map-side partial aggregation — a hot key's bucket averages distribute
    * across tasks; everything after moves one row per (key, bucket): the
    * per-key min/max grid, the grid⋈agg join, and the fill window all
    * hash on the key. The dense-grid explode is bounded by
    * (span/bucketUs) rows per key, a deliberate densification the caller
    * sizes via `bucketUs`. Never a global sort; per-key fill state is one
    * running value. Sparse series with huge spans should pick a coarser
    * bucket — the explode IS the output size.
    */
  def resampleWithFill(df: DataFrame, tsCol: String, valueCol: String,
      bucketUs: Long, partition: Seq[String]): DataFrame = {
    require(bucketUs > 0, "resampleWithFill: bucketUs must be > 0")
    val keys = partition.map(col)
    val bucketed = df
      .withColumn("bucket",
        floor(unix_micros(col(tsCol)) / bucketUs).cast("long"))
      .groupBy(keys :+ col("bucket"): _*)
      .agg(avg(col(valueCol)).as("bucket_avg"),
        count(lit(1)).as("n_events"))
    val grid = bucketed
      .groupBy(keys: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(keys :+ explode(sequence(col("__lo"), col("__hi")))
        .as("bucket"): _*)
    val w = spec(partition, Seq(col("bucket")))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(bucketed, partition :+ "bucket", "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_avg", last(col("bucket_avg"), ignoreNulls = true)
        .over(w))
  }

  /** One-sided CUSUM change detection per key (Page 1954): fold
    * S ← max(0, S + x − drift) over the key's ordered values and report
    * the maximum excursion — the sequential-drift alarm a plain
    * threshold-on-mean can't give (many small persistent upshifts
    * accumulate; isolated spikes decay). Output one row per key:
    * (keys…, n, max_cusum_micro, alarm = max ≥ threshold).
    *
    * Exactness: values round to integer MICRO units BEFORE the fold
    * (the lmScore convention), so the entire recurrence is BIGINT
    * max/add — any engine replaying the fold gets the identical
    * excursion. Callers encode target + slack into `driftMicro`
    * (classic CUSUM: μ + k). Null values drop.
    *
    * Implementation: the Page recursion S_n = max(0, S_{n−1} + y_n)
    * with y = x − drift has the closed form S_n = P_n − min(0,
    * min_{j≤n} P_j) over the prefix sums P — so the fold rewrites to
    * two running windows (prefix sum, then running min of it), no
    * per-key array materialization. `orderCols` must totally order
    * each key's events (ties would make the running min, and hence
    * the excursion, order-dependent).
    *
    * Scale shape: ONE hash shuffle — the two windows and the final
    * max/count aggregate all partition on `keys`, so Catalyst plans a
    * single Exchange and the aggregate reuses the windows' output
    * partitioning. Per-key state is two running BIGINTs; a hot key
    * costs its sort within the partition, never an in-memory event
    * array (the r12 collect_list form bounded keys by executor
    * memory; this form bounds them by spill-able sort). */
  def cusum(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      valueCol: String, driftMicro: Long, thresholdMicro: Long)
      : DataFrame = {
    require(keys.nonEmpty, "cusum: partition keys required")
    require(orderCols.nonEmpty, "cusum: need a total order")
    val x = round(col(valueCol) * lit(1000000.0)).cast("long")
    val w = spec(keys, orderCols.map(col))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.where(col(valueCol).isNotNull)
      .withColumn("__p", sum(x - lit(driftMicro)).over(w))
      .withColumn("__s", col("__p") -
        least(lit(0L), min(col("__p")).over(w)))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        max(col("__s")).as("max_cusum_micro"))
      .select(keys.map(col) :+ col("n") :+ col("max_cusum_micro") :+
        (col("max_cusum_micro") >= thresholdMicro).as("alarm"): _*)
  }

  /** Scalable GLOBAL running sum — the ECDF/rank kernel. For every row,
    * appends `cum_<c>` = the sum of `<c>` over all rows whose `orderCol`
    * sorts at-or-before this row's, WITHOUT the single-partition global
    * window (`Window.orderBy` with no partition keys moves the whole
    * frame through one task — fatal at scale). Classic two-level scan:
    *
    *  1. bucket rows by approximate percentiles of `orderCol` (balance
    *     only — ANY edges give a correct answer; the 1-row edges frame
    *     is materialized once so every consumer buckets identically);
    *  2. per-bucket partial totals → driver (≤ `buckets` rows — a
    *     planner-scale collect, like the graph loops' convergence
    *     probes) → exclusive prefix offsets joined back broadcast;
    *  3. within-bucket cumulative window (partitioned by bucket, so
    *     state stays executor-local) + the bucket's offset.
    *
    * Contract: `orderCol` values must be UNIQUE per row (pre-aggregate
    * ties into one row — the distinct-value ECDF shape). Precision on
    * WHY: equal values always land in the SAME bucket (bucket choice
    * compares only the value against the edges), so a tie group never
    * sees a partial bucket offset — what ties lose is only their
    * RELATIVE order inside the window, making per-row cumulatives over
    * tied rows arbitrary among the ties. A consumer whose aggregate is
    * invariant under tie order may therefore feed ties deliberately:
    * [[graft.ops.Agg.giniConcentration]] cumsums a column of ones
    * (rank-of-ones — ties get distinct consecutive ranks in arbitrary
    * order, and its Σ(i·x_i) over a tie class is x·Σi, order-free).
    * `orderCol` must also be non-null (bucket comparisons are undefined
    * on null). Value columns must be integral (counts/ranks); sums ride
    * exact longs.
    * `withTotals` appends `total_<c>` literal columns (free — the
    * driver already holds the partials). 3 passes over the input; the
    * input is normally an already-aggregated distinct-value frame. */
  def globalCumSum(df: DataFrame, orderCol: String, valueCols: Seq[String],
      buckets: Int = 0, withTotals: Boolean = false): DataFrame =
    groupedCumSum(df, Seq.empty, orderCol, valueCols, buckets, withTotals)

  /** [[globalCumSum]] generalized to independent cumulative sums PER
    * GROUP (`partCols`), still with zero single-partition stages — the
    * kernel for ranking several metrics in ONE pass (unpivot to
    * (metric, value) rows and cumsum per metric — [[graft.ops.Events
    * .rfmSegments]]'s shape, r14 verdict #2) instead of one
    * globalCumSum chain per metric. Same contract as globalCumSum,
    * per group: `orderCol` unique and non-null within each group;
    * value columns integral. `partCols` values must be NON-NULL (they
    * ride an equi-join back from the driver's offset frame; null keys
    * would drop rows — groups are caller-minted tags, so this costs
    * nothing). `withTotals` appends per-GROUP totals.
    *
    * Scale shape: bucket edges come from ONE grouped approx_percentile
    * pass (per-group edges, so each group's buckets stay balanced no
    * matter how different the groups' value ranges are); per-(group,
    * bucket) partials → driver (≤ groups·buckets rows — planner-scale
    * for the tag-cardinality groups this is for) → exclusive prefix
    * per group joined back broadcast; within-bucket window partitioned
    * by (group, bucket). */
  def groupedCumSum(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String], buckets: Int = 0,
      withTotals: Boolean = false): DataFrame = {
    require(valueCols.nonEmpty, "groupedCumSum: no value columns")
    val spark = df.sparkSession
    // Cut the input's lineage ONCE: the kernel consumes `df` through
    // THREE separate actions (bucket-edge percentile, per-bucket
    // partials collect, the final decorated result) and shuffle reuse
    // does not span actions — without this cut the whole upstream
    // lineage (typically the corpus-sized shuffle that produced this
    // collapsed frame) re-executes per action, and a caller that feeds
    // one cumsum's output into another (kaplanMeier) multiplies it
    // again. The input is by contract an already-collapsed
    // distinct-value frame (≪ corpus — the documented reason a cumsum
    // over it is safe at all), so one eager localCheckpoint is
    // bounded by the same argument, and converts 3+ upstream passes
    // into exactly one (r20 measured: stat_spearman 4.75→lower with 6
    // lineitem scans collapsing to 3, kaplanMeier 4 events scans → 1).
    val (src, _) = graft.core.CacheHandle.checkpointSmall(df)
    val p = math.max(1, if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val pc = partCols.map(col)
    val bucketed =
      if (p == 1) src.withColumn("__b", lit(1))
      else {
        val probs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
        val pct = approx_percentile(col(orderCol), probs, lit(10000))
          .as("__edges")
        val (edges, _) = graft.core.CacheHandle.checkpointSmall(
          if (partCols.isEmpty) src.agg(pct)
          else src.groupBy(pc: _*).agg(pct))
        val withEdges =
          if (partCols.isEmpty) src.crossJoin(broadcast(edges))
          else src.join(broadcast(edges), partCols)
        withEdges
          .withColumn("__b",
            (size(filter(col("__edges"), e => col(orderCol) > e)) + 1))
          .drop("__edges")
      }
    val np = partCols.length
    val partialRows = bucketed.groupBy((pc :+ col("__b")): _*)
      .agg(sum(col(valueCols.head)).cast("long").as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).cast("long").as(c)): _*)
      .collect()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // exclusive prefix per group: bucket b's offset = sum of the group's
    // earlier buckets; totals are per group
    val offsetRows: Seq[Row] = partialRows
      .groupBy(r => (0 until np).map(r.get(_)))
      .valuesIterator.flatMap { rs =>
        val sorted = rs.sortBy(_.getInt(np))
        val totals = valueCols.indices
          .map(i => sorted.map(_.getLong(np + 1 + i)).sum)
        val acc = Array.fill(valueCols.length)(0L)
        sorted.map { r =>
          val off = acc.toSeq
          valueCols.indices.foreach(i => acc(i) += r.getLong(np + 1 + i))
          Row.fromSeq((0 until np).map(r.get(_)) ++ (r.getInt(np) +: off) ++
            (if (withTotals) totals else Nil))
        }
      }.toSeq
    // part key columns ride under __p<i> names so the join back can't
    // clash with df's own columns
    val partFields = partCols.zipWithIndex.map { case (c, i) =>
      StructField(s"__p$i", df.schema(c).dataType)
    }
    val offSchema = StructType(partFields ++
      (StructField("__bo", IntegerType) +:
        valueCols.map(c => StructField(s"__off_$c", LongType))) ++
      (if (withTotals) valueCols.map(c => StructField(s"__tot_$c", LongType))
       else Nil))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    val joinCond = (partCols.zipWithIndex.map { case (c, i) =>
      bucketed(c) === offDf(s"__p$i")
    } :+ (bucketed("__b") === offDf("__bo"))).reduce(_ && _)
    val w = Window.partitionBy((pc :+ col("__b")): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cumCols = valueCols.map(c =>
      (sum(col(c)).over(w) + col(s"__off_$c")).as(s"cum_$c"))
    val totCols = if (withTotals)
      valueCols.map(c => col(s"__tot_$c").as(s"total_$c"))
    else Seq.empty
    bucketed.join(broadcast(offDf), joinCond)
      .select(df.columns.map(bucketed(_)) ++ cumCols ++ totCols: _*)
  }

  /** Rank-based quantile normalization: per group, replace a metric
    * with its percent_rank ∈ [0, 1] (6dp) — the distribution-free
    * feature transform (heavy-tailed raw metrics become uniform; two
    * sources' incomparable score scales become comparable). Ties share
    * a rank (SQL percent_rank semantics: (rank−1)/(n−1)); single-row
    * groups normalize to 0.0. ONE hash shuffle (the window); 6dp
    * rounding BEFORE any downstream comparison keeps thresholds
    * engine-independent (the winsorize convention). */
  def percentRankBy(df: DataFrame, c: String, partition: Seq[String],
      as: String = "pr"): DataFrame = {
    val w = spec(partition, Seq(col(c)))
    df.withColumn(as, round(percent_rank().over(w), 6))
  }

  /** Per-key UNION OF INTERVALS (gaps-and-islands): merge every
    * overlapping-or-touching [start, end] pair into maximal islands —
    * the "total session coverage / distinct busy time" primitive SQL
    * aggregates can't express directly (SUM over raw durations double-
    * counts overlaps). Returns one row per island:
    * (keys…, island_start, island_end, n_merged), from which coverage
    * per key is a plain downstream SUM of (island_end − island_start).
    *
    * Semantics: intervals merge when `start ≤ max(end so far)` in
    * (start, end) order — overlap AND abutment both merge (a session
    * ending at t and one starting at t are one busy span); half-open
    * callers who want touch-splits can pre-subtract 1 from ends. Rows
    * with null start/end are dropped (an interval without bounds has no
    * extent). Callers must guarantee `end ≥ start`; a reversed interval
    * participates with its raw bounds (it sorts by its start and its
    * small end never extends the running max) rather than being
    * silently clamped — pre-filter if upstream can produce them.
    *
    * Scale shape: ONE hash shuffle on the keys — the running-max window,
    * the island-flag running sum, and the final island aggregation all
    * partition identically, so Catalyst plans a single Exchange and the
    * two window passes + partial-agg run inside it. Per-key state is one
    * running max — no joins, no explode, no global sort; skew equals key
    * skew (a key's intervals sort within its partition, the documented
    * window-op bound). */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals: partition keys required " +
      "(global-merge on one task is fatal at scale)")
    val wOrd = spec(keyCols, Seq(col(startCol), col(endCol)))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val clean = df
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
    val flagged = clean
      .withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull ||
          col(startCol) > col("__pmax"), lit(1L)).otherwise(lit(0L)))
      .withColumn("__island", sum(col("__new")).over(wRun))
    flagged
      .groupBy((keyCols.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
