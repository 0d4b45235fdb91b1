package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics (beyond the reference): operations over a
  * (user, timestamp, event_type) stream that need ORDER within each user's
  * history — the product-analytics sibling of `Streaming.sessionizeBatch`.
  */
object Events {

  /** Funnel analysis: for each entity, find the earliest strictly-ordered
    * completion of `stages` (stage i+1 must occur at a ts strictly AFTER
    * the matched stage-i event; equal timestamps do NOT advance the funnel,
    * which keeps semantics engine-independent when events share a
    * timestamp). Emits one row per entity that reached stage 1, with the
    * matched timestamp per stage (micros, null = not reached) and the
    * count of stages reached.
    *
    * The match is greedy-earliest: stage 1 matches the entity's first
    * stage-1 event, stage 2 the first later stage-2 event, and so on —
    * the standard product-funnel definition, and for strictly-ordered
    * matching the greedy choice is optimal (taking any later stage-i
    * event can only shrink the events available to stage i+1).
    *
    * Scale shape: ONE shuffle — groupBy entity, collect each entity's
    * (ts, type) pairs pre-projected to 12 bytes/event, sort in-memory per
    * entity, walk once with a higher-order `aggregate`. Per-entity state is
    * its own event list — the same bound as any per-user sessionization;
    * entities with unbounded histories need a time-range pre-filter, which
    * composes (`df.filterRows` before the call). No window, no self-join
    * per stage (k stages would otherwise cost k shuffles).
    */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: no stages")
    require(stages.distinct.size == stages.size,
      "funnel: repeated stage types are ambiguous")
    val n = stages.size
    // skinny per-event payload; only funnel-relevant events are collected
    val ev = df
      .where(col(typeCol).isin(stages: _*))
      .select(col(entityCol),
        struct(unix_micros(col(tsCol)).as("ts"), col(typeCol).as("et"))
          .as("e"))
    val walked = ev.groupBy(col(entityCol))
      .agg(array_sort(collect_list(col("e"))).as("evs"))
      .withColumn("stages", aggregate(
        col("evs"),
        // accumulator: one nullable micros slot per stage
        struct((0 until n).map(i =>
          lit(null).cast("long").as(s"t$i")): _*),
        (acc, e) => {
          // slot i fills when: still empty, event type matches stage i,
          // and (i == 0, or slot i-1 filled at a strictly earlier ts)
          val slots = (0 until n).map { i =>
            val gate =
              if (i == 0) e.getField("et") === stages.head
              else acc.getField(s"t${i - 1}").isNotNull &&
                e.getField("et") === stages(i) &&
                e.getField("ts") > acc.getField(s"t${i - 1}")
            coalesce(acc.getField(s"t$i"),
              when(gate, e.getField("ts"))).as(s"t$i")
          }
          struct(slots: _*)
        }))
    val stageCols = (0 until n).map(i =>
      col(s"stages.t$i").as(s"stage${i + 1}_ts"))
    val reached = (0 until n).map(i =>
      when(col(s"stages.t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    walked
      .select(col(entityCol) +: stageCols :+ reached.as("stages_reached"): _*)
      .where(col("stage1_ts").isNotNull)
  }

  /** Retention cohort matrix: entities are cohorted by the time bucket of
    * their FIRST event; for each (cohort, offset) cell, count the distinct
    * entities from that cohort active `offset` buckets later. The
    * product-health table every activation dashboard draws (offset 0 =
    * cohort size, cells shrink rightward).
    *
    * Scale shape: TWO exchanges total. The raw events shuffle once on the
    * entity — `collect_set(bucket)` dedups map-side (partial_collect_set),
    * so the wire carries each entity's distinct bucket set, bounded by the
    * observation span in buckets, not its event count. Cohort (= set min)
    * and offsets then derive WITHOUT a second pass over the events — no
    * join back, no distinct-then-regroup (which would cost two more
    * shuffles on different keys). The final count moves skinny (cohort,
    * offset) pairs only.
    */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "retentionCohorts: bucketUs must be > 0")
    val bucket = floor(unix_micros(col(tsCol)) / bucketUs).cast("long")
    df.select(col(entityCol), bucket.as("bucket"))
      .groupBy(col(entityCol))
      .agg(collect_set(col("bucket")).as("buckets"))
      .select(array_min(col("buckets")).as("cohort"),
        explode(col("buckets")).as("bucket"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** First-order TRANSITION MATRIX between event types — the Markov
    * view of user behavior ([[funnel]] checks ONE prescribed path; this
    * surfaces what users actually do next). Per entity, events order by
    * `orderCols` (caller supplies a TOTAL order — ties would make
    * "previous event" a coin flip) and each consecutive pair counts
    * once. Output: (from_type, to_type, n, p_micro) with p_micro the
    * 10⁶-scaled row-conditional probability n / Σ n over the same
    * from_type. Each entity's first event has no predecessor and
    * contributes no pair.
    *
    * Scale shape: ONE hash shuffle on the entity (the lag window),
    * then a (types²)-key count shuffle with map-side partials; the
    * per-from totals are a window over the types²-row frame. Skew =
    * entity skew, the documented window bound. */
  def transitionMatrix(df: DataFrame, entityCol: String,
      orderCols: Seq[String], typeCol: String): DataFrame = {
    require(orderCols.nonEmpty, "transitionMatrix: need an event order")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    pairs.withColumn("p_micro",
      round(col("n") * lit(1000000.0) / sum(col("n")).over(wFrom))
        .cast("long"))
  }

  /** FIRST-TOUCH conversion attribution: sessionize each entity's
    * stream by inactivity gap, then credit every conversion event to
    * its session's FIRST event type — "which entry channel produced
    * the purchase", the question raw conversion counts can't answer.
    * Output: (first_type, n_conversions), one row per entry type that
    * produced at least one conversion.
    *
    * Sessions and firsts are deterministic under the caller-supplied
    * total order (ties in ts alone would make "first" a coin flip —
    * pass a tiebreaker column). Gap semantics match `sessionize`: a
    * new session starts when the gap since the PREVIOUS event exceeds
    * `gapUs` micros.
    *
    * Scale shape: ONE hash shuffle on the entity — the lag window, the
    * session running sum, and the per-session first_value all share
    * its partitioning (one Exchange in the plan); the rollup then
    * moves (types)-cardinality pairs. */
  def firstTouchAttribution(df: DataFrame, entityCol: String,
      tsCol: String, orderCols: Seq[String], typeCol: String,
      convType: String, gapUs: Long): DataFrame = {
    require(orderCols.nonEmpty, "firstTouchAttribution: need an order")
    require(gapUs > 0, "firstTouchAttribution: gapUs must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ts = unix_micros(col(tsCol))
    val sess = df
      .withColumn("__new",
        when(ts - lag(ts, 1).over(w) > gapUs ||
          lag(ts, 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(wRun))
    val wSess = Window.partitionBy(col(entityCol), col("__sess"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess
      .withColumn("__first", first(col(typeCol)).over(wSess))
      .where(col(typeCol) === convType)
      .groupBy(col("__first").as("first_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Association rules from co-occurrence (the market-basket /
    * co-view primitive): for every unordered item pair inside a basket,
    * support, per-item baskets, confidence and lift. Output (one row
    * per pair a < b): (item_a, item_b, n_pair, n_a, n_b,
    * conf_a_to_b_micro = 10⁶·n_pair/n_a, lift_micro =
    * 10⁶·N·n_pair/(n_a·n_b)), the `k` strongest pairs by
    * (n_pair desc, item_a, item_b).
    *
    * Baskets wider than `maxBasketSize` DISTINCT items are dropped
    * before pairing — the quadratic guard (a single 10⁵-item power
    * basket would emit 5·10⁹ pairs and strand the job; production
    * basket mining caps exactly like this). Dropped baskets leave all
    * counts, so n_a/n_b/N are measured over the SAME capped universe
    * the pairs are — ratios stay consistent.
    *
    * Scale shape: distinct (basket, item) once (one shuffle); the
    * basket-size cap is a count window over the same partitioning; the
    * pair self-join hash-partitions on the basket key with per-basket
    * fanout ≤ maxBasketSize²/2; pair counting and item counting are
    * partial-aggregated count shuffles; top-k is
    * TakeOrderedAndProject. Lift's N rides in as a broadcast 1-row
    * frame. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int, k: Int): DataFrame = {
    require(maxBasketSize >= 2, "associationRules: maxBasketSize >= 2")
    require(k >= 1, "associationRules: k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val wB = Window.partitionBy(col("b"))
    val items = df
      .select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .withColumn("__sz", count(lit(1)).over(wB))
      .where(col("__sz") <= maxBasketSize)
      .drop("__sz")
    val nBaskets = items.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("i"))
      .agg(count(lit(1)).as("n_i"))
    val pairs = items.as("l")
      .join(items.as("r"), col("l.b") === col("r.b") &&
        col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(col("n_pair").desc, col("item_a"), col("item_b"))
      .limit(k)
    pairs
      .join(itemCounts.select(col("i").as("item_a"),
        col("n_i").as("n_a")), "item_a")
      .join(itemCounts.select(col("i").as("item_b"),
        col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        round(col("n_pair") * lit(1000000.0) / col("n_a"))
          .cast("long").as("conf_a_to_b_micro"),
        round(col("n_baskets").cast("double") * col("n_pair") *
          lit(1000000.0) / (col("n_a").cast("double") * col("n_b")))
          .cast("long").as("lift_micro"))
  }

  /** Top-k most-common event PATHS (funnel discovery: the prefix
    * sequences users actually walk, counted exactly). Per entity, the
    * first `maxLen` events in `orderCols` order join into a
    * "a>b>c" path string; paths count across entities and the k most
    * common return as (rank, path, n_entities). Ties break on the path
    * string ascending.
    *
    * Scale shape: one entity-key shuffle (row_number window + ordered
    * rebuild — per-entity state is ≤ maxLen structs), one path-key
    * count shuffle with partials, top-k as TakeOrderedAndProject —
    * never a global sort. */
  def topPaths(df: DataFrame, entityCol: String, orderCols: Seq[String],
      typeCol: String, maxLen: Int, k: Int): DataFrame = {
    require(maxLen >= 1, "topPaths: maxLen must be >= 1")
    require(k >= 1, "topPaths: k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val paths = df
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxLen)
      .groupBy(col(entityCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col(typeCol)
          .as("t")))), s => s.getField("t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path").asc)
      .limit(k)
    paths.withColumn("rank",
        row_number().over(Window.partitionBy()
          .orderBy(col("n_entities").desc, col("path").asc)).cast("long"))
      .select(col("rank"), col("path"), col("n_entities"))
  }

  /** LINEAR multi-touch attribution: every event at-or-before a
    * conversion inside the same gap-session shares the conversion's
    * credit equally — the model marketing teams reach for when
    * first-touch ([[firstTouchAttribution]]) over-rewards the entry
    * channel. A conversion at session position r grants each of the r
    * touches ≤ r exactly round(10⁶/r) micro-credits (per-touch micros
    * round BEFORE summing — exact integers any engine replays; the ≤1
    * micro lost per conversion to rounding is documented, not hidden).
    * Returns (touch_type, credit_micro, n_touches) over ALL event
    * types, zero-credit rows included.
    *
    * The per-touch credit Σ_{conversions c: r_c ≥ r} round(10⁶/r_c)
    * is a SUFFIX sum over the session — so the whole model is one
    * descending-order running-sum window, not the touches×conversions
    * self-join the naive formulation pays (a 10⁴-event session would
    * fan out 10⁸ pairs). Scale shape: ONE entity-key Exchange
    * (sessionize + rank + suffix sum share it) then a type-key count
    * shuffle. */
  def linearAttribution(df: DataFrame, entityCol: String, tsCol: String,
      orderCols: Seq[String], typeCol: String, convType: String,
      gapUs: Long): DataFrame = {
    require(orderCols.nonEmpty, "linearAttribution: need an order")
    require(gapUs > 0, "linearAttribution: gapUs must be > 0")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ts = unix_micros(col(tsCol))
    val sess = df
      .withColumn("__new",
        when(ts - lag(ts, 1).over(w) > gapUs ||
          lag(ts, 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(wRun))
    val wSess = Window.partitionBy(col(entityCol), col("__sess"))
      .orderBy(orderCols.map(col): _*)
    val ranked = sess.withColumn("__rn", row_number().over(wSess))
      .withColumn("__contrib",
        when(col(typeCol) === convType,
          round(lit(1e6) / col("__rn")).cast(LongType)).otherwise(lit(0L)))
    val wSuffix = Window.partitionBy(col(entityCol), col("__sess"))
      .orderBy(col("__rn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("__credit", sum(col("__contrib")).over(wSuffix))
      .groupBy(col(typeCol).as("touch_type"))
      .agg(sum(col("__credit")).as("credit_micro"),
        count(lit(1)).as("n_touches"))
  }

  /** LAST-TOUCH attribution: each conversion credits the most recent
    * NON-conversion event before it in the same gap-session (the
    * "closer" channel); a conversion with no prior touch in its
    * session lands in the `(none)` bucket rather than silently
    * self-crediting. Returns (last_type, n_conversions).
    *
    * Scale shape: the same single entity-key Exchange as
    * [[firstTouchAttribution]] — sessionize, then one ignore-nulls
    * running last_value over rows strictly before the current one;
    * conversions filter and count per attributed type. */
  def lastTouchAttribution(df: DataFrame, entityCol: String,
      tsCol: String, orderCols: Seq[String], typeCol: String,
      convType: String, gapUs: Long): DataFrame = {
    require(orderCols.nonEmpty, "lastTouchAttribution: need an order")
    require(gapUs > 0, "lastTouchAttribution: gapUs must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ts = unix_micros(col(tsCol))
    val sess = df
      .withColumn("__new",
        when(ts - lag(ts, 1).over(w) > gapUs ||
          lag(ts, 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(wRun))
    val wPrev = Window.partitionBy(col(entityCol), col("__sess"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sess
      .withColumn("__prev",
        last(when(col(typeCol) =!= convType, col(typeCol)),
          ignoreNulls = true).over(wPrev))
      .where(col(typeCol) === convType)
      .groupBy(coalesce(col("__prev"), lit("(none)")).as("last_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Time-to-conversion funnel summary: per entity, the FIRST
    * `startType` event opens the clock and the first `convType` event
    * at-or-after it closes it. ONE row: (n_started, n_converted,
    * rate_micro, median_s, p90_s) — conversion rate in exact micros,
    * latency percentiles (R-7, 6dp) in seconds. Entities that convert
    * before ever starting do NOT count as conversions (the ts ≥ start
    * guard), the subtle funnel-integrity rule naive min/min joins get
    * wrong.
    *
    * Scale shape: one entity-key Exchange (partition-window min-start
    * shared by every row, conversions filter against it in the same
    * pass — no second aggregate + join-back), one entity rollup, then
    * 1-row frames meet in broadcast cross joins. */
  def timeToConversion(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, startType: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val base = df.where(col(entityCol).isNotNull && col(tsCol).isNotNull)
    val started = base.where(col(typeCol) === startType)
      .agg(countDistinct(col(entityCol)).as("n_started"))
    val w = Window.partitionBy(col(entityCol))
    val conv = base
      .withColumn("__start",
        min(when(col(typeCol) === startType, col(tsCol))).over(w))
      .where(col(typeCol) === convType && col("__start").isNotNull &&
        col(tsCol) >= col("__start"))
      .groupBy(col(entityCol))
      .agg(((unix_micros(min(col(tsCol))) -
        unix_micros(min(col("__start")))) / lit(1000000L))
        .cast(LongType).as("__delta_s"))
    val dist = conv.agg(count(lit(1)).as("n_converted"),
      round(percentile(col("__delta_s"), lit(0.5)), 6).as("median_s"),
      round(percentile(col("__delta_s"), lit(0.9)), 6).as("p90_s"))
    dist.crossJoin(broadcast(started))
      .select(col("n_started"), col("n_converted"),
        round(lit(1e6) * col("n_converted").cast(DoubleType) /
          nullif(col("n_started").cast(DoubleType), lit(0.0)))
          .cast(LongType).as("rate_micro"),
        col("median_s"), col("p90_s"))
  }

  /** Cohort LTV curves: entities cohort by the calendar month of their
    * FIRST event; revenue (Σ `valueCol` over `revenueType` events)
    * accumulates per cohort over months-since-cohort age. One row per
    * (cohort_month — a "yyyy-MM" string, the engine-independent
    * calendar key — age_month): (n_users, revenue, cum_revenue — both
    * 2dp, ltv_micro = 10⁶·cum_revenue/n_users rounded) — the
    * "how much is a January user worth by month 3" table.
    *
    * Cross-engine determinism: per-cell revenue rounds to 2dp BEFORE
    * the cumulative window, and both engines then run the same
    * sequential per-cohort cumsum over identical doubles — bit-equal;
    * ltv divides the exact same pair.
    *
    * Scale shape: one entity rollup (min ts → cohort), one skinny
    * join-back decorating events with their entity's cohort, one
    * (cohort, age) hash aggregate, then PARTITIONED (per-cohort)
    * cumulative windows over the cells frame — cohorts × ages rows,
    * never events. Cohort sizes ride the same entity rollup. */
  def cohortLtv(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, revenueType: String, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val base = df.where(col(entityCol).isNotNull && col(tsCol).isNotNull)
    val cohorts = base.groupBy(col(entityCol))
      .agg(date_trunc("month", min(col(tsCol))).as("cohort_month"))
    val sizes = cohorts.groupBy(col("cohort_month"))
      .agg(count(lit(1)).as("n_users"))
    val cells = base
      .join(cohorts, Seq(entityCol))
      .select(col("cohort_month"),
        months_between(date_trunc("month", col(tsCol)),
          col("cohort_month")).cast(IntegerType).as("age_month"),
        when(col(typeCol) === revenueType,
          coalesce(col(valueCol), lit(0.0))).otherwise(lit(0.0))
          .as("__rev"))
      .groupBy(col("cohort_month"), col("age_month"))
      .agg(round(sum(col("__rev")), 2).as("revenue"))
    val wCum = Window.partitionBy(col("cohort_month"))
      .orderBy(col("age_month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue", round(sum(col("revenue")).over(wCum), 2))
      .join(sizes, Seq("cohort_month"))
      .select(date_format(col("cohort_month"), "yyyy-MM")
          .as("cohort_month"),
        col("age_month"), col("n_users"), col("revenue"),
        col("cum_revenue"),
        round(lit(1e6) * col("cum_revenue") /
          nullif(col("n_users").cast(DoubleType), lit(0.0)))
          .cast(LongType).as("ltv_micro"))
  }

  /** RFM segmentation: per entity, Recency (days since last event,
    * against the corpus max timestamp), Frequency (event count) and
    * Monetary (Σ value, 2dp), each scored into `tiles` equal-count
    * tiers (1 = worst, `tiles` = best: most recent / most frequent /
    * highest spend), `segment` = the concatenated "rfm" digits. Exact
    * `ntile` semantics — first (n mod k) tiles take the extra row —
    * with the total order (metric, entity id) so ties are
    * deterministic in any engine. Null `valueCol` rows contribute 0 to
    * monetary (the entity still counts); rows with a null entity or
    * timestamp are excluded.
    *
    * Scale shape: events collapse to one row per entity in ONE shuffle
    * (count/max/sum partials); everything after runs on the
    * entities-sized frame. The classic exact-ntile trap is
    * `Window.orderBy` with no partition key (whole frame through one
    * task); instead the three metrics UNPIVOT to (metric, key) rows
    * and every global row number derives from value-collapsed counts +
    * ONE [[Series.groupedCumSum]] (per-metric bucketed two-level scan)
    * plus ONE PARTITIONED per-(metric, value) tie-break window; the
    * ntile index is pure arithmetic on (rn, n) and a final group-back
    * re-pivots to one row per entity. A single ranking pass for all
    * three metrics — not a globalCumSum chain per metric — with zero
    * single-partition stages.
    *
    * Honest serial bound: the tie-break window's task is the LARGEST
    * TIE CLASS of a metric (e.g. every one-event entity ties at
    * frequency 1 — at extreme scale that class is a single sorted,
    * spill-safe task: slow, never OOM). Exact ntile requires a total
    * order inside the class, so this is inherent to the semantics;
    * if per-class serialization bites before anything else does,
    * quantize the metric or accept hash-order ties. */
  def rfmSegments(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, tiles: Int = 5): DataFrame = {
    require(tiles >= 2, s"rfmSegments: tiles must be >= 2, got $tiles")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val maxTs = df.agg(max(col(tsCol)).as("__maxts"))
    // Cut lineage at the entity rollup (r20): `per` feeds BOTH the
    // value-collapse→cumsum chain and the tie-break/tile join below —
    // two separate actions — so without a cut the events-sized
    // entity shuffle runs twice. The rollup is the operator's
    // decision table (entity key + three longs, ≪ events corpus);
    // materializing it once is the guide-§2.3 "shuffle keys and
    // metadata, move heavy bytes once" shape.
    val (per, _) = graft.core.CacheHandle.checkpointSmall(df
      .where(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(max(col(tsCol)).as("__last"), count(lit(1)).as("frequency"),
        round(sum(coalesce(col(valueCol), lit(0.0))), 2).as("monetary"))
      .crossJoin(broadcast(maxTs))
      .withColumn("recency_days",
        datediff(to_date(col("__maxts")), to_date(col("__last")))
          .cast(LongType))
      .drop("__last", "__maxts"))
    def intDiv(a: Column, b: Column): Column =
      floor(a / nullif(b.cast(DoubleType), lit(0.0))).cast(LongType)
    // exact ntile(k) of row rn (1-based) among n: first n%k tiles hold
    // the extra row
    def tileIdx(rn: Column, n: Column): Column = {
      val size = intDiv(n, lit(tiles.toLong))
      val rem = n % lit(tiles.toLong)
      when(rn <= rem * (size + lit(1L)),
        intDiv(rn - lit(1L), size + lit(1L)) + lit(1L))
        .otherwise(rem +
          intDiv(rn - lit(1L) - rem * (size + lit(1L)), size) + lit(1L))
    }
    // global rn over (key asc, entity asc) per metric without a global
    // window: unpivot the three metrics to (metric, key) rows, then ONE
    // value-collapse + ONE groupedCumSum (per-metric prefix sums in a
    // single bucketed two-level scan) + ONE partitioned tie-break
    // window — r14 ran a full globalCumSum chain per metric (3× the
    // stages for the same answer)
    def metricStruct(idx: Int, keyExpr: Column): Column =
      struct(lit(idx).as("__metric"), keyExpr.cast(DoubleType).as("__k"))
    val unp = per.select(col(entityCol), col("recency_days"),
        col("frequency"), col("monetary"),
        explode(array(
          metricStruct(0, -col("recency_days")),
          metricStruct(1, col("frequency")),
          metricStruct(2, col("monetary")))).as("__mk"))
      .select(col(entityCol), col("recency_days"), col("frequency"),
        col("monetary"), col("__mk.__metric").as("__metric"),
        col("__mk.__k").as("__k"))
    val vc = unp.groupBy(col("__metric"), col("__k"))
      .agg(count(lit(1)).as("__c"))
    val cum = Series.groupedCumSum(vc, Seq("__metric"), "__k", Seq("__c"),
        withTotals = true)
      .select(col("__metric"), col("__k"),
        (col("cum___c") - col("__c")).as("__below"),
        col("total___c").as("__n"))
    val rn = col("__below") +
      row_number().over(
        Window.partitionBy(col("__metric"), col("__k"))
          .orderBy(col(entityCol)))
        .cast(LongType)
    val tiled = unp.join(cum, Seq("__metric", "__k"))
      .withColumn("__tile", tileIdx(rn, col("__n")))
    // pivot the three tiles back to one row per entity (one shuffle;
    // the metric columns ride as grouping keys — already 1:1 by entity)
    def tileOf(idx: Int): Column =
      max(when(col("__metric") === idx, col("__tile")))
    tiled.groupBy(col(entityCol), col("recency_days"), col("frequency"),
        col("monetary"))
      .agg(tileOf(0).as("r"), tileOf(1).as("f"), tileOf(2).as("m"))
      .select(col(entityCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
  }

  /** Kaplan–Meier survival estimate over per-entity lifetimes with
    * right censoring: lifetime = days between an entity's first and
    * last event; an entity still active within `horizonDays` of the
    * corpus max timestamp is CENSORED (its true lifetime is only known
    * to be ≥ the observed one — dropping such users would bias
    * survival down, the classic churn-analysis mistake). Returns one
    * row per distinct lifetime: (t_days, n_risk, events, censored,
    * survival), S(t) = Π over t'≤t of (1 − d/n) — right-continuous,
    * censored entities leave the risk set but trigger no factor.
    *
    * Cross-engine determinism: each factor's ln rounds to integer
    * NANOS before the running sum (the lm_perplexity convention — the
    * product becomes an exact BIGINT prefix sum), survival =
    * exp(nanos/1e9) rounded 6dp; a 1ulp libm difference cannot move
    * the 6th decimal. The d = n boundary (risk set wiped out) floors
    * the factor at 1e-12 so survival rounds to exactly 0 with no ±∞.
    *
    * Scale shape: ONE events-sized shuffle (per-entity min/max rollup);
    * lifetimes then collapse to distinct durations, and both running
    * quantities (risk-set depletion, log-survival) ride
    * [[Series.globalCumSum]] over the durations-sized frame — no
    * global window, no per-key arrays. */
  def kaplanMeier(df: DataFrame, entityCol: String, tsCol: String,
      horizonDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val maxTs = df.agg(max(col(tsCol)).as("__maxts"))
    val per = df
      .where(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("__f"), max(col(tsCol)).as("__l"))
      .crossJoin(broadcast(maxTs))
      .select(
        datediff(to_date(col("__l")), to_date(col("__f")))
          .cast(LongType).as("t_days"),
        when(col("__l") < col("__maxts") -
          expr(s"INTERVAL $horizonDays DAYS"), lit(1L)).otherwise(lit(0L))
          .as("__obs"))
    val g = per.groupBy(col("t_days"))
      .agg(sum(col("__obs")).as("events"),
        sum(lit(1L) - col("__obs")).as("censored"))
      .withColumn("__t", col("events") + col("censored"))
    val cum = Series.globalCumSum(g, "t_days", Seq("__t"),
      withTotals = true)
      .withColumn("n_risk", col("total___t") - col("cum___t") + col("__t"))
    val step = cum.withColumn("__step",
      round(lit(1e9) * log(greatest(
        lit(1.0) - col("events").cast(DoubleType) /
          col("n_risk").cast(DoubleType), lit(1e-12)))).cast(LongType))
    Series.globalCumSum(step.select(col("t_days"), col("n_risk"),
        col("events"), col("censored"), col("__step")),
        "t_days", Seq("__step"), withTotals = false)
      .select(col("t_days"), col("n_risk"), col("events"), col("censored"),
        round(exp(col("cum___step").cast(DoubleType) / lit(1e9)), 6)
          .as("survival"))
  }
}
