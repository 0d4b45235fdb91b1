package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * shape): a suite of checks evaluated against a frame in as few passes
  * as the checks admit, yielding a small report frame — the gate a
  * 100 TB ingest runs before a corpus snapshot is blessed. Reference
  * analogue: the describe/schema surface (`api/describe.kt`) reports
  * what the data IS; this asserts what it MUST be.
  *
  * Exactness: every verdict is BIGINT arithmetic — `passed` compares
  * `n_ok · 10⁶ ≥ minRatioMicros · n_total` (exact while both products
  * stay under 2⁶³, i.e. up to ~9·10¹² rows per check); `ratio_micros`
  * is the one IEEE ×/÷ (display only), replayed in the same order by
  * any engine. An EMPTY frame passes every check vacuously (ratio 10⁶).
  *
  * Scale shape: all row-predicate checks ([[Quality.NotNull]],
  * [[Quality.InRange]], [[Quality.MatchesPattern]], [[Quality.InSet]],
  * [[Quality.Satisfies]]) fuse into ONE aggregate scan — adding a 20th
  * check costs a column, not a pass. Each [[Quality.Unique]] adds one
  * hash aggregate on its key; each [[Quality.RefIntegrity]] adds one
  * join against the DISTINCT reference keys (no fanout; Catalyst
  * broadcasts small dimensions). The report itself is a handful of
  * 1-row frames unioned — nothing wide ever leaves the executors.
  */
object Quality {

  sealed trait Check { def name: String; def minRatioMicros: Long }

  /** Share of rows where `pred` holds (null-safe: null → fail). */
  final case class Satisfies(name: String, pred: Column,
      minRatioMicros: Long = 1000000L) extends Check

  def notNull(colName: String, minRatioMicros: Long = 1000000L): Satisfies =
    Satisfies("not_null:" + colName, col(colName).isNotNull, minRatioMicros)

  def inRange(colName: String, lo: Double, hi: Double,
      minRatioMicros: Long = 1000000L): Satisfies =
    Satisfies(s"in_range:$colName",
      col(colName) >= lit(lo) && col(colName) <= lit(hi), minRatioMicros)

  /** RE2-compatible patterns only (runs under Java regex here; keeping
    * to the common subset keeps the check portable across engines). */
  def matchesPattern(colName: String, pattern: String,
      minRatioMicros: Long = 1000000L): Satisfies =
    Satisfies(s"pattern:$colName", col(colName).rlike(pattern),
      minRatioMicros)

  def inSet(colName: String, values: Seq[Any],
      minRatioMicros: Long = 1000000L): Satisfies =
    Satisfies(s"in_set:$colName", col(colName).isin(values: _*),
      minRatioMicros)

  /** Share of rows whose key value is held by exactly one row. */
  final case class Unique(cols: Seq[String],
      minRatioMicros: Long = 1000000L) extends Check {
    val name: String = "unique:" + cols.mkString(",")
  }

  /** Share of rows whose `colName` value exists in `ref.refCol`
    * (referential integrity; null foreign keys fail). */
  final case class RefIntegrity(colName: String, ref: DataFrame,
      refCol: String, minRatioMicros: Long = 1000000L) extends Check {
    val name: String = s"ref:$colName"
  }

  /** Evaluate `checks` against `df` → report frame
    * (check, n_total, n_ok, ratio_micros, min_ratio_micros, passed),
    * one row per check: row-predicate checks first (the fused scan),
    * then unique/referential checks, each group in declaration order. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Quality.report: need >= 1 check")
    val scalar = checks.collect { case s: Satisfies => s }
    val scalarRows: Option[DataFrame] = if (scalar.isEmpty) None else {
      val aggs = count(lit(1)).as("__n") +: scalar.zipWithIndex.map {
        case (s, i) =>
          sum(coalesce(s.pred, lit(false)).cast("long")).as(s"__ok_$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = scalar.zipWithIndex.map { case (s, i) =>
        struct(lit(s.name).as("check"), col("__n").as("n_total"),
          coalesce(col(s"__ok_$i"), lit(0L)).as("n_ok"),
          lit(s.minRatioMicros).as("min_ratio_micros"))
      }
      Some(one.select(explode(array(rows: _*)).as("r")).select("r.*"))
    }
    val rest = checks.collect {
      case u: Unique =>
        df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_total"),
            coalesce(sum(when(col("__c") === 1L, 1L).otherwise(0L)),
              lit(0L)).as("n_ok"))
          .select(lit(u.name).as("check"), col("n_total"), col("n_ok"),
            lit(u.minRatioMicros).as("min_ratio_micros"))
      case r: RefIntegrity =>
        val refKeys = r.ref.select(col(r.refCol).as("__ref")).distinct()
        df.select(col(r.colName).as("__fk"))
          .join(refKeys, col("__fk") === col("__ref"), "left")
          .agg(count(lit(1)).as("n_total"),
            coalesce(sum(when(col("__ref").isNotNull, 1L).otherwise(0L)),
              lit(0L)).as("n_ok"))
          .select(lit(r.name).as("check"), col("n_total"), col("n_ok"),
            lit(r.minRatioMicros).as("min_ratio_micros"))
    }
    val all = (scalarRows.toSeq ++ rest).reduce(_ unionByName _)
    all.select(col("check"), col("n_total"), col("n_ok"),
      when(col("n_total") === 0L, lit(1000000L))
        .otherwise(floor(col("n_ok") * lit(1000000.0) / col("n_total"))
          .cast("long")).as("ratio_micros"),
      col("min_ratio_micros"),
      (col("n_total") === 0L ||
        col("n_ok") * lit(1000000L) >=
          col("min_ratio_micros") * col("n_total")).as("passed"))
  }

  /** Column-profile report — the "what IS this table" sweep run before
    * writing expectations: one row per profiled column with
    * (column, n_rows, n_nulls, n_distinct, min_str, max_str). Values
    * profile through their STRING form: min/max are lexicographic and
    * n_distinct counts distinct non-null strings — the type-agnostic
    * contract any engine reproduces (numeric-typed min/max/quantiles
    * live in `describe`/`summarize`; this sweep covers every column in
    * one uniform pass). Distinct counts are EXACT by default;
    * `approxDistinct = true` swaps in the HLL++ sketch aggregate
    * (`approx_count_distinct`, default rsd 5%; measured ±2-3% on this
    * corpus — see the QualitySpec error pin) whose partials are
    * fixed-size sketches instead of per-partition distinct sets, the
    * right trade at a 100 TB profile where the exact form's hash
    * aggregate must hold every distinct string per column.
    *
    * Scale shape: the frame unpivots scan-side into skinny
    * (column, value-string) pairs — no join, no driver loop over
    * columns — and ONE hash aggregation on the column name computes all
    * five stats with map-side partials. Cost is rows × profiled
    * columns wire pairs, the irreducible price of an exact
    * distinct-per-column profile; profile a column subset to pay less.
    * The column-name key has exactly `cols.size` distinct values, so
    * parallelism within one huge column comes from the partial
    * aggregation, not the final `cols.size`-row reduce. */
  def profileTable(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileTable: no columns to profile")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.column").as("column"), col("p.value").as("value"))
    val distinctAgg =
      if (approxDistinct) approx_count_distinct(col("value"))
      else countDistinct(col("value"))
    pairs.groupBy(col("column"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        distinctAgg.as("n_distinct"),
        min(col("value")).as("min_str"),
        max(col("value")).as("max_str"))
  }

  /** Numeric per-column profile — [[profileTable]]'s typed sibling for
    * the columns where lexicographic min/max lie: one row per column
    * with (column, n_rows, n_nulls, mean, min, max, p10…p90) — exact
    * R-7 linear-interpolation deciles (the agg_percentiles path), the
    * Deequ-analyzer shape read before writing numeric expectations.
    * Non-numeric inputs cast to DOUBLE up front (uncastable → null, so
    * a mistyped column profiles as all-null instead of failing late);
    * every statistic rounds 6dp (the winsorize convention — engine-
    * independent downstream comparisons).
    *
    * Scale shape: like [[profileTable]], the frame unpivots scan-side
    * into skinny (column, double) pairs and ONE hash aggregation on the
    * column name computes all 14 stats — the deciles share a single
    * sorted-percentile buffer per column via the array-percentage form,
    * not nine separate aggregates. Exact percentiles hold a per-column
    * value buffer; for a 100 TB profile swap the call site to
    * `approx_percentile` or profile a sampled partition — the contract
    * here is the exact ground truth the sketch is judged against. */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric: no columns to profile")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(c).cast("double").as("value"))): _*)).as("p"))
      .select(col("p.column").as("column"), col("p.value").as("value"))
    val decs = array((1 to 9).map(i => lit(i / 10.0)): _*)
    pairs.groupBy(col("column"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        round(avg(col("value")), 6).as("mean"),
        round(min(col("value")), 6).as("min"),
        round(max(col("value")), 6).as("max"),
        percentile(col("value"), decs).as("__d"))
      .select(col("column") +: col("n_rows") +: col("n_nulls") +:
        col("mean") +: col("min") +: col("max") +:
        (1 to 9).map(i =>
          round(element_at(col("__d"), i), 6).as(s"p${i * 10}")): _*)
  }

  /** Order-independent table fingerprint: ONE row
    * (n_rows, xor_hash, sum_mod) summarizing the exact content of the
    * selected columns — equal tables fingerprint equal on any engine,
    * any partitioning, any row order (every aggregate is commutative).
    * The snapshot-integrity primitive: record it at write time, re-check
    * after replication/compaction/migration without sorting 100 TB.
    *
    * Per row: hash = first 15 hex chars (60 bits) of SHA-256 over the
    * columns' string forms joined with U+0001 (nulls → a U+0000 sentinel
    * so (null) and ("") differ). xor_hash XORs all row hashes (pairs of
    * identical rows cancel — which n_rows and sum_mod both catch);
    * sum_mod sums hash mod 1000003, staying exact under 2⁶³ to ~9·10¹²
    * rows. Collision odds for a CHANGED table going unnoticed are
    * ~2⁻⁶⁰ per row pair — audit-grade, not crypto-grade (the full
    * SHA-256 concat of sorted output is crypto-grade and costs a global
    * sort; this never sorts).
    *
    * Scale shape: pure scan-side hashing + one fully partial-aggregable
    * 1-row reduce: bytes on the wire = partials × 3 longs. */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint: no columns")
    val joined = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val h = conv(substring(sha2(joined, 256), 1, 15), 16, 10).cast("long")
    df.select(h.as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("xor_hash"),
        coalesce(sum(col("__h") % 1000003L), lit(0L)).as("sum_mod"))
  }

  /** Exact EQUI-DEPTH histogram edges for `valueCol`: the 1-row frame
    * (edges array of `bins`+1 exact R-7 percentiles at i/bins, each
    * rounded 6dp BEFORE anything buckets against them — the winsorize
    * convention, so the bucketing decision is engine-independent).
    * Shared by [[histogram]] and [[psiDrift]]; exposed so drift checks
    * can bucket TODAY's data by YESTERDAY's persisted edges. */
  def histogramEdges(df: DataFrame, valueCol: String, bins: Int)
      : DataFrame = {
    require(bins >= 2, "histogramEdges: bins must be >= 2")
    val ps = (0 to bins).map(i =>
      round(percentile(col(valueCol), lit(i.toDouble / bins)), 6))
    df.where(col(valueCol).isNotNull)
      .agg(array(ps: _*).as("edges"))
  }

  /** Bin index (1-based) of `v` against an `edges` array of B+1
    * ascending bounds: bin i covers [e_i, e_i+1) with the LAST bin
    * closed; values outside the range clip into the end bins (the PSI
    * convention — drift beyond the historical range lands in, and
    * inflates, the boundary bin rather than vanishing). Pure array
    * expression: 1 + count of interior edges ≤ v. */
  def binOf(v: Column, edges: Column): Column =
    (size(filter(slice(edges, lit(2), size(edges) - 2), e => v >= e)) + 1)
      .cast("long")

  /** Exact equi-depth HISTOGRAM of `valueCol`: `bins` rows
    * (bin, lo, hi, n) with edges at the exact i/bins percentiles —
    * near-equal counts by construction (equal absent ties), the value-
    * distribution view [[profileTable]]'s min/max can't give. Null
    * values drop (no position on the value axis; count them with
    * [[profileTable]]); tie-emptied bins still appear with n = 0.
    *
    * Scale shape: ONE exact-percentile aggregation (the agg_percentiles
    * path), materialized EAGERLY as a 1-row local checkpoint so the two
    * consumers below (bin assignment + bins grid) never re-run the
    * full-table percentile scan → edges broadcast back → scan-side bin
    * assignment → one `bins`-row count shuffle; the bins grid is a
    * `sequence` explode of the 1-row edges frame, so empty bins
    * materialize without a driver loop. */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val (edges, _) = graft.core.CacheHandle.checkpointSmall(
      histogramEdges(df, valueCol, bins))
    val counts = df.where(col(valueCol).isNotNull)
      .crossJoin(broadcast(edges))
      .select(binOf(col(valueCol), col("edges")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    edges.select(explode(sequence(lit(1L), lit(bins.toLong))).as("bin"),
        col("edges"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        element_at(col("edges"), col("bin").cast("int")).as("lo"),
        element_at(col("edges"), col("bin").cast("int") + 1).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Population-stability-index DRIFT report between a BASE snapshot and
    * a CURRENT one: bucket both by the base's exact equi-depth edges,
    * then per bin the PSI contribution (p−q)·ln(p/q) with add-½
    * smoothed shares (no ±∞ on empty bins). Rules of thumb for the sum:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 act. Output:
    * (bin, lo, hi, base_n, cur_n, contrib_nano) — contributions round
    * to integer NANOS before any consumer sums them (the JSD
    * convention), so the report and every rollup of it are exact
    * BIGINTs both engines reproduce.
    *
    * Scale shape: ONE exact-percentile pass over base — materialized
    * eagerly as a 1-row local checkpoint, since three subplans consume
    * it (each side's bucketing + the bins grid) and would otherwise
    * each re-run the full base-table scan — then one scan-side bucket +
    * `bins`-row count shuffle per side, `bins`-row joins — nothing
    * row-scale ever joins row-scale. Out-of-range current values clip
    * into the boundary bins by [[binOf]], so range drift registers
    * instead of dropping. */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    val (edges, _) = graft.core.CacheHandle.checkpointSmall(
      histogramEdges(base, valueCol, bins))
    def side(df: DataFrame, as: String): DataFrame =
      df.where(col(valueCol).isNotNull)
        .crossJoin(broadcast(edges))
        .select(binOf(col(valueCol), col("edges")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val joined = edges
      .select(explode(sequence(lit(1L), lit(bins.toLong))).as("bin"),
        col("edges"))
      .join(side(base, "base_n"), Seq("bin"), "left")
      .join(side(current, "cur_n"), Seq("bin"), "left")
      .select(col("bin"),
        element_at(col("edges"), col("bin").cast("int")).as("lo"),
        element_at(col("edges"), col("bin").cast("int") + 1).as("hi"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // bins-row frame: the totals window runs over `bins` rows, never
    // data rows
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val bt = sum(col("base_n")).over(w)
    val ct = sum(col("cur_n")).over(w)
    val p = (col("base_n") + lit(0.5)) / (bt + lit(0.5) * lit(bins.toDouble))
    val q = (col("cur_n") + lit(0.5)) / (ct + lit(0.5) * lit(bins.toDouble))
    joined.withColumn("contrib_nano",
      round((p - q) * log(p / q) * lit(1e9)).cast("long"))
  }

  /** Benford first-digit audit of a positive INTEGER column — the
    * fabricated-data smoke test (organically-grown magnitudes follow
    * P(d) = log₁₀(1 + 1/d); uniform generators, copy-paste padding, and
    * unit mix-ups don't). Output: one row per digit 1–9 with
    * (digit, n, share_micro, expected_micro, chi_nano) — chi_nano the
    * (obs − exp)²/exp χ² term in integer nanos; Σ/1e9 against the
    * χ²(8) critical values is the verdict. Rows ≤ 0 or null are out of
    * scope and drop (Benford is a positive-magnitude law).
    *
    * The first digit comes from the BIGINT's STRING form, never from
    * log10 arithmetic — an exact decision any engine reproduces (a
    * half-ulp log10 at a power of ten would misfile the whole bucket).
    * Scale shape: one scan-side digit projection → one 9-key count
    * shuffle with map-side partials; the totals window runs over the
    * 9-row frame. */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .where(col(valueCol).isNotNull && col(valueCol) > 0L)
      .select(substring(col(valueCol).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val joined = grid.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("__tot", sum(col("n")).over(w))
    // ln(1+1/d)/ln(10) — Spark's log(base, x) lowers to exactly this,
    // the form the oracle replays
    val expShare = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    val expN = expShare * col("__tot")
    // nullif-guarded: a filtered-to-empty value column yields null
    // shares instead of an ANSI divide-by-zero
    joined.select(col("digit"), col("n"),
      round(col("n") * lit(1000000.0) /
        nullif(col("__tot").cast("double"), lit(0.0))).cast("long")
        .as("share_micro"),
      round(expShare * lit(1e6)).cast("long").as("expected_micro"),
      round((col("n") - expN) * (col("n") - expN) /
        nullif(expN, lit(0.0)) * lit(1e9))
        .cast("long").as("chi_nano"))
  }

  /** Key JOINABILITY / OVERLAP report between two tables' key columns —
    * the dataset-discovery and FK-audit primitive: ONE row
    * (n_a, n_b, n_common, contain_a_micro, contain_b_micro,
    * jaccard_micro) over the DISTINCT key sets. contain_a = share of
    * A's keys found in B (≈10⁶ ⇒ A.key is a foreign key into B —
    * join without row loss); jaccard = symmetric set overlap.
    * Null keys are excluded (a null joins nothing). Complements the
    * row-level `RefIntegrity` check in [[report]]: that counts rows
    * violating an assumed FK, this DISCOVERS whether a key
    * relationship exists at all.
    *
    * Scale shape: two distinct shuffles (map-side partial) + one full
    * outer join of the skinny distinct-key frames, then a 1-row fully
    * partial-aggregable reduce — payloads never move. */
  def keyOverlap(a: DataFrame, aCol: String, b: DataFrame, bCol: String)
      : DataFrame = {
    val da = a.select(col(aCol).as("k")).where(col("k").isNotNull)
      .distinct().withColumn("__a", lit(1L))
    val db = b.select(col(bCol).as("k")).where(col("k").isNotNull)
      .distinct().withColumn("__b", lit(1L))
    da.join(db, Seq("k"), "full")
      .agg(coalesce(sum(col("__a")), lit(0L)).as("n_a"),
        coalesce(sum(col("__b")), lit(0L)).as("n_b"),
        coalesce(sum(when(col("__a").isNotNull && col("__b").isNotNull,
          1L)), lit(0L)).as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        when(col("n_a") === 0L, lit(0L)).otherwise(
          round(col("n_common") * lit(1000000.0) / col("n_a"))
            .cast("long")).as("contain_a_micro"),
        when(col("n_b") === 0L, lit(0L)).otherwise(
          round(col("n_common") * lit(1000000.0) / col("n_b"))
            .cast("long")).as("contain_b_micro"),
        when(col("n_a") + col("n_b") === col("n_common"), lit(0L))
          .otherwise(round(col("n_common") * lit(1000000.0) /
            (col("n_a") + col("n_b") - col("n_common"))).cast("long"))
          .as("jaccard_micro"))
  }

  /** Exact two-sample KOLMOGOROV–SMIRNOV drift statistic between a BASE
    * and a CURRENT snapshot of a numeric column: ONE row
    * (n_base, n_cur, d_nano) with D = sup|F_base − F_cur| — the
    * distribution-free companion to [[psiDrift]] (PSI quantifies drift
    * per historical bucket; KS detects ANY distributional change,
    * including within-bucket shape shifts PSI's 10 bins can't see).
    * Verdict: D·√(n·m/(n+m)) against the Kolmogorov critical values
    * (1.358 ≈ α 0.05) — derivable from the three output fields.
    *
    * Exactness: the sup runs over EXACT integers — at each distinct
    * value, |cumB·n_cur − cumC·n_base| in 38-digit decimals (cross-
    * multiplied ECDF numerators; no per-value double division to
    * accumulate noise); only the final max divides through n_base·n_cur
    * and rounds to integer nanos, one deterministic IEEE op both
    * engines replay.
    *
    * Scale shape: one distinct-value count shuffle (map-side partial),
    * then [[Series.globalCumSum]]'s bucketed prefix-sum for the ECDFs —
    * no single-partition global window, no sort of row-scale data; the
    * final max is a 1-row full-partial aggregate. */
  def ksDrift(base: DataFrame, current: DataFrame, valueCol: String)
      : DataFrame = {
    def side(df: DataFrame, bn: Long, cn: Long): DataFrame =
      df.where(col(valueCol).isNotNull)
        .select(col(valueCol).cast("double").as("v"),
          lit(bn).as("bn"), lit(cn).as("cn"))
    val vc = side(base, 1L, 0L).unionAll(side(current, 0L, 1L))
      .groupBy(col("v"))
      .agg(sum(col("bn")).as("bn"), sum(col("cn")).as("cn"))
    val cum = Series.globalCumSum(vc, "v", Seq("bn", "cn"),
      withTotals = true)
    val dec = DecimalType(38, 0)
    val num = abs(col("cum_bn").cast(dec) * col("total_cn").cast(dec) -
      col("cum_cn").cast(dec) * col("total_bn").cast(dec))
    cum.agg(max(col("total_bn")).as("n_base"),
        max(col("total_cn")).as("n_cur"),
        max(num).as("__num"))
      .select(col("n_base"), col("n_cur"),
        round(col("__num").cast("double") * lit(1e9) /
          (col("n_base").cast("double") * col("n_cur").cast("double")))
          .cast("long").as("d_nano"))
  }

  /** Chi-square HOMOGENEITY drift report between a BASE and a CURRENT
    * snapshot of a CATEGORICAL column — the discrete companion to
    * [[ksDrift]] (lang mix, source mix, label mix). One row per
    * category: (category, base_n, cur_n, chi_nano) — chi_nano the
    * category's (obs−exp)²/exp χ² contribution summed over both sides,
    * in integer nanos (the Benford convention: round BEFORE any
    * rollup). Σ(chi_nano)/1e9 against χ²(k−1) is the verdict; absent
    * categories contribute through the side that has them (expected
    * counts under homogeneity are never zero when the category exists
    * at all). Null category is a real level ("(null)" sentinel) — a
    * drift toward missingness must register, not vanish.
    *
    * Scale shape: one category-key count shuffle per union leg with
    * map-side partials; the grand totals ride a broadcast 1-row
    * aggregate (no unpartitioned window anywhere in the plan — the
    * operator is scale-safe at ANY category cardinality, not just the
    * bounded-by-contract case). */
  def chiSquareDrift(base: DataFrame, current: DataFrame, catCol: String)
      : DataFrame = {
    def side(df: DataFrame, bn: Long, cn: Long): DataFrame =
      df.select(
        coalesce(col(catCol).cast("string"), lit("(null)")).as("category"),
        lit(bn).as("bn"), lit(cn).as("cn"))
    val counts0 = side(base, 1L, 0L).unionAll(side(current, 0L, 1L))
      .groupBy(col("category"))
      .agg(sum(col("bn")).as("base_n"), sum(col("cn")).as("cur_n"))
    val tot = counts0.agg(sum(col("base_n")).as("__bt"),
      sum(col("cur_n")).as("__ct"))
    val counts = counts0.crossJoin(broadcast(tot))
    val bt = col("__bt").cast("double")
    val ct = col("__ct").cast("double")
    // nullif-guarded: a side with zero total (all-null category column)
    // yields null chi instead of an ANSI divide-by-zero
    val rowTot = (col("base_n") + col("cur_n")).cast("double")
    val eb = rowTot * bt / nullif(bt + ct, lit(0.0))
    val ec = rowTot * ct / nullif(bt + ct, lit(0.0))
    val chi = (col("base_n") - eb) * (col("base_n") - eb) /
      nullif(eb, lit(0.0)) +
      (col("cur_n") - ec) * (col("cur_n") - ec) / nullif(ec, lit(0.0))
    counts.select(col("category"), col("base_n"), col("cur_n"),
      round(chi * lit(1e9)).cast("long").as("chi_nano"))
  }

  /** EMBEDDING-distribution drift between a BASE and a CURRENT snapshot
    * of a float-vector column — the MULTIVARIATE sibling of [[ksDrift]]
    * (an encoder swap, a pipeline bug zeroing a dimension, or a corpus
    * mix shift moves the embedding cloud long before any univariate
    * column notices). One row:
    *
    *  - `n_base`, `n_cur` — rows per side;
    *  - `mean_shift_micro` — ‖μ_cur − μ_base‖₂ in integer micros (the
    *    centroid moved this far);
    *  - `cov_fro_delta_micro` — ‖Σ_cur − Σ_base‖_F in micros (shape /
    *    orientation / spread change of the cloud);
    *  - `trace_ratio_micro` — tr(Σ_cur)/tr(Σ_base) in micros (overall
    *    variance inflation/collapse; 10⁶ = unchanged).
    *
    * Exactness: each side is ONE pass through
    * [[graft.functions.Aggregators.CovarianceMoments]]; the three
    * reported scalars round to micros only at the very end, so the
    * ~1e-13-relative reduction-order noise of the distributed sums sits
    * ~5 orders of magnitude below the rounding quantum — any engine
    * re-deriving mean/covariance from the raw vectors reproduces the
    * integers (the `quality_embedding_drift` oracle does, from unnested
    * (row, dim) pairs).
    *
    * Scale shape: two scans, two 8·(1+dim+dim²)-byte mergeable
    * aggregates, all comparison arithmetic driver-side on dim×dim
    * matrices (planner-scale, dim ≤ 512 by the aggregator's bound). */
  def embeddingDrift(base: DataFrame, current: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val spark = base.sparkSession
    def moments(df: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
      val dim = graft.ops.Similarity.vectorDim(df, vecCol)
      val m = df.where(col(vecCol).isNotNull)
        .select(graft.functions.Aggregators.covarianceMomentsUdaf(dim)(
          col(vecCol)).as("m"))
        .head().getSeq[Double](0).toArray
      val n = m(0)
      require(n >= 2,
        s"embeddingDrift: need >= 2 non-null '$vecCol' vectors per side")
      val off = 1 + dim
      val mean = Array.tabulate(dim)(i => m(1 + i) / n)
      val cov = Array.tabulate(dim, dim) { (i, j) =>
        val (hi, lo) = if (i >= j) (i, j) else (j, i)
        m(off + hi * dim + lo) / n - mean(i) * mean(j)
      }
      (n.toLong, mean, cov)
    }
    val (nb, mb, cb) = moments(base)
    val (nc, mc, cc) = moments(current)
    require(mb.length == mc.length,
      s"embeddingDrift: dimension mismatch (base ${mb.length} vs " +
        s"current ${mc.length})")
    val dim = mb.length
    val meanShift = math.sqrt(
      (0 until dim).map(i => (mc(i) - mb(i)) * (mc(i) - mb(i))).sum)
    val covDelta = math.sqrt(
      (for (i <- 0 until dim; j <- 0 until dim)
        yield (cc(i)(j) - cb(i)(j)) * (cc(i)(j) - cb(i)(j))).sum)
    val trB = (0 until dim).map(i => cb(i)(i)).sum
    val trC = (0 until dim).map(i => cc(i)(i)).sum
    val traceRatio =
      if (trB > 0) Some(math.round(trC / trB * 1e6)) else None
    import spark.implicits._
    Seq((nb, nc, math.round(meanShift * 1e6), math.round(covDelta * 1e6),
      traceRatio)).toDF("n_base", "n_cur", "mean_shift_micro",
      "cov_fro_delta_micro", "trace_ratio_micro")
  }

  /** Per-column Shannon entropy report — one row per column:
    * (col_name, n, n_distinct, entropy_nano, entropy, norm_entropy).
    * The class-balance / concentration number: a `source` column with
    * norm_entropy 0.1 means the corpus is effectively one source no
    * matter how many nominal values exist (the multi-value sibling of
    * [[graft.ops.Agg.giniConcentration]]); a label column near 0 means
    * a degenerate training signal. Entropy in nats over NON-NULL
    * values (nulls are [[profileTable]]'s `n_nulls` concern);
    * norm_entropy = H/ln(n_distinct), null for single-valued columns.
    * Per-value contributions −p·ln p round to integer NANO-nats before
    * the sum (the corpusDivergence convention — exact BIGINT aggregate
    * under any reduction order).
    *
    * Scale shape: scan-side unpivot to skinny (column, string) pairs
    * ([[profileTable]]'s shape) → ONE (column, value) count shuffle
    * with map-side partials → per-column rollup of the values-sized
    * frame. Entropy arithmetic never touches data rows. */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnEntropy: no columns given")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.c").as("__c"), col("p.v").as("__v"))
      .where(col("__v").isNotNull)
    val counts = pairs.groupBy(col("__c"), col("__v"))
      .agg(count(lit(1)).as("__n"))
    val totals = counts.groupBy(col("__c"))
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("n_distinct"))
    val p = col("__n").cast(DoubleType) /
      nullif(col("n").cast(DoubleType), lit(0.0))
    val ent = counts.join(totals, Seq("__c"))
      .select(col("__c"),
        round(lit(-1e9) * p * log(p)).cast(LongType).as("__nano"))
      .groupBy(col("__c")).agg(sum(col("__nano")).as("entropy_nano"))
    totals.join(ent, Seq("__c"))
      .select(col("__c").as("col_name"), col("n"), col("n_distinct"),
        col("entropy_nano"),
        round(col("entropy_nano") / lit(1e9), 6).as("entropy"),
        when(col("n_distinct") > 1,
          round(col("entropy_nano") / lit(1e9) /
            log(col("n_distinct").cast(DoubleType)), 6))
          .otherwise(lit(null)).as("norm_entropy"))
  }

  /** Functional-dependency violation report: does `detCols → depCol`
    * hold? Returns the `topK` determinant keys with MORE than one
    * distinct non-null dependent value — (det cols…, n_rows, n_dep,
    * n_null_dep), ordered (n_dep desc, det asc) so ties cut
    * deterministically. An empty result means the FD holds (modulo
    * nulls — `n_null_dep` counts dependent nulls separately rather
    * than folding them into the distinct count, so a key whose only
    * "second value" is NULL does not flag). Rows with a NULL
    * determinant are excluded — an FD says nothing about undefined
    * keys; count them with [[profileTable]]'s n_nulls if they matter.
    * The schema-discovery / data-contract primitive: "order_id
    * determines status" is an assertion this report either certifies
    * or refutes with the offending keys in hand.
    *
    * Scale shape: one exact `countDistinct` aggregate — Catalyst
    * expands it to the standard two-level plan ((det, dep) partial
    * dedup, then per-det rollup: two shuffles, both map-side-combined,
    * no row wider than the key pair); the violation filter prunes
    * before the TakeOrderedAndProject top-k. */
  def fdViolations(df: DataFrame, detCols: Seq[String], depCol: String,
      topK: Int = 20): DataFrame = {
    require(detCols.nonEmpty, "fdViolations: need >=1 determinant column")
    val g = df
      .where(detCols.map(c => col(c).isNotNull).reduce(_ && _))
      .groupBy(detCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(depCol)).as("n_dep"),
        sum(when(col(depCol).isNull, 1L).otherwise(0L)).as("n_null_dep"))
    g.where(col("n_dep") > 1)
      .orderBy(col("n_dep").desc +: detCols.map(c => col(c).asc): _*)
      .limit(topK)
  }

  /** k-anonymity audit over the quasi-identifier columns (Sweeney's
    * re-identification model): every row must share its quasi-identifier
    * combination with at least `k−1` other rows, or an adversary joining
    * on those columns singles it out. The governance gate a training
    * corpus carrying user-derived attributes runs before release —
    * [[Quality.report]] asserts value contracts; this asserts a JOIN
    * contract against every external table an attacker might hold.
    * One row: (n_rows, n_classes, k_anonymity = size of the smallest
    * equivalence class, classes_below_k, rows_below_k,
    * rows_below_micro = rows_below_k·10⁶/n_rows, passed).
    *
    * Nulls in quasi columns form their own equivalence class (SQL GROUP
    * BY semantics — two all-null rows ARE linkable to each other). An
    * empty frame reports k_anonymity 0 and passes vacuously (no row is
    * re-identifiable; the [[Quality.report]] empty-input convention).
    * All verdict arithmetic is exact BIGINT; `rows_below_micro` is the
    * one display division.
    *
    * Scale shape: ONE hash aggregate on the quasi key (map-side
    * combined), then a handful-of-groups rollup — the class-size frame
    * never leaves the executors and nothing is row-width. Skewed quasi
    * keys (one class holding ~all rows) only make the FIRST aggregate's
    * partials bigger, which is exactly what map-side combine absorbs. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long)
      : DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityReport: no quasi columns given")
    require(k >= 1L, "kAnonymityReport: k must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(coalesce(sum(col("__sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(min(col("__sz")), lit(0L)).as("k_anonymity"),
        coalesce(sum(when(col("__sz") < k, 1L).otherwise(0L)), lit(0L))
          .as("classes_below_k"),
        coalesce(sum(when(col("__sz") < k, col("__sz")).otherwise(0L)),
          lit(0L)).as("rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
        col("classes_below_k"), col("rows_below_k"),
        when(col("n_rows") > 0,
          round(col("rows_below_k") * lit(1e6) / col("n_rows"))
            .cast(LongType)).otherwise(lit(0L)).as("rows_below_micro"),
        (col("rows_below_k") === 0L).as("passed"))
  }

  /** Distinct l-diversity audit ([[kAnonymityReport]]'s companion —
    * Machanavajjhala et al.): k-anonymity stops an attacker from
    * finding WHICH row is yours, but if every row in your equivalence
    * class carries the same sensitive value the attacker learns it
    * anyway (the homogeneity attack). Requires every quasi-identifier
    * class to contain at least `l` DISTINCT non-null sensitive values.
    * One row: (n_rows, n_classes, l_diversity = min distinct sensitive
    * per class, classes_below_l, rows_below_l, passed).
    *
    * A class whose sensitive values are ALL null has diversity 0 (the
    * attacker learns "value withheld" — still homogeneous); non-null
    * rows count distinct values only. Empty frame → l_diversity 0,
    * passed vacuously. Nulls in quasi columns group together (same
    * linkability argument as [[kAnonymityReport]]).
    *
    * Scale shape: one exact `countDistinct` on (quasi, sensitive) —
    * Catalyst's standard two-level expansion, two map-side-combined
    * shuffles — then the class-frame rollup. */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityReport: no quasi columns given")
    require(l >= 1L, "lDiversityReport: l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        countDistinct(col(sensitiveCol)).as("__ldiv"))
      .agg(coalesce(sum(col("__sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(min(col("__ldiv")), lit(0L)).as("l_diversity"),
        coalesce(sum(when(col("__ldiv") < l, 1L).otherwise(0L)), lit(0L))
          .as("classes_below_l"),
        coalesce(sum(when(col("__ldiv") < l, col("__sz")).otherwise(0L)),
          lit(0L)).as("rows_below_l"))
      .select(col("n_rows"), col("n_classes"), col("l_diversity"),
        col("classes_below_l"), col("rows_below_l"),
        (col("rows_below_l") === 0L).as("passed"))
  }
}
