package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classical statistics over distributed frames — the "is this effect
  * real" layer a training-data pipeline reaches for after the drift /
  * quality reports (reference ships describe/std/corr primitives,
  * `api/describe.kt:38-64`, `api/std.kt`, `api/corr.kt`; regression,
  * rank correlation, ANOVA and resampling CIs are the natural
  * extension tier). Cross-engine determinism: closed-form fits ride Spark's
  * merge-stable single-pass moment aggregates (`covar_pop`/`var_pop`/
  * `corr` — the same numerically-stable shapes DuckDB's `regr_*`
  * family uses), and every derived double rounds to 6dp to absorb the
  * ≤1e-12 relative reduction-order noise.
  */
object Stats {

  /** Per-group ordinary least squares y ~ x via single-pass moments:
    * slope = covar_pop(x,y)/var_pop(x), intercept = ȳ − slope·x̄,
    * r² = corr(x,y)² — exactly DuckDB's `regr_slope`/`regr_intercept`
    * definitions. Rows with a null in either column are excluded
    * (the `regr_*` contract). Degenerate groups (var_pop(x)=0) yield
    * null slope/intercept/r2. Returns group cols + (n, slope,
    * intercept, r2), all fit columns rounded 6dp.
    *
    * Scale shape: ONE hash aggregate with map-side partials — the
    * moment accumulators (count + 5 running moments) are a fixed-width
    * partial per group, so 100 TB of (x, y) pairs reduces to
    * groups-sized traffic. No second pass, no window, no collect. */
  def linearRegression(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val fit = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        covar_pop(x, y).as("__cov"),
        var_pop(x).as("__varx"), var_pop(y).as("__vary"),
        avg(x).as("__mx"), avg(y).as("__my"))
    // nullif-guarded denominators: under ANSI mode a 0/0 throws (and
    // subexpression elimination evaluates divisions even inside a false
    // when() branch — `corr` itself throws on a constant column, which
    // is why r² derives from moments: r² = cov²/(varx·vary)); null
    // propagates instead.
    val slope = col("__cov") / nullif(col("__varx"), lit(0.0))
    fit.select(groupCols.map(col) :+ col("n") :+
      round(slope, 6).as("slope") :+
      round(col("__my") - slope * col("__mx"), 6).as("intercept") :+
      round(col("__cov") * col("__cov") /
        nullif(col("__varx") * col("__vary"), lit(0.0)), 6).as("r2"): _*)
  }

  /** MULTIPLE linear regression y ~ x₁ + … + x_k + intercept, solved
    * on the STANDARDIZED (correlation-matrix) system: one pass of
    * stable moment aggregates (covar_pop/var_pop — never raw Σx²),
    * the driver solves R·β_std = r_xy by Gaussian elimination with
    * partial pivoting, coefficients unstandardize as β_i =
    * β_std_i·σ_y/σ_i, intercept = ȳ − Σβ_i·x̄_i, R² = β_stdᵀ·r_xy.
    * Returns one row per term: ("(intercept)", each predictor, "r2"),
    * value 6dp. Constant predictors and collinear systems throw a
    * NAMED IllegalStateException.
    *
    * Why standardized: raw normal equations amplify independent
    * cross-engine moment noise by κ(XᵀX) = κ(X)² — with uncentered
    * large-mean regressors that swamps a 6dp compare. The correlation
    * system has κ ≈ the predictors' true collinearity (≈1 for sane
    * audit regressions), so a DuckDB replay of the same closed form
    * lands on identical rounded output.
    *
    * Scale shape: ONE aggregate, k(k+1)/2 + 2k + 2 fixed-width
    * partials; the collect is one row of O(k²) doubles (planner-scale,
    * the k-means centroid pattern); the solve is k³ driver flops. */
  def linearRegressionMulti(df: DataFrame, xCols: Seq[String],
      yCol: String): DataFrame = {
    require(xCols.nonEmpty, "linearRegressionMulti: no predictors")
    require(xCols.size <= 16,
      s"linearRegressionMulti: ${xCols.size} predictors - the closed " +
        "form is for small k (use an iterative solver beyond that)")
    val spark = df.sparkSession
    val k = xCols.size
    val xs = xCols.map(c => col(c).cast(DoubleType))
    val y = col(yCol).cast(DoubleType)
    val clean = df.where((col(yCol) +: xCols.map(col))
      .map(_.isNotNull).reduce(_ && _))
    val aggs =
      (for (i <- 0 until k; j <- i + 1 until k)
        yield covar_pop(xs(i), xs(j)).as(s"c_${i}_$j")) ++
      (0 until k).map(i => covar_pop(xs(i), y).as(s"cy_$i")) ++
      (0 until k).map(i => var_pop(xs(i)).as(s"v_$i")) ++
      (0 until k).map(i => avg(xs(i)).as(s"m_$i")) :+
      var_pop(y).as("vy") :+ avg(y).as("my") :+ count(lit(1)).as("n")
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    require(n > k + 1,
      s"linearRegressionMulti: $n rows for ${k + 1} coefficients - " +
        "underdetermined")
    val sd = Array.tabulate(k)(i => math.sqrt(row.getAs[Double](s"v_$i")))
    val sdY = math.sqrt(row.getAs[Double]("vy"))
    (0 until k).foreach { i =>
      if (!(sd(i) > 0)) throw new IllegalStateException(
        s"linearRegressionMulti: predictor '${xCols(i)}' is constant")
    }
    // mirror the predictor guard on the RESPONSE: var_pop(y) = 0 would
    // silently return all-zero coefficients with r2 = 0, presenting a
    // degenerate input as a valid fit (and diverging from the DuckDB
    // closed form, which yields NULLs there)
    if (!(sdY > 0)) throw new IllegalStateException(
      s"linearRegressionMulti: response '$yCol' is constant - nothing " +
        "to regress")
    val r = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0
      else row.getAs[Double](s"c_${math.min(i, j)}_${math.max(i, j)}") /
        (sd(i) * sd(j))
    }
    val rhs = Array.tabulate(k)(i =>
      if (sdY > 0) row.getAs[Double](s"cy_$i") / (sd(i) * sdY) else 0.0)
    // Gaussian elimination with partial pivoting, driver-side k×k
    val beta = {
      val a = r.map(_.clone()); val b = rhs.clone()
      for (c <- 0 until k) {
        val piv = (c until k).maxBy(rr => math.abs(a(rr)(c)))
        if (math.abs(a(piv)(c)) < 1e-10)
          throw new IllegalStateException(
            "linearRegressionMulti: collinear predictors (singular " +
              s"correlation matrix at '${xCols(c)}')")
        val (t1, t2) = (a(c), b(c)); a(c) = a(piv); b(c) = b(piv)
        a(piv) = t1; b(piv) = t2
        for (rr <- c + 1 until k) {
          val f = a(rr)(c) / a(c)(c)
          for (cc <- c until k) a(rr)(cc) -= f * a(c)(cc)
          b(rr) -= f * b(c)
        }
      }
      val out = new Array[Double](k)
      for (rr <- k - 1 to 0 by -1) {
        var s = b(rr)
        for (cc <- rr + 1 until k) s -= a(rr)(cc) * out(cc)
        out(rr) = s / a(rr)(rr)
      }
      out
    }
    val coef = Array.tabulate(k)(i =>
      if (sd(i) > 0) beta(i) * sdY / sd(i) else 0.0)
    val intercept = row.getAs[Double]("my") -
      (0 until k).map(i => coef(i) * row.getAs[Double](s"m_$i")).sum
    val r2 = (0 until k).map(i => beta(i) * rhs(i)).sum
    val terms = ("(intercept)" +: xCols) :+ "r2"
    val values = ((intercept +: coef.toSeq) :+ r2).map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    import spark.implicits._
    terms.zip(values).toDF("term", "value")
  }

  /** Spearman rank correlation of two columns — ONE row (n, rho 6dp).
    * Monotone-association robustness where Pearson (`describe`/`corr`,
    * reference `api/describe.kt`) assumes linearity. Fractional
    * average ranks with exact tie handling: a value occupying sorted
    * positions a..b ranks (a+b)/2 — an exact half-integer, so the
    * final Pearson-over-ranks runs on exact inputs and 6dp rounding
    * absorbs only the corr accumulator's own reduction noise.
    *
    * Scale shape: the classic global-rank trap is `Window.orderBy`
    * with no partition key (whole corpus through one task). Instead
    * BOTH columns collapse to their distinct values in ONE unpivoted
    * count shuffle (map-side partials), ranks for both derive from a
    * single [[Series.groupedCumSum]] keyed by the metric tag (bucketed
    * two-level scan, no single-partition stage), and two skinny
    * value→rank joins decorate the original pairs. Null pairs
    * excluded. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pairs = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast(DoubleType).as("__x"),
        col(yCol).cast(DoubleType).as("__y"))
    // ONE value-collapse for BOTH columns (r20): unpivot each pair to
    // (metric 0 = x, metric 1 = y) rows and count per (metric, value)
    // in a single map-side-partial shuffle, then ONE groupedCumSum
    // ranks both columns in a single bucketed two-level scan — the
    // rfmSegments shape. The r13 form ran the whole rank machinery
    // (counts shuffle + percentile + partials + offset window) once
    // PER column; per-(metric,value) counts equal the per-column
    // counts, so every rank is the identical exact half-integer.
    val unp = pairs.select(explode(array(
        struct(lit(0).as("__m"), col("__x").as("__v")),
        struct(lit(1).as("__m"), col("__y").as("__v")))).as("__mv"))
      .select(col("__mv.__m").as("__m"), col("__mv.__v").as("__v"))
    val counts = unp.groupBy(col("__m"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    // positions (cum−c+1)..cum → average rank cum − (c−1)/2
    val ranks = Series.groupedCumSum(counts, Seq("__m"), "__v", Seq("__c"))
      .select(col("__m"), col("__v"),
        (col("cum___c").cast(DoubleType) -
          (col("__c").cast(DoubleType) - lit(1.0)) / lit(2.0)).as("__r"))
    pairs
      .join(ranks.where(col("__m") === 0)
        .select(col("__v").as("__x"), col("__r").as("__rx")), Seq("__x"))
      .join(ranks.where(col("__m") === 1)
        .select(col("__v").as("__y"), col("__r").as("__ry")), Seq("__y"))
      .agg(count(lit(1)).as("n"),
        covar_pop(col("__rx"), col("__ry")).as("__cov"),
        var_pop(col("__rx")).as("__vx"), var_pop(col("__ry")).as("__vy"))
      // moments, not `corr` — ANSI corr throws 0/0 on a constant column
      .select(col("n"), round(col("__cov") /
        nullif(sqrt(col("__vx") * col("__vy")), lit(0.0)), 6).as("rho"))
  }

  /** Per-GROUP Spearman rank correlation — [[spearman]]'s grouped
    * sibling: one row per group (group cols…, n, rho 6dp). Ranks here
    * ride PARTITIONED windows (rank() + tie-count over the group key —
    * parallel across groups, per-group sort spill-safe), so no
    * globalCumSum machinery is needed; the global form exists because
    * `Window.orderBy` with NO partition key is the trap, not windows
    * per se. Fractional tie ranks are exact half-integers; ρ from
    * moments (ANSI-safe), single-valued columns yield null.
    *
    * Scale shape: ONE group-key Exchange shared by all four window
    * specs + the final aggregate (same-key clustering satisfies every
    * requirement); per-task work is the group's sort. */
  def spearmanBy(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "spearmanBy: empty group keys - use spearman() for the global form")
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val base = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys :+ col(xCol).cast(DoubleType).as("__x") :+
        col(yCol).cast(DoubleType).as("__y"): _*)
    def frank(c: String): Column = {
      val wOrd = Window.partitionBy(keys: _*).orderBy(col(c))
      val wTie = Window.partitionBy(keys :+ col(c): _*)
      rank().over(wOrd).cast(DoubleType) +
        (count(lit(1)).over(wTie).cast(DoubleType) - lit(1.0)) / lit(2.0)
    }
    base
      .withColumn("__rx", frank("__x"))
      .withColumn("__ry", frank("__y"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        covar_pop(col("__rx"), col("__ry")).as("__cov"),
        var_pop(col("__rx")).as("__vx"), var_pop(col("__ry")).as("__vy"))
      .select(keys :+ col("n") :+
        round(col("__cov") /
          nullif(sqrt(col("__vx") * col("__vy")), lit(0.0)), 6)
          .as("rho"): _*)
  }

  /** One-way ANOVA: does a numeric outcome differ across k groups?
    * ONE row (k, n, f, eta_sq) — F = (SSB/(k−1)) / (SSW/(N−k)),
    * η² = SSB/(SSB+SSW) (effect size), both 6dp; degenerate inputs
    * (k<2, N≤k, or SSW=0) yield null f. SSW = Σ n_g·var_pop_g and
    * SSB = Σ n_g·(x̄_g − x̄)² ride the merge-stable moment aggregates,
    * never raw Σx² (whose cancellation would not survive a cross-
    * engine 6dp compare at 100 TB magnitudes).
    *
    * Scale shape: one hash aggregate to per-group (n, mean, var) —
    * fixed-width partials — then all remaining arithmetic runs on the
    * groups-sized frame; the grand mean derives from the group sums
    * (exact same weighting both engines). */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val g = df.where(v.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), avg(v).as("__m"),
        var_pop(v).as("__v"))
    val nD = col("__n").cast(DoubleType)
    val agg = g.agg(
      count(lit(1)).as("k"),
      sum(col("__n")).as("n"),
      sum(nD * col("__m")).as("__sumx"),
      sum(nD * col("__v")).as("ssw"),
      sum(nD * col("__m") * col("__m")).as("__sumnm2"))
    val grand = col("__sumx") / nullif(col("n").cast(DoubleType), lit(0.0))
    // Σ n_g(m_g − m̄)² = Σ n_g m_g² − N m̄²  — both factors group-sized.
    // nullif-guarded denominators: ANSI mode + subexpression elimination
    // evaluate divisions eagerly even inside a false when() branch.
    val ssb = col("__sumnm2") - col("n").cast(DoubleType) * grand * grand
    val f = (ssb / nullif(col("k").cast(DoubleType) - lit(1.0), lit(0.0))) /
      nullif(col("ssw") / nullif(col("n").cast(DoubleType) -
        col("k").cast(DoubleType), lit(0.0)), lit(0.0))
    agg.select(col("k"), col("n"),
      when(col("k") >= 2 && col("n") > col("k") && col("ssw") > 0,
        round(f, 6)).otherwise(lit(null)).as("f"),
      round(ssb / nullif(ssb + col("ssw"), lit(0.0)), 6).as("eta_sq"))
  }

  /** Delete-a-group jackknife confidence interval for a column mean —
    * the resampling CI that actually works at 100 TB (per-row
    * bootstrap resamples are a non-starter; deleting one of k
    * deterministic hash buckets at a time needs only k partial sums).
    * Buckets come from `pmod(bucketKey, k)` — pure integer arithmetic
    * any engine replays bit-for-bit, no RNG to seed-sync. Leave-one-
    * out means θ̂ᵢ = (S−sᵢ)/(N−nᵢ); variance is the grouped-jackknife
    * estimator (k−1)/k · Σ(θ̂ᵢ − θ̄*)². ONE row (n, k, mean, se,
    * lo, hi) — mean/se/lo/hi 6dp, CI = mean ± 1.96·se.
    *
    * Scale shape: one k-group hash aggregate (map-side partials) →
    * all jackknife arithmetic on the k-row frame via a broadcast
    * 1-row totals join. Nothing else touches the data. */
  def jackknifeCi(df: DataFrame, valueCol: String, bucketKeyCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 2, s"jackknife needs >=2 buckets, got $k")
    // pmod on a fractional key yields fractional "buckets" — potentially
    // far more than k leave-one-out groups, silently contradicting the
    // documented "k deterministic hash buckets" contract
    val keyType = df.schema(bucketKeyCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(keyType),
      s"jackknifeCi: bucket key '$bucketKeyCol' must be an integral " +
        s"column (got ${keyType.simpleString}) - pmod of a fractional " +
        "key does not produce k buckets; hash or cast the key first")
    val v = col(valueCol).cast(DoubleType)
    val per = df.where(v.isNotNull && col(bucketKeyCol).isNotNull)
      .groupBy(pmod(col(bucketKeyCol), lit(k.toLong)).as("__b"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"))
    val tot = per.agg(sum(col("__n")).as("__nt"), sum(col("__s")).as("__st"),
      count(lit(1)).as("__k"))
    val loo = per.crossJoin(broadcast(tot))
      .select(col("__nt"), col("__st"), col("__k"),
        ((col("__st") - col("__s")) /
          nullif((col("__nt") - col("__n")).cast(DoubleType), lit(0.0)))
          .as("__theta"))
    val kD = col("__k").cast(DoubleType)
    val out = loo
      .groupBy(col("__nt"), col("__st"), col("__k"))
      .agg(avg(col("__theta")).as("__tbar"),
        sum(col("__theta") * col("__theta")).as("__t2"))
    val varJack = (kD - lit(1.0)) / nullif(kD, lit(0.0)) *
      (col("__t2") - kD * col("__tbar") * col("__tbar"))
    val mean = col("__st") / nullif(col("__nt").cast(DoubleType), lit(0.0))
    val se = sqrt(greatest(varJack, lit(0.0)))
    out.select(col("__nt").as("n"), col("__k").as("k"),
      round(mean, 6).as("mean"), round(se, 6).as("se"),
      round(mean - lit(1.96) * se, 6).as("lo"),
      round(mean + lit(1.96) * se, 6).as("hi"))
  }

  /** Zipf rank-frequency fit over a corpus — ONE row (vocab, top_n,
    * slope, intercept, r2): OLS of ln(freq) on ln(rank) over the
    * `topN` most frequent tokens. A healthy natural corpus slopes
    * ≈ −1; templated / synthetic / boilerplate-heavy corpora bend the
    * curve — the corpus-health companion to `ngramDiversity`. Ranks
    * break frequency ties by token (total order both engines).
    *
    * Scale shape: corpus collapses to token counts ONCE (explode +
    * count shuffle, map-side partials); `orderBy.limit(topN)` is
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * row_number window runs on the topN-row frame — bounded by the
    * `topN` argument, not the corpus. Fit reuses the moment identities
    * of [[linearRegression]] on ln/ln pairs. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val vocab = counts.agg(count(lit(1)).as("vocab"))
    val top = counts.orderBy(col("__c").desc, col("__w")).limit(topN)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__c").desc, col("__w"))))
      .select(log(col("__rank").cast(DoubleType)).as("__lr"),
        log(col("__c").cast(DoubleType)).as("__lf"))
    val fit = top.agg(count(lit(1)).as("top_n"),
      covar_pop(col("__lr"), col("__lf")).as("__cov"),
      var_pop(col("__lr")).as("__varx"), var_pop(col("__lf")).as("__vary"),
      avg(col("__lr")).as("__mx"), avg(col("__lf")).as("__my"))
    val slope = col("__cov") / nullif(col("__varx"), lit(0.0))
    fit.crossJoin(broadcast(vocab)).select(col("vocab"), col("top_n"),
      round(slope, 6).as("slope"),
      round(col("__my") - slope * col("__mx"), 6).as("intercept"),
      round(col("__cov") * col("__cov") /
        nullif(col("__varx") * col("__vary"), lit(0.0)), 6).as("r2"))
  }

  /** Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β — vocabulary as a
    * function of corpus size, measured at `checkpoints` evenly-spaced
    * doc-id thresholds and fitted by OLS of ln V on ln n. Natural text
    * sits at β ≈ 0.4–0.6; β near 1 means vocabulary grows linearly
    * (unbounded junk/IDs — dedup or filter before training a
    * tokenizer), β near 0 means the corpus stopped saying new things.
    * Returns one row per checkpoint (checkpoint, docs_through,
    * n_tokens, vocab) plus the fit constants repeated (beta,
    * ln_k, r2, 6dp) — the curve AND its summary in one frame.
    *
    * Scale shape: tokens explode once into TWO collapses — per-token
    * min doc_id (first occurrence) and per-doc token counts — each one
    * shuffle with map-side partials; both then bucket by the
    * arithmetic checkpoint index (floor(id·c/(max+1)) — pure integer
    * replayable anywhere; ids must be NON-NEGATIVE, a negative id
    * would land in a phantom negative bucket) and roll up to
    * `checkpoints` rows. The
    * cumulative + fit run on that tiny frame (a c-row window is the
    * transpose_row class of driver-scale work, not a data window). */
  def heapsFit(df: DataFrame, textCol: String, idCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 2 && checkpoints <= 50,
      s"heapsFit: checkpoints must be in [2, 50] (the exact-integer " +
        s"fit sums stay under 2^63 up to 50 points), got $checkpoints")
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("__w"))
    val maxId = df.agg((max(col(idCol)) + lit(1L)).as("__m"),
      min(col(idCol)).as("__min"))
    // negative-id guard rides the SAME broadcast bounds row (no extra
    // action): a negative id would land in a phantom negative bucket and
    // silently corrupt both the curve and the fit
    def bucketOf(id: Column): Column =
      when(col("__min") < 0, raise_error(format_string(
        "heapsFit: negative id in '%s' (min=%s) - checkpoint buckets " +
          "are floor(id*c/(max+1)); ids must be non-negative",
        lit(idCol), col("__min").cast("string"))).cast("int"))
        .otherwise(floor(id * lit(checkpoints.toLong) /
          nullif(col("__m").cast(DoubleType), lit(0.0))).cast("int"))
    val tokensPer = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nt"))
      .crossJoin(broadcast(maxId))
      .groupBy(bucketOf(col("__id")).as("__b"))
      .agg(sum(col("__nt")).as("__toks"), count(lit(1)).as("__docs"))
    val firstPer = toks.groupBy(col("__w"))
      .agg(min(col("__id")).as("__first"))
      .crossJoin(broadcast(maxId))
      .groupBy(bucketOf(col("__first")).as("__b"))
      .agg(count(lit(1)).as("__new"))
    val cells = tokensPer.join(firstPer, Seq("__b"), "left")
      .select(col("__b"), col("__toks"), col("__docs"),
        coalesce(col("__new"), lit(0L)).as("__new"))
    // checkpoints-row frame: a bounded single-partition window is fine
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = cells
      .withColumn("docs_through", sum(col("__docs")).over(w))
      .withColumn("n_tokens", sum(col("__toks")).over(w))
      .withColumn("vocab", sum(col("__new")).over(w))
      .select((col("__b") + lit(1)).as("checkpoint"),
        col("docs_through"), col("n_tokens"), col("vocab"))
    // Fit from EXACT integer micro-sums, not covar_pop/var_pop: the
    // test corpus's flat vocabulary makes y CONSTANT, and a parallel
    // moment merge over a constant column is nondeterministic garbage
    // at the 1e-31 scale (measured: DuckDB's r2 on constant y varied
    // run to run between null and ~0.72 — n·Σy²−(Σy)² over exact
    // BIGINTs is 0 exactly, every run, in every engine). ln points
    // round to integer micros first; sums stay < 2⁶³ for the
    // checkpoint counts the require() admits.
    val pts = curve
      .where(col("n_tokens") > 0 && col("vocab") > 0)
      .select(
        round(log(col("n_tokens").cast(DoubleType)) * lit(1e6))
          .cast(LongType).as("__x"),
        round(log(col("vocab").cast(DoubleType)) * lit(1e6))
          .cast(LongType).as("__y"))
    val sums = pts.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast(DoubleType)
    val denX = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast(DoubleType)
    val denY = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast(DoubleType)
    val beta = num / nullif(denX, lit(0.0))
    val lnK = (col("__sy").cast(DoubleType) -
      beta * col("__sx").cast(DoubleType)) /
      nullif(col("__n").cast(DoubleType), lit(0.0)) / lit(1e6)
    curve.crossJoin(broadcast(sums.select(
      round(beta, 6).as("beta"),
      round(lnK, 6).as("ln_k"),
      round(num * num / nullif(denX * denY, lit(0.0)), 6).as("r2"))))
  }

  /** Hapax-legomena report — ONE row (n_tokens, vocab, hapax, dis,
    * hapax_ratio 6dp): how much of the vocabulary occurs exactly once
    * (hapax) or twice (dis). The quick corpus-health companion to
    * [[zipfFit]]: natural corpora sit near 40–60% hapax; far below
    * suggests templated/duplicated text, far above suggests OCR noise
    * or tokenizer breakage.
    *
    * Scale shape: the corpus collapses to token counts ONCE (explode +
    * count shuffle with map-side partials); the report is one
    * conditional aggregate over the vocab-sized frame. */
  def hapaxReport(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    counts.agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
      sum(when(col("__c") === 2, 1L).otherwise(0L)).as("dis"))
      .withColumn("hapax_ratio",
        round(col("hapax").cast(DoubleType) /
          nullif(col("vocab").cast(DoubleType), lit(0.0)), 6))
  }

  /** Mahalanobis distance² per row over k numeric columns — the
    * multivariate outlier score that catches what per-column robust-z
    * ([[graft.ops.Series]]) cannot: a row whose EVERY coordinate is
    * individually plausible but whose combination is impossible (a
    * 1-unit order at list price 50k). d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) with
    * population covariance Σ (+ `ridge`·I when supplied); appends
    * `mahalanobis_d2` to the input frame. Rows with ANY null or NaN
    * among `cols` score null and are excluded from the moment pass.
    *
    * Exactness: moments are Spark's merge-stable single-pass aggregates
    * ([[linearRegressionMulti]]'s convention — ≤1e-12 relative
    * reduction-order noise); the k×k inverse is a deterministic
    * driver-side Gauss–Jordan with partial pivoting (planner-scale:
    * k ≤ 16 by the same closed-form bound); the quadratic form is a
    * fixed-order k² literal multiply-add, codegen'd scan-side. Under
    * population covariance and ridge 0, mean(d²) over the scored rows
    * is EXACTLY k — the algebraic identity the
    * `stat_mahalanobis_verify` oracle row pins. A singular covariance
    * (collinear columns) throws a named error naming the pivot —
    * pass `ridge` > 0 to regularize, accepting mean(d²) < k.
    *
    * Scale shape: ONE hash aggregate to a 1-row moment frame (fixed
    * width, k(k+3)/2 + 1 cells), one driver collect of that row, then
    * a pure projection — no joins, no windows, no second shuffle; the
    * 100 TB cost is the scan. */
  def mahalanobisScores(df: DataFrame, cols: Seq[String],
      ridge: Double = 0.0): DataFrame = {
    val k = cols.size
    require(k >= 2 && k <= 16,
      s"mahalanobisScores: $k columns - need 2..16 (one column is " +
        "plain z-score; beyond 16 invert iteratively)")
    require(ridge >= 0.0, "mahalanobisScores: ridge must be >= 0")
    val xs = cols.map(c => col(c).cast(DoubleType))
    // NaN is excluded like null: one NaN row would poison every moment
    // into NaN and trip the constant-column guard with a wrong
    // diagnosis; a NaN coordinate also has no meaningful distance
    val nonNull = cols.map(c => col(c).isNotNull &&
      !isnan(col(c).cast(DoubleType))).reduce(_ && _)
    val aggs =
      (for (i <- 0 until k; j <- i + 1 until k)
        yield covar_pop(xs(i), xs(j)).as(s"c_${i}_$j")) ++
      (0 until k).map(i => var_pop(xs(i)).as(s"v_$i")) ++
      (0 until k).map(i => avg(xs(i)).as(s"m_$i")) :+
      count(lit(1)).as("n")
    val row = df.where(nonNull).agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    require(n > k,
      s"mahalanobisScores: $n complete rows for $k columns - the " +
        "covariance is rank-deficient by construction")
    val mu = Array.tabulate(k)(i => row.getAs[Double](s"m_$i"))
    val sd = Array.tabulate(k)(i => math.sqrt(row.getAs[Double](s"v_$i")))
    (0 until k).foreach { i =>
      if (!(sd(i) > 0)) throw new IllegalStateException(
        s"mahalanobisScores: column '${cols(i)}' is constant - drop it " +
          "(a zero-variance coordinate has no multivariate distance)")
    }
    // Standardize before inverting (the linearRegressionMulti
    // convention): Σ + ridge·I = D·A·D with D = diag(sd) and
    // A = correlation matrix + ridge/varᵢ on the diagonal, so pivots
    // are O(1) regardless of raw column scales and the singularity
    // threshold is scale-free. Σ⁻¹ = D⁻¹·A⁻¹·D⁻¹.
    val a = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0 + ridge / (sd(i) * sd(i))
      else row.getAs[Double](s"c_${math.min(i, j)}_${math.max(i, j)}") /
        (sd(i) * sd(j))
    }
    // Gauss-Jordan inverse with partial pivoting (deterministic: pivot
    // choice is argmax |column|, first index wins ties)
    val inv = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    for (p <- 0 until k) {
      var best = p
      for (r <- p + 1 until k)
        if (math.abs(a(r)(p)) > math.abs(a(best)(p))) best = r
      if (best != p) {
        val t = a(p); a(p) = a(best); a(best) = t
        val ti = inv(p); inv(p) = inv(best); inv(best) = ti
      }
      val piv = a(p)(p)
      if (!(math.abs(piv) > 1e-12))
        throw new IllegalStateException(
          s"mahalanobisScores: covariance is singular at pivot $p " +
            s"(columns are collinear) - pass ridge > 0 to regularize")
      for (j <- 0 until k) { a(p)(j) /= piv; inv(p)(j) /= piv }
      for (r <- 0 until k if r != p) {
        val f = a(r)(p)
        if (f != 0.0) for (j <- 0 until k) {
          a(r)(j) -= f * a(p)(j); inv(r)(j) -= f * inv(p)(j)
        }
      }
    }
    for (i <- 0 until k; j <- 0 until k) inv(i)(j) /= sd(i) * sd(j)
    val d = xs.zipWithIndex.map { case (x, i) => x - lit(mu(i)) }
    val quad = (for (i <- 0 until k; j <- 0 until k)
      yield lit(inv(i)(j)) * d(i) * d(j)).reduce(_ + _)
    df.withColumn("mahalanobis_d2", when(nonNull, quad))
  }
}
