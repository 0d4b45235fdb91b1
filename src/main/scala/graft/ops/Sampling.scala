package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.core.CacheHandle

/** Deterministic sampling for training-data pipelines: corpus mixing by
  * weight and exact per-stratum sampling. Everything here is a CLOSED
  * INTEGER FORMULA over the row id — no RNG state, no
  * partition-order dependence — so a mixture is exactly reproducible
  * across engines, re-runs, and cluster sizes, and an independent
  * engine can audit precisely which rows were kept (oracles
  * `sample_mixture`, `sample_stratified`).
  *
  * The selector is a Knuth multiplicative hash of the id, reduced
  * before the multiply so the product never overflows a signed 64-bit
  * in engines that check overflow (DuckDB): ids are assumed
  * non-negative (synthetic and snowflake-style ids are).
  */
object Sampling {

  /** Deterministic Bernoulli keep-test at `rate` ∈ [0, 1]:
    * keep ⇔ ((id mod 2²⁰) · 2654435761) mod 10⁶ < rate·10⁶. */
  def keepFraction(id: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    pmod(pmod(id, lit(1048576L)) * lit(2654435761L), lit(1000000L)) <
      lit(math.round(rate * 1e6))
  }

  /** Weighted corpus mixture: each source downsampled to its rate with
    * the deterministic selector, tagged with its name, unioned by name
    * with type widening. One scan per source, no shuffle beyond what
    * the union's consumers ask for. */
  def mixCorpora(sources: Seq[(DataFrame, Double, String)], idCol: String)
      : DataFrame = {
    require(sources.nonEmpty)
    graft.core.TypeWidening.unionByNameWide(sources.map {
      case (df, rate, tag) =>
        df.filter(keepFraction(col(idCol), rate))
          .withColumn("source", lit(tag))
    })
  }

  /** Deterministic train/val/test split: each row goes to the named
    * split whose cumulative-weight interval contains its selector value
    * — a disjoint, exhaustive partition (weights normalized to sum 1,
    * thresholds in integer millionths). Pure projection: no RNG, no
    * shuffle, reproducible across engines, re-runs, and cluster sizes,
    * and leakage-auditable — membership is a closed formula of the id,
    * so train/test contamination can be checked by any engine. */
  def splitByWeights(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], as: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splitByWeights: weights must be positive")
    val total = splits.map(_._2).sum
    val sel = pmod(pmod(col(idCol), lit(1048576L)) * lit(2654435761L),
      lit(1000000L))
    val cuts = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
      .dropRight(1).map(c => math.round(c * 1e6))
    val expr = cuts.zip(splits.init.map(_._1))
      .foldRight(lit(splits.last._1): Column) {
        case ((cut, name), rest) => when(sel < lit(cut), lit(name))
          .otherwise(rest)
      }
    df.withColumn(as, expr)
  }

  /** Deterministic k-fold assignment for cross-validation: fold i ∈
    * [0, k) from the first 8 hex digits of SHA-256 over the id's decimal
    * rendering (the [[gramBuckets]] discipline) — a pure scan-side
    * projection any engine with a sha256 primitive replays
    * integer-for-integer (no RNG state, no global sort, no shuffle), so
    * fold membership is stable across runs, engines and partitionings.
    * SHA mixing matters here: the [[splitByWeights]] Knuth selector is
    * affine mod k, which on SEQUENTIAL ids collapses to `id mod k` —
    * a systematic stride no one wants correlated with their folds.
    * Train/test for fold i = (fold =!= i, fold === i). For corpora with
    * near-duplicates, assign folds to CLUSTER labels (the
    * [[leakageSafeSplit]] discipline) rather than raw ids. */
  def kFold(df: DataFrame, idCol: String, k: Int, as: String = "fold")
      : DataFrame = {
    require(k >= 2, s"kFold: k must be >= 2, got $k")
    df.withColumn(as,
      (conv(substring(sha2(col(idCol).cast("string"), 256), 1, 8), 16, 10)
        .cast(LongType) % lit(k.toLong)).cast(IntegerType))
  }

  /** Leakage-safe out-of-fold TARGET ENCODING — the high-cardinality
    * categorical feature a tree/linear model actually wants: replace
    * `catCol` with the smoothed mean of `labelCol` computed WITHOUT the
    * row's own fold, so the encoding never sees the row's own label
    * (in-fold target means are the classic silent leak — the model
    * memorizes the label through its own feature). Row in fold f with
    * category c gets
    *   enc = ((S_c − S_cf)/10⁶ + m·prior_f) / ((N_c − N_cf) + m)
    * with S/N label-micro sums and non-null-label counts, `m` =
    * `smoothing` pseudo-observations of the prior mean. The prior is
    * ITSELF out-of-fold — prior_f = (S_all − S_f)/(N_all − N_f) over
    * all categories outside fold f — so not even the m·prior smoothing
    * term carries the row's own label (an in-fold global prior is a
    * small residual leak through exactly that term). Categories unseen
    * outside the row's fold (and null categories, which form their own
    * category) shrink fully to prior_f; a fold holding EVERY non-null
    * label (nothing out-of-fold to learn from) encodes null.
    * Folds are [[kFold]]'s SHA assignment: deterministic, stable
    * across runs/engines/partitionings, never correlated with
    * sequential ids. Appends (`fold`, `target_enc` 6dp).
    *
    * Exactness: label sums ride exact BIGINT micros (|label| ≤ ~9·10¹²
    * by the convention bound); prior and encoding are two mirrored
    * double divisions at the very end, so any engine re-deriving the
    * integer sums reproduces the 6dp value bit-for-bit.
    *
    * Scale shape: one (cat, fold) hash aggregate (map-side combined;
    * (cats·k)-sized), a cats-sized and a k-sized rollup of THAT frame
    * (both broadcast), and one join back on the null-safe cat key —
    * rows shuffle once. A hot category is one big join bucket (AQE
    * skew-split absorbs it); the aggregate side is immune (partials). */
  def targetEncode(df: DataFrame, idCol: String, catCol: String,
      labelCol: String, k: Int = 5, smoothing: Double = 20.0)
      : DataFrame = {
    require(k >= 2, s"targetEncode: k must be >= 2, got $k")
    require(smoothing > 0,
      "targetEncode: smoothing must be > 0 (m = 0 leaves unseen " +
        "categories undefined)")
    val lm = when(col(labelCol).isNotNull,
      round(col(labelCol).cast(DoubleType) * lit(1e6)).cast(LongType))
    val withFold = kFold(df, idCol, k)
    val byCatFold = withFold
      .groupBy(col(catCol).as("__c"), col("fold").as("__f"))
      .agg(coalesce(sum(lm), lit(0L)).as("__s_cf"),
        count(lm).as("__n_cf"))
    val byCat = byCatFold.groupBy(col("__c").as("__c2"))
      .agg(sum(col("__s_cf")).as("__s_c"), sum(col("__n_cf")).as("__n_c"))
    val byFold = broadcast(byCatFold.groupBy(col("__f").as("__f2"))
      .agg(sum(col("__s_cf")).as("__s_f"), sum(col("__n_cf")).as("__n_f")))
    val global = broadcast(byCatFold.agg(
      coalesce(sum(col("__s_cf")), lit(0L)).as("__s_all"),
      coalesce(sum(col("__n_cf")), lit(0L)).as("__n_all")))
    // null-SAFE key joins throughout: a null category is a real
    // category here, and USING-joins drop null keys
    val folds = byCatFold.join(byCat, col("__c") <=> col("__c2"))
      .drop("__c2").join(byFold, col("__f") === col("__f2")).drop("__f2")
      .crossJoin(global)
    val oofS = col("__s_c") - col("__s_cf")
    val oofN = col("__n_c") - col("__n_cf")
    // the prior excludes the row's own fold too: not even the m·prior
    // smoothing term may carry the row's own label
    val oofSAll = col("__s_all") - col("__s_f")
    val oofNAll = col("__n_all") - col("__n_f")
    val prior = (oofSAll.cast(DoubleType) / lit(1e6)) /
      oofNAll.cast(DoubleType)
    val enc = folds.select(col("__c"), col("__f"),
      when(oofNAll > 0L,
        round((oofS.cast(DoubleType) / lit(1e6) + lit(smoothing) * prior)
          / (oofN.cast(DoubleType) + lit(smoothing)), 6))
        .as("target_enc"))
    withFold.join(enc,
      col(catCol) <=> col("__c") && col("fold") === col("__f"), "left")
      .drop("__c", "__f")
  }

  /** Deterministic training-shard assignment: shard ∈ [0, nShards) and a
    * within-shard pseudo-random sort key, both from SHA-256 over
    * "seed:id" — the seeded, engine-replayable global shuffle a training
    * run needs (reference `shuffled()`, `DataFrame.kt:186`, re-expressed
    * for a corpus that cannot `orderBy(rand())`: at 100 TB "shuffled"
    * must mean a deterministic hash order that any engine, any run, any
    * partitioning reproduces — resumable data loading depends on it).
    * SHA mixing, not the affine Knuth selector: sequential ids must not
    * stride across shards ([[kFold]]'s argument). Changing `seed`
    * reshuffles globally. shard = first 8 hex digits mod nShards;
    * shard_ord = next 15 hex digits (60 bits, fits a signed long) —
    * independent digits, so within-shard order is uncorrelated with
    * shard choice. Pure scan-side projection: no RNG, no sort, no
    * shuffle. Compose with [[graft.sources.IO.writeShards]] for the
    * on-disk layout. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards >= 1, s"shardAssign: nShards must be >= 1, got $nShards")
    val h = sha2(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string")), 256)
    df.withColumn("shard",
        (conv(substring(h, 1, 8), 16, 10).cast(LongType) %
          lit(nShards.toLong)).cast(IntegerType))
      .withColumn("shard_ord",
        conv(substring(h, 9, 15), 16, 10).cast(LongType))
  }

  /** Leakage-safe train/val/test split: [[splitByWeights]] applied to
    * NEAR-DUP CLUSTER labels instead of row ids, so a document and all
    * its near-duplicates always land in the SAME split — the guard
    * against the classic eval-contamination failure where a test doc's
    * near-copy sits in train and the benchmark silently measures
    * memorization. Singleton docs (no near-dup edge) hash their own id
    * (cluster = id for them), so the weights still hold in expectation
    * over the corpus.
    *
    * Scale shape: [[Dedup.nearDupClusters]] does the heavy lifting
    * (banded LSH candidates, min-label propagation over edge-touched ids
    * only); the split itself is the same closed integer selector as
    * [[splitByWeights]] — deterministic, engine-auditable — evaluated on
    * the skinny (id, cluster) frame, then one join back on the id key.
    * Text never moves beyond what clustering itself shuffles. */
  def leakageSafeSplit(df: DataFrame, textCol: String, idCol: String,
      splits: Seq[(String, Double)], as: String = "split",
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8, maxIters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val clusters = Dedup.nearDupClusters(df, textCol, idCol, numHashes,
      bands, shingleN, minJaccard, maxIters, cache)
    val assigned = splitByWeights(
      clusters.select(col("id").as(idCol), col("cluster")),
      "cluster", splits, as)
    df.join(assigned.select(col(idCol), col(as)), Seq(idCol))
  }

  /** Deterministic weighted sampling WITHOUT replacement — priority
    * sampling (Duffield–Lund–Thorup): each row gets priority
    * p_i = w_i / u_i with u_i = (selector(id)+1)/10⁶ ∈ (0, 1]; the k
    * highest-priority rows are kept, and each kept row carries the
    * unbiased subset-sum estimator weight max(w_i, τ) where τ is the
    * (k+1)-th priority (0 when the input has ≤ k rows — then the sample
    * is exhaustive and estimator = true weight). Heavy rows are near-
    * certain picks, light rows keep proportional chances, and
    * Σ est_weight estimates Σ w over the FULL corpus from k rows — the
    * audit-friendly way to downsample a weighted corpus.
    *
    * Cross-engine exactness without trusting libm: the priority is built
    * ONLY from IEEE-correctly-rounded ops (integer→double, ×, ÷) — no
    * ln/pow as classic ES sampling would need — so every engine computes
    * bit-identical priorities and the top-k cut (tie-broken by id) is
    * identical everywhere.
    *
    * Scale shape: pure projection + TakeOrderedAndProject top-(k+1) —
    * per-partition heaps, only k+1 rows cross the wire; τ joins back as
    * a broadcast 1-row literal. Never a global sort. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "prioritySample: k must be > 0")
    val sel = pmod(pmod(col(idCol), lit(1048576L)) * lit(2654435761L),
      lit(1000000L))
    val withPri = df.withColumn("priority",
      col(weightCol).cast("double") * lit(1000000.0) /
        (sel + lit(1L)).cast("double"))
    val top = withPri.orderBy(col("priority").desc, col(idCol))
      .limit(k + 1).localCheckpoint()
    val tau = top.agg(count(lit(1)).as("__n"),
        min(col("priority")).as("__min"))
      .select(when(col("__n") === (k + 1), col("__min"))
        .otherwise(lit(0.0)).as("__tau"))
    top.orderBy(col("priority").desc, col(idCol)).limit(k)
      .crossJoin(broadcast(tau))
      .withColumn("est_weight",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__tau")
  }

  /** Exact k-per-stratum sample: within each stratum, rows are ranked by
    * (selector(id), id) — a deterministic pseudo-random total order —
    * and the first k kept. One hash shuffle on the strata keys; every
    * engine picks the IDENTICAL rows. */
  def stratifiedSampleExact(df: DataFrame, strata: Seq[String], k: Int,
      idCol: String, as: String = "sample_rank"): DataFrame = {
    require(k > 0 && strata.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val sel = pmod(pmod(col(idCol), lit(1048576L)) * lit(2654435761L),
      lit(1000000L))
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(sel, col(idCol))
    df.withColumn(as, row_number().over(w)).filter(col(as) <= k)
  }

  /** Token-budget sampling — corpus mixing by TOKEN share, not row count
    * (LLM mixtures are specified in tokens; a row quota over-weights
    * short-document sources). Within each group, rows are ranked by the
    * deterministic (selector(id), id) order and the maximal PREFIX whose
    * cumulative `tokenCol` stays ≤ `budget` is kept, with the running
    * total exposed as `as`.
    *
    * PREFIX semantics, deliberately: the cut is "sum of everything kept
    * so far ≤ budget", never a greedy skip-over-the-big-row backfill —
    * skip-greedy is order-fragile knapsack that no independent engine
    * can replay from a window spec, while the prefix rule is ONE
    * cumulative-sum window any engine reproduces row-for-row. A
    * document larger than the whole budget therefore blocks its tail —
    * size budgets above the max document (or pre-split with
    * `chunkTokenWindows`).
    *
    * Scale shape: one hash shuffle on the group keys; the cumulative sum
    * is a single sort-based window per group — no global sort, no
    * driver-side accumulation; group sizes bound the per-task sort, the
    * same contract as every grouped window here. */
  def sampleToTokenBudget(df: DataFrame, groupCols: Seq[String],
      tokenCol: String, idCol: String, budget: Long,
      as: String = "cum_tokens"): DataFrame = {
    require(budget > 0, "sampleToTokenBudget: budget must be > 0")
    require(groupCols.nonEmpty, "sampleToTokenBudget: no group columns")
    import org.apache.spark.sql.expressions.Window
    val sel = pmod(pmod(col(idCol), lit(1048576L)) * lit(2654435761L),
      lit(1000000L))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(sel, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(col(tokenCol)).over(w))
      .filter(col(as) <= budget)
  }

  // ---- DSIR importance selection ------------------------------------

  /** Hashed n-gram feature buckets (word unigrams + adjacent bigrams),
    * the DSIR feature space: bucket(g) = first 8 hex chars of
    * SHA-256(g) parsed as an integer, mod `buckets`. SHA-256 is the
    * repo's cross-engine hash convention (see `contentKey`): any engine
    * reproduces the exact bucket ids, so feature extraction — not just
    * the final answer — is independently auditable. Scan-side array
    * expression, no shuffle, no UDF. */
  def gramBuckets(text: Column, buckets: Int): Column = {
    val t = graft.functions.TextFunctions.tokens(text)
    // zip_with gram join (no token subtree captured in a lambda — the
    // gramsOfTokens convention); < 2 tokens yields [] structurally
    val bigrams = when(size(t) >= 2,
      graft.functions.TextFunctions.gramsOfTokens(t, 2))
      .otherwise(array().cast("array<string>"))
    transform(concat(t, bigrams), g =>
      conv(substring(sha2(g, 256), 1, 8), 16, 10).cast("long")
        % lit(buckets.toLong))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): every raw doc is
    * scored by how target-like its hashed n-gram profile is —
    * score(doc) = Σ_grams log( p_target(bucket) / p_raw(bucket) ), with
    * add-`alpha` smoothing over the `buckets`-bucket feature space.
    *
    * Cross-engine exactness: per-bucket log-ratios round to integer
    * MICRO-units before any summation (the `lmScore` convention), so
    * doc scores are exact BIGINT sums — no float-accumulation-order
    * noise — and DuckDB re-derives identical scores from the same
    * integer bucket counts (oracle `sample_dsir`).
    *
    * Scale shape: both corpora scan ONCE into skinny (id, bucket) long
    * pairs; the bucket statistics collapse to `buckets` rows (map-side
    * partial count → one tiny shuffle) and ride back as a BROADCAST
    * join table; totals are broadcast 1-row aggregates (no driver
    * scalar); the per-doc aggregation shuffles (id, long) pairs only.
    * Text never moves after the first explode. Docs with no grams
    * (null/empty text) keep score 0 and n_grams 0 — scoring is total,
    * downstream joins never lose rows.
    *
    * Output: (idCol, n_grams, score_micro, score = score_micro/1e6 at
    * 6dp). Higher score = more target-like. */
  def importanceScores(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 1024, alpha: Double = 0.5): DataFrame = {
    require(buckets >= 2, "importanceScores: need at least 2 buckets")
    require(alpha > 0, "importanceScores: alpha must be > 0 (unseen buckets)")
    val rawB = raw.select(col(idCol),
      explode(gramBuckets(col(textCol), buckets)).as("__bucket"))
    val tgtB = target.select(
      explode(gramBuckets(col(textCol), buckets)).as("__bucket"))
    val cRaw = rawB.groupBy(col("__bucket")).agg(count(lit(1)).as("__cr"))
    val cTgt = tgtB.groupBy(col("__bucket")).agg(count(lit(1)).as("__ct"))
    val tRaw = rawB.agg(count(lit(1)).as("__tr"))
    val tTgt = tgtB.agg(count(lit(1)).as("__tt"))
    // dense bucket spine: unseen buckets still get a smoothed ratio
    val spine = raw.sparkSession.range(buckets.toLong)
      .select(col("id").as("__bucket"))
    val ab = lit(alpha * buckets)
    val table = spine
      .join(cRaw, Seq("__bucket"), "left").join(cTgt, Seq("__bucket"), "left")
      .crossJoin(broadcast(tRaw)).crossJoin(broadcast(tTgt))
      .select(col("__bucket"),
        round(log(((coalesce(col("__ct"), lit(0L)) + lit(alpha)) *
                   (col("__tr") + ab)) /
                  ((coalesce(col("__cr"), lit(0L)) + lit(alpha)) *
                   (col("__tt") + ab))) * lit(1e6))
          .cast(LongType).as("__lr_micro"))
    val perDoc = rawB.join(broadcast(table), Seq("__bucket"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_grams"),
        sum(col("__lr_micro")).as("score_micro"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .withColumn("score", round(col("score_micro") / lit(1e6), 6))
  }

  /** DSIR selection: keep the `n` most target-like raw docs by
    * importance score, deterministic tie-break on id. orderBy + limit
    * plans as TakeOrderedAndProject — a per-partition heap + driver
    * merge of n rows, NEVER a global sort (the same guarantee
    * `prioritySample` documents). */
  def dsirSelect(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, n: Int, buckets: Int = 1024,
      alpha: Double = 0.5): DataFrame = {
    require(n > 0, "dsirSelect: n must be > 0")
    importanceScores(raw, target, textCol, idCol, buckets, alpha)
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(n)
  }

  /** Temperature-scaled mixture plan (the multilingual/multi-source
    * sampling rule of mBERT/XLM-R/Gopher: sample source i with
    * probability ∝ cᵢ^α, α ∈ (0, 1] — α=1 is natural proportions, lower
    * α up-weights small sources). Rolls the corpus up to per-source
    * token totals and emits the MIXING TABLE a training-data scheduler
    * consumes: (source, tokens, weight_micro, target_tokens,
    * repeat_factor) where target_tokens splits `tokenBudget` by the
    * α-scaled weights and repeat_factor = target/actual is the epoch
    * multiplier (>1 ⇒ the source repeats, the small-language oversampling
    * effect α exists to produce).
    *
    * Cross-engine exactness: cᵢ^α rounds to integer MICRO units BEFORE
    * normalization (the lmScore convention) — with the default α = 0.5
    * the power is `sqrt`, correctly rounded by IEEE 754 in every engine,
    * so the micro weights are bit-reproducible; weight_micro divides
    * exact BIGINTs and target_tokens parenthesizes as
    * round(budget · (weight_micro / 10⁶)) — one double product both
    * engines evaluate identically. General α uses pow (documented
    * half-ulp caveat; the oracle pins α = 0.5).
    *
    * Scale shape: ONE partial-aggregated count shuffle over the corpus
    * (skinny (source, n) pairs); everything after runs on the
    * sources-sized frame — the 1-row total joins back as a broadcast
    * cross, the 100 TB of text never moves. */
  def temperatureMixture(df: DataFrame, sourceCol: String,
      tokenCol: String, tokenBudget: Long, alpha: Double = 0.5)
      : DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperatureMixture: alpha in (0,1]")
    require(tokenBudget > 0, "temperatureMixture: budget must be > 0")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol)).as("tokens"))
    val powered = if (alpha == 0.5) sqrt(col("tokens").cast("double"))
      else pow(col("tokens").cast("double"), lit(alpha))
    val scaled = counts.withColumn("__s",
      round(powered * lit(1e6)).cast("long"))
    val total = scaled.agg(sum(col("__s")).as("__t"))
    scaled.crossJoin(broadcast(total))
      .withColumn("weight_micro",
        round(col("__s").cast("double") * lit(1e6) /
          col("__t").cast("double")).cast("long"))
      .withColumn("target_tokens",
        round(lit(tokenBudget.toDouble) *
          (col("weight_micro").cast("double") / lit(1e6))).cast("long"))
      .withColumn("repeat_factor",
        round(col("target_tokens").cast("double") /
          col("tokens").cast("double"), 4))
      .select(col("source"), col("tokens"), col("weight_micro"),
        col("target_tokens"), col("repeat_factor"))
  }
}
