package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus/label QA metrics for training-data pipelines: distribution
  * drift between corpora and inter-annotator agreement. Both follow the
  * repo's cross-engine determinism conventions — per-term log
  * contributions round to integer NANO-units before summing (exact
  * BIGINT aggregates regardless of reduction order), pure-rational
  * ratios round to 6dp from mirrored operation orders.
  */
object Eval {

  /** Jensen–Shannon divergence between two corpora's term
    * distributions — the standard "did my data drift" metric (source
    * vs source, epoch vs epoch, pre- vs post-filter):
    * JSD(P‖Q) = ½Σ p·ln(p/m) + ½Σ q·ln(q/m), m = (p+q)/2, in nats;
    * bounded by ln 2, 0 iff identical distributions. Returns ONE row
    * (n_terms, jsd_nano, jsd): each term's contribution rounds to
    * integer nanos BEFORE the sum (the lm_perplexity convention at 1e9
    * — drift metrics need the extra headroom since contributions are
    * tiny), so the aggregate is an exact BIGINT any engine re-derives;
    * `jsd` divides the exact integer by 1e9 (round 6dp).
    *
    * Scale shape: each corpus collapses to its vocabulary ONCE (explode
    * → count shuffle with map-side partials — the only corpus-sized
    * work); vocabularies full-outer join on the word key (vocab-sized,
    * ≪ corpus); totals ride a broadcast 1-row cross join; the final sum
    * reduces vocab-sized (term, nano) pairs. Text never moves after the
    * explode. */
  def corpusDivergence(a: DataFrame, b: DataFrame, textCol: String)
      : DataFrame = {
    def counts(df: DataFrame, cn: String, tn: String): (DataFrame, DataFrame) = {
      val w = df.select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      (w.groupBy(col("w")).agg(count(lit(1)).as(cn)),
        w.agg(count(lit(1)).as(tn)))
    }
    val (ca, na) = counts(a, "ca", "na")
    val (cb, nb) = counts(b, "cb", "nb")
    val joined = ca.join(cb, Seq("w"), "full_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("w"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        col("na"), col("nb"))
    val p = col("ca") / col("na")
    val q = col("cb") / col("nb")
    val m = (p + q) / lit(2.0)
    val contrib =
      when(col("ca") > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
        when(col("cb") > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))
    joined
      .select(col("w"),
        round(contrib * lit(1e9)).cast(LongType).as("nano"))
      .agg(count(lit(1)).as("n_terms"), sum(col("nano")).as("jsd_nano"))
      .withColumn("jsd", round(col("jsd_nano") / lit(1e9), 6))
  }

  /** Exact AUC-ROC of a score column against a binary label — the
    * threshold-free classifier metric (quality/toxicity classifier QA).
    * Mann–Whitney formulation with exact tie handling: collapse the
    * corpus to per-DISTINCT-SCORE (positives, negatives) counts first —
    * the scale move: the only corpus-sized work is ONE count shuffle,
    * and the rank arithmetic runs over distinct scores (≪ corpus) —
    * then U = Σ_s p_s·(N_below(s) + n_s/2), AUC = U/(P·N). Returns ONE
    * row (n, positives, negatives, auc 6dp); degenerate single-class
    * input yields null auc. Ordering ascending by score; ties
    * contribute the exact ½ credit, no randomization. */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u = byScore
      .withColumn("n_below", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(
        sum(col("p") + col("n")).as("n_rows"),
        sum(col("p")).as("positives"),
        sum(col("n")).as("negatives"),
        sum(col("p") * (col("n_below") + col("n") / lit(2.0))).as("u"))
    u.select(col("n_rows").as("n"), col("positives"), col("negatives"),
      when(col("positives") > 0 && col("negatives") > 0,
        round(col("u") / (col("positives") * col("negatives")), 6))
        .otherwise(lit(null).cast(DoubleType)).as("auc"))
  }

  /** Average precision (PR-AUC) — the ranking metric that matters when
    * positives are RARE (quality/toxicity filters at real-world base
    * rates, where ROC-AUC flatters): AP = Σ_s ΔRecall(s)·Precision(s)
    * over distinct scores in DESCENDING order (sklearn's
    * `average_precision_score` step rule; ties grouped at their score,
    * no interpolation). Same scale shape as [[aucRoc]]: ONE count
    * shuffle collapses the corpus to per-distinct-score (pos, neg)
    * counts, the running sums walk distinct scores only. Each term
    * rounds to integer NANOS before the final sum (exact BIGINT — the
    * term product is inexact, so order-free summation needs the
    * convention). Returns (n, positives, negatives, ap 6dp); no
    * positives → null ap. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = byScore
      .withColumn("tp", sum(col("p")).over(w))
      .withColumn("fp", sum(col("n")).over(w))
    val tot = walked.agg(sum(col("p")).as("pos_t"), sum(col("n")).as("neg_t"))
    val terms = walked.crossJoin(broadcast(tot))
      .select(col("pos_t"), col("neg_t"),
        // guard BEFORE the division: under ANSI, p/0 throws, and the
        // zero-positive case must fall through to the null ap below
        when(col("pos_t") > 0,
          round((col("p") / col("pos_t")) *
            (col("tp") / (col("tp") + col("fp"))) * lit(1e9))
            .cast(LongType))
          .otherwise(lit(0L)).as("nano"))
    terms
      .groupBy(col("pos_t"), col("neg_t"))
      .agg(sum(col("nano")).as("ap_nano"))
      .select((col("pos_t") + col("neg_t")).as("n"),
        col("pos_t").as("positives"), col("neg_t").as("negatives"),
        when(col("pos_t") > 0, round(col("ap_nano") / lit(1e9), 6))
          .otherwise(lit(null).cast(DoubleType)).as("ap"))
  }

  /** Probability-calibration report for a [0,1] score column: global
    * Brier score + per-bin reliability (n, mean predicted, observed
    * positive rate). Determinism: per-row (p−y)² and p round to integer
    * NANOS before summing (exact BIGINT aggregates, order-free); ratios
    * round 6dp. Bin = floor(p·bins) clamped so p = 1.0 lands in the top
    * bin. ONE count shuffle on the bin key; the global row is a rollup
    * of the bins. Returns one row per non-empty bin:
    * (bin, n, mean_pred, frac_pos, brier) — brier repeated per row
    * (engines compare it everywhere, and the report stays one frame). */
  def calibrationReport(df: DataFrame, probCol: String, labelCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, "calibrationReport: bins must be >= 1")
    val p = col(probCol)
    val y = col(labelCol).cast(DoubleType)
    val binned = df
      .where(p.isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(p * lit(bins)).cast(IntegerType), lit(bins - 1))
          .as("bin"),
        round(p * lit(1e9)).cast(LongType).as("p_nano"),
        round((p - y) * (p - y) * lit(1e9)).cast(LongType).as("sq_nano"),
        when(col(labelCol) === 1, 1L).otherwise(0L).as("pos"))
    val perBin = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      sum(col("p_nano")).as("pn"),
      sum(col("sq_nano")).as("sn"),
      sum(col("pos")).as("np"))
    val tot = perBin.agg(sum(col("n")).as("nt"), sum(col("sn")).as("st"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(col("pn") / lit(1e9) / col("n"), 6).as("mean_pred"),
        round(col("np") / col("n").cast(DoubleType), 6).as("frac_pos"),
        round(col("st") / lit(1e9) / col("nt"), 6).as("brier"))
  }

  /** Quadratic WEIGHTED kappa over ordinal labels (Cohen 1968) — the
    * agreement metric when disagreeing by one band should cost less
    * than disagreeing by three (ratings, quality tiers):
    * κ_w = 1 − Σ w_ij·o_ij / Σ w_ij·e_ij, w_ij = (i−j)²/(k−1)², with
    * e the outer product of the marginals. `order` fixes the label →
    * index mapping (labels outside it are excluded). Same scale shape
    * as [[agreementKappa]]: one contingency shuffle, everything after
    * rolls up the counted cells; the e-matrix join is label² rows.
    * Exact integer/rational arithmetic until the final 6dp rounds
    * (weighted sums carry (i−j)² as integers; the /(k−1)² constant
    * cancels in the ratio, so it is never materialized). Returns ONE
    * row (n, po_w, pe_w, kappa_w) with po_w/pe_w the weighted
    * DISagreement rates (6dp), κ_w from the rounded pair. */
  def weightedKappa(df: DataFrame, aCol: String, bCol: String,
      order: Seq[String]): DataFrame = {
    require(order.size >= 2, "weightedKappa: need >= 2 ordered labels")
    require(order.distinct.size == order.size,
      "weightedKappa: order must not repeat labels")
    def idx(c: Column): Column = order.zipWithIndex.foldLeft(
      lit(null).cast(IntegerType)) { case (acc, (l, i)) =>
        when(c === l, lit(i)).otherwise(acc) }
    val cell = df
      .select(idx(col(aCol)).as("ia"), idx(col(bCol)).as("ib"))
      .where(col("ia").isNotNull && col("ib").isNotNull)
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))
    val n = cell.agg(sum(col("c")).as("n"))
    val wObs = cell.agg(sum(
      (col("ia") - col("ib")) * (col("ia") - col("ib")) * col("c"))
      .as("wo"))
    val ma = cell.groupBy(col("ia")).agg(sum(col("c")).as("ca"))
    val mb = cell.groupBy(col("ib")).agg(sum(col("c")).as("cb"))
    val wExp = ma.crossJoin(mb).agg(sum(
      (col("ia") - col("ib")) * (col("ia") - col("ib")) *
        col("ca") * col("cb")).as("we"))
    val row = n.crossJoin(broadcast(wObs)).crossJoin(broadcast(wExp))
    // po_w = Σw·o/n, pe_w = Σw·e/n² (the /(k−1)² normalizer cancels in
    // κ_w = 1 − po_w/pe_w, so neither engine materializes it)
    row.select(col("n"),
        round(col("wo") / col("n"), 6).as("po_w"),
        round(col("we") / col("n") / col("n"), 6).as("pe_w"))
      .withColumn("kappa_w",
        when(col("pe_w") === 0.0, lit(1.0))
          .otherwise(round(lit(1.0) - col("po_w") / col("pe_w"), 6)))
  }

  /** Per-class precision/recall/F1 against a truth column — the
    * classifier-QA report for label pipelines (quality classifiers,
    * lang-id, toxicity tags). Returns one row per label seen in EITHER
    * column: (label, support, tp, fp, fn, precision, recall, f1);
    * support = truth occurrences, fp/fn derived from the marginals
    * (fp = predicted − tp, fn = support − tp), ratios rounded 6dp with
    * 0.0 on empty denominators, f1 from the ROUNDED p/r (mirrored by
    * the oracle). Null in either column excludes the row.
    *
    * Scale shape: ONE corpus-sized shuffle builds the (truth, pred)
    * contingency cells; everything after — label set, diagonal,
    * marginals — rolls up the already-counted cells (label space ≪
    * corpus), joined on the label key. */
  def classificationReport(df: DataFrame, truthCol: String,
      predCol: String): DataFrame = {
    val cell = df
      .where(col(truthCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("c"))
    val labels = cell.select(col("t").as("label"))
      .union(cell.select(col("p").as("label"))).distinct()
    val tp = cell.where(col("t") === col("p"))
      .select(col("t").as("label"), col("c").as("tp"))
    val truthTot = cell.groupBy(col("t").as("label"))
      .agg(sum(col("c")).as("support"))
    val predTot = cell.groupBy(col("p").as("label"))
      .agg(sum(col("c")).as("predicted"))
    val j = labels
      .join(tp, Seq("label"), "left")
      .join(truthTot, Seq("label"), "left")
      .join(predTot, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("predicted"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
    val p = when(col("tp") + col("fp") > 0,
      round(col("tp") / (col("tp") + col("fp")), 6)).otherwise(lit(0.0))
    val r = when(col("support") > 0,
      round(col("tp") / col("support"), 6)).otherwise(lit(0.0))
    j.withColumn("precision", p).withColumn("recall", r)
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6))
          .otherwise(lit(0.0)))
  }

  /** Cohen's kappa between two categorical label columns over the same
    * rows — the inter-annotator / model-vs-model agreement measure that
    * corrects for chance: κ = (p_o − p_e)/(1 − p_e) with p_o the
    * observed agreement rate and p_e = Σ_k (n_ak/n)(n_bk/n) the
    * chance-agreement from the marginals. Returns ONE row
    * (n, po, pe, kappa), ratios rounded 6dp (κ from the ROUNDED po/pe,
    * mirrored by the oracle; 1.0 when p_e = 1 — total single-label
    * agreement, the 0/0 edge).
    *
    * Scale shape: ONE corpus-sized shuffle builds the (a, b)
    * contingency table with map-side partials; the marginals and the
    * agreement diagonal are rollups of the ALREADY-counted cells (the
    * PMI-marginals pattern — label space ≪ corpus), combined through
    * broadcast 1-row aggregates. Nulls: rows where either label is null
    * are excluded (agreement over labeled rows only). */
  def agreementKappa(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cell = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("c"))
    val n = cell.agg(sum(col("c")).as("n"))
    val agree = cell.where(col("la") === col("lb"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("ag"))
    val ma = cell.groupBy(col("la")).agg(sum(col("c")).as("na_k"))
    val mb = cell.groupBy(col("lb")).agg(sum(col("c")).as("nb_k"))
    val peSum = ma.join(mb, col("la") === col("lb"))
      .agg(coalesce(sum(col("na_k") * col("nb_k")), lit(0L)).as("pp"))
    val row = n.crossJoin(broadcast(agree)).crossJoin(broadcast(peSum))
    val po = round(col("ag") / col("n"), 6)
    val pe = round(col("pp") / col("n") / col("n"), 6)
    row.select(col("n"), po.as("po"), pe.as("pe"))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(1.0))
          .otherwise(round((col("po") - col("pe")) / (lit(1.0) - col("pe")),
            6)))
  }

  /** Two-proportion A/B test (pooled z): one row
    * (n_a, conv_a, n_b, conv_b, rate_a_micro, rate_b_micro, lift_micro,
    * z_nano) comparing conversion between the `aVal` and `bVal` groups
    * of `groupCol` — the experiment read-out behind every data-driven
    * filter/ranking rollout decision. lift = rate_b − rate_a;
    * z = lift / √(p̂(1−p̂)(1/n_a+1/n_b)) with p̂ the pooled rate
    * (null when either group is empty or p̂ ∈ {0, 1} — a degenerate
    * pool has no variance). |z| ≥ 1.96 ⇒ p < 0.05 two-sided.
    *
    * Exactness: counts are exact BIGINTs from ONE fused conditional
    * aggregation (no per-group pass); every derived stat is a fixed
    * parenthesization over those integers, micro/nano-rounded — any
    * engine holding the counts reproduces the row bit-for-bit.
    * Scale shape: one 1-row aggregate scan; nothing else. */
  def abTest(df: DataFrame, groupCol: String, convCol: Column,
      aVal: String, bVal: String): DataFrame = {
    val g = col(groupCol)
    val conv = coalesce(convCol.cast("boolean"), lit(false)).cast("long")
    val one = df.where(g === aVal || g === bVal).agg(
      sum(when(g === aVal, 1L).otherwise(0L)).as("n_a"),
      sum(when(g === aVal, conv).otherwise(0L)).as("conv_a"),
      sum(when(g === bVal, 1L).otherwise(0L)).as("n_b"),
      sum(when(g === bVal, conv).otherwise(0L)).as("conv_b"))
    val na = coalesce(col("n_a"), lit(0L)).cast(DoubleType)
    val nb = coalesce(col("n_b"), lit(0L)).cast(DoubleType)
    val ca = coalesce(col("conv_a"), lit(0L)).cast(DoubleType)
    val cb = coalesce(col("conv_b"), lit(0L)).cast(DoubleType)
    // nullif-guarded: under ANSI a 0/0 throws, and subexpression
    // elimination evaluates these even inside a false when() branch
    val ra = ca / nullif(na, lit(0.0))
    val rb = cb / nullif(nb, lit(0.0))
    val pool = (ca + cb) / nullif(na + nb, lit(0.0))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / nullif(na, lit(0.0)) + lit(1.0) / nullif(nb, lit(0.0))))
    one.select(
      coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("conv_a"), lit(0L)).as("conv_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      coalesce(col("conv_b"), lit(0L)).as("conv_b"),
      when(na > 0, round(ra * lit(1e6)).cast("long"))
        .otherwise(lit(null).cast("long")).as("rate_a_micro"),
      when(nb > 0, round(rb * lit(1e6)).cast("long"))
        .otherwise(lit(null).cast("long")).as("rate_b_micro"),
      when(na > 0 && nb > 0, round((rb - ra) * lit(1e6)).cast("long"))
        .otherwise(lit(null).cast("long")).as("lift_micro"),
      when(na > 0 && nb > 0 && pool > 0.0 && pool < 1.0,
        round((rb - ra) / se * lit(1e9)).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_nano"))
  }

  /** Fleiss' kappa (1971) — chance-corrected agreement for MANY raters
    * per item, the multi-annotator sibling of [[agreementKappa]] (which
    * handles exactly two): the labeling-QA gate when every doc gets 3+
    * crowd/model judgments. Requires the same rater count n on every
    * item (the statistic is undefined otherwise) — verified with a
    * 1-row aggregate and failed FAST, never silently averaged away.
    *
    * Exactness: both observed and expected agreement are ratios of
    * exact BIGINT aggregates (A = Σᵢ Σ_c n_ic(n_ic−1),
    * B = Σ_c (Σᵢ n_ic)²), combined in DOUBLE with a fixed
    * parenthesization — Po = A/(N·n·(n−1)), Pe = B/(N·n)²,
    * κ = (Po−Pe)/(1−Pe), each rounded 6dp — so any engine holding the
    * integers (exact under 2⁵³ ratings — beyond any labeling campaign)
    * reproduces the row bit-for-bit. Perfect expected agreement
    * (Pe = 1: every rating one category) pins κ = 1.
    *
    * Scale shape: ONE hash aggregation on (item, label) builds the
    * contingency cells; every later frame is cells-, items- or
    * categories-sized; the scalars meet in a broadcast-joined 1-row
    * frame. Output: (n_items, n_raters, po, pe, kappa). */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String)
      : DataFrame = {
    val cells = df.groupBy(col(itemCol).as("item"), col(labelCol).as("lab"))
      .agg(count(lit(1)).as("nic"))
    val perItem = cells.groupBy(col("item"))
      .agg(sum(col("nic")).as("n"),
        sum(col("nic") * (col("nic") - lit(1L))).as("a_i"))
    val raterCounts = perItem.select(col("n")).distinct().limit(2)
      .collect().map(_.getLong(0))
    require(raterCounts.length == 1,
      s"fleissKappa: unequal rater counts per item " +
        s"(saw ${raterCounts.mkString(", ")}…)")
    val n = raterCounts.head
    require(n >= 2, "fleissKappa: need >= 2 raters per item")
    val top = perItem.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("a_i")), lit(0L)).as("a"))
    val marg = cells.groupBy(col("lab"))
      .agg(sum(col("nic")).as("s_c"))
      .agg(coalesce(sum(col("s_c") * col("s_c")), lit(0L)).as("b"))
    top.crossJoin(broadcast(marg))
      .select(col("n_items"), lit(n).as("n_raters"),
        round(col("a").cast(DoubleType) /
          (col("n_items") * lit(n) * lit(n - 1L)).cast(DoubleType), 6)
          .as("po"),
        round(col("b").cast(DoubleType) /
          ((col("n_items") * lit(n)) * (col("n_items") * lit(n)))
            .cast(DoubleType), 6).as("pe"))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(1.0))
          .otherwise(round((col("po") - col("pe")) /
            (lit(1.0) - col("pe")), 6)))
  }

  /** MUTUAL INFORMATION between two categorical columns — the
    * dependence STRENGTH gauge ([[graft.ops.Quality.chiSquareDrift]]'s
    * χ² answers "is there dependence"; MI answers "how many nats does
    * knowing A tell you about B" — the feature-selection / leakage-
    * audit number: a metadata column with high MI against the label is
    * a leak). ONE row: (n, h_a_nano, h_b_nano, mi_nano, nmi_micro) —
    * entropies and MI in integer NANO-nats (per-cell contributions
    * round BEFORE summing, the JSD convention, so any reduction order
    * and engine agree), NMI = MI/√(H_a·H_b) ∈ [0,1] in micros (0 when
    * either margin is deterministic — one level has no uncertainty to
    * explain). Null is a real level on both axes ("(null)" sentinel).
    *
    * Scale shape: one (a, b) cell-count shuffle over the data with
    * map-side partials; margins re-aggregate the CELL frame (never the
    * data) through broadcast-joined 1-row totals — since r14 the
    * cells-frame windows are gone entirely (the
    * [[informationGainReport]] shape), so nothing in this operator
    * ever plans a single-partition window. Everything after the first
    * shuffle is cells-scale — |A|·|B| by contract (two categorical
    * axes). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    def level(c: String): Column =
      coalesce(col(c).cast("string"), lit("(null)"))
    val cells = df.select(level(aCol).as("a"), level(bCol).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val ma = cells.groupBy(col("a")).agg(sum(col("c")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val tot = broadcast(cells.agg(
      coalesce(sum(col("c")), lit(0L)).as("nt")))
    val nD = col("nt").cast(DoubleType)
    val cD = col("c").cast(DoubleType)
    val mi = cells.join(ma, Seq("a")).join(mb, Seq("b")).crossJoin(tot)
      .withColumn("__t", round(cD / nD *
        log(cD * nD / (col("ca").cast(DoubleType) *
          col("cb").cast(DoubleType))) * lit(1e9)).cast(LongType))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n"),
        sum(col("__t")).as("mi_nano"))
    def entropy(m: DataFrame, cnt: String, as: String): DataFrame =
      m.crossJoin(tot)
        .withColumn("__h", round(-(col(cnt).cast(DoubleType) / nD) *
          log(col(cnt).cast(DoubleType) / nD) * lit(1e9))
          .cast(LongType))
        .agg(coalesce(sum(col("__h")), lit(0L)).as(as))
    mi.crossJoin(broadcast(entropy(ma, "ca", "h_a_nano")))
      .crossJoin(broadcast(entropy(mb, "cb", "h_b_nano")))
      .select(col("n"), col("h_a_nano"), col("h_b_nano"), col("mi_nano"),
        when(col("h_a_nano") <= 0L || col("h_b_nano") <= 0L, lit(0L))
          .otherwise(round(col("mi_nano").cast(DoubleType) * lit(1e6) /
            sqrt(col("h_a_nano").cast(DoubleType) *
              col("h_b_nano").cast(DoubleType))).cast(LongType))
          .as("nmi_micro"))
  }

  /** Information-gain feature ranking — [[mutualInformation]] swept
    * across many feature columns against one label in a single job:
    * which columns carry label signal at all, the first question of
    * feature selection and the "is this metadata column worth keeping"
    * question of corpus curation. One row per feature, ranked by mutual
    * information: (feature, n, mi_nano, mi, h_label_nano,
    * h_feature_nano, explained_micro) where explained = MI/H(label),
    * the share of label entropy the feature resolves (10⁶ = the
    * feature determines the label; 0 = independent).
    *
    * Same conventions as [[mutualInformation]]: values and labels are
    * compared as strings with null a real level ("(null)"); per-cell
    * contributions round to integer NANO-nats before the exact BIGINT
    * sum (reduction-order-proof; engine ln ulp sits 7 orders below the
    * quantum).
    *
    * Scale shape: one scan-side unpivot to (feature, value, label)
    * triples, ONE (f, v, l) cell-count shuffle (map-side combined),
    * then margins re-aggregate the CELLS frame (never the rows) with
    * every join keyed by feature — no unpartitioned windows, features
    * rank in parallel. Adding a 20th feature costs scan width, not a
    * pass. */
  def informationGainReport(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty,
      "informationGainReport: no feature columns given")
    def level(c: Column): Column =
      coalesce(c.cast("string"), lit("(null)"))
    val pairs = df.select(explode(array(featureCols.map(f =>
        struct(lit(f).as("f"), level(col(f)).as("v"))): _*)).as("p"),
        level(col(labelCol)).as("l"))
      .select(col("p.f").as("f"), col("p.v").as("v"), col("l"))
    val cells = pairs.groupBy(col("f"), col("v"), col("l"))
      .agg(count(lit(1)).as("c"))
    val mv = cells.groupBy(col("f"), col("v")).agg(sum(col("c")).as("cv"))
    val ml = cells.groupBy(col("f"), col("l")).agg(sum(col("c")).as("cl"))
    val nf = cells.groupBy(col("f")).agg(sum(col("c")).as("n"))
    val cD = col("c").cast(DoubleType)
    val nD = col("n").cast(DoubleType)
    val mi = cells.join(mv, Seq("f", "v")).join(ml, Seq("f", "l"))
      .join(nf, Seq("f"))
      .withColumn("__t", round(cD / nD *
        log(cD * nD / (col("cv").cast(DoubleType) *
          col("cl").cast(DoubleType))) * lit(1e9)).cast(LongType))
      .groupBy(col("f")).agg(sum(col("__t")).as("mi_nano"))
    def entropy(m: DataFrame, cnt: String, as: String): DataFrame =
      m.join(nf, Seq("f"))
        .withColumn("__h", round(-(col(cnt).cast(DoubleType) / nD) *
          log(col(cnt).cast(DoubleType) / nD) * lit(1e9)).cast(LongType))
        .groupBy(col("f")).agg(coalesce(sum(col("__h")), lit(0L)).as(as))
    nf.join(mi, Seq("f")).join(entropy(ml, "cl", "h_label_nano"), Seq("f"))
      .join(entropy(mv, "cv", "h_feature_nano"), Seq("f"))
      .select(col("f").as("feature"), col("n"), col("mi_nano"),
        round(col("mi_nano") / lit(1e9), 6).as("mi"),
        col("h_label_nano"), col("h_feature_nano"),
        when(col("h_label_nano") > 0L,
          round(col("mi_nano").cast(DoubleType) * lit(1e6) /
            col("h_label_nano").cast(DoubleType)).cast(LongType))
          .otherwise(lit(0L)).as("explained_micro"))
      .orderBy(col("mi_nano").desc, col("feature"))
  }

  /** Two-sample MANN–WHITNEY U (Wilcoxon rank-sum) test — the
    * nonparametric "is A stochastically larger than B" companion to
    * [[abTest]] (which needs a binary conversion; this ranks any
    * ordinal metric, immune to outliers and monotone rescaling). ONE
    * row: (n_a, n_b, cles_micro, z_micro) —
    * cles = U_a/(n_a·n_b) ∈ [0,1], the common-language effect size
    * (= P(a > b) + ½P(a = b), the AUC identity; 0.5 = no effect);
    * z the tie-corrected normal approximation (positive = A larger),
    * valid for n ≳ 20 per side. All-tied input (σ = 0) yields z = 0.
    *
    * Exactness: ranks never materialize per row — per DISTINCT value,
    * the tied block's doubled rank sum 2·cumT − t + 1 is an exact
    * integer, and Σ n_a·(2·cumT − t + 1) = 2·R_a rides 38-digit
    * decimals; U, the effect size, and the tie term Σ(t³−t) are exact
    * until the final double division/rounding both engines replay.
    *
    * Scale shape: one distinct-value count shuffle (map-side partials),
    * then [[Series.globalCumSum]]'s bucketed prefix sum for cumT — no
    * global sort, no single-partition window; the final reduce is a
    * 1-row full-partial aggregate. */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String)
      : DataFrame = {
    def side(df: DataFrame, na: Long, nb: Long): DataFrame =
      df.where(col(valueCol).isNotNull)
        .select(col(valueCol).cast("double").as("v"),
          lit(na).as("na"), lit(nb).as("nb"))
    val vc = side(a, 1L, 0L).unionAll(side(b, 0L, 1L))
      .groupBy(col("v"))
      .agg(sum(col("na")).as("na"), sum(col("nb")).as("nb"))
      .withColumn("t", col("na") + col("nb"))
    val cum = Series.globalCumSum(vc, "v", Seq("t"), withTotals = false)
    val dec = DecimalType(38, 0)
    val r2a = col("na").cast(dec) *
      (lit(2L) * col("cum_t") - col("t") + lit(1L)).cast(dec)
    val ties = col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
      col("t").cast(dec)
    val agg = cum.agg(
      coalesce(sum(col("na")), lit(0L)).as("n_a"),
      coalesce(sum(col("nb")), lit(0L)).as("n_b"),
      coalesce(sum(r2a), lit(0L).cast(dec)).as("__r2a"),
      coalesce(sum(ties), lit(0L).cast(dec)).as("__ties"))
    val naD = col("n_a").cast(DoubleType)
    val nbD = col("n_b").cast(DoubleType)
    val nD = naD + nbD
    // 2·U_a = 2·R_a − n_a·(n_a+1), exact until the double casts below
    val u2 = col("__r2a") - (col("n_a").cast(dec) *
      (col("n_a") + lit(1L)).cast(dec))
    // nullif-guarded: an empty/degenerate side yields nulls instead of
    // an ANSI divide-by-zero (0/0 throws, and subexpression elimination
    // evaluates divisions even inside a false when() branch)
    val sigma2 = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - col("__ties").cast(DoubleType) /
        nullif(nD * (nD - lit(1.0)), lit(0.0)))
    val z = (u2.cast(DoubleType) - naD * nbD) /
      nullif(lit(2.0) * sqrt(sigma2), lit(0.0))
    agg.select(col("n_a"), col("n_b"),
      round(u2.cast(DoubleType) * lit(1e6) /
        nullif(lit(2.0) * naD * nbD, lit(0.0)))
        .cast(LongType).as("cles_micro"),
      when(sigma2 <= lit(0.0), lit(0L))
        .otherwise(round(z * lit(1e6)).cast(LongType)).as("z_micro"))
  }

  /** Retrieval ranking-quality report — the eval loop for the
    * similarity-search tier (does a new embedding/index change actually
    * rank relevant documents higher?). Per query: NDCG@k with the
    * exponential gain (2^rel − 1)/log₂(rank + 1), MRR (reciprocal rank
    * of the first relevant document, 0 if none retrieved relevant), and
    * precision@k (relevant in the top k over the constant k — the
    * sklearn convention, so sparse queries are penalized, not excused).
    * Ranking is `scoreCol` DESCENDING with `docCol` ascending as the
    * deterministic tie-break; the ideal ranking for IDCG reorders the
    * same rows by relevance. Null relevance reads as 0; null
    * query/doc/score rows drop.
    *
    * Determinism: every DCG/IDCG term rounds to integer NANOS before
    * its per-query sum (exact BIGINT, order-free — the lm_perplexity
    * convention); ndcg divides the two exact integers (6dp), rr and
    * p@k are pure rationals (6dp).
    *
    * Scale shape: ONE Exchange on the query key shared by both window
    * specs (actual rank, ideal rank) and the per-query aggregate —
    * windows are partitioned, never global, so a billion queries spread
    * across the cluster and the per-query task is bounded by that
    * query's candidate count. Returns one row per query:
    * (query, n_docs, ndcg, rr, p_at_k); ndcg null when the query has no
    * relevant documents (IDCG = 0). */
  def rankingReport(df: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"rankingReport: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .where(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(queryCol).as("query"), col(docCol).as("__doc"),
        col(scoreCol).as("__s"),
        coalesce(col(relCol).cast(DoubleType), lit(0.0)).as("__rel"))
    val wActual = Window.partitionBy(col("query"))
      .orderBy(col("__s").desc, col("__doc"))
    val wIdeal = Window.partitionBy(col("query"))
      .orderBy(col("__rel").desc, col("__doc"))
    def gainNano(rankCol: Column): Column =
      when(rankCol <= k, round(
        (pow(lit(2.0), col("__rel")) - lit(1.0)) /
          log(2.0, rankCol.cast(DoubleType) + lit(1.0)) * lit(1e9))
        .cast(LongType)).otherwise(lit(0L))
    val ranked = base
      .withColumn("__r", row_number().over(wActual))
      .withColumn("__ir", row_number().over(wIdeal))
    val perQuery = ranked.groupBy(col("query")).agg(
      count(lit(1)).as("n_docs"),
      sum(gainNano(col("__r"))).as("__dcg"),
      sum(gainNano(col("__ir"))).as("__idcg"),
      min(when(col("__rel") > 0, col("__r"))).as("__first_rel"),
      sum(when(col("__r") <= k && col("__rel") > 0, 1L).otherwise(0L))
        .as("__hits"))
    perQuery.select(col("query").as(queryCol), col("n_docs"),
      when(col("__idcg") > 0,
        round(col("__dcg").cast(DoubleType) / col("__idcg"), 6))
        .otherwise(lit(null).cast(DoubleType)).as("ndcg"),
      round(when(col("__first_rel").isNotNull,
        lit(1.0) / col("__first_rel")).otherwise(lit(0.0)), 6).as("rr"),
      round(col("__hits") / lit(k.toDouble), 6).as("p_at_k"))
  }
}
