package graft.ops

import org.apache.spark.sql.DataFrame
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
}
