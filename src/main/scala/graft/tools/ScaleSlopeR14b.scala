package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-slope measurement for the round-14 continuation tier
  * (the ScaleSlopeStats protocol: noop sink, cold caches between
  * points, replicas offset so key structure is preserved while volume
  * scales). Claims under test:
  *
  *  - targetEncode: one (cat, fold) aggregate + one row join — linear
  *    in rows (category count is constant across replicas, the honest
  *    shape for a bounded-cardinality categorical).
  *  - informationGainReport: one unpivot + one cell shuffle; margin
  *    work is cells-scale — linear in rows.
  *  - quantileNormalize: one exact-percentile grid aggregate + one
  *    partitioned rank window — n·log(partition) sortish, expect
  *    near-linear.
  *  - mahalanobisScores: ONE moment aggregate + scan-side projection —
  *    linear, and the TakeOrdered top-k keeps the tail constant.
  *  - blocklistReport: scan-side grams + broadcast join — linear in
  *    tokens; clean docs short-circuit at the join.
  *  - bleuReport: two gram-count shuffles + one join — linear in
  *    grams.
  *
  * Run alone: `sbt -batch "runMain graft.tools.ScaleSlopeR14b [ops]"`. */
object ScaleSlopeR14b {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.{Agg, Eval, Sampling, Stats}
    import graft.functions.TextFunctions

    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def timed(op: String, label: String, n: Long)(body: => DataFrame): Unit =
      if (only.isEmpty || only(op)) {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SLOPE $op%-18s $label%-10s n=$n%9d sec=$dt%8.2f " +
          f"us_per_row=${dt * 1e6 / n}%8.1f")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(true))
      }

    val t = graft.Tables(spark, "/root/testdata/sf0.1")
    val reps = Seq(("x1", 1), ("x10", 10), ("x100", 100))

    // --- orders replicas: offset keys, same category space -----------
    val baseOrd = t.orders.select(col("o_orderkey"),
      col("o_orderpriority"), col("o_totalprice"))
    for ((label, r) <- reps) {
      val ord =
        if (r == 1) baseOrd
        else baseOrd.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("o_orderkey") + col("rep") * 100000000L)
            .as("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
      val n = ord.count()
      timed("target_encode", label, n) {
        Sampling.targetEncode(ord, "o_orderkey", "o_orderpriority",
          "o_totalprice", k = 5, smoothing = 20.0)
      }
    }

    // --- customer replicas for info gain ------------------------------
    val baseCust = t.customer.select(col("c_custkey"),
      col("c_mktsegment"), col("c_nationkey"), col("c_acctbal"))
    for ((label, r) <- reps) {
      val cust =
        if (r == 1) baseCust
        else baseCust.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("c_custkey") + col("rep") * 10000000L)
            .as("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
            col("c_acctbal"))
      val withLab = cust.withColumn("lab",
        when(col("c_acctbal") > 0, lit("pos")).otherwise(lit("neg")))
      val n = withLab.count()
      timed("info_gain", label, n) {
        Eval.informationGainReport(withLab,
          Seq("c_mktsegment", "c_nationkey"), "lab")
      }
    }

    // --- events replicas for quantile normalization -------------------
    val baseEv = t.events.select(col("event_id"), col("event_type"),
      col("value"))
    for ((label, r) <- reps) {
      val ev =
        if (r == 1) baseEv
        else baseEv.crossJoin(spark.range(r).select(col("id").as("rep")))
          // jitter values per replica so the global distribution (and
          // the percentile buffer) grows honestly
          .select((col("event_id") + col("rep") * 1000000000L)
            .as("event_id"), col("event_type"),
            (col("value") + col("rep") * 0.001).as("value"))
      val n = ev.count()
      timed("quantile_norm", label, n) {
        Agg.quantileNormalize(ev, "value", "event_type", gridPoints = 100)
      }
    }

    // --- lineitem replicas for mahalanobis ----------------------------
    val baseLi = t.lineitem.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"))
    for ((label, r) <- reps) {
      val li =
        if (r == 1) baseLi
        else baseLi.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("l_orderkey") + col("rep") * 100000000L)
            .as("l_orderkey"), col("l_linenumber"),
            (col("l_quantity") + col("rep") * 0.001).as("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"))
      val n = li.count()
      timed("mahalanobis", label, n) {
        Stats.mahalanobisScores(li,
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("mahalanobis_d2"))
          .orderBy(col("mahalanobis_d2").desc).limit(20)
      }
    }

    // --- documents replicas for blocklist + bleu ----------------------
    val baseDocs = t.documents.select(col("doc_id"), col("text"))
    for ((label, r) <- reps) {
      val docs =
        if (r == 1) baseDocs
        else baseDocs.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("doc_id") + col("rep") * 100000000L).as("doc_id"),
            col("text"))
      val n = docs.count()
      timed("blocklist", label, n) {
        TextFunctions.blocklistReport(docs, "doc_id", "text",
          Seq("slow", "vector", "big table", "nonexistentterm"))
      }
      timed("bleu", label, n) {
        val a = docs.select(col("doc_id"), col("text").as("cand"))
        val b = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("ref"))
        TextFunctions.bleuReport(a.join(b, Seq("doc_id")), "doc_id",
          "cand", "ref", maxN = 4)
      }
    }

    spark.stop()
  }
}
