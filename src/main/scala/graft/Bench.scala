package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Honesty rules (VERDICT r1 #6): every query is fully materialized
  * through the `noop` sink — Catalyst cannot prune payload columns the
  * way it can under `.count()` — and a query that fails is reported as
  * -1.0 with its error on stderr, never silently timed as fast.
  */
object Bench {

  /** Headline set: one per plan family — scan/filter, hash agg, broadcast
    * + shuffle joins, as-of join, pivot, partitioned window, event-time
    * window + sessionize, zipWithIndex ids, LSH dedup + label-propagation
    * clusters, ANN top-k, text scoring, union. */
  val headline: Seq[String] = Seq(
    "q1_agg", "filter_rows", "io_parquet_project",
    "join_inner", "join_left", "join_semi", "join_asof",
    "agg_sum_mean_for", "agg_median", "agg_maxby_row",
    "pivot_agg", "union_wide",
    "series_moving_avg", "series_running_sum", "events_window_agg",
    "events_sessionize",
    "add_row_number", "topk_custom",
    "text_quality", "text_token_count", "dedup_exact",
    "dedup_minhash_pairs", "dedup_clusters", "sim_bruteforce_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    // JIT/codegen warm-up outside the timed region
    Tables(spark, sfDir).lineitem.write.format("noop").mode("overwrite").save()

    // two reps, report the min: steady-state throughput (codegen compile
    // amortizes over a long job; rep 1 alone mostly measures javac).
    // Dedup queries get the SAME min-of-2 policy (r5 verdict): the
    // cache+RDD teardown below makes every rep equally cold, so rep 2 is
    // a fresh dedup, not a warm-cache read — timing them once exposed
    // the two most expensive rows to single-run machine noise (±10 s
    // headline swings across otherwise-identical builds).
    val reps = 2
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val sec =
        try {
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            // isolate timings: the LSH operators persist intermediates
            // with the session-lifetime handle, and the cache manager
            // matches canonicalized plans ACROSS queries — without this,
            // whether dedup_clusters hits dedup_minhash_pairs' leftover
            // cache is a race, swinging its time 5× run to run
            spark.catalog.clearCache()
            // clearCache only drops Dataset-level entries; the label-
            // propagation loop truncates lineage with localCheckpoint,
            // whose blocks live at the RDD level. Bench calls queries
            // through the (SparkSession, sfDir) signature, so the
            // operators run with CacheHandle.unmanaged and their release
            // thunks never fire — drop every leftover persistent RDD here
            // or checkpoint blocks accumulate across the 24-query run.
            val sc = spark.sparkContext
            sc.getPersistentRDDs.values.foreach(_.unpersist(false))
            dt
          }
          times.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      System.err.println(f"[bench] $name: $sec%.3f s")
      name -> sec
    }
    // dedup_clusters internally re-runs the full LSH pairs pipeline that
    // dedup_minhash_pairs just timed (the operator owns its pipeline —
    // correct design, double-counted wall clock): the headline total
    // replaces the clusters time with its NET cost (clusters − pairs) so
    // the total reflects DISTINCT work; both raw values stay in "queries"
    val rm = results.toMap
    val net = (rm.get("dedup_clusters"), rm.get("dedup_minhash_pairs")) match {
      case (Some(c), Some(p)) if c >= 0 && p >= 0 => Some(math.max(c - p, 0.0))
      case _ => None
    }
    val qs = (results ++ net.map("dedup_clusters_net" -> _))
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum -
      net.map(n => rm("dedup_clusters") - n).getOrElse(0.0)
    val note = "dedup_clusters re-runs the LSH pairs stage timed as " +
      "dedup_minhash_pairs; total counts its net (dedup_clusters_net)"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${results.size - ok.size},"reps":$reps,"timing":"min-of-reps; all reps cold (caches + checkpoint RDDs dropped between reps)","note":"$note","sf":"$sfDir"}""")
    spark.stop()
  }
}
