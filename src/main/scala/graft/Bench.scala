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

  /** Fixed calibration workload: a deterministic, CPU-bound, I/O-free
    * Spark job (800M-row range → two xxhash64 kernels → 4096-key hash
    * agg → noop sink) whose steady-state cost on the reference sandbox
    * is pinned below. It is timed immediately BEFORE and AFTER the query
    * loop, so machine-load skew is measurable from the artifact alone:
    * twice (r5, r9) the per-round artifact reported a phantom 20-40%
    * regression that a quiet re-run disproved (r9: driver 18.5 s vs
    * judge re-run 14.77 s). `load_factor` ~1.0 = trustworthy numbers;
    * >>1 = the whole run was load-inflated and should be normalized by
    * the factor (every query row inflates roughly uniformly — r9's
    * artifact was ~25-40% high across all 25 rows) or re-run. */
  def calibrate(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 800000000L, 1, 32)
      .select((xxhash64(col("id")) % 4096).as("k"),
        (xxhash64(col("id") + 1L) % 1000000L).as("v"))
      .groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Min-of-3 probe: single calibration runs fluctuate ±30% from GC
    * debt left by the preceding queries (measured r10: a post-dedup
    * first probe hits 1.36 s, settling to ~1.0 s by the third), which
    * would make a one-shot probe cry wolf. Sustained EXTERNAL load
    * inflates all three probes together, which is the signal we want. */
  def calibrationProbe(spark: SparkSession): Double =
    (1 to 3).map(_ => calibrate(spark)).min

  /** Steady-state `calibrationProbe` cost on the unloaded reference
    * sandbox (local[32], 128 GiB) after JIT warmup, measured 2026-08
    * (round 10). Pure compute — no parquet, no page cache — so the only
    * thing that moves it is CPU contention. */
  val CalibrationRefSec = 1.02

  /** Headline set: one per plan family — scan/filter, hash agg, broadcast
    * + shuffle joins, as-of join, pivot, partitioned window, event-time
    * window + sessionize, zipWithIndex ids, LSH dedup + label-propagation
    * clusters, ANN top-k, text scoring, union; (r14) three r13-tier
    * representatives — the globalCumSum rank kernel (rfm), the
    * value-collapse rank-correlation path (spearman), and the survival
    * window composition (kaplan–meier) — so regressions in the
    * statistics tier surface in the driver bench, not only in hand-run
    * scale slopes; (r15) the HTML→text extraction kernel
    * (`text_html_extract`) — the crawl-ingest representative, a pure
    * scan-side codegen'd native-expression pass — and the robots.txt
    * verdict chain (`web_robots_decide`) — parse + group windows +
    * host join + regex match, the crawl-compliance representative;
    * (r16) `.warc.gz` ingestion (`web_warc_gzip`) — gzip-member
    * compress/decompress + offset-based record slicing, the
    * Common-Crawl distribution-format representative; (r17) the
    * response-record chain (`pipeline_warc_response`) — chunked+gzip
    * HTTP de-framing (HttpParts), header-hinted charset decode and
    * htmlText over every document, the raw-crawl ingest
    * representative; (r18) the FILE tier (`web_warc_write_roundtrip`)
    * — distributed `.warc.gz` shard WRITE (hash repartition + staged
    * atomic renames) followed by the member-boundary chunked FILE
    * READ back, so the file reader/writer pair gets a recurring
    * per-round band instead of only hand-run scale slopes (r17
    * what's-wrong #4); (r19) the CDXJ index tier (`web_cdxj_ingest`)
    * — warcCdx over real files → serialize to CDXJ text → parse →
    * re-anchor → tiling-validated indexed ingest, the shipped-index
    * interop representative (r18 verdict next #6); (r20) the WAT
    * tier (`web_wat_ingest`) — envelope records in gzip members →
    * explicit-schema from_json parse → typed link table, the
    * link-graph-at-1/10th-bytes representative (r19 verdict next
    * #5). */
  val headline: Seq[String] = Seq(
    "q1_agg", "filter_rows", "io_parquet_project",
    "join_inner", "join_left", "join_semi", "join_asof",
    "agg_sum_mean_for", "agg_median", "agg_maxby_row",
    "pivot_agg", "union_wide",
    "series_moving_avg", "series_running_sum", "events_window_agg",
    "events_sessionize",
    "add_row_number", "topk_custom",
    "text_quality", "text_token_count", "dedup_exact",
    "dedup_minhash_pairs", "dedup_clusters", "sim_bruteforce_topk",
    "events_rfm", "stat_spearman", "events_kaplan_meier",
    "text_html_extract", "text_html_main", "web_robots_decide",
    "web_warc_gzip", "pipeline_warc_response",
    "web_warc_write_roundtrip", "web_cdxj_ingest", "web_wat_ingest")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    // JIT/codegen warm-up outside the timed region
    Tables(spark, sfDir).lineitem.write.format("noop").mode("overwrite").save()
    calibrate(spark) // JIT-warm the calibration plan itself
    val calStart = calibrationProbe(spark)

    // two reps, report the min: steady-state throughput (codegen compile
    // amortizes over a long job; rep 1 alone mostly measures javac).
    // Dedup queries get the SAME min-of-2 policy (r5 verdict): the
    // cache+RDD teardown below makes every rep equally cold, so rep 2 is
    // a fresh dedup, not a warm-cache read — timing them once exposed
    // the two most expensive rows to single-run machine noise (±10 s
    // headline swings across otherwise-identical builds).
    val reps = 2
    val repTimes = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val suspects = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val done = scala.collection.mutable.ArrayBuffer.empty[Double]
      def runOnce(): Unit = {
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
        done += dt
      }
      val sec =
        try {
          (1 to reps).foreach(_ => runOnce())
          // rep-divergence guard (r15: a load transient shipped a
          // phantom 8× regression and cost a judge session to
          // disprove): when one rep is >3× another, the slow rep is
          // suspect — run ONE extra rep so the min reflects a quiet
          // measurement, and flag the query in the artifact so the
          // reader knows its reps disagreed.
          if (done.max / math.max(done.min, 1e-9) > 3.0) {
            suspects += name
            System.err.println(f"[bench] $name reps diverge >3x " +
              f"(${done.min}%.3f..${done.max}%.3f s) - extra rep")
            runOnce()
          }
          done.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      repTimes(name) = done.toSeq
      System.err.println(f"[bench] $name: $sec%.3f s")
      name -> sec
    }
    val calEnd = calibrationProbe(spark)
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
    // self-calibration block: the same CPU-bound job timed before and
    // after the query loop vs its pinned unloaded-sandbox cost. The
    // factor uses the MEAN of the two probes (load at either end taints
    // the whole run); normalized_total = total / max(load_factor, 1) is
    // the load-corrected headline for cross-round comparison.
    val loadFactor = (calStart + calEnd) / 2.0 / CalibrationRefSec
    val normTotal = total / math.max(loadFactor, 1.0)
    val repsJson = repTimes
      .map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val calJson = f"""{"start_sec":$calStart%.3f,"end_sec":$calEnd%.3f,"ref_sec":$CalibrationRefSec%.3f,"load_factor":$loadFactor%.3f}"""
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    System.err.println(f"[bench] calibration: start=$calStart%.3f end=$calEnd%.3f ref=$CalibrationRefSec load_factor=$loadFactor%.3f")
    // field order matters (r16 verdict #6): the driver's artifact keeps
    // only the TAIL bytes of this line, so the big per-query dicts go
    // FIRST and everything that makes the numbers interpretable —
    // calibration/load_factor, suspect, failed, normalized_total, and a
    // repeat of the headline total — goes LAST, where it survives
    // truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps_sec":$repsJson,"timing":"min-of-reps; all reps cold (caches + checkpoint RDDs dropped between reps); calibration = fixed CPU-bound job timed before+after the loop, load_factor = mean/ref (1.0 = unloaded sandbox, normalize or re-run if >1.15); suspect = queries whose reps diverged >3x (load transient - an extra rep was run and recorded)","note":"$note","reps":$reps,"sf":"$sfDir","total_sec":${f"$total%.3f"},"normalized_total":${f"$normTotal%.3f"},"calibration":$calJson,"suspect":$suspectJson,"failed":${results.size - ok.size}}""")
    spark.stop()
  }
}
