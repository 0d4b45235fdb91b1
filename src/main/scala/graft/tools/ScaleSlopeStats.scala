package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-slope measurement for the round-13 statistics /
  * product-analytics tier (the ScaleSlopeHeavy protocol: noop sink,
  * cold caches between points, replicas constructed so per-entity /
  * per-component structure is preserved while volume scales). Claims
  * under test:
  *
  *  - adamicAdar: wedge fan-out is Σ over centers of deg² — DISJOINT
  *    graph replicas hold the degree distribution constant, so wall
  *    should grow ~linearly with edges despite the quadratic kernel.
  *  - rfmSegments: one events-sized rollup, then entities-sized rank
  *    machinery (globalCumSum + partitioned tie-break) — linear.
  *  - kaplanMeier: events rollup + durations-sized cumulative — the
  *    duration-collapse means the tail work barely grows.
  *  - linearAttribution: ONE entity Exchange, three windows on it —
  *    linear in events.
  *  - spearman: two value-collapses + two skinny rank joins — linear
  *    in rows, value-collapse bounds the rank arithmetic.
  *  - mmrRerank: candidate generation is corpus-linear per query;
  *    the greedy machinery is (queries × nCandidates)-sized and
  *    should NOT grow with the corpus.
  *
  * Run alone for clean numbers:
  * `sbt -batch "runMain graft.tools.ScaleSlopeStats [op,op,...]"`. */
object ScaleSlopeStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.{Events, Graph, Similarity, Stats}

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

    // --- events replicas: offset user ids, keep timestamps -----------
    val baseEv = t.events.select(col("user_id"), col("ts"),
      col("event_id"), col("event_type"), col("value"))
    def evReplica(r: Int): DataFrame =
      if (r == 1) baseEv
      else baseEv.crossJoin(spark.range(r).select(col("id").as("rep")))
        .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
          col("ts"), (col("event_id") + col("rep") * 1000000000L)
            .as("event_id"), col("event_type"), col("value"))

    for ((label, r) <- reps) {
      val ev = evReplica(r)
      val n = ev.count()
      timed("rfm", label, n) {
        Events.rfmSegments(ev, "user_id", "ts", "value")
      }
      timed("kaplan_meier", label, n) {
        Events.kaplanMeier(ev, "user_id", "ts")
      }
      timed("linear_attr", label, n) {
        Events.linearAttribution(ev, "user_id", "ts",
          Seq("ts", "event_id"), "event_type", "purchase",
          gapUs = 1800000000L)
      }
    }

    // --- adamic-adar: disjoint dense-graph replicas -------------------
    val baseEdges = t.documents.select((col("doc_id") % 400).as("a"),
      ((col("doc_id") * 7 + 3) % 400).as("b"))
    for ((label, r) <- reps) {
      val edges =
        if (r == 1) baseEdges
        else baseEdges
          .crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("a") + col("rep") * 100000L).as("a"),
            (col("b") + col("rep") * 100000L).as("b"))
      val n = edges.count()
      timed("adamic_adar", label, n) {
        Graph.adamicAdar(edges, "a", "b", topK = 100)
      }
    }

    // --- spearman: replicated lineitem pairs --------------------------
    val basePairs = t.lineitem.select(col("l_quantity").as("x"),
      col("l_extendedprice").as("y"))
    for ((label, r) <- reps) {
      val pairs =
        if (r == 1) basePairs
        else basePairs
          .crossJoin(spark.range(r).select(col("id").as("rep")))
          // jitter y per replica so the value-collapse grows too (the
          // honest case: distinct values scale with data)
          .select(col("x"), (col("y") + col("rep") * 0.001).as("y"))
      val n = pairs.count()
      timed("spearman", label, n) {
        Stats.spearman(pairs, "x", "y")
      }
    }

    // --- mmr: corpus grows, query set fixed ---------------------------
    val baseVecs = t.embeddings.select(col("vec_id"), col("embedding"))
    val queries = baseVecs.where(col("vec_id") % 1000 === 0)
    for ((label, r) <- reps) {
      val corpus =
        if (r == 1) baseVecs
        else baseVecs
          .crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
            col("embedding"))
      val n = corpus.count()
      timed("mmr_rerank", label, n) {
        Similarity.mmrRerank(corpus, queries, nCandidates = 20, k = 5)
      }
    }

    spark.stop()
  }
}
