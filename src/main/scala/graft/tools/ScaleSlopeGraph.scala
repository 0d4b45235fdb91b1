package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off measurement main for the round-12 operators' scale slopes:
  * `Graph.connectedComponents`, `Graph.bfsDistances`,
  * `Series.mergeIntervals`, `Dedup.noveltyScores`, and
  * `TextFunctions.stripBoilerplateLines` at 1×/10×/100× input, printing
  * one SLOPE line per point (the `ScaleSlopeHeavy` protocol: noop sink,
  * cold caches between points). Claims under test:
  *
  *  - connectedComponents: per-round work is linear in edges and the
  *    ROUND COUNT is O(log diameter) — so wall time grows ~linearly
  *    with the edge count when the diameter is held roughly constant
  *    (the functional-graph construction keeps component shapes stable
  *    across replicas).
  *  - bfsDistances: total edge touches across all hops = O(edges);
  *    fixed per-hop scheduling overhead dominates small graphs.
  *  - mergeIntervals: one hash shuffle + two windows + partial agg →
  *    linear in interval count.
  *  - noveltyScores: gram explode + min shuffle + join back → linear in
  *    corpus grams.
  *  - stripBoilerplateLines: frequency pass on skinny triples + one
  *    id-keyed rebuild shuffle → linear in line count.
  *
  * Graph replicas are DISJOINT copies (node ids offset per replica), so
  * edge count scales while per-component structure is preserved. Run
  * alone for clean numbers:
  * `sbt -batch "runMain graft.tools.ScaleSlopeGraph"`. */
object ScaleSlopeGraph {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.{Dedup, Graph, Series}

    // optional arg: comma-separated op filter (re-measure single rows)
    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def timed(op: String, label: String, n: Long)(body: => DataFrame): Unit =
      if (only.isEmpty || only(op)) timedAlways(op, label, n)(body)

    def timedAlways(op: String, label: String, n: Long)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SLOPE $op%-18s $label%-10s n=$n%9d sec=$dt%8.2f us_per_row=${dt * 1e6 / n}%8.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    val t = graft.Tables(spark, "/root/testdata/sf0.1")
    val docs = t.documents.select(col("doc_id"), col("text"), col("source"))
    val events = t.events.select(col("user_id"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        round(col("value") * 60000000).cast("long")).as("e"))

    val reps = Seq(("x1", 1), ("x10", 10), ("x100", 100))

    // --- graph: disjoint functional-graph replicas --------------------
    val baseEdges = docs.select(col("doc_id").as("a"),
      ((col("doc_id") * 7) % 2500).as("b"))
    for ((label, r) <- reps) {
      val edges =
        if (r == 1) baseEdges
        else baseEdges
          .crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("a") + col("rep") * 100000L).as("a"),
            (col("b") + col("rep") * 100000L).as("b"))
      val n = edges.count()
      timed("connected_comp", label, n) {
        Graph.connectedComponents(edges, "a", "b")
      }
      timed("bfs_hops6", label, n) {
        Graph.bfsDistances(edges, "a", "b",
          edges.select(col("a").as("node")).where(col("node") % 500 === 0)
            .distinct(),
          maxHops = 6)
      }
    }

    // --- intervals: replicated users keep per-key sizes constant ------
    for ((label, r) <- reps) {
      val iv =
        if (r == 1) events
        else events.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("user_id") + col("rep") * 1000000L).as("user_id"),
            col("s"), col("e"))
      val n = iv.count()
      timed("merge_intervals", label, n) {
        Series.mergeIntervals(iv, Seq("user_id"), "s", "e")
      }
    }

    // --- text: token-suffixed replicas (the ScaleSlope construction) --
    for ((label, r) <- Seq(("x1", 1), ("x10", 10), ("x100", 100))) {
      val corpus =
        if (r == 1) docs.select(col("doc_id"), col("text"))
        else docs.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("doc_id") * r + col("rep")).as("doc_id"),
            regexp_replace(col("text"), lit("(\\w+)"),
              concat(lit("$1"), col("rep").cast("string"))).as("text"))
      val n = corpus.count()
      timed("novelty_scores", label, n) {
        Dedup.noveltyScores(corpus, "text", "doc_id", shingleN = 3)
      }
      val d2 = docs.crossJoin(spark.range(r).select(col("id").as("rep")))
        .select((col("doc_id") * r + col("rep")).as("doc_id"), col("source"),
          concat(lit("header of "), col("source"), lit("\n"),
            col("text")).as("t"))
      timed("boilerplate", label, d2.count()) {
        graft.functions.TextFunctions.stripBoilerplateLines(
          d2, "t", "source", "doc_id", minShareMicro = 600000L)
      }
    }
    spark.stop()
  }
}
