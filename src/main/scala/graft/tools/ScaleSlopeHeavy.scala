package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off measurement main for the round-9 heavy operators' scale
  * slopes (r9 verdict, next-round #5): times `Graph.pageRank`,
  * `TextFunctions.collocations`, `Dedup.fuzzyContamination`, and
  * `Dedup.incrementalDedup` end-to-end (noop sink) at 1×/10×/100× the
  * sf0.1 input, printing one SLOPE line per point — the same protocol
  * the LSH pair path got in r6 (`ScaleSlope`). Claims under test:
  *
  *  - pageRank: one skinny rank⋈edges join + partial sum per iteration →
  *    wall time ≈ linear in edge count (plus fixed per-iteration
  *    scheduling overhead that dominates small graphs).
  *  - collocations: one bigram explode + count, marginals reuse the
  *    counted pairs → linear in corpus tokens.
  *  - fuzzyContamination: train-side shingle/minhash is scan-side and
  *    the bench side broadcasts → linear in train size with a fixed
  *    bench set.
  *  - incrementalDedup: history text never re-read — only its persisted
  *    signature index is joined → linear (shallow slope) in index size
  *    with a fixed batch.
  *
  * The 10×/100× corpora replicate sf0.1 with every token suffixed by the
  * replica digit (no cross-replica shingle sharing, preserved intra-rep
  * structure), the `ScaleSlope` construction. Run alone for clean
  * numbers: `sbt -batch "runMain graft.tools.ScaleSlopeHeavy"`. */
object ScaleSlopeHeavy {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.{Dedup, Graph}
    import graft.functions.TextFunctions

    def timed(op: String, label: String, n: Long)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SLOPE $op%-18s $label%-10s n=$n%9d sec=$dt%8.2f us_per_row=${dt * 1e6 / n}%8.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // --- corpora: sf0.1 ×1/×10/×100, token-suffixed replicas ----------
    val base = graft.Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"), col("text"))
    val corpora: Seq[(String, DataFrame)] = Seq(("x1", base)) ++
      Seq(10, 100).map { reps =>
        val path = s"/tmp/graft_x$reps.parquet"
        if (!new java.io.File(path).exists()) {
          base.crossJoin(spark.range(reps).select(col("id").as("rep")))
            .select((col("doc_id") * reps + col("rep")).as("doc_id"),
              regexp_replace(col("text"), lit("(\\w+)"),
                concat(lit("$1"), col("rep").cast("string"))).as("text"))
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        }
        (s"x$reps", spark.read.parquet(path))
      }
    // fuzzy-decontamination benchmark: FIXED 200-doc size, drawn from the
    // point's own corpus (lightly edited → fuzzy, not exact, matches) so
    // the hit-rate stays constant while only the train side grows
    def mkBench(docs: DataFrame, keepEvery: Long): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(keepEvery)) === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" trailing edit")).as("text"))
    // incremental batch: FIXED ~5000-row size at every point, drawn from
    // the point's own history so the dup/near-dup/fresh hit-rate stays
    // constant while only the indexed history grows (the oracle's mix)
    def mkBatch(docs: DataFrame, keepEvery: Long): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(keepEvery)) === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        when(col("doc_id") % 5 === 0, col("text"))
          .when(col("doc_id") % 5 === 1,
            concat(col("text"), lit(" graft extra marker")))
          .otherwise(concat(lit("fresh batch content segment "),
            col("doc_id").cast("string"), lit(" entirely new material")))
          .as("text"))

    // --- JIT/codegen warmup outside the timed points -------------------
    val tiny = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text"))
    timed("warmup_colloc", "sf0.001", 500)(
      TextFunctions.collocations(tiny, "text", minCount = 2, k = 20))
    timed("warmup_fuzzy", "sf0.001", 500)(
      Dedup.fuzzyContamination(tiny, mkBench(tiny, 5L), "text", "doc_id"))
    timed("warmup_incr", "sf0.001", 500)(Dedup.incrementalDedup(
      mkBatch(tiny, 5L), Dedup.buildDedupIndex(tiny, "text", "doc_id"),
      "text", "doc_id"))
    val tinyEdges = spark.range(500).select(col("id").as("src"),
        explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"), pmod(col("src") * 31 + col("j"), lit(500)).as("dst"))
    timed("warmup_pagerank", "n=500", 500)(
      Graph.pageRank(tinyEdges, "src", "dst", iters = 10))

    // --- pageRank: synthetic 3-regular graph, node count scales --------
    Seq(5000L, 50000L, 500000L).foreach { n =>
      val edges = spark.range(n).select(col("id").as("src"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .select(col("src"), pmod(col("src") * 31 + col("j"), lit(n)).as("dst"))
      timed("graph_pagerank", s"n=$n", 3 * n)(
        Graph.pageRank(edges, "src", "dst", damping = 0.85, iters = 10))
    }

    // --- corpus-scaling operators --------------------------------------
    corpora.foreach { case (label, docs) =>
      val n = docs.count()
      timed("text_collocations", label, n)(
        TextFunctions.collocations(docs, "text", minCount = 5, k = 50))
      timed("decontam_fuzzy", label, n)(
        Dedup.fuzzyContamination(docs, mkBench(docs, n / 200L),
          "text", "doc_id"))
      val index = Dedup.buildDedupIndex(docs, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      index.count() // the PERSISTED index is the operator's contract —
                    // history signature compute stays outside the timing
      timed("dedup_incremental", label, n)(
        Dedup.incrementalDedup(mkBatch(docs, n / 5000L), index,
          "text", "doc_id"))
    }
    spark.stop()
  }
}
