package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off measurement main for the round-10 text-retrieval/span-dedup
  * operators' scale slopes: times `TextFunctions.bm25TopK`,
  * `Dedup.duplicateSpans`, `Dedup.stripDuplicates`, and
  * `TextFunctions.rougeReport` end-to-end (noop sink) at 1×/10×/100×
  * the sf0.1 documents — the `ScaleSlopeHeavy` protocol (cold caches,
  * JIT warmed outside the timed points, caches + persistent RDDs
  * dropped between points). Claims under test:
  *
  *  - bm25TopK: ONE posting explode + count shuffle; broadcast query
  *    terms prune postings before df/dl join in → linear in corpus
  *    tokens with a FIXED query set.
  *  - duplicateSpans: skinny (sha-128, id, pos) gram triples, one count
  *    shuffle, shuffle-hash join back, per-doc islands → linear in
  *    corpus grams; dup structure per replica is constant (suffixed
  *    replicas share no grams), so hit-rates stay fixed.
  *  - stripDuplicates: same pipeline + per-key occurrence window +
  *    splice join → linear, slightly above duplicateSpans.
  *  - rougeReport: two explode→count shuffles + skinny (key, gram)
  *    join → linear in pair grams (the scalar rougeN form measured
  *    pathological here — this tool pins the replacement's slope).
  *
  * Corpora are the token-suffixed sf0.1 replicas (`ScaleSlopeHeavy`
  * construction — intra-replica duplication preserved, none across).
  * Every corpus gets `withNearDups`-style planted copies at id+10⁶ so
  * the span ops do real work at every point. Run alone for clean
  * numbers: `sbt -batch "runMain graft.tools.ScaleSlopeText"`. */
object ScaleSlopeText {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.Dedup
    import graft.functions.TextFunctions

    // optional arg: comma-separated op filter (re-measure single rows)
    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def wanted(op: String): Boolean = only.isEmpty || only(op)

    def timed(op: String, label: String, n: Long)(body: => DataFrame): Unit =
      if (wanted(op) || op.startsWith("warmup")) timedAlways(op, label, n)(body)

    def timedAlways(op: String, label: String, n: Long)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SLOPE $op%-16s $label%-6s n=$n%9d sec=$dt%8.2f us_per_row=${dt * 1e6 / n}%8.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    val base = graft.Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"), col("text"))
    val corpora: Seq[(String, DataFrame)] = Seq(("x1", base)) ++
      Seq(10, 100).map { reps =>
        val path = s"/tmp/graft_x$reps.parquet" // shared with ScaleSlopeHeavy
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

    // JIT/codegen warmup outside the timed points
    val tiny = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text"))
    val tinyQ = {
      val s2 = spark
      import s2.implicits._
      Seq((1, "data query spark window")).toDF("query_id", "qtext")
    }
    timed("warmup_bm25", "tiny", 500)(TextFunctions.bm25TopK(
      tiny, "text", "doc_id", tinyQ, "query_id", "qtext", k = 5))
    timed("warmup_spans", "tiny", 500)(
      Dedup.duplicateSpans(tiny, "text", "doc_id", l = 10))

    val queries = {
      val s2 = spark
      import s2.implicits._
      // FIXED query set; terms exist in every replica only for rep 0,
      // which keeps match volume constant across points (the pruning
      // claim is exactly that non-matching postings die at the filter)
      Seq((1, "data0 query0 spark0 window0"), (2, "data query spark window"),
        (3, "fast0 slow0 filter0 scan0"), (4, "fast slow filter scan"))
        .toDF("query_id", "qtext")
    }
    corpora.foreach { case (label, corpus) =>
      val n = corpus.count()
      // planted copies keep span-dedup doing real work at every point
      val planted = corpus.where(pmod(col("doc_id"), lit(20L)) === 0)
        .select((col("doc_id") + lit(100000000L)).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text"))
      val withDups = corpus.unionByName(planted)
      timed("bm25_topk", label, n)(TextFunctions.bm25TopK(
        corpus, "text", "doc_id", queries, "query_id", "qtext", k = 10))
      timed("dup_spans", label, n)(
        Dedup.duplicateSpans(withDups, "text", "doc_id", l = 10))
      timed("strip_dups", label, n)(
        Dedup.stripDuplicates(withDups, "text", "doc_id", l = 10))
      val pairs = corpus.as("a").join(
          corpus.select((col("doc_id") - 1).as("doc_id"),
            col("text").as("ref")), Seq("doc_id"))
      timed("rouge_report", label, n)(TextFunctions.rougeReport(
        pairs, "doc_id", "text", "ref", 2))
    }
    spark.stop()
  }
}
