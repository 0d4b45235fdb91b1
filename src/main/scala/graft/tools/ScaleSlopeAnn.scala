package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off measurement main for the round-10 ANN/selection operators'
  * scale slopes: times `Similarity.pqEncode`, `Similarity.pqTopK`,
  * `Similarity.ivfPqTopK`, and `Sampling.dsirSelect` end-to-end (noop
  * sink) at 1×/10×/100× the sf0.1 input — the `ScaleSlopeHeavy`
  * protocol (cold caches, JIT warmed outside the timed points, caches
  * + persistent RDDs dropped between points). Claims under test:
  *
  *  - pqEncode: pure scan-side argmin over broadcast codebook literals
  *    → linear in corpus size, no shuffle at any scale.
  *  - pqTopK: ADC scan of ALL codes with a fixed 20-query broadcast →
  *    linear in corpus size (the flat-PQ baseline).
  *  - ivfPqTopK (nlist=16, nprobe=2): candidates pruned to
  *    nprobe/nlist of the corpus → linear with a visibly smaller
  *    constant than flat PQ at equal corpus.
  *  - dsirSelect: two corpus scans to skinny (id, bucket) pairs, a
  *    B-row broadcast stats table, top-n via TakeOrderedAndProject →
  *    linear in corpus size.
  *
  * The 10×/100× embedding corpora replicate sf0.1 with a per-replica
  * deterministic perturbation (vectors stay distinct across replicas,
  * distances keep the same distribution); the DSIR corpora are the
  * token-suffixed document replicas from `ScaleSlopeHeavy`. Queries
  * and the DSIR target are FIXED-size sets drawn from each point's own
  * corpus so per-query work stays constant while the corpus grows.
  * Run alone for clean numbers:
  * `sbt -batch "runMain graft.tools.ScaleSlopeAnn"`. */
object ScaleSlopeAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.{Sampling, Similarity}

    def timed(op: String, label: String, n: Long)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SLOPE $op%-14s $label%-6s n=$n%9d sec=$dt%8.2f us_per_row=${dt * 1e6 / n}%8.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // --- embedding corpora: sf0.1 ×1/×10/×100, perturbed replicas ------
    val base = graft.Tables(spark, "/root/testdata/sf0.1").embeddings
      .select(col("vec_id"), col("embedding"))
    val corpora: Seq[(String, DataFrame)] = Seq(("x1", base)) ++
      Seq(10, 100).map { reps =>
        val path = s"/tmp/graft_emb_x$reps.parquet"
        if (!new java.io.File(path).exists()) {
          base.crossJoin(spark.range(reps).select(col("id").as("rep")))
            .select((col("vec_id") * reps + col("rep")).as("vec_id"),
              // Divide promotes to double in Spark SQL — cast each
              // element back so the corpus stays array<float> like sf0.1
              transform(col("embedding"), x =>
                (x * (lit(1.0) + col("rep").cast("double") / lit(200.0)))
                  .cast("float"))
                .as("embedding"))
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        }
        (s"x$reps", spark.read.parquet(path))
      }
    val docsBase = graft.Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"), col("text"), col("source"))
    val docCorpora: Seq[(String, Int, DataFrame)] =
      Seq(("x1", 1, docsBase)) ++ Seq(10, 100).map { reps =>
        val path = s"/tmp/graft_dsir_x$reps.parquet"
        if (!new java.io.File(path).exists()) {
          docsBase.crossJoin(spark.range(reps).select(col("id").as("rep")))
            .select((col("doc_id") * reps + col("rep")).as("doc_id"),
              regexp_replace(col("text"), lit("(\\w+)"),
                concat(lit("$1"), col("rep").cast("string"))).as("text"),
              col("source"))
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        }
        (s"x$reps", reps, spark.read.parquet(path))
      }

    // --- JIT/codegen warmup outside the timed points -------------------
    val tinyE = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val tinyQ = tinyE.orderBy("vec_id").limit(5)
    timed("warmup_pq", "tiny", 500)(
      Similarity.pqTopK(tinyE, tinyQ, k = 5))
    timed("warmup_ivfpq", "tiny", 500)(
      Similarity.ivfPqTopK(tinyE, tinyQ, k = 5, nlist = 4, nprobe = 2))
    val tinyD = graft.Tables(spark, "/root/testdata/sf0.001").documents
    timed("warmup_dsir", "tiny", 500)(Sampling.dsirSelect(tinyD,
      tinyD.filter(col("source").isin("src1")), "text", "doc_id", n = 50))

    // --- timed points --------------------------------------------------
    corpora.foreach { case (label, corpus) =>
      val n = corpus.count()
      // NOT checkpointed: timed() unpersists every persistent RDD
      // between points, which would orphan a checkpoint's blocks
      val queries = corpus.orderBy("vec_id").limit(20)
      val cb = Similarity.pqTrain(corpus, m = 8, ksub = 16)
      timed("pq_encode", label, n)(Similarity.pqEncode(corpus, cb))
      timed("pq_topk", label, n)(
        Similarity.pqTopK(corpus, queries, k = 10))
      timed("ivfpq_topk", label, n)(Similarity.ivfPqTopK(
        corpus, queries, k = 10, nlist = 16, nprobe = 2))
    }
    docCorpora.foreach { case (label, reps, docs) =>
      val n = docs.count()
      // FIXED-size target (replica 0 only): the target histogram scan
      // stays constant while the raw side grows
      val target = docs.filter(
        col("source").isin("src1", "src2", "src3") &&
          pmod(col("doc_id"), lit(reps.toLong)) === 0)
      timed("dsir_select", label, n)(Sampling.dsirSelect(
        docs, target, "text", "doc_id", n = 1000))
    }
    spark.stop()
  }
}
