package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement main for the LSH-dedup scale slope (r4 advice #6):
  * times `Dedup.nearDupPairs` end-to-end (noop sink) at sf0.001 / sf0.01 /
  * sf0.1 document counts and on a 10×-duplicated sf0.1 corpus, printing
  * one line per point. The claim under test: candidate generation is
  * O(n·bands) — wall time should grow ≈ linearly in document count, never
  * quadratically. Run alone (no concurrent load) for clean numbers:
  * `sbt -batch "runMain graft.tools.ScaleSlope"`. */
object ScaleSlope {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    import graft.ops.Dedup

    def time(label: String, docs: org.apache.spark.sql.DataFrame): Unit = {
      val n = docs.count()
      val t0 = System.nanoTime()
      Dedup.nearDupPairs(docs, "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SLOPE $label%-12s docs=$n%7d sec=$dt%7.2f us_per_doc=${dt * 1e6 / n}%7.1f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // JIT/codegen warmup outside the timed points
    time("warmup", graft.Tables(spark, "/root/testdata/sf0.001").documents)
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      time(sf, graft.Tables(spark, s"/root/testdata/$sf").documents)
    }
    // 10× corpus: replicate sf0.1 docs with distinct ids, suffixing every
    // TOKEN with the replica digit — replicas share no shingles across
    // reps (no artificial 10-way near-dup families), while each replica
    // preserves the original corpus's intra-rep near-dup structure, so
    // true pair density scales exactly 10×
    val base = graft.Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"), col("text"))
    Seq(10, 100).foreach { reps =>
      base.crossJoin(
          spark.range(reps).select(col("id").as("rep")))
        .select((col("doc_id") * reps + col("rep")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\w+)"),
            concat(lit("$1"), col("rep").cast("string"))).as("text"))
        .repartition(32)
        // materialize OUTSIDE the timed region: every point reads parquet
        .write.mode("overwrite").parquet(s"/tmp/graft_x$reps.parquet")
      time(s"sf0.1x$reps", spark.read.parquet(s"/tmp/graft_x$reps.parquet"))
    }
    spark.stop()
  }
}
