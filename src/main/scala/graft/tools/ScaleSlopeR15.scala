package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 measurements:
  *
  *  1. [[graft.sources.IO.writeShards]] at TRAINING-SCALE shard counts
  *     (512–4096; real training layouts, vs the 64 measured in r14).
  *     The claim under test: cost is bound by output FILE COUNT (one
  *     file per shard via the repartition-first partitioned writer),
  *     not by row count — so the shard sweep holds rows fixed at 10M
  *     and scales only nShards. The commit protocol (FileOutputCommitter
  *     v1 driver-side rename of every task dir) is the expected
  *     file-count-linear term.
  *
  *  2. pcaTrain x1/x10/x100 — the one r14-tier operator whose slope
  *     was not in the ScaleSlopeR14b table. Claim: ONE
  *     CovarianceMoments pass, 8·dim² bytes per task partial — linear
  *     in rows with a constant driver eigensolve tail.
  *
  *  3. The r15 HTML tier x1/x10/x100: htmlText + htmlStats + htmlLinks
  *     + htmlTitle over documents wrapped in the same deterministic
  *     HTML shape the oracles use. Claim: pure scan-side
  *     native-expression passes — no shuffle, no state — so per-row
  *     cost must be FLAT in corpus size (the only moving part is the
  *     single-pass kernel over each document's bytes).
  *
  *  4. The r15 crawl tier x1/x10/x100: mainContent (split + HOF block
  *     scoring, the heaviest html-tier kernel) and warcRecords
  *     (split + posexplode + header regexes) over the oracle-shaped
  *     inputs. Claim: both are scan-side only (no shuffle beyond the
  *     explode fan-out) — per-row cost flat-to-falling.
  *
  * Run: `sbt -batch "runMain graft.tools.ScaleSlopeR15
  * [shards|pca|html|crawl]"`. */
object ScaleSlopeR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def on(op: String) = only.isEmpty || only(op)

    val t = graft.Tables(spark, "/root/testdata/sf0.1")

    if (on("shards")) {
      // 10M rows: x100 replicas of sf0.1 events, offset ids
      val base = t.events.select(col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      val big = base
        .crossJoin(spark.range(100).select(col("id").as("rep")))
        .select((col("event_id") + col("rep") * 1000000000L)
          .as("event_id"), col("user_id"), col("event_type"), col("value"))
      val n = big.count()
      for (nShards <- Seq(64, 512, 1024, 2048, 4096)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_shards_$nShards").toString
        val t0 = System.nanoTime()
        graft.sources.IO.writeShards(big, dir, "event_id", nShards)
        val dt = (System.nanoTime() - t0) / 1e9
        // count data files + verify one-file-per-shard held
        val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .filter(p => p.getFileName.toString.startsWith("part-"))
          .count()
        println(f"SLOPE shards=$nShards%5d n=$n%9d sec=$dt%8.2f " +
          f"files=$files%5d ms_per_file=${dt * 1e3 / files}%7.1f")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
        spark.catalog.clearCache()
      }
    }

    if (on("pca")) {
      val baseE = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      for ((label, r) <- Seq(("x1", 1), ("x10", 10), ("x100", 100))) {
        val e =
          if (r == 1) baseE
          else baseE.crossJoin(spark.range(r).select(col("id").as("rep")))
            .select((col("vec_id") + col("rep") * 10000000L)
              .as("vec_id"), col("embedding"))
        val n = e.count()
        val t0 = System.nanoTime()
        val model = graft.ops.Similarity.pcaTrain(e, k = 16)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SLOPE pca $label%-5s n=$n%9d sec=$dt%8.2f " +
          f"us_per_row=${dt * 1e6 / n}%8.1f nModel=${model.n}%d")
        spark.catalog.clearCache()
      }
    }

    if (on("html")) {
      import org.apache.spark.sql.types.StringType
      import graft.functions.TextFunctions
      val baseD = spark.read
        .parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
      for ((label, r) <- Seq(("x1", 1), ("x10", 10), ("x100", 100))) {
        val d =
          if (r == 1) baseD
          else baseD.crossJoin(spark.range(r).select(col("id").as("rep")))
            .select((col("doc_id") + col("rep") * 100000000L)
              .as("doc_id"), col("source"), col("lang"), col("text"))
        // same deterministic wrapper shape as the oracle rows (doctype,
        // title, style+script, comment, blocks, inline a/b, entities)
        val html = concat(
          lit("<!DOCTYPE html><html><head><title>Doc "),
          col("doc_id").cast(StringType),
          lit("</title><style>body { color: #333; }</style>" +
            "<script>var n = 1 < 2 && \"q\";</script>" +
            "</head><body><!-- source "),
          col("source"),
          lit(" --><h1>Doc "), col("doc_id").cast(StringType),
          lit("</h1><p>lang &quot;"), col("lang"),
          lit("&quot; &amp; <b>"), col("source"),
          lit("</b></p><div><p>"), col("text"),
          lit("</p><a href=\"/d/"), col("doc_id").cast(StringType),
          lit("\">next&nbsp;&gt;</a></div></body></html>"))
        val n = d.count()
        val st = TextFunctions.htmlStats(html)
        val t0 = System.nanoTime()
        d.select(col("doc_id"),
            length(TextFunctions.htmlText(html)).as("n_text"),
            st.getField("text_share_micro").as("share"),
            size(TextFunctions.htmlLinks(html)).as("n_links"),
            length(TextFunctions.htmlTitle(html)).as("n_title"))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SLOPE html $label%-5s n=$n%9d sec=$dt%8.2f " +
          f"us_per_row=${dt * 1e6 / n}%8.1f")
        spark.catalog.clearCache()
      }
    }

    if (on("crawl")) {
      import org.apache.spark.sql.types.StringType
      import graft.functions.TextFunctions
      val baseD = spark.read
        .parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text"))
      for ((label, r) <- Seq(("x1", 1), ("x10", 10), ("x100", 100))) {
        val d =
          if (r == 1) baseD
          else baseD.crossJoin(spark.range(r).select(col("id").as("rep")))
            .select((col("doc_id") + col("rep") * 100000000L)
              .as("doc_id"), col("text"))
        val id = col("doc_id").cast(StringType)
        val html = concat(
          lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/a/"),
          id, lit("\">Archive</a></nav><h1>Doc "), id, lit("</h1><p>"),
          col("text"), lit("</p><div>"), col("text"),
          lit(" See <a href=\"/r/"), id, lit("\">related</a>.</div>" +
            "<footer><a href=\"/t\">Terms</a></footer></body></html>"))
        val crlf = "\r\n"
        val warc = concat(
          lit("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
            "WARC-Target-URI: http://x/"), id,
          lit(crlf + "Content-Length: "), length(col("text")).cast(StringType),
          lit(crlf + crlf), col("text"), lit(crlf + crlf))
        val n = d.count()
        val m = TextFunctions.mainContent(html)
        val t0 = System.nanoTime()
        d.select(col("doc_id"),
            length(m.getField("main_text")).as("mc"),
            m.getField("n_kept").as("nk"))
          .write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        graft.ops.Web.warcRecords(
            d.select(col("doc_id"), warc.as("warc")), "doc_id", "warc")
          .select(col("doc_id"), col("rec_idx"), length(col("payload")))
          .write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val (dm, dw) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
        println(f"SLOPE crawl $label%-5s n=$n%9d main_sec=$dm%8.2f " +
          f"main_us=${dm * 1e6 / n}%8.1f warc_sec=$dw%8.2f " +
          f"warc_us=${dw * 1e6 / n}%8.1f")
        spark.catalog.clearCache()
      }
    }
  }
}
