package graft.tools

import org.apache.spark.sql.functions._

/** Round-18 measurements for the new CDXJ / selective-ingest /
  * image-extraction surface:
  *
  *  1. `cdxj`: serialize + parse throughput over real written corpora
  *     at x1/x2/x4 file scale — warcCdx → warcCdxjLines → cdxjRecords
  *     roundtrip. Claim: both directions are pure scan-side
  *     projections (regex + JSON path), so per-line cost is FLAT; the
  *     only non-map work is warcCdx's own index walk + skinny join
  *     (measured linear in r17).
  *
  *  2. `ranges`: selective ranged ingest (warcRecordsGzipRanges) of a
  *     1/3 selection vs the FULL chunked read of the same corpus.
  *     Claim: selective cost tracks the SELECTED byte volume, not the
  *     corpus size — the whole point of index-driven range fetch (plus
  *     a per-read constant: one FS open per selected member at this
  *     member grain).
  *
  *  3. `images`: htmlImages + srcsetUrls over x1/x10/x50 documents
  *     wrapped in a 3-img fixture page. Claim: scan-side tag scan +
  *     per-tag lambda projections — per-row cost flat in corpus size.
  *
  * Run: `sbt -batch "runMain graft.tools.ScaleSlopeR18
  * [cdxj|ranges|images]"`. */
object ScaleSlopeR18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def on(op: String) = only.isEmpty || only(op)

    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .where(col("doc_id").isNotNull && col("text").isNotNull)

    /** Write rep× copies of the documents as a real `.warc.gz` corpus;
      * returns (glob, nFiles, rows). */
    def corpus(rep: Int, shards: Int): (String, Long) = {
      val src = docs
        .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
        .select(concat(lit("http://w"), (col("doc_id") % 97)
            .cast("string"), lit(".ex/d/"), col("doc_id"), lit("-"),
            col("r")).as("uri"),
          lit("2026-01-01T00:00:00Z").as("date"),
          encode(col("text"), "UTF-8").as("payload"))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_r18_corpus_$rep")
      dir.toFile.deleteOnExit()
      graft.sources.WarcFiles.writeWarcGz(src, "uri", "date", "payload",
        dir.toString, shards)
      (dir.toString + "/*.warc.gz", src.count())
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (on("cdxj")) {
      for (rep <- Seq(1, 2, 4)) {
        val (glob, rows) = corpus(rep, 8 * rep)
        val wfs = graft.sources.WarcFiles
        val (cdxN, tCdx) = time {
          wfs.warcCdx(spark, glob, 4L << 20).count()
        }
        val (serN, tSer) = time {
          wfs.warcCdxjLines(wfs.warcCdx(spark, glob, 4L << 20))
            .write.format("noop").mode("overwrite").save(); 0L
        }
        val (parsedN, tPar) = time {
          wfs.cdxjRecords(
            wfs.warcCdxjLines(wfs.warcCdx(spark, glob, 4L << 20))
              .select(lit(1L).as("id"), col("line")),
            "id", "line")
            .where(col("offset").isNotNull).count()
        }
        println(f"[r18-cdxj] rep=$rep rows=$rows cdx=$cdxN%d " +
          f"t_cdx=$tCdx%.2f t_serialize=$tSer%.2f " +
          f"t_parse_roundtrip=$tPar%.2f parsed=$parsedN%d")
      }
    }

    if (on("ranges")) {
      for (rep <- Seq(1, 4)) {
        val (glob, rows) = corpus(rep, 8 * rep)
        val wfs = graft.sources.WarcFiles
        val idx = wfs.memberIndex(spark, glob).localCheckpoint()
        val (fullN, tFull) = time {
          wfs.warcRecordsGzipFilesIndexed(spark, idx, 4L << 20).count()
        }
        val sel = idx.where(col("clean") && col("member_idx") % 3 === 0)
          .select(col("path"), col("offset"), col("length"))
          .localCheckpoint()
        val (selN, tSel) = time {
          wfs.warcRecordsGzipRanges(spark, sel).count()
        }
        println(f"[r18-ranges] rep=$rep rows=$rows full=$fullN%d " +
          f"t_full=$tFull%.2f sel=$selN%d t_selective=$tSel%.2f " +
          f"sel_share=${selN.toDouble / fullN}%.3f")
      }
    }

    if (on("images")) {
      val f = graft.functions.TextFunctions
      for (rep <- Seq(1, 10, 50)) {
        val id = col("doc_id").cast("string")
        val page = concat(lit("<html><body><img src=\"/i/"), id,
          lit(".jpg\" alt=\"pic &amp; caption for \">"), col("text"),
          lit("<img src='/s/"), id, lit(".png' srcset=\"/s/"), id,
          lit("-1x.png 1x, /s/"), id, lit("-2x.png 2x\"><img src=/u/"),
          id, lit(".gif></body></html>"))
        val big = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(col("doc_id"), page.as("html"))
        val (n, dt) = time {
          big.select(explode(f.htmlImages(col("html"))).as("im"))
            .select(col("im.src"),
              array_join(f.srcsetUrls(col("im.srcset")), "|"))
            .write.format("noop").mode("overwrite").save(); big.count()
        }
        println(f"[r18-images] rep=$rep docs=$n t=$dt%.2f " +
          f"docs_per_s=${n / dt}%.0f")
      }
    }

    spark.stop()
  }
}
