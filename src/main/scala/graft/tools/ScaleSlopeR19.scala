package graft.tools

import org.apache.spark.sql.functions._

/** Round-19 measurements for the new WAT / CDXJ-writer / request-parse
  * surface:
  *
  *  1. `wat`: watLinks + watMetadata parse throughput over x1/x10/x50
  *     generated envelopes. Claim: explicit-schema from_json is one
  *     scan-side Jackson pass — per-doc cost flat in corpus size.
  *
  *  2. `cdxjw`: writeCdxjGz + readCdxjGz over x1/x2/x4 index volumes
  *     (lines derived from real written corpora via warcCdx →
  *     warcCdxjLines). Claim: the write is ONE range exchange over
  *     skinny (surt, ts, line) rows + streamed gzip blocks, so time
  *     tracks line volume linearly; the two-level read-back is
  *     cluster.idx parse + one ranged read per block — also linear in
  *     block count.
  *
  *  3. `req`: httpRequestParts + xRobotsFlags over x1/x10/x50
  *     generated request messages. Claim: scan-side codegen'd kernel +
  *     array HOFs — per-row cost flat.
  *
  * Run: `sbt -batch "runMain graft.tools.ScaleSlopeR19
  * [wat|cdxjw|req]"`. */
object ScaleSlopeR19 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val only: Set[String] = args.headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def on(op: String) = only.isEmpty || only(op)

    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .where(col("doc_id").isNotNull && col("text").isNotNull)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (on("wat")) {
      for (rep <- Seq(1, 10, 50)) {
        val id = col("doc_id").cast("string")
        val env = concat(
          lit("{\"Envelope\":{\"WARC-Header-Metadata\":{" +
            "\"WARC-Target-URI\":\"http://h"), id,
          lit(".ex/p\"},\"Payload-Metadata\":{" +
            "\"HTTP-Response-Metadata\":{" +
            "\"Response-Message\":{\"Status\":\"200\"}," +
            "\"Headers\":{\"Content-Type\":\"text/html\"}," +
            "\"HTML-Metadata\":{\"Head\":{\"Title\":\"T "), id,
          lit("\"},\"Links\":[{\"path\":\"A@/href\",\"url\":\"/a/"), id,
          lit("\",\"text\":\"x\"},{\"path\":\"A@/href\"," +
            "\"url\":\"../b/"), id,
          lit("\"},{\"path\":\"IMG@/src\",\"url\":\"/i/"), id,
          lit(".jpg\"}]}}}}}"))
        val big = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(col("doc_id"), env.as("wat"))
        val (n, dt) = time {
          graft.ops.Web.watLinks(big, "doc_id", "wat")
            .select(col("url"), col("path"))
            .write.format("noop").mode("overwrite").save()
          big.count()
        }
        val (_, dtMeta) = time {
          big.select(graft.ops.Web.watMetadata(col("wat")))
            .write.format("noop").mode("overwrite").save()
        }
        println(f"[r19-wat] rep=$rep docs=$n t_links=$dt%.2f " +
          f"docs_per_s=${n / dt}%.0f t_meta=$dtMeta%.2f")
      }
    }

    if (on("cdxjw")) {
      for (rep <- Seq(1, 2, 4)) {
        val src = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(concat(lit("http://w"), (col("doc_id") % 97)
              .cast("string"), lit(".ex/d/"), col("doc_id"), lit("-"),
              col("r")).as("uri"),
            lit("2026-01-01T00:00:00Z").as("date"),
            encode(col("text"), "UTF-8").as("payload"))
        val wdir = java.nio.file.Files
          .createTempDirectory(s"graft_r19_corpus_$rep")
        wdir.toFile.deleteOnExit()
        graft.sources.WarcFiles.writeWarcGz(src, "uri", "date",
          "payload", wdir.toString, 8 * rep)
        val wfs = graft.sources.WarcFiles
        val lines = wfs.warcCdxjLines(
          wfs.warcCdx(spark, wdir.toString + "/*.warc.gz", 4L << 20))
          .localCheckpoint()
        val nLines = lines.count()
        val idir = java.nio.file.Files
          .createTempDirectory(s"graft_r19_idx_$rep")
        idir.toFile.deleteOnExit()
        val (_, tWrite) = time {
          wfs.writeCdxjGz(lines, idir.toString, 4 * rep,
            blockLines = 500).collect()
        }
        val (readN, tRead) = time {
          wfs.readCdxjGz(spark, idir.toString)
            .where(col("offset").isNotNull).count()
        }
        println(f"[r19-cdxjw] rep=$rep lines=$nLines " +
          f"t_write=$tWrite%.2f t_read2level=$tRead%.2f read=$readN%d")
      }
    }

    if (on("req")) {
      for (rep <- Seq(1, 10, 50)) {
        val id = col("doc_id").cast("string")
        val crlf = "\r\n"
        val msg = concat(lit("GET /p/"), id, lit(" HTTP/1.1" + crlf +
          "Host: h.ex" + crlf + "User-Agent: graftbot/1.0" + crlf +
          "X-Robots-Tag: graftbot: noindex" + crlf + crlf))
        val big = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(col("doc_id"), encode(msg, "US-ASCII").as("p"))
        val p = graft.ops.Web.httpRequestParts(col("p"))
        val (n, dt) = time {
          big.select(p.getField("method"), p.getField("user_agent"),
            graft.ops.Web.xRobotsFlags(p.getField("headers"), "graftbot")
              .getField("noindex"))
            .write.format("noop").mode("overwrite").save()
          big.count()
        }
        println(f"[r19-req] rep=$rep rows=$n t=$dt%.2f " +
          f"rows_per_s=${n / dt}%.0f")
      }
    }

    spark.stop()
  }
}
