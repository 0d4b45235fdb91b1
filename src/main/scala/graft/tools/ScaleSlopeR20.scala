package graft.tools

import org.apache.spark.sql.functions._

/** Round-20 measurements for the WAT/WET write side and the
  * exact-URL index lookup:
  *
  *  1. `watw`: watEnvelopeJson serialize + writeWatGz + full parse
  *     read-back over x1/x2/x4 corpus volumes. Claim: the serialize
  *     is one scan-side to_json pass and the write is the
  *     writeWarcGz machinery (one hash repartition over pre-gzipped
  *     members, streamed to files) — wall time linear in docs,
  *     per-doc cost flat.
  *
  *  2. `wetw`: writeWetGz (htmlText payload + digest/refers-to
  *     headers) + read-back over x1/x2/x4. Claim: the per-record
  *     sha1 digest and header render are scan-side; same linear
  *     shape as the bare writeWarcGz.
  *
  *  3. `lookupu`: cdxjLookupUrl against x1/x4/x16 index volumes.
  *     Claim: the two-level pruning makes lookup cost track the ONE
  *     URL's capture history (fixed here), NOT corpus size — wall
  *     time stays ~flat while the index grows 16×, because blocks
  *     outside the exact-key range are never fetched.
  *
  * Run: `sbt -batch "runMain graft.tools.ScaleSlopeR20
  * [watw|wetw|lookupu]"`. */
object ScaleSlopeR20 {
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

    if (on("watw")) {
      for (rep <- Seq(1, 2, 4)) {
        val id = col("doc_id").cast("string")
        val links = array(
          struct(lit("A@/href").as("path"),
            concat(lit("/rel/"), id).as("url"),
            concat(lit("Rel "), id).as("text"),
            lit(null).cast("string").as("title"),
            lit(null).cast("string").as("rel")),
          struct(lit("IMG@/src").as("path"),
            concat(lit("/i/"), id, lit(".jpg")).as("url"),
            lit(null).cast("string").as("text"),
            lit(null).cast("string").as("title"),
            lit(null).cast("string").as("rel")))
        val env = graft.ops.Web.watEnvelopeJson(
          concat(lit("http://h"), (col("doc_id") % 97).cast("string"),
            lit(".ex/p/"), id, lit("-"), col("r")),
          lit("2026-01-01T00:00:00Z"), lit("200"), lit("text/html"),
          concat(lit("Doc "), id), null, links)
        val src = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(concat(lit("http://h"), (col("doc_id") % 97)
              .cast("string"), lit(".ex/p/"), id, lit("-"),
              col("r")).as("uri"),
            lit("2026-01-01T00:00:00Z").as("date"), env.as("env"))
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_r20_wat_$rep")
        dir.toFile.deleteOnExit()
        val (m, tWrite) = time {
          graft.sources.WarcFiles.writeWatGz(src, "uri", "date",
            "env", dir.toString, 8 * rep).collect()
        }
        val n = m.map(_.getAs[Long]("n_records")).sum
        val (links2, tRead) = time {
          val back = graft.sources.WarcFiles.warcRecordsGzipFiles(
            spark, dir.toString + "/*.warc.gz", 4L << 20)
            .select(col("warc_record_id").as("rid"), col("payload"))
          graft.ops.Web.watLinks(back, "rid", "payload")
            .where(col("url").isNotNull).count()
        }
        println(f"[r20-watw] rep=$rep recs=$n t_write=$tWrite%.2f " +
          f"recs_per_s=${n / tWrite}%.0f t_readparse=$tRead%.2f " +
          f"links=$links2%d")
      }
    }

    if (on("wetw")) {
      for (rep <- Seq(1, 2, 4)) {
        val id = col("doc_id").cast("string")
        val html = concat(lit("<html><body><p>"), col("text"),
          lit("</p><b>t "), id, lit("</b></body></html>"))
        val src = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(concat(lit("http://h"), (col("doc_id") % 97)
              .cast("string"), lit(".ex/p/"), id, lit("-"),
              col("r")).as("uri"),
            lit("2026-01-01T00:00:00Z").as("date"),
            graft.functions.TextFunctions.htmlText(html)
              .as("wet_text"),
            concat(lit("urn:uuid:o-"), id).as("refers"))
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_r20_wet_$rep")
        dir.toFile.deleteOnExit()
        val (m, tWrite) = time {
          graft.sources.WarcFiles.writeWetGz(src, "uri", "date",
            "wet_text", dir.toString, 8 * rep,
            refersToCol = "refers").collect()
        }
        val n = m.map(_.getAs[Long]("n_records")).sum
        val (ok, tRead) = time {
          graft.sources.WarcFiles.warcRecordsGzipFiles(spark,
              dir.toString + "/*.warc.gz", 4L << 20)
            .where(col("warc_payload_digest") ===
              graft.ops.Web.payloadDigest(col("payload")))
            .count()
        }
        println(f"[r20-wetw] rep=$rep recs=$n t_write=$tWrite%.2f " +
          f"recs_per_s=${n / tWrite}%.0f t_readverify=$tRead%.2f " +
          f"digest_ok=$ok%d")
      }
    }

    if (on("lookupu")) {
      for (rep <- Seq(1, 4, 16)) {
        val id = col("doc_id").cast("string")
        val hit = col("doc_id") % 997 === 7 && col("r") === 0
        val surt = when(hit, lit("ex,target)/cap"))
          .otherwise(concat(lit("ex,h"), (col("doc_id") % 97)
            .cast("string"), lit(")/d/"), id, lit("-"), col("r")))
        val ts = (lit(20260101000000L) + col("doc_id")).cast("string")
        val lines = docs
          .crossJoin(broadcast(spark.range(rep).select(col("id").as("r"))))
          .select(surt.as("surt"), ts.as("ts"),
            concat(surt, lit(" "), ts,
              lit(" {\"url\": \"http://target.ex/cap\", " +
                "\"digest\": \"sha1:D"), id, lit("\"}")).as("line"))
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_r20_idx_$rep")
        dir.toFile.deleteOnExit()
        graft.sources.WarcFiles.writeCdxjGz(lines, dir.toString,
          4 * rep, blockLines = 500)
        val (n, tLookup) = time {
          graft.sources.WarcFiles.cdxjLookupUrl(spark, dir.toString,
            "http://target.ex/cap").count()
        }
        println(f"[r20-lookupu] rep=$rep captures=$n%d " +
          f"t_lookup=$tLookup%.2f (index grows ${rep}x, lookup " +
          "should stay ~flat)")
      }
    }

    spark.stop()
  }
}
