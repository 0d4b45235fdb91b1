package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftnative.{NativeFunctions, SqlFunctions}

/** SQL function surface (SparkSessionExtensions.injectFunction): every
  * graft native expression is callable from `spark.sql(...)` and plans the
  * SAME Catalyst kernel as the DataFrame API — checked by value parity and
  * by the codegen pin (no UDF wrapping, no fallback). */
class ExtensionsSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val docs = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("ext_docs")
    d
  }

  test("graft_text_stats: SQL path matches the DataFrame API path") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id, graft_text_stats(text) AS st FROM ext_docs""")
    val viaApi = docs.select(col("doc_id"),
      NativeFunctions.textStats(col("text")).as("st"))
    assert(viaSql.orderBy("doc_id").collect().toSeq ===
      viaApi.orderBy("doc_id").collect().toSeq)
  }

  test("graft_shingle_hashes + graft_minhash + graft_simhash64 parity") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash_from_longs(
        |    graft_shingle_hashes(split(lower(text), '\\W+'), 3), 16) AS mh,
        |  graft_simhash64(
        |    graft_shingle_hashes(split(lower(text), '\\W+'), 1)) AS sh
        |FROM ext_docs""".stripMargin)
    val toks = split(lower(col("text")), "\\W+")
    val viaApi = docs.select(col("doc_id"),
      NativeFunctions.minhashFromLongs(
        NativeFunctions.shingleHashes(toks, 3), 16).as("mh"),
      NativeFunctions.simhash64(
        NativeFunctions.shingleHashes(toks, 1)).as("sh"))
    assert(viaSql.orderBy("doc_id").collect().toSeq ===
      viaApi.orderBy("doc_id").collect().toSeq)
  }

  test("graft_minhash (string shingles) and graft_cosine work from SQL") {
    val r = spark.sql(
      """SELECT graft_minhash(array('a b c', 'b c d'), 4) AS mh,
        |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos
        |""".stripMargin).collect().head
    assert(r.getSeq[Long](0).length === 4)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_html_text: SQL path matches the DataFrame API path") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id, graft_html_text(
        |  '<p>' || text || '</p><script>x</script>') AS t
        |FROM ext_docs""".stripMargin)
    val viaApi = docs.select(col("doc_id"),
      NativeFunctions.htmlExtractText(concat(
        lit("<p>"), col("text"), lit("</p><script>x</script>"))).as("t"))
    assert(viaSql.orderBy("doc_id").collect().toSeq ===
      viaApi.orderBy("doc_id").collect().toSeq)
  }

  test("graft_url_resolve: SQL path matches the DataFrame API path " +
      "(incl. the null-on-schemeless-base contract)") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_url_resolve('http://a/b/c/d;p?q',
        |    'x' || CAST(doc_id AS STRING) || '/../g') AS u,
        |  graft_url_resolve('no-scheme', 'g') AS n
        |FROM ext_docs""".stripMargin)
    val viaApi = docs.select(col("doc_id"),
      graft.ops.Web.resolveUrl(lit("http://a/b/c/d;p?q"),
        concat(lit("x"), col("doc_id").cast("string"), lit("/../g")))
        .as("u"),
      graft.ops.Web.resolveUrl(lit("no-scheme"), lit("g")).as("n"))
    assert(viaSql.orderBy("doc_id").collect().toSeq ===
      viaApi.orderBy("doc_id").collect().toSeq)
    assert(viaApi.where(col("u") =!= "http://a/b/c/g").count() === 0)
  }

  test("foldable int expressions are accepted as static parameters") {
    docs
    val r = spark.sql(
      "SELECT graft_minhash_from_longs(array(1L, 2L), CAST(1 + 1 AS INT)) AS sig FROM ext_docs LIMIT 1")
      .collect().head
    assert(r.getSeq[Long](0).length === 2)
  }

  test("static int parameters must be literals (fail-fast at analysis)") {
    docs
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash_from_longs(array(1L), CAST(doc_id AS INT)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("INT literal"), e.getMessage)
  }

  test("foldable param that throws at eval gets the friendly literal error") {
    docs
    // ANSI CAST overflow: foldable, IntegerType, but eval() throws — must
    // surface as the 'must be an INT literal' analysis error, not a raw
    // ArithmeticException mid-analysis
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash_from_longs(array(1L), CAST(9999999999 AS INT)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("INT literal"), e.getMessage)
  }

  test("wrong arity fails fast") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(array(1L), 2) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("expects 1 argument"), e.getMessage)
  }

  test("SQL-path expressions stay inside whole-stage codegen") {
    docs // ensure view
    val p = spark.sql(
      """SELECT doc_id, graft_text_stats(text).ntok AS ntok FROM ext_docs""")
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(1000))
    assert(!p.contains("CodegenFallback"), p.take(1000))
  }

  test("runtime register() is idempotent and keeps the surface callable") {
    SqlFunctions.register(spark)
    SqlFunctions.register(spark)
    val got = spark.sql("SELECT graft_simhash64(array(7L)) AS h")
      .collect().head.getLong(0)
    val expected = spark.range(1)
      .select(NativeFunctions.simhash64(lit(Array(7L))).as("h"))
      .collect().head.getLong(0)
    assert(got === expected)
  }

  // ---- SQL TABLE-FUNCTION surface (injectTableFunction) --------------

  private lazy val events = {
    // Tables normalizes ts to TIMESTAMP (testdata writes TIMESTAMP_NTZ);
    // a raw NTZ view fails sessionize with the engine's own typed
    // analysis error — the view a user passes is the normalized ingest
    val e = Tables(spark, "/root/testdata/sf0.001").events
    e.createOrReplaceTempView("ext_events")
    e
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .sorted.toSeq

  test("graft_rfm is NOT a table function (eligibility rule: its " +
      "groupedCumSum kernel collects at build time — ADVICE r15)") {
    events
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_rfm('ext_events', 'user_id', 'ts', 'value')")
        .collect()
    }
    // the engine's own unresolved-TVF error, not a graft crash
    assert(e.getMessage.toLowerCase.contains("graft_rfm"), e.getMessage)
  }

  test("graft_sessionize table function matches sessionizeBatch") {
    events
    val viaSql = spark.sql("SELECT * FROM graft_sessionize(" +
      "'ext_events', 'user_id', 'ts', 'value', 1800000)")
    val viaApi = graft.streaming.Streaming.sessionizeBatch(
      events, "user_id", "ts", "value", 1800000L)
    assert(sortedRows(viaSql.select(viaApi.columns.sorted.map(col): _*)) ===
      sortedRows(viaApi.select(viaApi.columns.sorted.map(col): _*)))
  }

  test("graft_target_encode table function matches targetEncode, " +
      "defaults applied") {
    events
    val viaSql = spark.sql("SELECT * FROM graft_target_encode(" +
      "'ext_events', 'event_id', 'event_type', 'value')")
    val viaApi = graft.ops.Sampling.targetEncode(
      events, "event_id", "event_type", "value")
    assert(sortedRows(viaSql.select(viaApi.columns.sorted.map(col): _*)) ===
      sortedRows(viaApi.select(viaApi.columns.sorted.map(col): _*)))
  }

  test("graft_exact_dedup + graft_topk_per_group run from SQL and " +
      "match the DF path") {
    docs; events
    val d1 = spark.sql(
      "SELECT * FROM graft_exact_dedup('ext_docs', 'text', 'doc_id')")
    val d2 = graft.ops.Dedup.exactDedup(docs, "text", "doc_id")
    assert(sortedRows(d1.select(d2.columns.sorted.map(col): _*)) ===
      sortedRows(d2.select(d2.columns.sorted.map(col): _*)))
    val t1 = spark.sql("SELECT * FROM graft_topk_per_group(" +
      "'ext_events', 'value', 3, 'event_type')")
    val t2 = org.apache.spark.sql.graftnative.GraftExtensions
      .topKPerGroup(events, Seq("event_type"), "value", 3)
    assert(sortedRows(t1.select(t2.columns.sorted.map(col): _*)) ===
      sortedRows(t2.select(t2.columns.sorted.map(col): _*)))
  }

  test("table functions compose with outer SQL (filter + projection " +
      "above the TVF)") {
    events
    val n = spark.sql(
      """SELECT user_id, events
        |FROM graft_sessionize('ext_events', 'user_id', 'ts', 'value',
        |  1800000)
        |WHERE events > 0""".stripMargin)
      .count()
    assert(n > 0)
  }

  test("graft_warc_records / graft_sitemap_entries / " +
      "graft_robots_decide table functions match their DF paths") {
    docs
    // WARC: wrap each document's text as a one-record WET body
    val crlf = "\r\n"
    val warc = concat(
      lit("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
        "Content-Length: "), length(col("text")).cast("string"),
      lit(crlf + crlf), col("text"), lit(crlf + crlf))
    docs.select(col("doc_id"), warc.as("warc"))
      .createOrReplaceTempView("ext_warc")
    val w1 = spark.sql(
      "SELECT * FROM graft_warc_records('ext_warc', 'doc_id', 'warc')")
    val w2 = graft.ops.Web.warcRecords(
      spark.table("ext_warc"), "doc_id", "warc")
    assert(sortedRows(w1.select(w2.columns.sorted.map(col): _*)) ===
      sortedRows(w2.select(w2.columns.sorted.map(col): _*)))
    // .warc.gz variant: one gzip member per record
    spark.table("ext_warc").select(col("doc_id"),
      org.apache.spark.sql.graftnative.WebFunctions
        .gzipCompress(col("warc").cast("binary")).as("gz"))
      .createOrReplaceTempView("ext_warc_gz")
    // payload is BINARY (Array[Byte] stringifies by identity) — cast
    // for the row comparison
    val g1 = spark.sql(
      "SELECT * FROM graft_warc_gzip('ext_warc_gz', 'doc_id', 'gz')")
      .withColumn("payload", col("payload").cast("string"))
    val g2 = graft.ops.Web.warcRecordsGzip(
      spark.table("ext_warc_gz"), "doc_id", "gz")
      .withColumn("payload", col("payload").cast("string"))
    assert(sortedRows(g1.select(g2.columns.sorted.map(col): _*)) ===
      sortedRows(g2.select(g2.columns.sorted.map(col): _*)))
    assert(g2.count() > 0)
    // the full SQL-surface ingest chain in ONE query: .warc.gz TVF →
    // charset-decode scalar → html-text scalar
    val chain = spark.sql(
      """SELECT doc_id,
        |  graft_html_text(graft_charset_decode(payload).text) AS t
        |FROM graft_warc_gzip('ext_warc_gz', 'doc_id', 'gz')
        |WHERE warc_type = 'conversion'""".stripMargin)
    assert(chain.count() > 0)
    assert(chain.where(col("t").isNull || length(col("t")) === 0)
      .count() === 0)
    // sitemap
    docs.select(col("doc_id"), concat(lit("<urlset><url><loc>u"),
      col("doc_id").cast("string"), lit("</loc></url></urlset>"))
      .as("xml")).createOrReplaceTempView("ext_sm")
    val s1 = spark.sql(
      "SELECT * FROM graft_sitemap_entries('ext_sm', 'doc_id', 'xml')")
    val s2 = graft.ops.Web.sitemapEntries(
      spark.table("ext_sm"), "doc_id", "xml")
    assert(sortedRows(s1.select(s2.columns.sorted.map(col): _*)) ===
      sortedRows(s2.select(s2.columns.sorted.map(col): _*)))
    // robots verdicts
    docs.select(col("doc_id"), concat(lit("http://h.ex/p/"),
      col("doc_id").cast("string")).as("url"))
      .createOrReplaceTempView("ext_urls")
    spark.createDataFrame(Seq(
      ("h.ex", "User-agent: *\nDisallow: /p/1\n")))
      .toDF("host", "txt").createOrReplaceTempView("ext_robots")
    val r1 = spark.sql("SELECT * FROM graft_robots_decide(" +
      "'ext_urls', 'url', 'ext_robots', 'host', 'txt', 'gbot')")
    val r2 = graft.ops.Web.robotsDecisions(spark.table("ext_urls"),
      "url", spark.table("ext_robots"), "host", "txt", "gbot")
    assert(sortedRows(r1.select(r2.columns.sorted.map(col): _*)) ===
      sortedRows(r2.select(r2.columns.sorted.map(col): _*)))
    assert(r1.where(!col("allowed")).count() > 0)
  }

  test("graft_warc_files: the FILE-reader table function matches the " +
      "DataFrame path and composes with outer SQL") {
    val crlf = "\r\n"
    def rec(uri: String, p: String): String =
      "WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
        s"WARC-Target-URI: $uri" + crlf +
        "Content-Length: " + p.getBytes("UTF-8").length + crlf +
        crlf + p + crlf + crlf
    def gz(x: String): Array[Byte] =
      org.apache.spark.sql.graftnative.GzipCompress
        .compute(x.getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_files")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      (1 to 5).map(i => gz(rec(s"http://t.ex/$i", s"pay $i")))
        .reduce(_ ++ _))
    val q1 = spark.sql("SELECT * FROM graft_warc_files('" +
        dir.toString + "/*.warc.gz', 64)")
      .withColumn("payload", col("payload").cast("string"))
    val q2 = graft.sources.WarcFiles
      .warcRecordsGzipFiles(spark, dir.toString + "/*.warc.gz", 64L)
      .withColumn("payload", col("payload").cast("string"))
    assert(sortedRows(q1.select(q2.columns.sorted.map(col): _*)) ===
      sortedRows(q2.select(q2.columns.sorted.map(col): _*)))
    // outer SQL composes: filter + scalar chain over the TVF
    val n = spark.sql("SELECT count(*) FROM graft_warc_files('" +
        dir.toString + "/*.warc.gz') WHERE target_uri LIKE '%t.ex%'")
      .head().getLong(0)
    assert(n == 5L)
  }

  test("graft_http_parts + graft_charset_decode_hint: the response-" +
      "record chain runs from pure SQL and matches the DataFrame API") {
    val s = spark
    import s.implicits._
    Seq((1L, "body text é"), (2L, "second doc é"))
      .toDF("id", "txt")
      .select(col("id"), concat(
        encode(lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
          "charset=iso-8859-1\r\n\r\n"), "US-ASCII"),
        encode(col("txt"), "ISO-8859-1")).as("resp"))
      .createOrReplaceTempView("ext_http")
    val viaSql = spark.sql(
      """SELECT id, graft_http_parts(resp).status_code AS sc,
        |  graft_http_parts(resp).body_mode AS mode,
        |  graft_charset_decode_hint(graft_http_parts(resp).body,
        |    'text/plain; charset=iso-8859-1').text AS t,
        |  graft_charset_decode_hint(graft_http_parts(resp).body,
        |    'text/plain; charset=iso-8859-1').source AS src
        |FROM ext_http""".stripMargin)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(viaSql == Seq(
      (1L, 200, "identity", "body text é", "header"),
      (2L, 200, "identity", "second doc é", "header")))
    val p = graft.ops.Web.httpParts(col("resp"))
    val viaApi = spark.table("ext_http")
      .select(col("id"), graft.ops.Web.decodeTextHinted(
        p.getField("body"),
        graft.ops.Web.httpHeader(p.getField("headers"), "content-type"))
        .getField("text").as("t"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaApi == viaSql.map(v => (v._1, v._4)))
  }

  test("table function errors are friendly: missing view fails with the " +
      "engine's named error, non-literal table name fails fast") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_exact_dedup(" +
        "'no_such_view_xyz', 'text', 'doc_id')").collect()
    }
    assert(e1.getMessage.contains("no_such_view_xyz"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_exact_dedup(" +
        "lower(rand()::string), 'text', 'doc_id')").collect()
    }
    assert(e2.getMessage.contains("STRING literal") ||
      e2.getMessage.contains("table"))
  }
}
