package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web

/** Crawl ingest formats: WARC record splitting ([[Web.warcRecords]])
  * and sitemap parsing ([[Web.sitemapEntries]] / [[Web.sitemapIndex]]).
  * Pins the constrained semantics: version-line record boundaries,
  * header-block/blank-line split, trailing-CRLF payload strip,
  * null-tolerant headers, document-order blocks, missing loc kept as
  * a null row.
  */
class CrawlFormatsSpec extends AnyFunSuite {
  import SparkFixture._

  private val CRLF = "\r\n"

  private def recs(warc: String)
      : Seq[(Int, String, String, Any, String)] = {
    val s = spark
    import s.implicits._
    Web.warcRecords(Seq((1L, warc)).toDF("id", "warc"), "id", "warc")
      .orderBy("rec_idx")
      .select(col("rec_idx"), col("warc_type"), col("target_uri"),
        col("content_length"), col("payload"))
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        r.getString(4))).toSeq
  }

  test("warcRecords: two records, headers parsed, trailing CRLFs " +
      "stripped from payload, prefix before first record ignored") {
    val w = "junk prefix" + CRLF +
      "WARC/1.0" + CRLF +
      "WARC-Type: warcinfo" + CRLF +
      "Content-Length: 4" + CRLF + CRLF +
      "info" + CRLF + CRLF +
      "WARC/1.0" + CRLF +
      "WARC-Type: conversion" + CRLF +
      "WARC-Target-URI: http://ex.com/p" + CRLF +
      "Content-Length: 11" + CRLF + CRLF +
      "hello" + CRLF + "world" + CRLF + CRLF
    assert(recs(w) == Seq(
      (1, "warcinfo", null, 4L, "info"),
      (2, "conversion", "http://ex.com/p", 11L, "hello\r\nworld")))
  }

  test("warcRecords: missing headers -> null; junk Content-Length -> " +
      "null; header-only record -> empty payload; case-insensitive " +
      "header names") {
    val w = "WARC/1.0" + CRLF +
      "warc-type: response" + CRLF +
      "content-length: 12abc" + CRLF + CRLF +
      "body" + CRLF + CRLF +
      "WARC/1.0" + CRLF +
      "WARC-Type: metadata" + CRLF  // no blank line, no payload
    assert(recs(w) == Seq(
      (1, "response", null, null, "body"),
      (2, "metadata", null, null, "")))
  }

  test("sitemapEntries: document order, lastmod optional, missing " +
      "loc kept as null row, attributes tolerated, CDATA loc honored") {
    val s = spark
    import s.implicits._
    val xml = """<?xml version="1.0"?><urlset xmlns="x">""" +
      "<url><loc> http://a/1 </loc><lastmod>2026-01-02</lastmod></url>" +
      "<url attr=\"z\"><loc>http://a/2</loc></url>" +
      "<url><priority>0.5</priority></url>" +
      "<url><loc><![CDATA[ http://a/3?x=1&y=2 ]]></loc></url>" +
      "<url><loc>\n<![CDATA[http://a/4]]>\n</loc></url></urlset>"
    val got = Web.sitemapEntries(
      Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .orderBy("url_idx")
      .select(col("url_idx"), col("loc"), col("lastmod"))
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq((0, "http://a/1", "2026-01-02"),
      (1, "http://a/2", null), (2, null, null),
      (3, "http://a/3?x=1&y=2", null), (4, "http://a/4", null)))
  }

  test("sitemapIndex: child locs in order; urlset/sitemapindex " +
      "container tags never match the entry patterns") {
    val s = spark
    import s.implicits._
    val xml = "<sitemapindex>" +
      "<sitemap><loc>http://a/sm1.xml</loc></sitemap>" +
      "<sitemap x=\"1\"><loc> http://a/sm2.xml </loc></sitemap>" +
      "</sitemapindex>"
    val got = Seq(xml).toDF("x")
      .select(Web.sitemapIndex(col("x")).as("l"))
      .as[Seq[String]].first()
    assert(got == Seq("http://a/sm1.xml", "http://a/sm2.xml"))
  }

  test("warc_record_id / warc_concurrent_to extraction strips angle " +
      "brackets; warcRequestResponsePairs pairs ALL THREE conventions " +
      "(incl. double-linked, exactly once) and never pairs unlinked " +
      "records") {
    val s = spark
    import s.implicits._
    def rec(typ: String, uri: String, date: String, rid: String,
        cto: String, pay: String): String =
      "WARC/1.0" + CRLF + s"WARC-Type: $typ" + CRLF +
        (if (rid != null) s"WARC-Record-ID: <$rid>" + CRLF else "") +
        (if (cto != null) s"WARC-Concurrent-To: <$cto>" + CRLF else "") +
        (if (uri != null) s"WARC-Target-URI: $uri" + CRLF else "") +
        s"WARC-Date: $date" + CRLF +
        "Content-Length: " + pay.getBytes("UTF-8").length + CRLF +
        CRLF + pay + CRLF + CRLF
    // Heritrix convention: request links to the response
    val a = rec("response", "http://a/1", "2026-01-01T00:00:05Z",
      "urn:uuid:ra", null, "resp a") +
      rec("request", "http://a/1", "2026-01-01T00:00:00Z",
        "urn:uuid:qa", "urn:uuid:ra", "req a")
    // flipped convention: response links to the request
    val b = rec("response", "http://b/2", "2026-01-01T00:00:09Z",
      "urn:uuid:rb", "urn:uuid:qb", "resp b") +
      rec("request", "http://b/2", "2026-01-01T00:00:00Z",
        "urn:uuid:qb", null, "req b")
    // unlinked: neither side carries Concurrent-To -> never pairs
    val c = rec("response", "http://c/3", "2026-01-01T00:00:01Z",
      "urn:uuid:rc", null, "resp c") +
      rec("request", "http://c/3", "2026-01-01T00:00:00Z",
        "urn:uuid:qc", null, "req c")
    // double-linked convention (r18 advice): both records point at
    // each other -> must pair EXACTLY ONCE, not twice
    val d = rec("response", "http://d/4", "2026-01-01T00:00:02Z",
      "urn:uuid:rd", "urn:uuid:qd", "resp d") +
      rec("request", "http://d/4", "2026-01-01T00:00:00Z",
        "urn:uuid:qd", "urn:uuid:rd", "req d")
    val records = Web.warcRecordsBinary(
      Seq((1L, (a + b + c + d).getBytes("UTF-8"))).toDF("id", "bin"),
      "id", "bin")
    // extraction: brackets stripped, absent header -> null
    val ids = records.orderBy("rec_idx")
      .select(col("warc_record_id"), col("warc_concurrent_to"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(ids == Seq(("urn:uuid:ra", null), ("urn:uuid:qa", "urn:uuid:ra"),
      ("urn:uuid:rb", "urn:uuid:qb"), ("urn:uuid:qb", null),
      ("urn:uuid:rc", null), ("urn:uuid:qc", null),
      ("urn:uuid:rd", "urn:uuid:qd"), ("urn:uuid:qd", "urn:uuid:rd")))
    val pairs = Web.warcRequestResponsePairs(records)
      .orderBy("target_uri")
      .select(col("target_uri"), col("response_id"), col("request_id"),
        col("response_payload").cast("string"),
        col("request_payload").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(pairs == Seq(
      ("http://a/1", "urn:uuid:ra", "urn:uuid:qa", "resp a", "req a"),
      ("http://b/2", "urn:uuid:rb", "urn:uuid:qb", "resp b", "req b"),
      ("http://d/4", "urn:uuid:rd", "urn:uuid:qd", "resp d", "req d")))
  }

  test("watEnvelope/watMetadata/watLinks: typed fields from the WAT " +
      "JSON envelope; junk payload -> null metadata and ONE null link " +
      "row; empty envelope -> null fields, row kept") {
    val s = spark
    import s.implicits._
    val wat = """{"Envelope":{"WARC-Header-Metadata":{""" +
      """"WARC-Target-URI":"http://ex.com/p","WARC-Date":""" +
      """"2026-01-01T00:00:00Z","WARC-Type":"metadata"},""" +
      """"Payload-Metadata":{"HTTP-Response-Metadata":{""" +
      """"Response-Message":{"Status":"200"},""" +
      """"Headers":{"Content-Type":"text/html; charset=utf-8",""" +
      """"Server":"x"},"HTML-Metadata":{""" +
      """"Head":{"Title":"A title","Base":"http://ex.com/base/"},""" +
      """"Links":[{"path":"A@/href","url":"/a","text":"first"},""" +
      """{"path":"IMG@/src","url":"i.png"},""" +
      """{"path":"A@/href","url":"../b","rel":"nofollow"}]}}}},""" +
      """"Container":{"Filename":"f.warc.gz","Offset":"123"}}"""
    // r19 advice: a Headers object WITHOUT a Content-Type key —
    // routine in real WAT (redirects, non-HTML) — must degrade
    // content_type to null, never throw ANSI MAP_KEY_DOES_NOT_EXIST
    val watNoCt = """{"Envelope":{"WARC-Header-Metadata":{""" +
      """"WARC-Target-URI":"http://ex.com/r"},""" +
      """"Payload-Metadata":{"HTTP-Response-Metadata":{""" +
      """"Response-Message":{"Status":"301"},""" +
      """"Headers":{"Location":"http://ex.com/moved"}}}}}"""
    val df = Seq((1L, wat), (2L, "shapeless junk, not json"),
      (3L, "{}"), (4L, watNoCt)).toDF("id", "p")
    val m = df.select(col("id"), Web.watMetadata(col("p")).as("m"))
      .orderBy("id").collect()
    val m1 = m(0).getStruct(1)
    assert(m1.getString(0) == "http://ex.com/p" &&
      m1.getString(1) == "2026-01-01T00:00:00Z" &&
      m1.getString(2) == "200" &&
      m1.getString(3) == "text/html; charset=utf-8" &&
      m1.getString(4) == "A title" &&
      m1.getString(5) == "http://ex.com/base/" &&
      m1.getInt(6) == 3)
    assert(m(1).isNullAt(1)) // junk -> null struct
    assert(m(2).isNullAt(1)) // no Envelope -> null struct
    val m4 = m(3).getStruct(1) // Headers without Content-Type
    assert(m4.getString(0) == "http://ex.com/r" &&
      m4.getString(2) == "301" && m4.isNullAt(3) && m4.isNullAt(6))
    val l = Web.watLinks(df.where(col("id") <= 3), "id", "p")
      .orderBy("id", "link_idx")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4),
        if (r.isNullAt(6)) null else r.getString(6))).toSeq
    assert(l == Seq(
      (1L, 0, "/a", "A@/href", "first", null),
      (1L, 1, "i.png", "IMG@/src", null, null),
      (1L, 2, "../b", "A@/href", null, "nofollow"),
      (2L, null, null, null, null, null),
      (3L, null, null, null, null, null)))
    // the resolve/canonicalize chain the docstring names composes
    val edges = Web.watLinks(df.where(col("id") === 1), "id", "p")
      .where(col("path") === "A@/href")
      .select(Web.canonicalizeUrl(Web.resolveUrl(
        lit("http://ex.com/base/"), col("url"))))
      .collect().map(_.getString(0)).toSeq
    assert(edges == Seq("http://ex.com/a", "http://ex.com/b"))
  }

  test("warcRevisitResolve: refers_to wins, digest fallback is " +
      "deterministic, unresolved revisits stay visible with nulls") {
    val s = spark
    import s.implicits._
    def rec(typ: String, rid: String, refersTo: String, digest: String,
        pay: String): String =
      "WARC/1.0" + CRLF + s"WARC-Type: $typ" + CRLF +
        s"WARC-Record-ID: <$rid>" + CRLF +
        (if (refersTo != null) s"WARC-Refers-To: <$refersTo>" + CRLF
         else "") +
        (if (digest != null) s"WARC-Payload-Digest: $digest" + CRLF
         else "") +
        "WARC-Target-URI: http://r.ex/p" + CRLF +
        "Content-Length: " + pay.getBytes("UTF-8").length + CRLF +
        CRLF + pay + CRLF + CRLF
    def digestOf(pay: String): String = {
      val sha = java.security.MessageDigest.getInstance("SHA-1")
        .digest(pay.getBytes("UTF-8"))
      "sha1:" + org.apache.spark.sql.graftnative.Base32Encode
        .compute(sha).toString
    }
    val w = rec("response", "urn:uuid:oa", null, null, "orig a") +
      rec("revisit", "urn:uuid:va", "urn:uuid:oa", null, "") +
      rec("response", "urn:uuid:oc", null, null, "orig c") +
      rec("revisit", "urn:uuid:vc", null, digestOf("orig c"), "") +
      rec("revisit", "urn:uuid:vx", null, "sha1:NOPE", "")
    val records = Web.warcRecordsBinary(
      Seq((1L, w.getBytes("UTF-8"))).toDF("id", "bin"), "id", "bin")
    val got = Web.warcRevisitResolve(records)
      .orderBy("warc_record_id")
      .select(col("warc_record_id"), col("original_id"),
        col("original_payload").cast("string"), col("resolved_via"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(got == Seq(
      ("urn:uuid:va", "urn:uuid:oa", "orig a", "refers_to"),
      ("urn:uuid:vc", "urn:uuid:oc", "orig c", "digest"),
      ("urn:uuid:vx", null, null, null)))
  }

  test("watRobotsFlags: Head.Metas robots directives agree with " +
      "metaRobotsFlags on the same page (WAT-cost governance gate); " +
      "case-insensitive name, first robots meta wins, none implies " +
      "both, no metas -> indexable default, junk -> null") {
    val s = spark
    import s.implicits._
    def watOf(metas: String): String =
      """{"Envelope":{"WARC-Header-Metadata":{""" +
        """"WARC-Target-URI":"http://ex.com/p"},""" +
        """"Payload-Metadata":{"HTTP-Response-Metadata":{""" +
        """"HTML-Metadata":{"Head":{"Title":"t"""" +
        (if (metas == null) "" else s""","Metas":[$metas]""") +
        """}}}}}}"""
    def htmlOf(robots: String, nameAttr: String): String =
      "<html><head><meta name=\"viewport\" content=\"w\">" +
        (if (robots == null) ""
         else s"""<meta name="$nameAttr" content="$robots">""") +
        "</head><body>x</body></html>"
    val rows = Seq(
      (1L, htmlOf("noindex", "robots"),
        watOf("""{"name":"viewport","content":"w"},""" +
          """{"name":"robots","content":"noindex"}""")),
      (2L, htmlOf("none", "ROBOTS"),
        watOf("""{"name":"viewport","content":"w"},""" +
          """{"name":"ROBOTS","content":"none"}""")),
      (3L, htmlOf(" noindex , NOFOLLOW ", "robots"),
        watOf("""{"name":"viewport","content":"w"},""" +
          """{"name":"robots","content":" noindex , NOFOLLOW "}""")),
      (4L, htmlOf(null, "robots"),
        watOf("""{"name":"viewport","content":"w"}""")),
      (5L, htmlOf(null, "robots"), watOf(null)))
    val f = graft.functions.TextFunctions
    val got = rows.toDF("id", "html", "wat")
      .select(col("id"),
        f.metaRobotsFlags(col("html")).as("h"),
        Web.watRobotsFlags(col("wat")).as("w"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null
        else (r.getStruct(1).getBoolean(0), r.getStruct(1).getBoolean(1)),
        if (r.isNullAt(2)) null
        else (r.getStruct(2).getBoolean(0),
          r.getStruct(2).getBoolean(1)))).toSeq
    assert(got.map(_._2) == Seq((true, false), (true, true),
      (true, true), (false, false), (false, false)))
    // the WAT side agrees row for row with the HTML side
    assert(got.forall(r => r._2 == r._3))
    // junk payload -> null struct (the HTML side has no analogue of
    // a junk envelope, so this case stands alone)
    assert(Seq(Tuple1("not json at all")).toDF("p")
      .select(Web.watRobotsFlags(col("p"))).collect().head.isNullAt(0))
  }

  test("warcRevisitResolve: a response original carrying a real HTTP " +
      "message digests its BODY (ISO 28500 payload = entity-body), " +
      "so a crawler-written digest matches; duplicate record ids " +
      "collapse to the least-digest original (no fan-out)") {
    val s = spark
    import s.implicits._
    def rec(typ: String, rid: String, refersTo: String, digest: String,
        pay: String): String =
      "WARC/1.0" + CRLF + s"WARC-Type: $typ" + CRLF +
        s"WARC-Record-ID: <$rid>" + CRLF +
        (if (refersTo != null) s"WARC-Refers-To: <$refersTo>" + CRLF
         else "") +
        (if (digest != null) s"WARC-Payload-Digest: $digest" + CRLF
         else "") +
        "WARC-Target-URI: http://r.ex/p" + CRLF +
        "Content-Length: " + pay.getBytes("UTF-8").length + CRLF +
        CRLF + pay + CRLF + CRLF
    def digestOf(pay: String): String = {
      val sha = java.security.MessageDigest.getInstance("SHA-1")
        .digest(pay.getBytes("UTF-8"))
      "sha1:" + org.apache.spark.sql.graftnative.Base32Encode
        .compute(sha).toString
    }
    // the original stores the full HTTP message (status line +
    // headers + body) — the crawler's WARC-Payload-Digest covers
    // ONLY the body, which is what the fallback must compute
    val httpMsg = "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/plain" + CRLF + CRLF + "the real body"
    // duplicate-id corpus: ISO 28500 promises unique ids, this
    // corpus breaks the promise — resolution must stay one row per
    // revisit, picking the least-digest original deterministically
    val dupA = "dup payload A"
    val dupB = "dup payload B"
    val expectDup =
      if (digestOf(dupA) <= digestOf(dupB)) dupA else dupB
    val w = rec("response", "urn:uuid:oh", null, null, httpMsg) +
      rec("revisit", "urn:uuid:vh", null, digestOf("the real body"),
        "") +
      rec("response", "urn:uuid:dup", null, null, dupA) +
      rec("response", "urn:uuid:dup", null, null, dupB) +
      rec("revisit", "urn:uuid:vd", "urn:uuid:dup", null, "")
    val records = Web.warcRecordsBinary(
      Seq((1L, w.getBytes("UTF-8"))).toDF("id", "bin"), "id", "bin")
    val got = Web.warcRevisitResolve(records)
      .orderBy("warc_record_id")
      .select(col("warc_record_id"), col("original_id"),
        col("original_payload").cast("string"), col("resolved_via"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(got == Seq(
      ("urn:uuid:vd", "urn:uuid:dup", expectDup, "refers_to"),
      ("urn:uuid:vh", "urn:uuid:oh", httpMsg, "digest")))
  }

  test("warcinfoFields: key:value lines in order, duplicates kept in " +
      "the array, colon-less lines dropped, accessor first-wins and " +
      "case-insensitive") {
    val s = spark
    import s.implicits._
    val payload = ("software: graftcrawler/1.0\r\n" +
      "isPartOf: CRAWL-X\n" + // bare LF tolerated
      "no colon here\r\n" +
      "robots: checked\r\n" +
      "robots: rechecked\r\n").getBytes("UTF-8")
    val fields = Web.warcinfoFields(col("p"))
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(fields.as("f"),
        Web.warcinfoField(fields, "SOFTWARE").as("sw"),
        Web.warcinfoField(fields, "robots").as("rb"),
        Web.warcinfoField(fields, "absent").as("ab"))
      .collect().head
    val kv = r.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getString(0), e.getString(1)))
    assert(kv == Seq(("software", "graftcrawler/1.0"),
      ("isPartOf", "CRAWL-X"), ("robots", "checked"),
      ("robots", "rechecked")))
    assert(r.getString(1) == "graftcrawler/1.0" &&
      r.getString(2) == "checked" && r.isNullAt(3))
    assert(Seq(Option.empty[Array[Byte]]).toDF("p")
      .select(Web.warcinfoFields(col("p"))).collect().head.isNullAt(0))
  }
}
