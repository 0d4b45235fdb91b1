package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.ops.Web
import graft.functions.TextFunctions
import org.apache.spark.sql.graftnative.{Base32Encode, WebFunctions}

/** Crawl-tier fidelity extras (r17): MIME sniffing + declared-vs-
  * sniffed audit, redirect edges (HTTP Location + meta refresh) and
  * bounded chain collapse, and the Common-Crawl `sha1:BASE32` payload
  * digest (RFC 4648 §6 pinned on the RFC's own vectors).
  */
class CrawlExtrasSpec extends AnyFunSuite {
  import SparkFixture._

  private def one(c: Column): Any = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.get(0)
  }

  // ---- base32 / payloadDigest ------------------------------------------

  test("Base32Encode: the RFC 4648 §10 test vectors, byte for byte") {
    val vectors = Seq(
      "" -> "", "f" -> "MY======", "fo" -> "MZXQ====",
      "foo" -> "MZXW6===", "foob" -> "MZXW6YQ=",
      "fooba" -> "MZXW6YTB", "foobar" -> "MZXW6YTBOI======")
    vectors.foreach { case (in, want) =>
      assert(Base32Encode.compute(in.getBytes("US-ASCII")).toString
        == want, s"base32($in)")
      assert(one(WebFunctions.base32(
        lit(in.getBytes("US-ASCII")))) == want)
    }
    assert(one(WebFunctions.base32(lit(null).cast("binary"))) == null)
  }

  test("payloadDigest: Common Crawl's sha1:BASE32 convention, " +
      "including the famous empty-payload digest") {
    val cases = Seq(
      "" -> "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ",
      "abc" -> "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5",
      "foobar payload" -> "sha1:DC6MLRQOLJHV6UZAKYEDYFWPRXH3VRX3")
    cases.foreach { case (in, want) =>
      assert(one(Web.payloadDigest(lit(in.getBytes("US-ASCII"))))
        == want, s"digest($in)")
    }
    assert(one(Web.payloadDigest(lit(null).cast("binary"))) == null)
  }

  test("Base32Encode survives codegen (kernel reachable from " +
      "generated code)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 64).map(i => ("x" * i))
    val got = rows.toDF("t")
      .select(WebFunctions.base32(encode(col("t"), "US-ASCII")).as("b"))
      .collect().map(_.getString(0))
    got.zip(rows).foreach { case (g, r) =>
      assert(g == Base32Encode.compute(r.getBytes("US-ASCII")).toString)
    }
  }

  // ---- sniffMime / mimeAudit -------------------------------------------

  private def sniffOf(bytes: Array[Byte]): String = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(bytes)).toDF("b")
      .select(Web.sniffMime(col("b")).as("m")).collect().head.getString(0)
  }

  test("sniffMime: the constrained magic table, case for case") {
    assert(sniffOf(Array(0x1f, 0x8b.toByte, 8, 0)) == "application/gzip")
    assert(sniffOf("%PDF-1.7 junk".getBytes("US-ASCII"))
      == "application/pdf")
    assert(sniffOf(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
      0x1a, '\n', 1, 2)) == "image/png")
    assert(sniffOf(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte)) == "image/jpeg")
    assert(sniffOf("GIF89a....".getBytes("US-ASCII")) == "image/gif")
    assert(sniffOf(Array[Byte]('P', 'K', 3, 4, 9)) == "application/zip")
    assert(sniffOf(("RIFF1234WEBPVP8 ").getBytes("US-ASCII"))
      == "image/webp")
    assert(sniffOf(("RIFF1234WAVEfmt ").getBytes("US-ASCII"))
      == "audio/wav")
    assert(sniffOf("  \n\t<?xml version=\"1.0\"?><a/>"
      .getBytes("US-ASCII")) == "application/xml")
    assert(sniffOf("<!DOCTYPE html><p>x</p>".getBytes("US-ASCII"))
      == "text/html")
    assert(sniffOf("junk then <HTML lang=en>".getBytes("US-ASCII"))
      == "text/html")
    assert(sniffOf(Array[Byte]('a', 'b', 0, 'c'))
      == "application/octet-stream")
    assert(sniffOf("just prose, no tags".getBytes("UTF-8"))
      == "text/plain")
    // precedence: magic beats the html scan (a PDF containing "<html")
    assert(sniffOf("%PDF-1.4 <html>".getBytes("US-ASCII"))
      == "application/pdf")
    // precedence (r17 advice): a NUL beats the html scan — unmagicked
    // binary data containing '<head' bytes must NOT classify as
    // text/html and leak through the gate into decodeText/htmlText
    assert(sniffOf(Array[Byte](1, 0, 2) ++
      "<head><body>".getBytes("US-ASCII"))
      == "application/octet-stream")
    // window bound: a NUL beyond the first 1024 bytes is not seen
    assert(sniffOf(("a" * 1024).getBytes("US-ASCII") ++ Array[Byte](0))
      == "text/plain")
    assert(sniffOf(Array.empty[Byte]) == "text/plain")
  }

  test("contentTypeEssence + mimeAudit: normalize, compare, " +
      "null-means-no-lie") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("Text/HTML; charset=utf-8", "<html><p>x</p>"),
      ("application/pdf", "<html>server lied</html>"),
      (null, "plain words")
    ).toDF("ct", "body")
      .select(Web.mimeAudit(encode(col("body"), "UTF-8"), col("ct"))
        .as("a"))
      .select(col("a.declared"), col("a.sniffed"), col("a.agree"))
      .collect()
    assert(df(0).getString(0) == "text/html" &&
      df(0).getString(1) == "text/html" && df(0).getBoolean(2))
    assert(df(1).getString(0) == "application/pdf" &&
      df(1).getString(1) == "text/html" && !df(1).getBoolean(2))
    assert(df(2).isNullAt(0) && df(2).getString(1) == "text/plain" &&
      df(2).isNullAt(2))
  }

  // ---- metaRefreshUrl ----------------------------------------------------

  test("metaRefreshUrl: both attribute orders, separators, inner " +
      "quotes, delay-only refresh is null") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("""<meta http-equiv="refresh" content="5; url=/new">""", "/new"),
      ("""<meta content="0;URL=https://ex.com/x" http-equiv='Refresh'>""",
        "https://ex.com/x"),
      ("""<meta http-equiv='refresh' content='3.5 , url = "b.html" '>""",
        "b.html"),
      ("""<meta http-equiv="refresh" content="1; url='/q?a=1'">""",
        "/q?a=1"),
      ("""<meta http-equiv="refresh" content="30">""", null),
      ("""<meta name="refresh" content="5; url=/decoy">""", null),
      ("""no meta at all""", null),
      (null, null))
    val got = cases.map(_._1).toDF("h")
      .select(TextFunctions.metaRefreshUrl(col("h")).as("u"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"case $i")
    }
  }

  // ---- htmlAnchors --------------------------------------------------------

  test("htmlAnchors: (href, anchor_text) pairs — quote styles, inner " +
      "markup cleaned through the kernel, href-less and unterminated " +
      "anchors skipped") {
    val s = spark
    import s.implicits._
    val html =
      """<html><body><a href="/a">First <b>bold</b> link</a>""" +
        """<a href='/b'> spaced &amp; entity </a>""" +
        """<a href=/c>bare</a>""" +
        """<a name="x">no href</a>""" +
        """<a href="/d">unterminated..."""
    val got = Seq(html).toDF("h")
      .select(explode(TextFunctions.htmlAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor_text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("/a", "First bold link"),
      ("/b", "spaced & entity"),
      ("/c", "bare")))
    // null html -> null array
    val n = Seq(Option.empty[String]).toDF("h")
      .select(TextFunctions.htmlAnchors(col("h")).as("a")).collect()
    assert(n.head.isNullAt(0))
  }

  // ---- robotsSitemaps -----------------------------------------------------

  test("robotsSitemaps: file-wide Sitemap lines in document order — " +
      "case-insensitive, comments stripped, empty values dropped, " +
      "decoy field names ignored") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("a.ex", "# c\nUser-agent: *\nDisallow: /x\n" +
        "Sitemap: https://a.ex/s1.xml\r\n" +
        "sitemap:\thttps://cdn.ex/s2.xml.gz # note\n" +
        "SITEMAP:\nSitemap-x: /decoy\n" +
        "SiteMap: https://a.ex/s3.xml"),
      ("b.ex", "User-agent: *\nAllow: /"),
      ("c.ex", null)
    ).toDF("host", "txt")
    val got = graft.ops.Web.robotsSitemaps(robots, "host", "txt")
      .orderBy("host", "ln")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("a.ex", 3, "https://a.ex/s1.xml"),
      ("a.ex", 4, "https://cdn.ex/s2.xml.gz"),
      ("a.ex", 7, "https://a.ex/s3.xml")))
  }

  // ---- redirectTarget / resolveRedirects ---------------------------------

  test("redirectTarget: 3xx + Location resolves against the page " +
      "URL; non-redirects and missing Location are null") {
    val s = spark
    import s.implicits._
    val crlf = "\r\n"
    def resp(status: String, loc: Option[String]): Array[Byte] =
      (s"HTTP/1.1 $status$crlf" +
        loc.map(l => s"Location: $l$crlf").getOrElse("") +
        s"Content-Length: 0$crlf$crlf").getBytes("US-ASCII")
    val rows = Seq(
      ("http://a.ex/p/1", resp("301 Moved", Some("/new/1"))),
      ("http://a.ex/p/2", resp("302 Found", Some("https://b.ex/z"))),
      ("http://a.ex/p/3", resp("200 OK", Some("/ignored"))),
      ("http://a.ex/p/4", resp("308 Permanent", None)),
      ("http://a.ex/p/5", resp("307 Temp", Some("../up"))))
    val got = rows.toDF("url", "payload")
      .select(Web.redirectTarget(col("url"),
        Web.httpParts(col("payload"))).as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("http://a.ex/new/1", "https://b.ex/z",
      null, null, "http://a.ex/up"))
  }

  test("resolveRedirects: chains collapse, loops exhaust maxHops as " +
      "resolved=false, duplicate observations pick the lexicographic " +
      "min dst") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("u3", "u2"), ("u2", "u1"), ("u1", "u0"), // 3-hop chain
      ("solo", "t1"),                           // 1 hop
      ("loopA", "loopB"), ("loopB", "loopA"),   // 2-cycle
      ("self", "self"),                         // self-loop
      ("dup", "zz"), ("dup", "aa")              // duplicate observation
    ).toDF("src", "dst")
    val got = Web.resolveRedirects(edges, "src", "dst", maxHops = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got("u3") == (("u0", 3, true)))
    assert(got("u2") == (("u0", 2, true)))
    assert(got("u1") == (("u0", 1, true)))
    assert(got("solo") == (("t1", 1, true)))
    assert(got("self") == (("self", 8, false)))
    assert(got("loopA")._2 == 8 && !got("loopA")._3)
    assert(got("dup") == (("aa", 1, true)))
    assert(got.size == 8) // 9 edges, 8 distinct srcs (dup collapses)
  }

  test("resolveRedirects: maxHops=1 caps a long chain as unresolved") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Web.resolveRedirects(edges, "src", "dst", maxHops = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got("a") == (("b", 1, false))) // b still has an outgoing edge
    assert(got("b") == (("c", 1, true)))
    intercept[IllegalArgumentException] {
      Web.resolveRedirects(edges, "src", "dst", maxHops = 0)
    }
    intercept[IllegalArgumentException] {
      Web.resolveRedirects(edges, "src", "dst", maxHops = 17)
    }
  }
}
