package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web
import org.apache.spark.sql.graftnative.{GzipCompress, WebFunctions}

/** HTTP response-message parsing ([[Web.httpParts]], kernel
  * `HttpParts`) — the step between WARC `response` records and the
  * text tier. Pins: status/header extraction, chunked de-framing
  * (extensions, trailers), gzip/x-gzip (CRC-verified) and deflate
  * (zlib + raw retry) body decoding, the '+'-joined body_mode ledger,
  * and every loud degradation (raw / chunked-malformed / gzip-corrupt
  * / unsupported:<token>). Plus the header-charset-hinted decode
  * ([[Web.decodeTextHinted]]): BOM > header > meta > default.
  */
class HttpPartsSpec extends AnyFunSuite {
  import SparkFixture._

  private val CRLF = "\r\n"

  private def parse(payload: Array[Byte]) = {
    val s = spark
    import s.implicits._
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(Web.httpParts(col("p")).as("h"))
      .select(col("h.status_code"), col("h.reason"),
        col("h.http_version"), col("h.headers"),
        col("h.body").cast("string"), col("h.body_mode"))
      .collect().head
    (if (r.isNullAt(0)) null else r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2),
      r.getSeq[org.apache.spark.sql.Row](3)
        .map(h => (h.getString(0), h.getString(1))),
      r.getString(4), r.getString(5))
  }

  private def asciiBytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("identity message: status line, ordered headers, body verbatim; " +
      "header lines without a colon are dropped") {
    val msg = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/plain" + CRLF +
      "this line has no colon and is dropped" + CRLF +
      "X-Custom:  spaced value  " + CRLF + CRLF +
      "hello body")
    val (code, reason, ver, hdrs, body, mode) = parse(msg)
    assert(code == 200 && reason == "OK" && ver == "1.1")
    assert(hdrs == Seq(("Content-Type", "text/plain"),
      ("X-Custom", "spaced value")))
    assert(body == "hello body" && mode == "identity")
  }

  test("chunked de-framing: multiple chunks, chunk extensions, " +
      "uppercase hex, trailer fields discarded") {
    val data1 = "first chunk "
    val data2 = "and the second"
    val msg = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Transfer-Encoding: chunked" + CRLF + CRLF +
      data1.length.toHexString.toUpperCase + ";note=x" + CRLF +
      data1 + CRLF +
      data2.length.toHexString + CRLF + data2 + CRLF +
      "0" + CRLF + "X-Trailer: ignored" + CRLF + CRLF)
    val (code, _, _, _, body, mode) = parse(msg)
    assert(code == 200 && body == data1 + data2 && mode == "chunked")
  }

  test("gzip / x-gzip / deflate (zlib and raw) bodies decode; the " +
      "body_mode ledger records what was applied in order") {
    def gzMsg(label: String, bodyBytes: Array[Byte]) =
      asciiBytes("HTTP/1.1 200 OK" + CRLF +
        s"Content-Encoding: $label" + CRLF + CRLF) ++ bodyBytes
    val gz = GzipCompress.compute("compressed payload".getBytes("UTF-8"))
    assert(parse(gzMsg("gzip", gz))._5 == "compressed payload")
    assert(parse(gzMsg("gzip", gz))._6 == "gzip")
    assert(parse(gzMsg("x-gzip", gz))._5 == "compressed payload")
    // zlib-wrapped deflate
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput("zlib body".getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](256); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(parse(gzMsg("deflate", defl)) ._5 == "zlib body")
    // raw deflate under the same label (the wire reality)
    val raw = {
      val d = new java.util.zip.Deflater(-1, true)
      d.setInput("raw body".getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](256); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(parse(gzMsg("deflate", raw))._5 == "raw body")
    // chunked + gzip stacked: chunked de-framed first, then gunzip
    val chunked = asciiBytes(gz.length.toHexString + CRLF) ++ gz ++
      asciiBytes(CRLF + "0" + CRLF + CRLF)
    val both = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Transfer-Encoding: chunked" + CRLF +
      "Content-Encoding: gzip" + CRLF + CRLF) ++ chunked
    val (_, _, _, _, body, mode) = parse(both)
    assert(body == "compressed payload" && mode == "chunked+gzip")
  }

  test("loud degradations: non-HTTP -> raw; malformed chunk framing -> " +
      "chunked-malformed with raw bytes and NO content decode; corrupt " +
      "gzip -> gzip-corrupt; br -> unsupported:br") {
    val junk = "just some text, not an http message".getBytes("UTF-8")
    val (c0, _, _, h0, b0, m0) = parse(junk)
    assert(c0 == null && h0.isEmpty && m0 == "raw" &&
      b0 == "just some text, not an http message")
    // bad chunk size line
    val badChunk = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Transfer-Encoding: chunked" + CRLF +
      "Content-Encoding: gzip" + CRLF + CRLF + "zz" + CRLF + "body")
    val (_, _, _, _, b1, m1) = parse(badChunk)
    assert(m1 == "chunked-malformed" && b1 == "zz" + CRLF + "body")
    // declared length past the end
    val shortChunk = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Transfer-Encoding: chunked" + CRLF + CRLF + "ff" + CRLF + "tiny")
    assert(parse(shortChunk)._6 == "chunked-malformed")
    // gzip that is not gzip
    val badGz = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Encoding: gzip" + CRLF + CRLF + "not gzip bytes")
    val (_, _, _, _, b2, m2) = parse(badGz)
    assert(m2 == "gzip-corrupt" && b2 == "not gzip bytes")
    val br = asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Encoding: br" + CRLF + CRLF + "brotli??")
    assert(parse(br)._6 == "unsupported:br" && parse(br)._5 == "brotli??")
    // status-only message with no blank line: headers to end, empty body
    val noBlank = asciiBytes("HTTP/1.1 204 No Content" + CRLF +
      "X-A: 1" + CRLF + "X-B: 2")
    val (c3, _, _, h3, b3, _) = parse(noBlank)
    assert(c3 == 204 && h3 == Seq(("X-A", "1"), ("X-B", "2")) && b3 == "")
  }

  test("decodeTextHinted: header charset wins over the default, loses " +
      "to a BOM, falls through when absent/unrecognized") {
    val s = spark
    import s.implicits._
    def d(bytes: Array[Byte], hint: String): (String, String, String) = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(Web.decodeTextHinted(col("b"),
          if (hint == null) lit(null).cast("string") else lit(hint))
          .as("d"))
        .select(col("d.charset"), col("d.source"), col("d.text"))
        .collect().head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val latin = "café".getBytes("ISO-8859-1")
    assert(d(latin, "text/html; charset=iso-8859-1") ==
      ("iso-8859-1", "header", "café"))
    val sj = "日本語".getBytes("Shift_JIS")
    assert(d(sj, "text/html; charset=Shift_JIS") ==
      ("shift_jis", "header", "日本語"))
    // BOM beats the header (HTML5 sniffing order)
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "x".getBytes("UTF-8")
    assert(d(bom, "text/html; charset=iso-8859-1")._2 == "bom")
    // no charset parameter / null hint -> the meta/default chain
    assert(d("plain".getBytes("UTF-8"), "text/html")._2 == "default")
    assert(d("plain".getBytes("UTF-8"), null)._2 == "default")
    assert(d("<meta charset=windows-1252>x".getBytes("US-ASCII"),
      "text/html")._2 == "meta")
    // unrecognized header charset falls through, not a crash
    assert(d("ok".getBytes("UTF-8"), "text/html; charset=klingon")._2 ==
      "default")
  }

  test("content_type field: essence of the FIRST Content-Type header " +
      "(lowered, parameters cut); absent/empty -> null; raw -> null") {
    val s = spark
    import s.implicits._
    def ct(payload: Array[Byte]): String = {
      val r = Seq(Tuple1(payload)).toDF("p")
        .select(Web.httpParts(col("p")).getField("content_type").as("c"))
        .collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(ct(asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Type:  Text/HTML ; charset=utf-8" + CRLF +
      "Content-Type: application/json" + CRLF + CRLF + "x"))
      == "text/html") // first header wins, essence lowered + cut
    assert(ct(asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "X-A: 1" + CRLF + CRLF + "x")) == null) // absent
    assert(ct(asciiBytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: ; charset=utf-8" + CRLF + CRLF + "x"))
      == null) // parameter-only value: empty essence
    assert(ct("not http".getBytes("UTF-8")) == null) // raw row
  }

  test("httpRequestParts: request line + ordered headers + user_agent; " +
      "bodies share the chunked/encoding machinery; non-request " +
      "payloads (incl. a RESPONSE message) degrade to the raw row") {
    val s = spark
    import s.implicits._
    def rparse(payload: Array[Byte]) = {
      val r = Seq(Tuple1(payload)).toDF("p")
        .select(Web.httpRequestParts(col("p")).as("h"))
        .select(col("h.method"), col("h.target"), col("h.http_version"),
          col("h.headers"), col("h.body").cast("string"),
          col("h.body_mode"), col("h.content_type"), col("h.user_agent"))
        .collect().head
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(h => (h.getString(0), h.getString(1))),
        r.getString(4), r.getString(5),
        if (r.isNullAt(6)) null else r.getString(6),
        if (r.isNullAt(7)) null else r.getString(7))
    }
    val get = asciiBytes("GET /p/1?x=2 HTTP/1.1" + CRLF +
      "Host: ex.com" + CRLF +
      "User-Agent: graftbot/1.0 (+http://g.ex)" + CRLF + CRLF)
    assert(rparse(get) == ("GET", "/p/1?x=2", "1.1",
      Seq(("Host", "ex.com"),
        ("User-Agent", "graftbot/1.0 (+http://g.ex)")),
      "", "identity", null, "graftbot/1.0 (+http://g.ex)"))
    // POST body + content_type essence; chunked requests de-frame too
    val post = asciiBytes("POST /submit HTTP/1.1" + CRLF +
      "Content-Type: Application/JSON; charset=utf-8" + CRLF +
      "Transfer-Encoding: chunked" + CRLF + CRLF +
      "5" + CRLF + "hello" + CRLF + "0" + CRLF + CRLF)
    val pp = rparse(post)
    assert(pp._1 == "POST" && pp._5 == "hello" && pp._6 == "chunked" &&
      pp._7 == "application/json" && pp._8 == null)
    // a response message is NOT a request: raw row (method token
    // cannot contain '/')
    val resp = asciiBytes("HTTP/1.1 200 OK" + CRLF + CRLF + "x")
    val rr = rparse(resp)
    assert(rr._1 == null && rr._4.isEmpty && rr._6 == "raw" &&
      rr._5 == "HTTP/1.1 200 OK" + CRLF + CRLF + "x")
    // junk prose: raw
    assert(rparse("no request here".getBytes("UTF-8"))._6 == "raw")
  }

  test("linkHeaderEntries/linkHeaderTargets: RFC 8288 Link headers " +
      "parse to (url, rel) entries in declaration order across " +
      "multiple headers; quoted and bare rel, space-separated rel " +
      "token lists, rel-less entries, no Link headers -> empty, " +
      "null -> null") {
    val s = spark
    import s.implicits._
    def df(hdrLines: Seq[String]) = {
      val msg = hdrLines.mkString("HTTP/1.1 200 OK" + CRLF,
        CRLF, CRLF + CRLF + "x")
      Seq(Tuple1(msg.getBytes("ISO-8859-1"))).toDF("p")
    }
    val d = df(Seq(
      "Link: <https://ex.com/canon>; rel=\"canonical\", " +
        "</page/2>; rel=next",
      "Server: x",
      "LINK: </alt.fr>; rel=\"alternate canonical\"; " +
        "hreflang=fr, </bare>"))
    val entries = d.select(Web.linkHeaderEntries(
        Web.httpParts(col("p")).getField("headers")).as("e"))
      .select(explode(col("e")).as("x"))
      .select(col("x.url"), col("x.rel")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull)).toSeq
    assert(entries == Seq(
      ("https://ex.com/canon", "canonical"),
      ("/page/2", "next"),
      ("/alt.fr", "alternate canonical"),
      ("/bare", null)))
    // token-list filtering: both canonical declarations match, in
    // order; composition with resolve/canonicalize = the HTML chain
    val canon = d.select(Web.linkHeaderTargets(
        Web.httpParts(col("p")).getField("headers"), "canonical")
        .as("c"))
      .select(explode(col("c"))).collect().map(_.getString(0)).toSeq
    assert(canon == Seq("https://ex.com/canon", "/alt.fr"))
    val next = d.select(Web.linkHeaderTargets(
        Web.httpParts(col("p")).getField("headers"), "next").as("c"))
      .first().getSeq[String](0)
    assert(next == Seq("/page/2"))
    // no Link headers -> empty array; null headers -> null
    val none = df(Seq("Server: x")).select(Web.linkHeaderEntries(
        Web.httpParts(col("p")).getField("headers")).as("e"))
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(none.isEmpty)
    assert(Seq(Tuple1(Option.empty[Array[Byte]])).toDF("p")
      .select(Web.linkHeaderEntries(
        Web.httpParts(col("p")).getField("headers")))
      .collect().head.isNullAt(0))
  }

  test("xRobotsFlags: unscoped applies, foreign scope ignored, our " +
      "scope applies, parameterful directives are never scopes, none " +
      "implies both, null headers -> null") {
    val s = spark
    import s.implicits._
    def flags(vals: Seq[String], agent: String): (Boolean, Boolean) = {
      val hs = vals.map(v =>
        s"X-Robots-Tag: $v").mkString("HTTP/1.1 200 OK" + CRLF,
        CRLF, CRLF + CRLF + "x")
      val r = Seq(Tuple1(hs.getBytes("ISO-8859-1"))).toDF("p")
        .select(Web.xRobotsFlags(
          Web.httpParts(col("p")).getField("headers"), agent).as("f"))
        .select(col("f.noindex"), col("f.nofollow")).collect().head
      (r.getBoolean(0), r.getBoolean(1))
    }
    assert(flags(Seq("noindex, nofollow"), "graftbot") == (true, true))
    assert(flags(Seq("NOINDEX"), "graftbot") == (true, false))
    assert(flags(Seq("none"), "graftbot") == (true, true))
    assert(flags(Seq("otherbot: noindex"), "graftbot") == (false, false))
    assert(flags(Seq("graftbot: nofollow"), "graftbot") == (false, true))
    assert(flags(Seq("GraftBot: noindex"), "graftbot") == (true, false))
    // parameterful keywords keep their colon and stay unscoped values
    assert(flags(Seq("max-snippet:-1, noindex"), "graftbot") ==
      (true, false))
    assert(flags(Seq("unavailable_after: 25 Jun 2030"), "graftbot") ==
      (false, false))
    // several headers accumulate
    assert(flags(Seq("otherbot: noindex", "nofollow"), "graftbot") ==
      (false, true))
    assert(flags(Seq.empty, "graftbot") == (false, false))
    // null headers -> null struct
    val n = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("p")
      .select(Web.xRobotsFlags(
        when(col("p").isNotNull, Web.httpParts(col("p"))
          .getField("headers")), "graftbot"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("httpParts, httpRequestParts and decodeCharsetHint stay inside " +
      "whole-stage codegen") {
    val p = spark.range(2)
      .select(WebFunctions.decodeCharsetHint(
        WebFunctions.httpParts(concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
          col("id").cast("string")).cast("binary")).getField("body"),
        lit("text/plain")),
        WebFunctions.httpRequestParts(concat(lit("GET /p HTTP/1.1\r\n\r\n"),
          col("id").cast("string")).cast("binary")).getField("method"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    assert(!p.contains("CodegenFallback"), p.take(800))
  }
}
