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

  test("httpParts and decodeCharsetHint stay inside whole-stage codegen") {
    val p = spark.range(2)
      .select(WebFunctions.decodeCharsetHint(
        WebFunctions.httpParts(concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
          col("id").cast("string")).cast("binary")).getField("body"),
        lit("text/plain")))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    assert(!p.contains("CodegenFallback"), p.take(800))
  }
}
