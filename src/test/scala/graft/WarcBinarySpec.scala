package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web
import org.apache.spark.sql.graftnative.WebFunctions

/** Binary-safe WARC ingestion ([[Web.warcRecordsBinary]] /
  * [[Web.warcRecordsGzip]], kernels `GunzipMembers`/`WarcSplitBinary`/
  * `GzipCompress`) — pins the r16 contract: record extents come from
  * Content-Length OFFSETS, so a payload CONTAINING `WARC/1.0\r\n` does
  * NOT split (the text reader's documented hazard); gzip members are
  * per-record and survive concatenation; junk degrades loudly (null
  * header / clamped tail / null member row), never silently.
  */
class WarcBinarySpec extends AnyFunSuite {
  import SparkFixture._

  private val CRLF = "\r\n"

  private def record(tpe: String, uri: String, payload: String): String =
    "WARC/1.0" + CRLF +
      s"WARC-Type: $tpe" + CRLF +
      (if (uri != null) s"WARC-Target-URI: $uri" + CRLF else "") +
      "Content-Length: " + payload.getBytes("UTF-8").length + CRLF +
      CRLF + payload + CRLF + CRLF

  private def binRecs(bytes: Array[Byte])
      : Seq[(Any, String, String, Any, String)] = {
    val s = spark
    import s.implicits._
    Web.warcRecordsBinary(Seq((1L, bytes)).toDF("id", "bin"), "id", "bin")
      .orderBy("rec_idx")
      .select(col("rec_idx"), col("warc_type"), col("target_uri"),
        col("content_length"), col("payload").cast("string"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        r.getString(4))).toSeq
  }

  test("warcRecordsBinary: payload containing WARC/1.0 CRLF does NOT " +
      "split (the text reader's documented hazard, closed)") {
    val hazard = "before WARC/1.0" + CRLF + "after the version line"
    val bytes = (record("conversion", "http://ex.com/1", hazard) +
      record("conversion", "http://ex.com/2", "plain")).getBytes("UTF-8")
    assert(binRecs(bytes) == Seq(
      (1, "conversion", "http://ex.com/1",
        hazard.getBytes("UTF-8").length.toLong, hazard),
      (2, "conversion", "http://ex.com/2", 5L, "plain")))
    // the text reader DOES split this shape — the two readers disagree
    // by design, which is exactly why the binary one exists
    val s = spark
    import s.implicits._
    val textSplit = Web.warcRecords(
      Seq((1L, new String(bytes, "UTF-8"))).toDF("id", "warc"),
      "id", "warc").count()
    assert(textSplit == 3)
  }

  test("warcRecordsBinary degradations are loud: junk tail -> null " +
      "header; missing Content-Length -> remainder; truncation clamps") {
    // junk after a valid record
    val j = (record("conversion", null, "ok") + "trailing junk bytes")
      .getBytes("UTF-8")
    val got = binRecs(j)
    assert(got.size == 2 && got.head._5 == "ok")
    assert(got(1)._2 == null && got(1)._5 == "trailing junk bytes")
    // record without Content-Length consumes the remainder
    val noCl = ("WARC/1.0" + CRLF + "WARC-Type: x" + CRLF + CRLF +
      "everything to the end " + CRLF + "even this").getBytes("UTF-8")
    val g2 = binRecs(noCl)
    assert(g2.size == 1 && g2.head._4 == null &&
      g2.head._5.endsWith("even this"))
    // declared length past the end of the buffer clamps
    val trunc = ("WARC/1.0" + CRLF + "Content-Length: 100" + CRLF +
      CRLF + "short").getBytes("UTF-8")
    val g3 = binRecs(trunc)
    assert(g3.size == 1 && g3.head._4 == 100L && g3.head._5 == "short")
  }

  test("gzip round-trip: one member per record, members concatenated, " +
      "warcRecordsGzip recovers every record; multi-record member ok") {
    val s = spark
    import s.implicits._
    val hazard = "gz payload with WARC/1.0" + CRLF + "inside"
    val r1 = record("conversion", "http://ex.com/a", hazard)
    val r2 = record("conversion", "http://ex.com/b", "second")
    val r3 = record("warcinfo", null, "info")
    val wf = WebFunctions
    // member1 = r1, member2 = r2+r3 (multi-record member tolerated)
    val df = Seq((7L, r1, r2 + r3)).toDF("id", "m1", "m2")
      .select(col("id"), concat(
        wf.gzipCompress(col("m1").cast("binary")),
        wf.gzipCompress(col("m2").cast("binary"))).as("gz"))
    val got = Web.warcRecordsGzip(df, "id", "gz")
      .orderBy("member_idx", "rec_idx")
      .select(col("member_idx"), col("rec_idx"), col("warc_type"),
        col("payload").cast("string"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      (1, 1, "conversion", hazard),
      (2, 1, "conversion", "second"),
      (2, 2, "warcinfo", "info")))
  }

  test("corrupt gzip stream -> one visible row with null member " +
      "fields, never a silent drop or a crash") {
    val s = spark
    import s.implicits._
    val wf = WebFunctions
    val good = record("conversion", null, "fine")
    val df = Seq(
      (1L, Array[Byte](1, 2, 3, 4)), // not gzip at all
      (2L, null: Array[Byte])        // null cell
    ).toDF("id", "gz")
      .unionByName(Seq(3L).toDF("id").select(col("id"),
        wf.gzipCompress(lit(good).cast("binary")).as("gz")))
    val got = Web.warcRecordsGzip(df, "id", "gz")
      .select(col("id"), col("member_idx"), col("payload").cast("string"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
      .sortBy(t => t._1)
    assert(got == Seq((1L, null, null), (2L, null, null),
      (3L, 1, "fine")))
    // truncated member (valid header, chopped body) -> null too
    val full = Seq(4L).toDF("id").select(col("id"),
      wf.gzipCompress(lit(good).cast("binary")).as("gz"))
    val g2 = Web.warcRecordsGzip(
      full.select(col("id"), expr("substring(gz, 1, 14)").as("gz")),
      "id", "gz").select(col("member_idx")).collect()
    assert(g2.length == 1 && g2.head.isNullAt(0))
  }

  test("decodeText: BOMs, meta prescan (bare/quoted/aliases), utf-8 " +
      "default, malformed bytes -> U+FFFD, unknown charset falls " +
      "through") {
    val s = spark
    import s.implicits._
    def d(bytes: Array[Byte]): (String, String, String) = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(Web.decodeText(col("b")).as("d"))
        .select(col("d.charset"), col("d.source"), col("d.text"))
        .collect().head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val bomU8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "héllo".getBytes("UTF-8")
    assert(d(bomU8) == ("utf-8", "bom", "héllo"))
    val bomLe = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "ab".getBytes("UTF-16LE")
    assert(d(bomLe) == ("utf-16le", "bom", "ab"))
    val bomBe = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      "ab".getBytes("UTF-16BE")
    assert(d(bomBe) == ("utf-16be", "bom", "ab"))
    // meta prescan: latin1 alias, real 0xE9 byte
    val latin = "<meta charset='latin1'>café".getBytes("ISO-8859-1")
    assert(d(latin) == ("iso-8859-1", "meta", "<meta charset='latin1'>café"))
    // windows-1252 euro at 0x80
    val cp = "<meta charset=windows-1252>x ".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte)
    assert(d(cp) == ("windows-1252", "meta",
      "<meta charset=windows-1252>x €"))
    // unknown declared charset falls through to the utf-8 default
    assert(d("<meta charset=klingon>ok".getBytes("UTF-8")) ==
      ("utf-8", "default", "<meta charset=klingon>ok"))
    // malformed utf-8 -> U+FFFD replacement, never a crash
    val bad = Array[Byte](0xF0.toByte, '('.toByte)
    assert(d(bad) == ("utf-8", "default", "�("))
    // prescan window: a charset declared past 1024 bytes is ignored
    val far = (" " * 1100 + "charset=iso-8859-1 y").getBytes("UTF-8")
    assert(d(far)._2 == "default")
  }

  test("gunzipMembers verifies the CRC32+ISIZE trailer: a member that " +
      "still inflates but carries a corrupted trailer -> null (r16 " +
      "advice: inflate success alone does not mean integrity)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.graftnative.GzipCompress
    val gz = GzipCompress.compute(record("conversion", null, "payload")
      .getBytes("UTF-8"))
    def expectNull(bytes: Array[Byte]): Unit = {
      val got = Seq(Tuple1(bytes)).toDF("gz")
        .select(WebFunctions.gunzipMembers(col("gz")).as("m"))
        .collect().head
      assert(got.isNullAt(0))
    }
    val crcFlip = gz.clone(); crcFlip(gz.length - 8) =
      (crcFlip(gz.length - 8) ^ 0x01).toByte
    expectNull(crcFlip)
    val isizeFlip = gz.clone(); isizeFlip(gz.length - 1) =
      (isizeFlip(gz.length - 1) ^ 0x01).toByte
    expectNull(isizeFlip)
    // and the untouched member still round-trips
    val ok = Seq(Tuple1(gz)).toDF("gz")
      .select(element_at(WebFunctions.gunzipMembers(col("gz")), 1)
        .cast("string")).collect().head.getString(0)
    assert(ok.contains("payload"))
  }

  test("warc header extraction is line-anchored: X-Content-Length / " +
      "X-WARC-Type decoys before the real headers are skipped, and " +
      "the reported content_length matches the slicing") {
    val decoyed = ("WARC/1.0" + CRLF +
      "X-WARC-Type: decoy" + CRLF +
      "X-Content-Length: 7" + CRLF +
      "WARC-Type: conversion" + CRLF +
      "Content-Length: 5" + CRLF + CRLF +
      "12345" + CRLF + CRLF +
      record("metadata", null, "next")).getBytes("UTF-8")
    val got = binRecs(decoyed)
    assert(got == Seq(
      (1, "conversion", null, 5L, "12345"),
      (2, "metadata", null, 4L, "next")))
    // the text reader shares the anchored convention
    val s = spark
    import s.implicits._
    val t = Web.warcRecords(
      Seq((1L, new String(decoyed, "UTF-8"))).toDF("id", "warc"),
      "id", "warc").orderBy("rec_idx")
      .select(col("warc_type"), col("content_length")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(t == Seq(("conversion", 5L), ("metadata", 4L)))
  }

  test("decodeText: legacy CJK charsets (shift_jis / gbk-via-gb2312 / " +
      "euc-kr http-equiv form) decode for real; a bare charset= token " +
      "outside a meta tag is NOT honored (r16 advice)") {
    val s = spark
    import s.implicits._
    def d(bytes: Array[Byte]): (String, String, String) = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(Web.decodeText(col("b")).as("d"))
        .select(col("d.charset"), col("d.source"), col("d.text"))
        .collect().head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val sj = "<meta charset=shift_jis>日本語".getBytes("Shift_JIS")
    assert(d(sj) == ("shift_jis", "meta", "<meta charset=shift_jis>日本語"))
    // the WHATWG rule: the gb2312 label decodes with the gbk superset
    val gb = "<meta charset=\"gb2312\">中文".getBytes("GBK")
    assert(d(gb) == ("gbk", "meta", "<meta charset=\"gb2312\">中文"))
    val kr = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=euc-kr\">한국어").getBytes("EUC-KR")
    assert(d(kr)._1 == "euc-kr" && d(kr)._3.endsWith("한국어"))
    val bg = "<meta charset=big5>繁體".getBytes("Big5")
    assert(d(bg) == ("big5", "meta", "<meta charset=big5>繁體"))
    // prose decoy: would have forced a destructive utf-16 decode before
    // the tag-context constraint
    val decoy = "see charset=utf-16le in prose é".getBytes("UTF-8")
    assert(d(decoy) == ("utf-8", "default", "see charset=utf-16le in prose é"))
  }

  test("WARC kernels stay inside whole-stage codegen") {
    val p = spark.range(2)
      .select(WebFunctions.warcSplitBinary(element_at(
        WebFunctions.gunzipMembers(WebFunctions.gzipCompress(
          concat(lit("WARC/1.0\r\n\r\n"),
            col("id").cast("string")).cast("binary"))), 1)))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    assert(!p.contains("CodegenFallback"), p.take(800))
  }
}
