package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HTML→text extraction kernel
  * ([[org.apache.spark.sql.graftnative.HtmlExtractText]]) — pins the
  * constrained single-pass semantics case by case, including the hostile
  * shapes (unterminated comment/script/style/tag, stray close tags,
  * bare `<`, double-escaped and invalid entities) that the
  * `text_html_extract` oracle's generated well-formed HTML can't reach.
  * Expected strings were cross-checked against an independent regex-chain
  * implementation (the same chain the DuckDB oracle runs).
  */
class HtmlSpec extends AnyFunSuite {
  import SparkFixture._

  private def extract(ss: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    ss.toDF("h").select(TextFunctions.htmlText(col("h")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("full document: comments/script/style stripped, blocks newline, entities decode") {
    assert(extract(
      """<!DOCTYPE html><html><head><title>T1</title><style>body{color:red}</style>""" +
      """<script type="x">var a = 1 < 2 && b;</script></head>""" +
      """<body><!-- c --><h1>Head</h1><p class="l">hello <b>world</b></p>""" +
      """<div><a href="http://x/1">link &amp; more</a> tail &lt;tag&gt; s</div></body></html>""")
      == Seq("T1\nHead\nhello world\nlink & more tail <tag> s"))
  }

  test("plain text passes through; outer whitespace trims; inner collapses") {
    assert(extract(
      "plain text no markup",
      "  leading ws <p> and </p>  trailing  ",
      "<p>multi\n\n  line\ttext</p>") ==
      Seq("plain text no markup", "leading ws\nand\ntrailing",
        "multi\nline text"))
  }

  test("block tags emit newlines: br variants, lists, tables, headings, hr") {
    assert(extract(
      "a<br>b<br/>c<br />d",
      "<ul><li>one</li><li>two</li></ul>",
      "<table><tr><td>1</td><td>2</td></tr></table>",
      "<h2 id=\"a\">H</h2>mid<hr>end",
      "<pre>pre text</pre><p>p text</p>") ==
      Seq("a\nb\nc\nd", "one\ntwo", "1\n2", "H\nmid\nend",
        "pre text\np text"))
  }

  test("entities: named set, double-escape, unknown stays literal") {
    assert(extract(
      "ent &amp;lt; &amp;amp; &quot;q&quot; &apos;a&apos; x&nbsp;&nbsp;y &unknown; &")
      == Seq("ent &lt; &amp; \"q\" 'a' x y &unknown; &"))
  }

  test("numeric entities: valid decode (incl. astral); invalid stay literal") {
    assert(extract(
      "&#65;&#x42;&#x1F600; num",
      "&#xD800; bad &#0; zero &#1114112; over") ==
      Seq("AB😀 num",
        "&#xD800; bad &#0; zero &#1114112; over"))
  }

  test("script/style boundaries: word boundary, case, spaced close, stray close") {
    assert(extract(
      "<SCRIPT>upper</SCRIPT>after",
      "<scripty>not script</scripty>ok",
      "x</script >y",
      "<script>a</script >b") ==
      Seq("after", "not scriptok", "xy", "b"))
  }

  test("unterminated constructs remove to end; bare < is literal") {
    assert(extract(
      "<script src=\"x.js\">no close",
      "<style>unclosed",
      "<!-- unclosed comment",
      "<p",
      "tag at end <",
      "a < b and c > d") ==
      Seq("", "", "", "", "tag at end <", "a < b and c > d"))
  }

  test("tag edge shapes: XML PI, newline inside tag, non-block near-name") {
    assert(extract(
      "<?xml version=\"1.0\"?><p>x</p>",
      "<div\nclass=\"a\">nl in tag</div>",
      "<p2>notblock</p2>z") ==
      Seq("x", "nl in tag", "notblockz"))
  }

  test("null html -> null text; empty -> empty") {
    val s = spark
    import s.implicits._
    val r = Seq(Option("x"), None, Option(""))
      .toDF("h").select(TextFunctions.htmlText(col("h")).as("t"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getString(0))
    assert(r.toSeq == Seq("x", null, ""))
  }

  test("htmlStats: counts and micro shares on a known document") {
    val s = spark
    import s.implicits._
    val html = "<html><body><p>twelve chars</p>" +
      "<a href=\"/x\">go</a><a href=\"/y\">no</a>" +
      "<script>s()</script></body></html>"
    val r = Seq(html).toDF("h")
      .select(TextFunctions.htmlStats(col("h")).as("st"))
      .select(col("st.*")).collect().head
    assert(r.getAs[Long]("html_chars") == html.length.toLong)
    // "twelve chars\ngono" — adjacent inline <a> runs join with no space
    assert(r.getAs[Long]("text_chars") == "twelve chars\ngono".length.toLong)
    // tags: html body p /p a /a a /a script /script /body /html = 12
    assert(r.getAs[Long]("n_tags") == 12L)
    assert(r.getAs[Long]("n_links") == 2L)
    assert(r.getAs[Long]("n_scripts") == 1L)
    assert(r.getAs[Long]("text_share_micro") ==
      math.floor(17.0 * 1e6 / html.length).toLong)
    assert(r.getAs[Long]("link_tag_share_micro") ==
      math.floor(2.0 * 1e6 / 12.0).toLong)
  }

  test("htmlStats: null html -> null struct; empty html -> null shares") {
    val s = spark
    import s.implicits._
    val r = Seq(Option(""), None).toDF("h")
      .select(TextFunctions.htmlStats(col("h")).as("st")).collect()
    assert(!r(0).isNullAt(0) &&
      r(0).getStruct(0).isNullAt(5)) // text_share_micro null on 0 chars
    assert(r(1).isNullAt(0))
  }

  test("unicode-hostile payloads inside markup survive (ZWJ, bidi, NUL, CJK)") {
    val payloads = Seq(
      "🚀 fam👨‍👩ily",
      "\u0645\u0631\u062d\u0628\u0627 \u202Eevil\u202C",
      "null\u0000byte\u0007bell",
      "四十二是生命")
    val wrapped = payloads.map(p => s"<div><p>$p</p><script>x</script></div>")
    val got = extract(wrapped: _*)
    // NUL and BEL are not in the whitespace-collapse set: pass through
    assert(got == payloads.map(_.trim))
    // 10k-char single token inside a tag soup: linear, no blowup
    val big = "<p>" + ("x" * 10000) + "</p>"
    assert(extract(big) == Seq("x" * 10000))
  }

  private def links(ss: String*): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    ss.toDF("h").select(TextFunctions.htmlLinks(col("h")).as("l"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[String](0).toSeq)
      .toSeq
  }

  test("htmlLinks: double/single/unquoted hrefs in document order; " +
      "case and spacing tolerated; href-less anchors excluded") {
    assert(links(
      """<a href="/a">1</a><p><A HREF = "/b">2</A></p>""" +
        """<a class="z" href="#f">3</a>""") == Seq(Seq("/a", "/b", "#f")))
    // all three quote styles extracted, document order preserved
    // ACROSS styles (one alternation pass, not one pass per style)
    assert(links(
      """<a href='/sq'>x</a><a href="/dq">y</a><a href=/plain>z</a>""" +
        """<a name="n">w</a>""") ==
      Seq(Seq("/sq", "/dq", "/plain")))
    // empty quoted values survive as empty strings; unquoted values
    // must be non-empty (HTML5 rule) so `href=>` yields nothing
    assert(links("""<a href="">a</a><a href=''>b</a><a href=>c</a>""") ==
      Seq(Seq("", "")))
    // QUOTED value may contain '>'; a '>' in an EARLIER attribute ends
    // the candidate tag (the [^>]*? constraint, identical in RE2); an
    // unquoted value stops at '>' or whitespace
    assert(links("""<a href="x>y">v</a>""") == Seq(Seq("x>y")))
    assert(links("""<a href='x>y'>v</a>""") == Seq(Seq("x>y")))
    assert(links("""<a title="a>b" href="/miss">v</a>""") == Seq(Seq()))
    assert(links(Seq("null").head + "") == Seq(Seq())) // no anchors
  }

  test("htmlLinks: attribute boundary — data-href is NOT a link " +
      "(ADVICE r15); real href after a data-href still extracts") {
    assert(links(
      """<a data-href="/fake">d</a>""",
      """<a data-href="/fake" href="/real">r</a>""",
      """<a href="/first" data-href="/fake">f</a>""") ==
      Seq(Seq(), Seq("/real"), Seq("/first")))
  }

  test("aside is a block boundary in the kernel, the split pattern and " +
      "the shared alternation (ADVICE r15 parity fix)") {
    // kernel: <aside> emits a newline like every other block tag
    assert(extract("before<aside>note</aside>after") ==
      Seq("before\nnote\nafter"))
    // the oracle-shared alternation now carries the same tag
    assert(TextFunctions.blockTagAlt.contains("aside"))
    // mainContent's splitter sees the aside boundary: the link-farm
    // aside drops while the prose block stays
    val s = spark
    import s.implicits._
    val prose = "This aside-adjacent paragraph has plenty of prose " +
      "characters so the minimum length gate passes comfortably."
    val got = Seq(s"<p>$prose</p><aside><a href='/x'>x</a> " +
        "<a href='/y'>y</a></aside>").toDF("h")
      .select(TextFunctions.mainContent(col("h")).as("m"))
      .select(col("m.main_text"), col("m.n_blocks"), col("m.n_kept"))
      .collect().head
    assert(got.getLong(1) == 2 && got.getLong(2) == 1)
    assert(got.getString(0) == prose)
  }

  test("htmlTitle: first title block through the htmlText kernel " +
      "(entity decode + collapse); no title -> empty; null -> null") {
    val s = spark
    import s.implicits._
    val got = Seq(
      "<title> Doc &amp;\n42 </title><title>second</title>",
      "<TITLE lang=\"en\">Mixed &lt;Case&gt;</TITLE>",
      "no title here",
      null: String
    ).toDF("h").select(TextFunctions.htmlTitle(col("h")).as("t"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("Doc &\n42", "Mixed <Case>", "", null))
  }

  test("mainContent: link-dense nav/footer blocks drop, prose stays; " +
      "short blocks drop; counts reported; null -> null") {
    val s = spark
    import s.implicits._
    val prose = "This is a long paragraph of running prose with " +
      "enough characters to pass the minimum length gate easily."
    val html =
      """<html><body><nav><a href="/a">Home</a> <a href="/b">About</a>""" +
        """ <a href="/c">Contact us today</a></nav>""" +
        s"<p>$prose</p>" +
        s"""<div>$prose See <a href="/ref">one small link</a> too.</div>""" +
        """<p>short</p>""" +
        """<footer><a href="/t">Terms</a> <a href="/p">Privacy</a>""" +
        """</footer></body></html>"""
    val got = Seq(html, null: String).toDF("h")
      .select(TextFunctions.mainContent(col("h")).as("m"))
      .select(col("m.main_text"), col("m.n_blocks"), col("m.n_kept"))
      .collect()
    val r0 = got(0)
    assert(r0.getLong(1) == 5 && r0.getLong(2) == 2)
    val mt = r0.getString(0)
    assert(mt.startsWith(prose) && mt.contains("one small link") &&
      !mt.contains("Home") && !mt.contains("Terms") &&
      !mt.contains("short"))
    assert(got(1).isNullAt(0) || got(1).anyNull) // null html -> null struct
  }

  test("mainContent: threshold knobs; zero link budget drops any " +
      "block with a link; no qualifying block -> empty text") {
    val s = spark
    import s.implicits._
    val html = "<p>twelve chars!</p>" +
      "<p>linked text here <a href=\"/x\">x</a></p>"
    def run(minC: Int, maxShare: Long) =
      Seq(html).toDF("h")
        .select(TextFunctions.mainContent(col("h"), minC, maxShare)
          .as("m"))
        .select(col("m.main_text"), col("m.n_kept"))
        .collect().head
    val strict = run(14, 0L) // first block is 13 chars; second has a link
    assert(strict.getString(0) == "" && strict.getLong(1) == 0)
    val loose = run(5, 1000000L)
    assert(loose.getLong(1) == 2)
  }

  private def meta(name: String, ss: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    ss.toDF("h").select(TextFunctions.htmlMeta(col("h"), name).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("htmlMeta: first match wins; both attribute orders; property= " +
      "alias; empty content distinguished from no match") {
    assert(meta("description",
      """<meta name="description" content="first desc">""" +
        """<meta name="description" content="second">""",
      """<meta content="order swapped" name="description">""",
      """<META NAME = "Description" CONTENT = 'single quoted'>""",
      """<meta name="keywords" content="other tag only">""",
      """<meta name="description" content="">""",
      null: String) ==
      Seq("first desc", "order swapped", "single quoted", null, "", null))
    // OpenGraph property= form
    assert(meta("og:title",
      """<meta property="og:title" content="OG Title">""") ==
      Seq("OG Title"))
    // a '>' inside an earlier quoted attr ends the candidate tag (the
    // [^>]*? constraint, identical in RE2) — documented like htmlLinks
    assert(meta("d", """<meta x="a>b" name="d" content="v">""") ==
      Seq(null: String))
    // attribute boundary (ADVICE r15): data-name/data-content never
    // match; a real pair later in the document still does
    assert(meta("d",
      """<meta data-name="d" data-content="fake">""",
      """<meta data-name="d" data-content="fake">""" +
        """<meta name="d" content="real">""") ==
      Seq(null, "real"))
  }

  test("canonicalLink: both orders; first wins; none -> null") {
    val s = spark
    import s.implicits._
    val got = Seq(
      """<link rel="canonical" href="https://ex.com/a">""" +
        """<link rel="canonical" href="https://ex.com/b">""",
      """<link href='https://ex.com/swap' rel='canonical'>""",
      """<link rel="stylesheet" href="/css">""",
      // attribute boundary (ADVICE r15): data-rel/data-href don't match
      """<link data-rel="canonical" data-href="https://ex.com/no">""",
      null: String
    ).toDF("h").select(TextFunctions.canonicalLink(col("h")).as("c"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("https://ex.com/a", "https://ex.com/swap",
      null, null, null))
  }

  test("metaRobotsFlags: directive list parsing; none=both; default " +
      "indexable; null html -> null struct") {
    val s = spark
    import s.implicits._
    val got = Seq(
      """<meta name="robots" content="noindex, nofollow">""",
      """<meta name="ROBOTS" content=" NOINDEX ">""",
      """<meta name="robots" content="none">""",
      """<meta name="robots" content="index, follow">""",
      """no robots meta at all""",
      null: String
    ).toDF("h")
      .select(TextFunctions.metaRobotsFlags(col("h")).as("f"))
      .select(col("f.noindex"), col("f.nofollow"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getBoolean(0),
        if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq
    assert(got == Seq((true, true), (true, false), (true, true),
      (false, false), (false, false), (null, null)))
  }

  test("htmlImages: three quote styles, src-less / EMPTY-src and " +
      "data-src/<imgx decoys skipped, alt through the kernel, empty " +
      "alt stays empty") {
    val s = spark
    import s.implicits._
    val html = "<img src=\"/a.jpg\" alt=\"caf&eacute;  &amp; x\">" +
      "<IMG ALT='b first' SRC='/b.png'>" + // any case, any attr order
      "<img src=/c.gif>" +
      "<img src=\"/d.webp\" alt=\"\">" + // decorative: alt stays ""
      "<img src=\"\" alt=\"no url\">" + // r18 advice: quoted-empty src
      "<img data-src=\"/decoy\" alt=x><img alt=nosrc><imgx src=\"/no\">"
    val got = Seq(html).toDF("h")
      .select(explode(TextFunctions.htmlImages(col("h"))).as("im"))
      .select(col("im.src"), col("im.alt"), col("im.srcset"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    // the kernel's constrained entity set is lt/gt/quot/apos/nbsp/amp:
    // &eacute; passes through verbatim (same on the oracle side)
    assert(got == Seq(("/a.jpg", "caf&eacute; & x", null),
      ("/b.png", "b first", null), ("/c.gif", null, null),
      ("/d.webp", "", null)))
    assert(Seq(Option.empty[String]).toDF("h")
      .select(TextFunctions.htmlImages(col("h"))).collect().head
      .isNullAt(0)) // null html -> null
  }

  test("srcsetUrls: whitespace-tokenized grammar — descriptors " +
      "dropped, empty candidates dropped, commas INSIDE a token stay " +
      "in the URL (data-URI safe), null -> null") {
    val s = spark
    import s.implicits._
    def u(ss: String): Seq[String] =
      Seq(Option(ss)).toDF("s")
        .select(TextFunctions.srcsetUrls(col("s")).as("u"))
        .as[Option[Seq[String]]].first().orNull
    assert(u("/a-1x.png 1x, /a-2x.png 2x") ==
      Seq("/a-1x.png", "/a-2x.png"))
    assert(u("a.jpg 480w,\n\tb.jpg 800w , c.jpg") ==
      Seq("a.jpg", "b.jpg", "c.jpg"))
    assert(u("solo.png") == Seq("solo.png"))
    assert(u("x.png 1x,") == Seq("x.png")) // trailing comma
    // r18 what's-wrong #1: the data-URI's comma is part of the URL
    assert(u("data:image/png;base64,iVBORw0KGg== 1x, /b.png 2x") ==
      Seq("data:image/png;base64,iVBORw0KGg==", "/b.png"))
    // separator comma glued to the URL token (no descriptor)
    assert(u("a.png, b.png") == Seq("a.png", "b.png"))
    // separator glued to the FOLLOWING token instead
    assert(u("a.jpg ,b.jpg") == Seq("a.jpg", "b.jpg"))
    assert(u("a.jpg 1x ,b.jpg 2x") == Seq("a.jpg", "b.jpg"))
    // r19 advice: separator glued to the PRECEDING descriptor with no
    // following space — the candidate ends at the comma inside the
    // descriptor token, the remainder is the NEXT candidate's URL,
    // and the token after it is that URL's descriptor (not a URL)
    assert(u("a.jpg 1x,b.jpg 2x") == Seq("a.jpg", "b.jpg"))
    assert(u("a.jpg 480w,b.jpg 800w,c.jpg") ==
      Seq("a.jpg", "b.jpg", "c.jpg"))
    // descriptor token carrying a URL AND ending its own candidate
    assert(u("a.jpg 1x,b.jpg, c.jpg") == Seq("a.jpg", "b.jpg", "c.jpg"))
    // interior commas of the glued URL survive (data-URI after the
    // first separator comma)
    assert(u("a.jpg 2x,data:image/png;base64,AA== 1x") ==
      Seq("a.jpg", "data:image/png;base64,AA=="))
    assert(u(null) == null)
  }
}
