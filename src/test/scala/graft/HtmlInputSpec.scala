package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sixth degenerate-shape sweep (after empty / all-null / hot-key-skew
  * / unicode-hostile / numeric-hostile): HOSTILE MARKUP — documents
  * whose text IS raw adversarial HTML, the shape the r15 crawl tier
  * ingests and every text operator downstream of `htmlText` must then
  * digest. Every registered query must produce a frame or a documented
  * named guard; never an opaque crash. The machinery under test: the
  * HtmlExtractText kernel's unterminated-construct handling, the
  * regex-chain operators (mainContent, htmlLinks, htmlMeta) on
  * pathological tag soup, entity decoding on repeat bombs (decode is
  * single-pass — no recursive expansion), and the plain-text tier
  * (tokenizers, shinglers, dedup) on markup-dense "text".
  *
  * Hostile classes, cycled over doc_id % 9:
  *  0 deep nesting: 400 unclosed `<div><span>` pairs around one word
  *  1 one enormous unterminated open tag (5 kB of attribute bytes)
  *  2 unterminated comment swallowing the document tail
  *  3 unterminated script whose payload LOOKS like more HTML
  *  4 tag soup: stray closes, bare `<`/`>`, mismatched quotes
  *  5 entity bomb: 2,000 `&amp;lt;` repeats (must decode ONCE each)
  *  6 200 repeats of a quoted-`>` attribute anchor
  *  7 markup-only document (tags, no visible text at all)
  *  8 a legitimate small page (control)
  */
class HtmlInputSpec extends AnyFunSuite {
  import SparkFixture._

  private val hostile = Seq(
    "<div><span>" * 400 + "core" + "</span></div>" * 50,
    "<a href=\"" + "y" * 5000,
    "<!-- the comment never ends " + "filler words here " * 40,
    "<script>var html = '<p>fake</p><a href=\"/x\">l</a>' " +
      "+ 'more';" + " // never closed",
    "</p></div>> stray < bare <a href='mismatched\" quote>text" +
      "<meta name=\"x content=y><ul><li>item",
    "&amp;lt;" * 2000,
    "<a title=\"a>b\" href=\"/k\">t</a> words between " * 200,
    "<p><b><i></i></b></p><div><table><tr><td></td></tr></table></div>",
    "<html><head><title>Ok page</title></head><body><p>Real prose " +
      "with enough words to pass filters and score well.</p>" +
      "<a href=\"/next\">next</a></body></html>")

  private lazy val htmlDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_htmlhostile_sf").toString
    val src = "/root/testdata/sf0.001"
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      load(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val pick = hostile.zipWithIndex.foldLeft(lit(hostile.head)) {
      case (acc, (s, i)) =>
        when(pmod(col("doc_id"), lit(hostile.size.toLong)) === i.toLong,
          lit(s)).otherwise(acc)
    }
    load("documents").select(col("doc_id"), pick.as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every registered query survives hostile-markup text (result " +
      "or documented guard, never an opaque crash)") {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, htmlDir).collect()
      } catch {
        case e: IllegalArgumentException if e.getMessage != null => // guard
        case e: IllegalStateException if e.getMessage != null =>    // guard
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          opaque += s"$name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(160)}"
      }
    }
    assert(opaque.isEmpty,
      s"opaque hostile-markup failures (${opaque.size}):\n" +
        opaque.mkString("\n"))
  }

  test("html tier point-checks on the hostile classes: kernel strips " +
      "to end on unterminated constructs; entity bomb decodes once; " +
      "mainContent never fabricates text") {
    val s = spark
    import s.implicits._
    val f = graft.functions.TextFunctions
    val df = hostile.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("i", "h")
      .select(col("i"), f.htmlText(col("h")).as("t"),
        f.mainContent(col("h")).getField("main_text").as("m"),
        size(f.htmlLinks(col("h"))).as("nl"))
      .orderBy("i").collect()
    // 0: deep nesting -> the one word survives
    assert(df(0).getString(1) == "core")
    // 1: unterminated tag -> nothing visible
    assert(df(1).getString(1) == "")
    // 2/3: unterminated comment/script swallow to end -> empty
    assert(df(2).getString(1) == "")
    assert(df(3).getString(1) == "")
    // 5: entity bomb decodes each &amp;lt; once -> 2000 literal "&lt;"
    assert(df(5).getString(1) == "&lt;" * 2000)
    // 6: a '>' inside an EARLIER quoted attribute ends the candidate
    // tag (the documented [^>]*? constraint, pinned in HtmlSpec), so
    // these anchors are structurally invisible to htmlLinks — 0, not
    // 200, and no crash
    assert(df(6).getInt(3) == 0)
    // 7: markup-only -> no text, mainContent empty
    assert(df(7).getString(1) == "" && df(7).getString(2) == "")
    // 8: control page keeps its prose
    assert(df(8).getString(2).startsWith("Real prose"))
  }
}
