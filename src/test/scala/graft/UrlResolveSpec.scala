package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web
import graft.functions.TextFunctions

/** RFC 3986 reference resolution ([[Web.resolveUrl]] /
  * [[org.apache.spark.sql.graftnative.UrlResolve]]) — pinned against
  * the RFC's OWN §5.4 test vectors (base `http://a/b/c/d;p?q`), both
  * the normal and the abnormal set, plus the null contracts and the
  * `<base href>` extraction that re-anchors a page's links.
  */
class UrlResolveSpec extends AnyFunSuite {
  import SparkFixture._

  private val base = "http://a/b/c/d;p?q"

  private def resolve(pairs: (String, String)*): Seq[String] = {
    val s = spark
    import s.implicits._
    pairs.toSeq.toDF("b", "r")
      .select(Web.resolveUrl(col("b"), col("r")).as("u"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  private def fromBase(refs: (String, String)*): Unit = {
    val got = resolve(refs.map { case (r, _) => (base, r) }: _*)
    assert(got == refs.map(_._2),
      refs.map(_._1).zip(got).zip(refs.map(_._2))
        .collect { case ((r, g), e) if g != e => s"'$r' -> $g (want $e)" }
        .mkString("; "))
  }

  test("RFC 3986 §5.4.1 normal examples resolve exactly") {
    fromBase(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
  }

  test("RFC 3986 §5.4.2 abnormal examples: can't climb above root; " +
      "dot-lookalike segments pass through; strict http:g") {
    fromBase(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "http:g" -> "http:g")
  }

  test("crawl shapes: scheme-relative keeps base scheme; authority " +
      "with port; rootless base path; host-only base") {
    assert(resolve(
      ("https://h.ex/a/b", "//cdn.ex/x.js"),
      ("http://h.ex:8080/a/", "p?k=v"),
      ("http://h.ex", "p"), // empty base path: merge adds the '/'
      ("http://h.ex?bq", "")) ==
      Seq("https://cdn.ex/x.js", "http://h.ex:8080/a/p?k=v",
        "http://h.ex/p", "http://h.ex?bq"))
  }

  test("junk-in/null-out: base without a scheme or null inputs -> null") {
    assert(resolve(
      ("relative/base", "g"),
      ("//no-scheme.ex/a", "g"),
      (null, "g"),
      (base, null)) == Seq(null, null, null, null))
  }

  test("htmlBaseHref: first base wins; three quote styles; attribute " +
      "boundary; absent -> null; composes with resolveUrl") {
    val s = spark
    import s.implicits._
    val got = Seq(
      """<head><base href="https://cdn.ex/r/"><base href="/x"></head>""",
      """<head><base target="_b" href='/deep/'></head>""",
      """<head><base href=/unq></head>""",
      """<head><base data-href="/fake"></head>""",
      "no base here",
      null: String
    ).toDF("h")
      .select(TextFunctions.htmlBaseHref(col("h")).as("b"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("https://cdn.ex/r/", "/deep/", "/unq",
      null, null, null))
    // the HTML5 composition: base href re-anchors, else the page URL
    val resolved = Seq(
      ("http://h.ex/p/page.html",
        """<base href="https://cdn.ex/r/">""", "img/x.png"),
      ("http://h.ex/p/page.html", "no base", "img/x.png"))
      .toDF("page", "html", "href")
      .select(Web.resolveUrl(
        coalesce(
          // a RELATIVE base href itself resolves against the page URL
          Web.resolveUrl(col("page"),
            TextFunctions.htmlBaseHref(col("html"))),
          col("page")), col("href")).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(resolved == Seq("https://cdn.ex/r/img/x.png",
      "http://h.ex/p/img/x.png"))
  }

  test("resolveUrl stays inside whole-stage codegen") {
    // non-foldable input (range id) so neither ConvertToLocalRelation
    // nor constant folding can collapse the projection before the pin
    val p = spark.range(4)
      .select(Web.resolveUrl(lit(base),
        concat(lit("seg"), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    assert(!p.contains("CodegenFallback"), p.take(800))
  }
}
