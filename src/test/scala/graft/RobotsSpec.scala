package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web

/** RFC 9309 robots.txt parsing ([[Web.robotsRules]]) and per-URL
  * verdicts ([[Web.robotsDecisions]]): group assembly (consecutive
  * user-agent headers, rules-before-any-group dropped), exact-agent
  * beats `*` file-wide, empty-value rules dropped, wildcard/`$`
  * matching, longest-match precedence with allow winning ties, and the
  * allowed-by-default cases (no rules, no robots.txt, no matching
  * group). Expected verdicts hand-derived from RFC 9309 §2.2/§5.
  */
class RobotsSpec extends AnyFunSuite {
  import SparkFixture._

  private val robotsTxt =
    """# global group
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp/*.log
      |Allow: /private/open.html
      |
      |User-agent: graftbot
      |User-Agent: otherbot
      |Disallow: /graft-only/
      |Allow: /
      |
      |User-agent: exactonly
      |Disallow: /
      |Disallow:
      |""".stripMargin

  private def rulesFor(agent: String): Set[(String, Boolean)] = {
    val s = spark
    import s.implicits._
    Web.robotsRules(
      Seq(("ex.com", robotsTxt)).toDF("host", "txt"), "host", "txt", agent)
      .select(col("pattern"), col("allow"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
  }

  test("group selection: exact agent beats *, consecutive ua lines " +
      "share a group, empty-value rules dropped") {
    // graftbot has an exact group -> ONLY that group's rules
    assert(rulesFor("GraftBot") ==
      Set(("/graft-only/", false), ("/", true)))
    // otherbot shares the same header run
    assert(rulesFor("otherbot") ==
      Set(("/graft-only/", false), ("/", true)))
    // unknown agent -> the * group; empty Disallow in exactonly's group
    // never leaks anywhere
    assert(rulesFor("strangerbot") ==
      Set(("/private/", false), ("/tmp/*.log", false),
        ("/private/open.html", true)))
    assert(rulesFor("exactonly") == Set(("/", false)))
  }

  test("rules before any user-agent line are invalid and dropped; " +
      "comments and blank lines ignored; CRLF tolerated") {
    val s = spark
    import s.implicits._
    val txt = "Disallow: /headless/\r\n# c\r\nUser-agent: *\r\n" +
      "Disallow: /a/ # trailing comment\r\n\r\nAllow: /a/b\r\n"
    val got = Web.robotsRules(
      Seq(("h", txt)).toDF("host", "txt"), "host", "txt", "anybot")
      .select(col("pattern"), col("allow"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(got == Set(("/a/", false), ("/a/b", true)))
  }

  private def verdicts(urls: Seq[String], agent: String = "graftbot",
      robots: Seq[(String, String)] = Seq(("ex.com", robotsTxt)))
      : Seq[(String, Any)] = {
    val s = spark
    import s.implicits._
    Web.robotsDecisions(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url"),
      "url",
      robots.toDF("host", "txt"), "host", "txt", agent)
      .orderBy(col("id"))
      .select(col("url"), col("allowed"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq
  }

  test("verdicts: longest match wins, allow wins ties, wildcard and $ " +
      "patterns, default allowed, junk URL -> null") {
    val got = verdicts(Seq(
      "http://ex.com/private/secret.html",   // * group: disallowed
      "http://ex.com/private/open.html",     // longer Allow wins
      "http://EX.COM/tmp/x.log",             // wildcard; host case-folds
      "http://ex.com/tmp/x.log.bak",         // prefix match still hits
      "http://ex.com/anything",              // no rule -> allowed
      "http://unknown.org/x",                // no robots.txt -> allowed
      "not a url at all"                     // junk -> null verdict
    ), agent = "strangerbot")
    assert(got == Seq(
      ("http://ex.com/private/secret.html", false),
      ("http://ex.com/private/open.html", true),
      ("http://EX.COM/tmp/x.log", false),
      ("http://ex.com/tmp/x.log.bak", false),
      ("http://ex.com/anything", true),
      ("http://unknown.org/x", true),
      ("not a url at all", null)))
  }

  test("$ anchors the end; query participates in the match target") {
    val txt = "User-agent: *\nDisallow: /*.php$\nDisallow: /q?sid=\n"
    val got = verdicts(Seq(
      "http://h/a.php",          // $ match -> disallowed
      "http://h/a.php?x=1",      // target is /a.php?x=1 -> $ fails
      "http://h/a.phpx",         // $ fails
      "http://h/q?sid=7",        // query in target -> disallowed
      "http://h/q"               // no query -> allowed
    ), agent = "anybot", robots = Seq(("h", txt)))
    assert(got == Seq(
      ("http://h/a.php", false),
      ("http://h/a.php?x=1", true),
      ("http://h/a.phpx", true),
      ("http://h/q?sid=7", false),
      ("http://h/q", true)))
  }

  test("tie between allow and disallow of equal length -> allow " +
      "(least restrictive); graftbot's Allow: / overrides nothing " +
      "longer") {
    val txt = "User-agent: *\nAllow: /dir/\nDisallow: /dir/\n"
    val got = verdicts(Seq("http://h/dir/page"),
      agent = "x", robots = Seq(("h", txt)))
    assert(got == Seq(("http://h/dir/page", true)))
    // graftbot against the main file: /graft-only/ disallow (len 12)
    // beats Allow: / (len 1)
    assert(verdicts(Seq("http://ex.com/graft-only/x")) ==
      Seq(("http://ex.com/graft-only/x", false)))
    assert(verdicts(Seq("http://ex.com/private/secret.html")) ==
      Seq(("http://ex.com/private/secret.html", true)))
  }

  test("regex metacharacters in patterns stay literal") {
    val txt = "User-agent: *\nDisallow: /a+b(c).d\n"
    val got = verdicts(Seq(
      "http://h/a+b(c).d/e",   // literal match -> disallowed
      "http://h/aab(c)xd"      // would match if + and . were regex
    ), agent = "x", robots = Seq(("h", txt)))
    assert(got == Seq(
      ("http://h/a+b(c).d/e", false),
      ("http://h/aab(c)xd", true)))
  }

  test("empty or null robots.txt -> every URL allowed") {
    val got = verdicts(Seq("http://h/x", "http://h/y"),
      agent = "x", robots = Seq(("h", ""), ("h2", null: String)))
    assert(got.map(_._2) == Seq(true, true))
  }

  test("robotsCrawlDelay: exact group replaces *, first PARSEABLE " +
      "value wins (junk skipped), fractional seconds -> ms, no delay " +
      "line -> host absent") {
    val s = spark
    import s.implicits._
    def delays(agent: String): Map[String, Long] =
      Web.robotsCrawlDelay(Seq(
        // * group: junk value first, then 1.5s; graftbot group: 3s
        ("a.ex", "User-agent: *\nDisallow: /p/\nCrawl-delay: fast\n" +
          "Crawl-delay: 1.5\n\nUser-agent: graftbot\nDisallow: /g\n" +
          "Crawl-delay: 3\n"),
        // only a * group with an integer delay
        ("b.ex", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
        // rules but NO delay line
        ("c.ex", "User-agent: *\nDisallow: /y\n"),
        // delay before any group header is invalid and dropped
        ("d.ex", "Crawl-delay: 9\nUser-agent: *\nDisallow: /z\n"))
        .toDF("host", "txt"), "host", "txt", agent)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(delays("graftbot") == Map("a.ex" -> 3000L, "b.ex" -> 10000L))
    assert(delays("nobody") == Map("a.ex" -> 1500L, "b.ex" -> 10000L))
    // robotsRules output is unchanged by the delay lines riding along
    val rules = Web.robotsRules(Seq(
      ("a.ex", "User-agent: *\nCrawl-delay: 2\nDisallow: /p/\n"))
      .toDF("host", "txt"), "host", "txt", "anybot")
      .collect().map(_.getString(1)).toSeq
    assert(rules == Seq("/p/"))
  }

  test("politenessSchedule: offsets = (seq-1)*delay in lexicographic " +
      "url order; hosts without a delay row use the default") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      ("a.ex", "http://a.ex/2"), ("a.ex", "http://a.ex/1"),
      ("a.ex", "http://a.ex/3"), ("b.ex", "http://b.ex/x"),
      ("b.ex", "http://b.ex/y")).toDF("host", "url")
    val delays = Seq(("a.ex", 2000L)).toDF("host", "crawl_delay_ms")
    val got = Web.politenessSchedule(urls, "url", "host",
        delays, "host", "crawl_delay_ms", defaultDelayMs = 500L)
      .orderBy("host", "fetch_seq")
      .select(col("url"), col("fetch_seq"), col("fetch_offset_ms"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      ("http://a.ex/1", 1, 0L), ("http://a.ex/2", 2, 2000L),
      ("http://a.ex/3", 3, 4000L),
      ("http://b.ex/x", 1, 0L), ("http://b.ex/y", 2, 500L)))
    // maxUrlsPerHost caps THIS cycle's schedule: rows beyond the cap
    // are deferred (dropped), earlier rows unchanged
    val capped = Web.politenessSchedule(urls, "url", "host",
        delays, "host", "crawl_delay_ms", defaultDelayMs = 500L,
        maxUrlsPerHost = Some(2))
      .orderBy("host", "fetch_seq")
      .select(col("url"), col("fetch_seq"), col("fetch_offset_ms"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSeq
    assert(capped == Seq(
      ("http://a.ex/1", 1, 0L), ("http://a.ex/2", 2, 2000L),
      ("http://b.ex/x", 1, 0L), ("http://b.ex/y", 2, 500L)))
    intercept[IllegalArgumentException] {
      Web.politenessSchedule(urls, "url", "host", delays, "host",
        "crawl_delay_ms", maxUrlsPerHost = Some(0))
    }
  }
}
