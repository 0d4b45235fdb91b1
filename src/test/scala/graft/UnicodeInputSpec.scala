package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Fourth degenerate-shape sweep (after empty / all-null /
  * hot-key-skew): UNICODE-HOSTILE TEXT — the shapes a real web crawl
  * actually serves. Every registered query must either produce a frame
  * or throw a DOCUMENTED named guard; never an opaque crash. The text
  * machinery under test: tokenization (\\W+ on astral-plane
  * codepoints), shingling (combining marks, ZWJ emoji families),
  * hashing (NUL bytes must not truncate), per-char loops (a 10k-char
  * single token must not blow a buffer), NFC normalization (decomposed
  * accents), and writers (control chars through parquet/CSV/JSON
  * round-trips).
  *
  * Hostile classes, cycled over doc_id % 9:
  *  0 empty string (NOT null — the all-null sweep covers null)
  *  1 emoji + ZWJ family + flag sequences (astral plane, grapheme > 1
  *    codepoint)
  *  2 decomposed combining marks (NFC must compose; tokens carry marks)
  *  3 RTL Arabic/Hebrew with explicit bidi override controls
  *  4 CJK with no spaces (a "one-token" 30-char document)
  *  5 NUL + C0 control chars embedded mid-token
  *  6 one 10,000-char single token (length-loop stress)
  *  7 whitespace-only (tokenizes to zero tokens, n_chars > 0)
  *  8 mixed-script Latin/Greek with diacritics
  *
  * customer.c_name gets combining marks + emoji (linkage/phonetic
  * paths); events.event_type gets an emoji prefix (funnel/transition
  * steps legitimately go empty, never crash). Unpaired surrogates are
  * deliberately NOT included: they are not valid UTF-8 and parquet
  * cannot round-trip them — a corpus would have lost them at ingest.
  */
class UnicodeInputSpec extends AnyFunSuite {
  import SparkFixture._

  private val hostile = Seq(
    "",
    "🚀🚀 raketen👨‍👩‍" +
      "👧‍👦familie 🇩🇪 " +
      "flags 😀",
    "café résumé ǻbc naïve " +
      "decǫmposed",
    "مرحبا بالعا" +
      "لم \u202Eevil\u202C שלום bidi",
    "四十二是生命宇宙以及任" +
      "何事情的终极答案由深思" +
      "计算而来的结论",
    "null\u0000byte\u0001ctrl\u0007bell tab\there done",
    "x" * 10000,
    "   \t\n  ",
    "ASCII mixed ñörmàl tëxt with Ωμέ" +
      "γα και ελλην" +
      "ικά words")

  private lazy val uniDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_unicode_sf").toString
    val src = "/root/testdata/sf0.001"
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")

    Seq("region", "nation", "supplier", "part", "orders", "lineitem",
        "embeddings").foreach { t =>
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
    load("events").select(col("event_id"), col("ts"), col("user_id"),
        concat(lit("🔥"), col("event_type")).as("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    load("customer").select(col("c_custkey"),
        concat(col("c_name"), lit(" é😀")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("every registered query survives unicode-hostile text (result " +
      "or documented guard, never an opaque crash)") {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, uniDir).collect() // force full execution
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
      s"opaque unicode-input failures (${opaque.size}):\n" +
        opaque.mkString("\n"))
  }
}
