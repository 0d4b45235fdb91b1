// Shim package (see NativeExpressions.scala) — needs private[sql]
// FunctionRegistry access for runtime registration.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft native expressions: registered through
  * `SparkSessionExtensions.injectFunction` (config
  * `spark.sql.extensions=...` or `.withExtensions(GraftExtensions.inject)`),
  * so `spark.sql("SELECT graft_text_stats(text).ntok ...")` plans the same
  * codegen'd Catalyst kernels as the DataFrame API — no UDF wrapping, same
  * whole-stage fusion. Mirrors the reference's ability to run its operator
  * surface from query strings while staying Spark-native.
  */
object SqlFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(SqlFunctions.getClass.getCanonicalName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  /** Static int parameters (hash counts, shingle widths) must be literals:
    * they size codegen'd arrays, so a non-literal can't be planned. */
  private def intLit(name: String, arg: String, e: Expression): Int = {
    val folded: Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      // analysis-time-foldable int expressions (CAST(2 AS INT), 1+1) arrive
      // here before constant folding runs — fold them ourselves. eval() can
      // still throw (ANSI overflow like CAST(9999999999 AS INT)): a single
      // guarded eval turns that into the friendly arity error below instead
      // of a raw runtime exception surfacing mid-analysis.
      case other if other.foldable && other.dataType == IntegerType =>
        scala.util.Try(other.eval()).toOption.collect { case v: Int => v }
      case _ => None
    }
    folded.getOrElse(throw new IllegalArgumentException(
      s"$name: $arg must be an INT literal, got $e"))
  }

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats",
        "graft_text_stats(text) - one-pass chars/punct/ntok/wlen/lang-hit stats struct"),
      args => { requireArity("graft_text_stats", args, 1)
        TextStats(args.head) }),

    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(array<long>) - 64-bit simhash over token hashes"),
      args => { requireArity("graft_simhash64", args, 1)
        SimHash64(args.head) }),

    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(array<float>, array<float>) - cosine similarity"),
      args => { requireArity("graft_cosine", args, 2)
        CosineSimilarity(args(0), args(1)) }),

    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(array<string>, n) - distinct xxhash64 of word n-grams"),
      args => { requireArity("graft_shingle_hashes", args, 2)
        ShingleHashes(args(0),
          intLit("graft_shingle_hashes", "n", args(1))) }),

    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(array<string>, numHashes) - minhash signature of shingle set"),
      args => { requireArity("graft_minhash", args, 2)
        MinHashSignature(args(0),
          intLit("graft_minhash", "numHashes", args(1))) }),

    (FunctionIdentifier("graft_minhash_from_longs"),
      info("graft_minhash_from_longs",
        "graft_minhash_from_longs(array<long>, numHashes) - minhash signature of pre-hashed shingles"),
      args => { requireArity("graft_minhash_from_longs", args, 2)
        MinHashFromLongs(args(0),
          intLit("graft_minhash_from_longs", "numHashes", args(1))) }),

    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC composition (ASCII fast path)"),
      args => { requireArity("graft_nfc", args, 1)
        NormalizeNFC(args.head) }),

    (FunctionIdentifier("graft_html_text"),
      info("graft_html_text",
        "graft_html_text(html) - visible text: strip comments/script/style/tags, decode entities, collapse whitespace"),
      args => { requireArity("graft_html_text", args, 1)
        HtmlExtractText(args.head) }),

    (FunctionIdentifier("graft_url_resolve"),
      info("graft_url_resolve",
        "graft_url_resolve(base, ref) - RFC 3986 reference resolution; null when base has no scheme"),
      args => { requireArity("graft_url_resolve", args, 2)
        UrlResolve(args.head, args(1)) }),

    (FunctionIdentifier("graft_charset_decode"),
      info("graft_charset_decode",
        "graft_charset_decode(binary) - struct(charset, source, text): BOM -> meta prescan -> utf-8 default"),
      args => { requireArity("graft_charset_decode", args, 1)
        DecodeCharset(args.head) }),

    (FunctionIdentifier("graft_http_parts"),
      info("graft_http_parts",
        "graft_http_parts(binary) - struct(status_code, reason, http_version, headers, body, body_mode): " +
          "HTTP response parse with chunked de-framing + gzip/deflate body decode"),
      args => { requireArity("graft_http_parts", args, 1)
        HttpParts(args.head) }),

    (FunctionIdentifier("graft_charset_decode_hint"),
      info("graft_charset_decode_hint",
        "graft_charset_decode_hint(binary, contentType) - struct(charset, source, text): " +
          "BOM -> header charset -> meta prescan -> utf-8 default"),
      args => { requireArity("graft_charset_decode_hint", args, 2)
        DecodeCharsetHint(args.head, args(1)) }),

    (FunctionIdentifier("graft_base32"),
      info("graft_base32",
        "graft_base32(binary) - RFC 4648 base32 (A-Z2-7, = padding); " +
          "concat 'sha1:' + graft_base32(unhex(sha1(payload))) is the " +
          "Common Crawl WARC-Payload-Digest spelling"),
      args => { requireArity("graft_base32", args, 1)
        Base32Encode(args.head) }))

  /** Runtime registration for sessions not built with `.withExtensions`
    * (mirrors `GraftExtensions.topKPerGroup`'s self-register). Idempotent:
    * `registerFunction` overwrites. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }
}
