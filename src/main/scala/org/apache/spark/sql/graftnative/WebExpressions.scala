// Shim package (NativeExpressions.scala convention) — the graft native
// expressions live under org.apache.spark.sql so they can use the
// private[sql] codegen/expression internals.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution: `url_resolve(base, ref)` returns
  * the absolute URL that `ref` denotes when found in a document at
  * `base` — THE missing step between [[graft.functions.TextFunctions
  * .htmlLinks]] (raw href values, mostly relative on real pages) and
  * the canonicalize/dedup/graph tier, which all assume absolute URLs
  * (r15 verdict #2: without it, most intra-site crawl-graph edges are
  * garbage).
  *
  * Semantics (RFC 3986, replayed constrained):
  *  - components split per appendix B: optional `scheme:` (chars
  *    before the first `:` when it precedes any `/`), optional
  *    `//authority` (to the next `/`), path, optional `?query`,
  *    optional `#fragment`;
  *  - the strict algorithm of §5.2.2: an absolute `ref` wins outright;
  *    a scheme-relative `//host/x` takes the base scheme; an empty ref
  *    returns the base (with the base query, no fragment); `?q` keeps
  *    the base path; root-relative `/x` and relative `x`/`./x`/`../x`
  *    paths go through merge + remove_dot_segments (§5.2.3/§5.2.4),
  *    which cannot climb above the root (`/../../x` → `/x`);
  *  - `ref`'s fragment is carried through (callers that dedup drop it
  *    downstream in `canonicalizeUrl`);
  *  - a base WITHOUT a scheme cannot anchor resolution → null (the
  *    `try_parse_url` junk-in/null-out convention — a crawl corpus
  *    always contains junk base URLs); null inputs → null.
  *
  * No percent-encoding normalization and no scheme/host case folding —
  * resolution is kept byte-transparent (§6 normalization is
  * `canonicalizeUrl`'s job). Pure scan-side kernel with real codegen
  * (the HtmlExtractText pattern); one call per row, no allocation
  * beyond the output — 100 TB-safe as a plain projection. */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "url_resolve"
  override def nullable: Boolean = true

  override protected def nullSafeEval(b: Any, r: Any): Any =
    UrlResolve.compute(b.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("urlResolveKernel", UrlResolve,
      UrlResolve.getClass.getName)
    nullSafeCodeGen(ctx, ev, (b, r) => {
      s"""
         |${ev.value} = $ref.compute($b, $r);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

object UrlResolve {

  /** Appendix-B component split. `scheme`/`auth`/`query`/`frag` are
    * null when ABSENT (an empty-but-present component — `http://h?` —
    * is "" and round-trips, per the RFC's defined/undefined
    * distinction); `path` is always present (possibly ""). */
  private final class Parts(val scheme: String, val auth: String,
    val path: String, val query: String, val frag: String)

  private def parse(s: String): Parts = {
    var rest = s
    var frag: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { frag = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val c = rest.indexOf(':')
    if (c > 0) {
      val sl = rest.indexOf('/')
      if (sl < 0 || c < sl) {
        scheme = rest.substring(0, c)
        rest = rest.substring(c + 1)
      }
    }
    var auth: String = null
    if (rest.startsWith("//")) {
      val end = rest.indexOf('/', 2)
      if (end < 0) { auth = rest.substring(2); rest = "" }
      else { auth = rest.substring(2, end); rest = rest.substring(end) }
    }
    new Parts(scheme, auth, rest, query, frag)
  }

  /** §5.2.3 merge: base with authority and empty path contributes a
    * leading '/'; otherwise everything up to (including) the base
    * path's last '/' prefixes the reference path. */
  private def merge(b: Parts, refPath: String): String =
    if (b.auth != null && b.path.isEmpty) "/" + refPath
    else {
      val i = b.path.lastIndexOf('/')
      if (i < 0) refPath else b.path.substring(0, i + 1) + refPath
    }

  /** §5.2.4 remove_dot_segments, verbatim. */
  private def removeDotSegments(input: String): String = {
    val out = new java.lang.StringBuilder(input.length)
    var in = input
    def dropLastSegment(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i >= 0) i else 0)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSegment() }
      else if (in == "/..") { in = "/"; dropLastSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.charAt(0) == '/') 1 else 0
        val i = in.indexOf('/', from)
        if (i < 0) { out.append(in); in = "" }
        else { out.append(in, 0, i); in = in.substring(i) }
      }
    }
    out.toString
  }

  def compute(base: UTF8String, ref: UTF8String): UTF8String = {
    val b = parse(base.toString)
    if (b.scheme == null) return null
    val r = parse(ref.toString)
    var scheme: String = null; var auth: String = null
    var path: String = null; var query: String = null
    if (r.scheme != null) {
      scheme = r.scheme; auth = r.auth
      path = removeDotSegments(r.path); query = r.query
    } else {
      scheme = b.scheme
      if (r.auth != null) {
        auth = r.auth; path = removeDotSegments(r.path); query = r.query
      } else {
        auth = b.auth
        if (r.path.isEmpty) {
          path = b.path
          query = if (r.query != null) r.query else b.query
        } else {
          path =
            if (r.path.charAt(0) == '/') removeDotSegments(r.path)
            else removeDotSegments(merge(b, r.path))
          query = r.query
        }
      }
    }
    val sb = new java.lang.StringBuilder(
      base.numChars() + ref.numChars() + 8)
    sb.append(scheme).append(':')
    if (auth != null) sb.append("//").append(auth)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (r.frag != null) sb.append('#').append(r.frag)
    UTF8String.fromString(sb.toString)
  }
}

object WebFunctions {
  /** [[UrlResolve]] as a Column function. */
  def urlResolve(base: Column, ref: Column): Column =
    ExpressionUtils.column(UrlResolve(
      ExpressionUtils.expression(base), ExpressionUtils.expression(ref)))
}
