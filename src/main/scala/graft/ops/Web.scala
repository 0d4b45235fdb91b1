package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-column operators for web-corpus pipelines (source attribution,
  * per-domain quotas, URL-level filtering). Everything here is built on
  * Spark's codegen'd `ParseUrl` expression plus array built-ins — pure
  * scan-side projections until the single hash shuffle of the domain
  * roll-up; nothing touches the driver.
  */
object Web {

  /** URL components as one struct: protocol / host / path / query — the
    * Hive-compatible `parse_url` semantics, `try_` form: absent part or
    * malformed URL → null (a web corpus always contains junk URLs). */
  def urlParts(c: Column): Column = struct(
    try_parse_url(c, lit("PROTOCOL")).as("protocol"),
    try_parse_url(c, lit("HOST")).as("host"),
    try_parse_url(c, lit("PATH")).as("path"),
    try_parse_url(c, lit("QUERY")).as("query"))

  /** One query-string parameter (null when absent). */
  def urlParam(c: Column, key: String): Column =
    try_parse_url(c, lit("QUERY"), lit(key))

  /** Registrable domain ≈ last two host labels ("cdn.src1.org" →
    * "src1.org"). The true answer needs the public-suffix list (external
    * data, multi-label suffixes like co.uk); two-label is the standard
    * self-contained approximation and is documented as such. Hosts with
    * ≤ 2 labels pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(host.isNull, lit(null))
      .otherwise(when(size(labels) <= 2, host)
        .otherwise(array_join(slice(labels, -2, 2), ".")))
  }

  /** Per-registrable-domain corpus roll-up: document count and distinct
    * host count. The shape of every per-domain policy pass (quotas,
    * blocklists, quality-by-domain): one scan-side parse projection,
    * then ONE hash shuffle on the domain key with partial aggregation —
    * no sort, no join, no driver collection. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val host = try_parse_url(col(urlCol), lit("HOST"))
    df.select(registrableDomain(host).as("domain"), host.as("__host"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"))
  }

  /** URL canonicalization for dedup keys: lowercase scheme and host,
    * drop the fragment, drop tracking query parameters (key matches a
    * `dropParamPrefixes` prefix OR equals a `dropParamsExact` name),
    * keep the remaining query in original order, strip the path's
    * trailing slashes. The web-corpus reality this serves: the same
    * page arrives as `HTTP://Example.com/p/1`, `…/p/1/`,
    * `…/p/1?utm_source=feed#top` — exact dedup on the raw string keeps
    * all of them. Malformed URLs (no parseable host) → null, so junk
    * never fabricates a dedup key. Pure scan-side expression over
    * Spark's codegen'd ParseUrl + array built-ins.
    *
    * `ref`/`fbclid`/`gclid` match EXACTLY, not as prefixes — a prefix
    * `ref` would swallow legitimate params (refresh, ref_id, refund_id)
    * and merge genuinely distinct URLs into one dedup key. Only `utm_`
    * keeps prefix semantics (the family is open-ended by convention). */
  def canonicalizeUrl(c: Column,
      dropParamPrefixes: Seq[String] = Seq("utm_"),
      dropParamsExact: Seq[String] = Seq("fbclid", "gclid", "ref"))
      : Column = {
    val proto = lower(try_parse_url(c, lit("PROTOCOL")))
    val host = lower(try_parse_url(c, lit("HOST")))
    val path = regexp_replace(
      coalesce(try_parse_url(c, lit("PATH")), lit("")), "/+$", "")
    val rawQ = try_parse_url(c, lit("QUERY"))
    val keptParams = filter(split(rawQ, "&"), p => {
      val key = element_at(split(p, "="), 1)
      (dropParamPrefixes.map(pre => startswith(key, lit(pre))) ++
        dropParamsExact.map(name => key === lit(name)))
        .reduce(_ || _).unary_!
    })
    val query = when(rawQ.isNull || size(keptParams) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(keptParams, "&")))
    when(proto.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(proto, lit("://"), host, path, query))
  }
}
