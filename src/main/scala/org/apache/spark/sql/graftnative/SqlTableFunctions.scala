// Shim package (see NativeExpressions.scala) — needs the private[sql]
// TableFunctionRegistry FunctionDescription shape.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-FUNCTION surface for the pipeline-shaped DataFrame
  * operators — `SELECT * FROM graft_sessionize('events_view',
  * 'user_id', 'ts', 'value', 1800000)` plans the same operator graph
  * as the DataFrame call, registered through
  * `SparkSessionExtensions.injectTableFunction`.
  *
  * The input relation is named by a STRING LITERAL resolved through the
  * session catalog (`SparkSession.active.table`) — the same contract as
  * every SQL-engine polymorphic table function that predates TABLE()
  * arguments: register the input as a (temp) view, pass its name. The
  * builder returns the operator's UNANALYZED logical plan; the outer
  * query's analyzer resolves it in place, so the optimizer sees one
  * seamless plan (filters above the TVF push into it like any subquery).
  *
  * WHICH operators are surfaced — a deliberate boundary (round-15
  * decision, see PLANS.md): only operators whose DataFrame entry point
  * is a PURE LAZY PLAN BUILDER (no driver-side collect at build time)
  * are eligible. Table-function builders run during ANALYSIS; an
  * operator that trains a model with a driver micro-round at build time
  * (pcaTrain's moment pass, quantileNormalize's grid collect,
  * mahalanobisScores' moments, BPE rounds, rfmSegments — whose
  * groupedCumSum kernel collects per-bucket partials for the prefix
  * offsets, an ADVICE-r15 finding that removed graft_rfm from this
  * surface) would launch Spark jobs from inside `EXPLAIN`, break plan
  * caching, and re-train on every re-analysis. Those stay
  * DataFrame-only by design — their API already factorizes into train
  * (driver model) → apply (scan-side plan), and the apply halves are
  * reachable from SQL through the scalar surface ([[SqlFunctions]]). */
object SqlTableFunctions {

  type TableFunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(SqlTableFunctions.getClass.getCanonicalName, null,
      name, usage, "", "", "", "", "", "", "built-in")

  private def requireArity(name: String, args: Seq[Expression],
      lo: Int, hi: Int): Unit =
    if (args.length < lo || args.length > hi)
      throw new IllegalArgumentException(
        s"$name expects $lo..$hi argument(s), got ${args.length}")

  private def strLit(name: String, arg: String, e: Expression): String =
    e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other if other.foldable && other.dataType == StringType =>
        scala.util.Try(other.eval()).toOption
          .collect { case s: UTF8String => s.toString }
          .getOrElse(throw new IllegalArgumentException(
            s"$name: $arg must be a STRING literal, got $e"))
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be a STRING literal, got $e")
    }

  private def intLit(name: String, arg: String, e: Expression): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other if other.foldable && other.dataType == IntegerType =>
        scala.util.Try(other.eval()).toOption.collect { case v: Int => v }
          .getOrElse(throw new IllegalArgumentException(
            s"$name: $arg must be an INT literal, got $e"))
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be an INT literal, got $e")
    }

  private def numLit(name: String, arg: String, e: Expression): Double =
    e match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Int, IntegerType) => v.toDouble
      case Literal(v: Long, LongType) => v.toDouble
      case other if other.foldable =>
        scala.util.Try(other.eval()).toOption.collect {
          case v: Double => v
          case v: Int => v.toDouble
          case v: Long => v.toDouble
        }.getOrElse(throw new IllegalArgumentException(
          s"$name: $arg must be a numeric literal, got $e"))
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be a numeric literal, got $e")
    }

  /** Resolve the named relation through the active session's catalog.
    * Missing name → the engine's own named TABLE_OR_VIEW_NOT_FOUND. */
  private def rel(name: String): DataFrame = SparkSession.active.table(name)

  private def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.logical

  val functions: Seq[TableFunctionDescription] = Seq(

    (FunctionIdentifier("graft_sessionize"),
      info("graft_sessionize",
        "graft_sessionize(table, userCol, tsCol, valueCol, gapMs) - " +
          "gap-based sessionization (batch)"),
      args => { requireArity("graft_sessionize", args, 5, 5)
        planOf(graft.streaming.Streaming.sessionizeBatch(
          rel(strLit("graft_sessionize", "table", args(0))),
          strLit("graft_sessionize", "userCol", args(1)),
          strLit("graft_sessionize", "tsCol", args(2)),
          strLit("graft_sessionize", "valueCol", args(3)),
          numLit("graft_sessionize", "gapMs", args(4)).toLong)) }),

    (FunctionIdentifier("graft_target_encode"),
      info("graft_target_encode",
        "graft_target_encode(table, idCol, catCol, labelCol[, k, " +
          "smoothing]) - out-of-fold smoothed target encoding"),
      args => { requireArity("graft_target_encode", args, 4, 6)
        val k = if (args.length > 4)
          intLit("graft_target_encode", "k", args(4)) else 5
        val m = if (args.length > 5)
          numLit("graft_target_encode", "smoothing", args(5)) else 20.0
        planOf(graft.ops.Sampling.targetEncode(
          rel(strLit("graft_target_encode", "table", args(0))),
          strLit("graft_target_encode", "idCol", args(1)),
          strLit("graft_target_encode", "catCol", args(2)),
          strLit("graft_target_encode", "labelCol", args(3)), k, m)) }),

    (FunctionIdentifier("graft_exact_dedup"),
      info("graft_exact_dedup",
        "graft_exact_dedup(table, textCol, idCol) - keep first row per " +
          "normalized content key"),
      args => { requireArity("graft_exact_dedup", args, 3, 3)
        planOf(graft.ops.Dedup.exactDedup(
          rel(strLit("graft_exact_dedup", "table", args(0))),
          strLit("graft_exact_dedup", "textCol", args(1)),
          strLit("graft_exact_dedup", "idCol", args(2)))) }),

    (FunctionIdentifier("graft_warc_records"),
      info("graft_warc_records",
        "graft_warc_records(table, idCol, warcCol) - split WARC/WET " +
          "file bodies into records with parsed headers"),
      args => { requireArity("graft_warc_records", args, 3, 3)
        planOf(graft.ops.Web.warcRecords(
          rel(strLit("graft_warc_records", "table", args(0))),
          strLit("graft_warc_records", "idCol", args(1)),
          strLit("graft_warc_records", "warcCol", args(2)))) }),

    (FunctionIdentifier("graft_warc_gzip"),
      info("graft_warc_gzip",
        "graft_warc_gzip(table, idCol, binCol) - split .warc.gz binary " +
          "cells into records (gzip members + Content-Length offsets)"),
      args => { requireArity("graft_warc_gzip", args, 3, 3)
        planOf(graft.ops.Web.warcRecordsGzip(
          rel(strLit("graft_warc_gzip", "table", args(0))),
          strLit("graft_warc_gzip", "idCol", args(1)),
          strLit("graft_warc_gzip", "binCol", args(2)))) }),

    (FunctionIdentifier("graft_sitemap_entries"),
      info("graft_sitemap_entries",
        "graft_sitemap_entries(table, idCol, xmlCol) - sitemap <url> " +
          "blocks as (loc, lastmod) rows in document order"),
      args => { requireArity("graft_sitemap_entries", args, 3, 3)
        planOf(graft.ops.Web.sitemapEntries(
          rel(strLit("graft_sitemap_entries", "table", args(0))),
          strLit("graft_sitemap_entries", "idCol", args(1)),
          strLit("graft_sitemap_entries", "xmlCol", args(2)))) }),

    (FunctionIdentifier("graft_robots_decide"),
      info("graft_robots_decide",
        "graft_robots_decide(urlTable, urlCol, robotsTable, hostCol, " +
          "txtCol, agent) - RFC 9309 per-URL allow/deny verdicts"),
      args => { requireArity("graft_robots_decide", args, 6, 6)
        planOf(graft.ops.Web.robotsDecisions(
          rel(strLit("graft_robots_decide", "urlTable", args(0))),
          strLit("graft_robots_decide", "urlCol", args(1)),
          rel(strLit("graft_robots_decide", "robotsTable", args(2))),
          strLit("graft_robots_decide", "hostCol", args(3)),
          strLit("graft_robots_decide", "txtCol", args(4)),
          strLit("graft_robots_decide", "agent", args(5)))) }),

    // Eligibility note: the builder's only driver-side work is the
    // metadata glob (fs.globStatus) — the same class of analysis-time
    // work every Spark file source performs; no Spark job, no collect.
    // (warcCdx stays DataFrame-only: its localCheckpoint is an eager
    // job at build time.)
    (FunctionIdentifier("graft_warc_files"),
      info("graft_warc_files",
        "graft_warc_files(pattern[, targetChunkBytes]) - read .warc.gz " +
          "FILES by glob through the member-boundary chunked reader " +
          "(bounded per-task memory, >1 task per file)"),
      args => { requireArity("graft_warc_files", args, 1, 2)
        val target = if (args.length > 1)
          intLit("graft_warc_files", "targetChunkBytes", args(1)).toLong
        else graft.sources.WarcFiles.DefaultTargetChunkBytes
        planOf(graft.sources.WarcFiles.warcRecordsGzipFiles(
          SparkSession.active,
          strLit("graft_warc_files", "pattern", args(0)), target)) }),

    (FunctionIdentifier("graft_topk_per_group"),
      info("graft_topk_per_group",
        "graft_topk_per_group(table, scoreCol, k, groupCol...) - heap " +
          "top-k rows per group by descending score"),
      args => { requireArity("graft_topk_per_group", args, 4, 8)
        val groups = args.drop(3).zipWithIndex.map { case (e, i) =>
          strLit("graft_topk_per_group", s"groupCol$i", e) }
        planOf(GraftExtensions.topKPerGroup(
          rel(strLit("graft_topk_per_group", "table", args(0))),
          groups,
          strLit("graft_topk_per_group", "scoreCol", args(1)),
          intLit("graft_topk_per_group", "k", args(2)))) })
  )
}
