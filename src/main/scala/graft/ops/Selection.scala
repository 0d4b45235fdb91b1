package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SchemaOps

/** Column-selector DSL (reference `SelectReceiver.kt:27-174`): predicates
  * and positional ranges resolved against `df.schema` into `Seq[Column]`.
  * All resolution is driver-side over the schema only — no jobs.
  */
final class Selector(df: DataFrame) {
  private def names: Seq[String] = df.columns.toSeq

  def all(): Seq[String] = names
  def cols(pred: String => Boolean): Seq[String] = names.filter(pred)

  /** Recursive descent over nested structs (reference `dfs()`), returning
    * dotted paths. */
  def dfs(): Seq[String] =
    SchemaOps.leafPaths(df.schema).map(_.mkString("."))

  def colsOf(dt: DataType): Seq[String] =
    df.schema.fields.filter(_.dataType == dt).map(_.name).toSeq
  def numberCols(): Seq[String] =
    df.schema.fields.filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name).toSeq
  def stringCols(): Seq[String] = colsOf(StringType)
  def booleanCols(): Seq[String] = colsOf(BooleanType)

  def nameContains(s: String): Seq[String]   = names.filter(_.contains(s))
  def nameStartsWith(s: String): Seq[String] = names.filter(_.startsWith(s))
  def nameEndsWith(s: String): Seq[String]   = names.filter(_.endsWith(s))

  private def idx(c: String): Int = {
    val i = names.indexOf(c)
    require(i >= 0, s"no column $c"); i
  }
  def allAfter(c: String): Seq[String]  = names.drop(idx(c) + 1)
  def allSince(c: String): Seq[String]  = names.drop(idx(c))
  def allBefore(c: String): Seq[String] = names.take(idx(c))
  def allUntil(c: String): Seq[String]  = names.take(idx(c) + 1)
  def range(from: Int, to: Int): Seq[String] = names.slice(from, to + 1)

  def except(sel: Seq[String], minus: Seq[String]): Seq[String] =
    sel.filterNot(minus.toSet)

  /** reference `withoutNulls()` — columns containing no nulls. Driver-side
    * selector that runs ONE aggregation job over the frame (the reference
    * scans eagerly too); small-data / interactive utility. */
  def withoutNulls(): Seq[String] = {
    import org.apache.spark.sql.functions.{count, lit, col => c}
    val counts = df.agg(count(lit(1)).as("__n"),
      names.map(n => count(c(n)).as(n)): _*).head()
    val total = counts.getLong(0)
    names.filter(n => counts.getAs[Long](n) == total)
  }

  /** Children of a struct column (reference `children()`). */
  def children(group: String): Seq[String] =
    df.schema(group).dataType match {
      case s: StructType =>
        s.fieldNames.toSeq
          .map(c => s"${SchemaOps.quote(group)}.${SchemaOps.quote(c)}")
      case _             => Nil
    }
  def colGroups(): Seq[String] =
    df.schema.fields.filter(_.dataType.isInstanceOf[StructType])
      .map(_.name).toSeq
}

object Selection {
  implicit final class SelectableDataFrame(private val df: DataFrame)
      extends AnyVal {
    def selector: Selector = new Selector(df)
    /** `select` over resolved names (reference `api/select.kt`). */
    def selectNames(ns: Seq[String]): DataFrame = {
      // named guard: a schema-drifted source (e.g. JSON drops all-null
      // columns on write) should fail with the missing names in hand,
      // not an analyzer stack trace
      val missing = ns.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"selectNames: no such column(s) ${missing.mkString(", ")} - " +
          s"available: ${df.columns.mkString(", ")}")
      df.select(ns.map(col): _*)
    }
    /** reference selector `named`/`into` — rename-in-select. */
    def selectAs(pairs: (String, String)*): DataFrame =
      df.select(pairs.map { case (from, to) => col(from).as(to) }: _*)
  }
}
