package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SchemaOps

/** Column surgery + conversion surface (SURVEY §2.2 / §2.4 gaps from
  * round 1): rename, remove (incl. nested prune), replace/set, the
  * convert cast matrix, the parse cascade, slicing/access, round,
  * replaceAll. All plan-building except `parseCascade` (samples the
  * column once on the driver to pick a type — same one-shot inference
  * the reference does eagerly, `api/parse.kt:18-48`).
  */
object Surgery {

  implicit final class SurgeryDataFrame(private val df: DataFrame) {

    // ---- rename / remove / replace / set ------------------------------
    /** reference `rename(...).into(...)` (`api/rename.kt:12-31`). */
    def renameInto(pairs: (String, String)*): DataFrame =
      df.withColumnsRenamed(pairs.toMap)

    /** reference `remove`/`minus` (`api/remove.kt:13-74`) incl. nested
      * paths ("a.b"): struct fields are pruned via dropFields, and a group
      * emptied by the prune is removed entirely. */
    def removeCols(names: Seq[String]): DataFrame = {
      val (nested, top) = names.partition(_.contains("."))
      val afterTop = df.drop(top: _*)
      nested.foldLeft(afterTop) { (d, path) =>
        val Array(parent, rest @ _*) = path.split("\\.")
        d.schema.find(_.name == parent) match {
          case Some(f) =>
            val remainingFields = f.dataType match {
              case s: StructType => s.fieldNames.length - 1
              case _             => 0
            }
            if (rest.length == 1 && remainingFields == 0) d.drop(parent)
            else d.withColumn(parent,
              col(SchemaOps.quote(parent)).dropFields(rest.mkString(".")))
          case None => d
        }
      }
    }

    /** reference `replace(sel).with{}` (`api/replace.kt:17-48`) — swap a
      * column in place, type may change. */
    def replaceWith(name: String, value: Column): DataFrame =
      df.withColumn(name, value)

    /** reference `set(columnName, col)` (`impl/DataFrameImpl.kt:61-70`). */
    def setCol(name: String, value: Column): DataFrame =
      df.withColumn(name, value)

    /** reference multi-`add` (`api/add.kt:33-79`). */
    def addCols(pairs: (String, Column)*): DataFrame =
      df.withColumns(pairs.toMap)

    /** reference `replaceAll(valuePairs)` (`api/replace.kt:23-26`) —
      * global value substitution across the given (or all) string
      * columns. */
    def replaceAllValues(pairs: Map[String, String], cols: Seq[String] = Nil)
        : DataFrame = {
      val cs = if (cols.nonEmpty) cols
        else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
      df.na.replace(cs, pairs)
    }

    // ---- convert cast matrix (`api/convert.kt:32-161`) ----------------
    /** number↔number, string↔anything, bool, decimal. */
    def convertTo(name: String, to: DataType): DataFrame =
      df.withColumn(name, col(name).cast(to))

    /** Null-on-failure cast (`try_cast`): a value the cast can't parse
      * becomes null instead of failing the job under ANSI mode. Column
      * API with an exact-name reference — a backtick in the name is
      * data, not syntax (plain col(name) would parse it). */
    def tryConvertTo(name: String, to: DataType): DataFrame =
      df.withColumn(name,
        graft.core.SchemaOps.colAt(Seq(name)).try_cast(to))

    /** epoch millis → timestamp (`api/convert.kt:163-167`). */
    def epochMillisToTimestamp(name: String): DataFrame =
      df.withColumn(name, timestamp_millis(col(name).cast(LongType)))

    /** string → date/timestamp with optional format. */
    def convertToDate(name: String, format: Option[String] = None): DataFrame =
      df.withColumn(name,
        format.fold(to_date(col(name)))(f => to_date(col(name), f)))
    def convertToTimestamp(name: String, format: Option[String] = None)
        : DataFrame =
      df.withColumn(name,
        format.fold(to_timestamp(col(name)))(f => to_timestamp(col(name), f)))

    /** Reference's lenient string→bool ("T", "YES", case-insensitive,
      * `api/convert.kt:230-239`). */
    def convertToBoolean(name: String): DataFrame = {
      val u = upper(trim(col(name).cast(StringType)))
      df.withColumn(name,
        when(u.isin("T", "TRUE", "YES", "1"), lit(true))
          .when(u.isin("F", "FALSE", "NO", "0"), lit(false))
          .otherwise(lit(null).cast(BooleanType)))
    }

    /** reference `round(places)` (`Math.kt:5-8`, HALF_UP — Spark `round`
      * matches). */
    def roundCol(name: String, places: Int): DataFrame =
      df.withColumn(name, round(col(name), places))

    /** reference column `map {}` (`api/map.kt:17-28`) — expression form. */
    def mapCol(name: String, f: Column => Column): DataFrame =
      df.withColumn(name, f(col(name)))

    // ---- parse cascade (`api/parse.kt:18-48`) -------------------------
    /** String-column type inference: try Long → Double → Boolean → Date →
      * Timestamp; the first parser that parses ALL (non-null) sampled
      * values wins, else the column stays string. Driver-side sampling
      * (one small job over `sampleRows` rows), then a single plan-level
      * cast — the reference runs the same cascade eagerly over all rows
      * (`api/parse.kt`). DOCUMENTED DEVIATION: the sample is a row prefix,
      * not the full column, so a non-conforming value past the sample can
      * slip through — the committed conversions therefore use the
      * null-on-failure forms (`try_cast` / `try_to_timestamp`), never an
      * ANSI-throwing cast: an unsampled "abc" after 10k numerics yields a
      * null cell, not a failed 100-TB job. */
    def parseCascade(name: String, sampleRows: Int = 10000): DataFrame = {
      val sample = df.select(col(name).cast(StringType))
        .filter(col(name).isNotNull).limit(sampleRows)
        .collect().map(_.getString(0))
      if (sample.isEmpty) df
      else {
        val all = (p: String => Boolean) => sample.forall(p)
        def parsesLong(s: String)   = s.toLongOption.isDefined
        def parsesDouble(s: String) =
          s.toDoubleOption.isDefined || Set("NAN", "INF", "-INF",
            "INFINITY", "-INFINITY").contains(s.toUpperCase)
        def parsesBool(s: String) = Set("T", "TRUE", "YES", "F", "FALSE",
          "NO").contains(s.trim.toUpperCase)
        def parsesDate(s: String) =
          scala.util.Try(java.time.LocalDate.parse(s)).isSuccess
        def parsesTs(s: String) = scala.util.Try(
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))).isSuccess
        if (all(parsesLong)) tryConvertTo(name, LongType)
        else if (all(parsesDouble)) tryConvertTo(name, DoubleType)
        else if (all(parsesBool)) convertToBoolean(name)
        else if (all(parsesDate)) df.withColumn(name,
          try_to_timestamp(col(name)).cast(DateType))
        else if (all(parsesTs)) df.withColumn(name,
          try_to_timestamp(col(name)))
        else df
      }
    }

    /** Parse every string column (reference frame-level `parse()`). */
    def parseAll(sampleRows: Int = 10000): DataFrame =
      df.schema.fields.filter(_.dataType == StringType).map(_.name)
        .foldLeft(df)((d, c) => d.parseCascade(c, sampleRows))

    // ---- slicing / access (`DataFrame.kt:138-191`) ---------------------
    /** take/head: first n rows — `limit`, pushed into the scan. */
    def takeRows(n: Int): DataFrame = df.limit(n)
    /** tail/takeLast: needs a total order to be well-defined distributed. */
    def takeLastRows(n: Int, order: Seq[Column]): DataFrame =
      df.orderBy(order.map(_.desc): _*).limit(n)
        .orderBy(order: _*)
    /** drop first n rows (positional) — `offset` (Spark 3.4+). */
    def dropRowsCount(n: Int, order: Seq[Column]): DataFrame =
      df.orderBy(order: _*).offset(n)

    /** reference `get(indices)` — positional row selection; small-data
      * utility built on the scale-safe row number. */
    def rowsAt(indices: Seq[Long], order: Seq[Column]): DataFrame = {
      import graft.ops.RowOps._
      df.addRowNumber(order, "__rn")
        .filter(col("__rn").isin(indices: _*)).drop("__rn")
    }

    /** reference `first/last/single(+pred)` — scalar row access (driver
      * action by nature). */
    def firstRow(pred: Option[Column] = None): Row =
      pred.fold(df)(df.filter).head()
    def singleRow(pred: Option[Column] = None): Row = {
      val rows = pred.fold(df)(df.filter).take(2)
      require(rows.length == 1, s"singleRow: ${rows.length} rows matched")
      rows(0)
    }
  }
}
