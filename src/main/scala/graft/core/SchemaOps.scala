package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-column path utilities over `StructType`.
  *
  * The reference models hierarchical columns as a tree of `ColumnGroup`s
  * addressed by `ColumnPath = List<String>` (reference: `DataFrame.kt:31`,
  * tree ops `Operations.kt:138-229`, `impl/TreeNode.kt`). Spark already has
  * the tree — `StructType` — so these helpers only *resolve paths* and
  * *rebuild plans*; Catalyst does the execution.
  */
object SchemaOps {

  /** All leaf column paths, depth-first — the reference's recursive-descent
    * selector `dfs()` (`SelectReceiver.kt`). */
  def leafPaths(schema: StructType, prefix: Seq[String] = Nil)
      : Seq[Seq[String]] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => leafPaths(s, prefix :+ f.name)
        case _             => Seq(prefix :+ f.name)
      }
    }

  /** Backtick-escape one path segment so names containing dots or
    * backticks resolve as literal segments, not nested hops. */
  def quote(seg: String): String = "`" + seg.replace("`", "``") + "`"

  /** Top-level-or-nested column reference from a path. */
  def colAt(path: Seq[String]): Column = col(path.map(quote).mkString("."))

  def fieldAt(schema: StructType, path: Seq[String]): Option[StructField] =
    path match {
      case Seq()     => None
      case Seq(last) => schema.fields.find(_.name == last)
      case head +: rest =>
        schema.fields.find(_.name == head).flatMap(_.dataType match {
          case s: StructType => fieldAt(s, rest)
          case _             => None
        })
    }

  /** Recursively flatten all struct columns, joining path segments with
    * `sep` and uniquifying clashes with a numeric suffix
    * (reference `api/flatten.kt:9-31`). */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    val paths = leafPaths(df.schema)
    val used  = scala.collection.mutable.Set[String]()
    val cols = paths.map { p =>
      val base = p.mkString(sep)
      var name = base
      var i    = 1
      while (used.contains(name)) { name = s"$base$i"; i += 1 }
      used += name
      colAt(p).as(name)
    }
    df.select(cols: _*)
  }

  /** Nest `cols` under a struct named `name`, preserving the position of the
    * first nested column (reference `api/group.kt`: `group(cols).into(name)`). */
  def nest(df: DataFrame, cols: Seq[String], name: String): DataFrame = {
    require(cols.nonEmpty, "nest: no columns given")
    val set   = cols.toSet
    val first = df.columns.indexWhere(set.contains)
    val out = df.columns.zipWithIndex.flatMap {
      case (c, i) if i == first   => Some(struct(cols.map(col): _*).as(name))
      case (c, _) if set(c)       => None
      case (c, _)                 => Some(col(c))
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** Splice the children of struct column `name` up one level
    * (reference `api/ungroup.kt`). Clashing child names get the parent name
    * prefixed. */
  def unnest(df: DataFrame, name: String): DataFrame = {
    val idx = df.columns.indexOf(name)
    require(idx >= 0, s"unnest: no column $name")
    val children = df.schema(name).dataType match {
      case s: StructType => s.fieldNames.toSeq
      case other => sys.error(s"unnest: $name is $other, not struct")
    }
    val others = df.columns.filter(_ != name).toSet
    val childCols = children.map { c =>
      val outName = if (others.contains(c)) s"${name}_$c" else c
      colAt(Seq(name, c)).as(outName)
    }
    val out = df.columns.zipWithIndex.flatMap {
      case (c, i) if i == idx => childCols
      case (c, _)             => Seq(col(c))
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** Reposition columns (reference `api/move.kt`): move `names` so the first
    * lands at `to` (positions computed after removal). */
  def move(df: DataFrame, names: Seq[String], to: Int): DataFrame = {
    val set       = names.toSet
    val remaining = df.columns.filterNot(set.contains).toVector
    val pos       = math.max(0, math.min(to, remaining.size))
    val order     = (remaining.take(pos) ++ names ++ remaining.drop(pos))
    df.select(order.map(col): _*)
  }

  /** Insert a computed column at position `at` (reference `api/insert.kt`). */
  def insertAt(df: DataFrame, name: String, c: Column, at: Int): DataFrame = {
    val pos   = math.max(0, math.min(at, df.columns.length))
    val front = df.columns.take(pos).map(col).toSeq
    val back  = df.columns.drop(pos).map(col).toSeq
    df.select((front :+ c.as(name)) ++ back: _*)
  }
}
