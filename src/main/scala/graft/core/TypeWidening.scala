package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Common-supertype computation over Spark `DataType`s.
  *
  * Mirrors the reference's `baseType` / `commonParents` unification
  * (reference `Operations.kt:55-112`) and its numeric widening table
  * (`impl/TypeInference.kt:100-123`: Byte < Short < Int < Long < Double,
  * Float < Double) — re-expressed over Spark's type lattice so
  * `unionByNameWide` can align frames whose columns disagree in type, which
  * plain `unionByName` refuses to do (SURVEY §2.7 `union`).
  */
object TypeWidening {

  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
    FloatType -> 5, DoubleType -> 6
  )

  /** Tightest common supertype; falls back to StringType (documented
    * deviation for heterogeneous `Any` columns, SURVEY §1.3). */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y)    => y
    case (x, NullType)    => x
    case (x: DecimalType, y: DecimalType) =>
      DecimalType(math.max(x.precision - x.scale, y.precision - y.scale)
        + math.max(x.scale, y.scale), math.max(x.scale, y.scale))
    case (x: DecimalType, y) if numericRank.contains(y) =>
      if (numericRank(y) >= 5) DoubleType else x
    case (x, y: DecimalType) if numericRank.contains(x) => widen(y, x)
    case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
      if (numericRank(x) >= numericRank(y)) x else y
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      ArrayType(widen(x, y), n1 || n2)
    case (x: StructType, y: StructType) =>
      val names = (x.fieldNames ++ y.fieldNames).distinct
      StructType(names.map { n =>
        (x.fields.find(_.name == n), y.fields.find(_.name == n)) match {
          case (Some(f1), Some(f2)) =>
            StructField(n, widen(f1.dataType, f2.dataType),
              f1.nullable || f2.nullable)
          case (Some(f1), None) => f1.copy(nullable = true)
          case (None, Some(f2)) => f2.copy(nullable = true)
          case _                => throw new IllegalStateException(n)
        }
      })
    case (DateType, TimestampType) | (TimestampType, DateType) =>
      TimestampType
    case _ => StringType
  }

  /** Vertical concat with column alignment by name, null back-fill for
    * missing columns, and type unification (reference `api/union.kt:13-87`).
    * Column order follows the first frame, then new columns in appearance
    * order. Purely plan-building: no jobs run here.
    */
  def unionByNameWide(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "union of zero frames")
    val names = frames.foldLeft(Vector.empty[String]) { (acc, df) =>
      acc ++ df.columns.filterNot(acc.contains)
    }
    val types: Map[String, DataType] = names.map { n =>
      n -> frames.flatMap(df => df.schema.fields.find(_.name == n))
        .map(_.dataType).reduce(widen)
    }.toMap
    val aligned = frames.map { df =>
      val have = df.columns.toSet
      df.select(names.map { n =>
        if (have(n)) col(n).cast(types(n)).as(n)
        else lit(null).cast(types(n)).as(n)
      }: _*)
    }
    aligned.reduce(_ union _)
  }
}
