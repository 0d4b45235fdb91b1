package graft.core

import org.apache.spark.sql.{Column, DataFrame}
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
  private def isIntegral(t: DataType): Boolean =
    numericRank.get(t).exists(_ <= 4)

  /** Exact decimal representation of an integral type (Spark's
    * `DecimalType.forType`): Byte→(3,0), Short→(5,0), Int→(10,0),
    * Long→(20,0). */
  private def decimalFor(t: DataType): DecimalType = t match {
    case ByteType    => DecimalType(3, 0)
    case ShortType   => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case LongType    => DecimalType(20, 0)
    case _           => throw new IllegalArgumentException(t.toString)
  }

  /** Combine two decimals keeping every representable value, capped at
    * Spark's max precision 38. Past the cap, mirrors Spark's
    * `DecimalPrecision.adjustPrecisionScale`: sacrifice SCALE (down to a
    * floor of 6) to preserve integer digits — capping precision while
    * keeping the max scale would leave e.g. Decimal(30,10) ∪ Decimal(30,25)
    * only 13 integer digits where 20 are needed, overflowing large values
    * to null after a union widening. */
  private def combineDecimals(x: DecimalType, y: DecimalType): DecimalType = {
    val MinimumAdjustedScale = 6
    val scale = math.max(x.scale, y.scale)
    val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
    if (intDigits + scale <= DecimalType.MAX_PRECISION)
      DecimalType(intDigits + scale, scale)
    else {
      val minScale = math.min(scale, MinimumAdjustedScale)
      val adjScale = math.max(DecimalType.MAX_PRECISION - intDigits, minScale)
      DecimalType(DecimalType.MAX_PRECISION, adjScale)
    }
  }

  /** Tightest common supertype; falls back to StringType (documented
    * deviation for heterogeneous `Any` columns, SURVEY §1.3). */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y)    => y
    case (x, NullType)    => x
    case (x: DecimalType, y: DecimalType) => combineDecimals(x, y)
    case (x: DecimalType, y) if isIntegral(y) =>
      combineDecimals(x, decimalFor(y))
    case (x, y: DecimalType) if isIntegral(x) =>
      combineDecimals(decimalFor(x), y)
    // decimal ∪ float/double → double: documented precision-loss fallback
    case (_: DecimalType, y) if numericRank.contains(y) => DoubleType
    case (x, _: DecimalType) if numericRank.contains(x) => DoubleType
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

  /** Rewrite column `c` of type `from` into type `to`. Plain `cast` for
    * scalars; structs are REBUILT field-by-field (Spark's struct cast
    * demands equal field counts, so casting is exactly wrong for the
    * divergent-schema case this module exists for); arrays align
    * element-wise via `transform`. */
  def alignColumn(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if f == t => c
      case (f: StructType, t: StructType) =>
        val rebuilt = struct(t.fields.toSeq.map { tf =>
          f.fields.find(_.name == tf.name) match {
            case Some(ff) =>
              alignColumn(c.getField(tf.name), ff.dataType, tf.dataType)
                .as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        when(c.isNull, lit(null).cast(t)).otherwise(rebuilt)
      case (ArrayType(f, _), ArrayType(t, _)) =>
        // final cast normalizes containsNull — array<string,false> and
        // array<string,true> inputs must land on ONE type or consumers
        // like `stack` reject the mismatch
        if (f == t) c.cast(to)
        else transform(c, x => alignColumn(x, f, t)).cast(to)
      case (_, t) => c.cast(t)
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
      val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(names.map { n =>
        fields.get(n) match {
          case Some(from) => alignColumn(df(n), from, types(n)).as(n)
          case None       => lit(null).cast(types(n)).as(n)
        }
      }: _*)
    }
    aligned.reduce(_ union _)
  }
}
