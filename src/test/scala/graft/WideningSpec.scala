package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.core.TypeWidening.widen

/** Laws for the type-widening lattice (VERDICT r1 task 4: these laws would
  * have caught the round-1 decimal truncation bug). */
class WideningSpec extends AnyFunSuite {

  /** Deterministic property driver over scalacheck generators. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 300).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 300).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val scalars: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType, TimestampType, NullType,
    DecimalType(5, 2), DecimalType(20, 0), DecimalType(38, 18))

  private val types: Gen[DataType] = Gen.frequency(
    8 -> scalars,
    1 -> scalars.map(ArrayType(_, containsNull = true)),
    1 -> scalars.map(t => StructType(Seq(StructField("a", t)))))

  test("widen is commutative") {
    forAll(types, types) { (a, b) => assert(widen(a, b) == widen(b, a)) }
  }

  test("widen is associative") {
    // alignment of N frames folds pairwise — a non-associative lattice
    // would make the union's result type depend on frame ORDER
    forAll(types, Gen.zip(types, types)) { case (a, (b, c)) =>
      assert(widen(widen(a, b), c) == widen(a, widen(b, c)),
        s"assoc broken for ($a, $b, $c)")
    }
  }

  test("union alignment is total over random divergent schemas") {
    // any two schemas must align: unionByNameWide plans AND executes
    // (an unresolvable cast or field mismatch throws at analysis)
    val s = SparkFixture.spark
    val names = Gen.someOf(Seq("a", "b", "c", "d")).suchThat(_.nonEmpty)
    val schema: Gen[StructType] = for {
      ns <- names; ts <- Gen.listOfN(ns.size, types)
    } yield StructType(ns.zip(ts).map { case (n, t) =>
      StructField(n, t, nullable = true)
    }.toSeq)
    (1 to 40).foreach { i =>
      val x = schema.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val y = schema.pureApply(Gen.Parameters.default, Seed(i.toLong + 500))
      val dfx = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], x)
      val dfy = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], y)
      val u = graft.core.TypeWidening.unionByNameWide(Seq(dfx, dfy))
      assert(u.count() == 0L, s"union of empty frames must execute ($x, $y)")
      // result columns carry the widened type of every contributing input
      val rt = u.schema.fields.map(f => f.name -> f.dataType).toMap
      (x.fields ++ y.fields).foreach { f =>
        assert(widen(rt(f.name), f.dataType) == rt(f.name),
          s"${f.name}: ${rt(f.name)} cannot absorb input ${f.dataType}")
      }
    }
  }

  test("widen is idempotent") {
    forAll(types) { a => assert(widen(a, a) == a) }
  }

  test("widen result can hold both inputs (absorption)") {
    forAll(types, types) { (a, b) =>
      val w = widen(a, b)
      assert(widen(w, a) == w, s"widen($w, $a) != $w")
      assert(widen(w, b) == w, s"widen($w, $b) != $w")
    }
  }

  test("NullType is the identity") {
    forAll(types) { a => assert(widen(NullType, a) == a) }
  }

  test("decimal ∪ long keeps all Long values representable") {
    val w = widen(DecimalType(5, 2), LongType)
    val d = w.asInstanceOf[DecimalType]
    assert(d.precision - d.scale >= 20, s"got $d") // Long needs 20 digits
  }

  test("decimal precision is capped at 38") {
    val w = widen(DecimalType(38, 18), DecimalType(38, 0))
    assert(w.asInstanceOf[DecimalType].precision <= 38)
  }

  test("decimal over-cap sacrifices scale to keep integer digits (Spark adjustPrecisionScale)") {
    // 20 int digits + 25 scale > 38: scale must shrink so int digits survive
    val w = widen(DecimalType(30, 10), DecimalType(30, 25)).asInstanceOf[DecimalType]
    assert(w.precision == 38 && w.precision - w.scale == 20, s"got $w")
    // scale floor of 6: int digits give way only down to scale 6
    val w2 = widen(DecimalType(38, 0), DecimalType(38, 30)).asInstanceOf[DecimalType]
    assert(w2 == DecimalType(38, 6), s"got $w2")
  }

  test("numeric ladder matches the reference table") {
    // Byte < Short < Int < Long, Float < Double (TypeInference.kt:100-123)
    assert(widen(ByteType, ShortType) == ShortType)
    assert(widen(IntegerType, LongType) == LongType)
    assert(widen(FloatType, DoubleType) == DoubleType)
    assert(widen(IntegerType, DoubleType) == DoubleType)
  }

  test("incompatible types fall back to string (documented deviation)") {
    assert(widen(BooleanType, IntegerType) == StringType)
  }

  test("struct widening unions fields with nullability") {
    val a = StructType(Seq(StructField("x", IntegerType, nullable = false)))
    val b = StructType(Seq(StructField("x", LongType, nullable = false),
      StructField("y", StringType)))
    val w = widen(a, b).asInstanceOf[StructType]
    assert(w.fieldNames.toSeq == Seq("x", "y"))
    assert(w("x").dataType == LongType)
    assert(w("y").nullable)
  }
}
