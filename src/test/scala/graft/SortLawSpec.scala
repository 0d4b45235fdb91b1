package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.RowOps._

/** Property tests for the sort laws (SURVEY §5, r4 advice #5): every
  * `SortKey(desc, nullsLast)` flag combination over random frames must
  * match a driver-side comparator model. The reference's contract is
  * per-key flags with asc nulls-first as the default (`api/sort.kt:81`);
  * the model pins the value orders Spark guarantees on top of that:
  * NaN sorts greater than every non-NaN double, strings sort in binary
  * (UTF-8 byte) order.
  *
  * -0.0 is excluded from the generator on purpose: Spark normalizes it
  * to 0.0 in sort keys (NormalizeFloatingNumbers), so the two are TIED
  * there, while the model's java.lang.Double.compare orders them — a tie
  * in one order and not the other makes the expected sequence ambiguous,
  * not wrong.
  */
class SortLawSpec extends AnyFunSuite {
  import SparkFixture._

  private type Rec = (Option[Int], Option[Double], Option[String])

  private val genDouble: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0))
  private val genRec: Gen[Rec] = for {
    i <- Gen.option(Gen.chooseNum(-50, 50))
    d <- Gen.option(genDouble)
    s <- Gen.option(Gen.resize(4, Gen.alphaNumStr))
  } yield (i, d, s)
  private val genRows: Gen[List[Rec]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genRec))

  // one comparator per column, matching Spark's value order for the type
  private val colCmp: Vector[(Any, Any) => Int] = Vector(
    (a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]),
    // Double.compare: NaN greater than everything incl. +Inf — Spark's order
    (a, b) => java.lang.Double.compare(
      a.asInstanceOf[Double], b.asInstanceOf[Double]),
    (a, b) => {
      // binary (UTF-8 byte) order, Spark's string collation default
      val (xa, xb) = (a.asInstanceOf[String].getBytes("UTF-8"),
        b.asInstanceOf[String].getBytes("UTF-8"))
      val n = math.min(xa.length, xb.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) {
        c = Integer.compare(xa(i) & 0xFF, xb(i) & 0xFF)
        i += 1
      }
      if (c != 0) c else Integer.compare(xa.length, xb.length)
    })

  private def modelCompare(keys: Seq[(Int, SortKey)])(x: Rec, y: Rec): Int = {
    def at(r: Rec, i: Int): Option[Any] = i match {
      case 0 => r._1; case 1 => r._2; case _ => r._3
    }
    keys.iterator.map { case (idx, k) =>
      (at(x, idx), at(y, idx)) match {
        case (None, None)       => 0
        case (None, _)          => if (k.nullsLast) 1 else -1
        case (_, None)          => if (k.nullsLast) -1 else 1
        case (Some(a), Some(b)) =>
          val c0 = colCmp(idx)(a, b)
          if (k.desc) -c0 else c0
      }
    }.find(_ != 0).getOrElse(0)
  }

  test("sortByKeys matches the comparator model for every flag combo") {
    val s = spark
    import s.implicits._
    val names = Vector("i", "d", "str")
    val genKeys: Gen[List[(Int, Boolean, Boolean)]] = for {
      idxs  <- Gen.someOf(Seq(0, 1, 2)).suchThat(_.nonEmpty)
      perm  <- Gen.oneOf(idxs.toList.permutations.toList)
      flags <- Gen.listOfN(perm.size,
        Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false)))
    } yield perm.zip(flags).map { case (i, (de, nl)) => (i, de, nl) }

    (1 to 60).foreach { trial =>
      val rows = genRows.pureApply(Gen.Parameters.default, Seed(trial.toLong))
      val keys = genKeys
        .pureApply(Gen.Parameters.default, Seed(trial.toLong + 9000))
        .map { case (i, de, nl) => (i, SortKey(names(i), de, nl)) }
      val df = rows.toDF(names: _*)
      // NaN-proof value equality: NaN != NaN under ==, so canonicalize
      // doubles to their bit pattern before comparing sequences
      def canon(v: Option[Any]): Option[Any] = v.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case x         => x
      }
      val got = df.sortByKeys(keys.map(_._2): _*)
        .select(keys.map(k => org.apache.spark.sql.functions.col(names(k._1))): _*)
        .collect()
        .map(r => keys.indices.map(j => canon(Option(r.get(j)))).toVector)
      val cmp = modelCompare(keys) _
      val expect = rows
        .sortWith((a, b) => cmp(a, b) < 0)
        .map(r => keys.map { case (i, _) => (i match {
          case 0 => r._1; case 1 => r._2; case _ => r._3
        }).map(_.asInstanceOf[Any]) }.map(canon).toVector)
      // compare only the KEY tuples: Spark's sort is not stable, so rows
      // tied on every key may appear in any order — the law is about key
      // ordering, and ties have equal key tuples by construction
      assert(got.toSeq == expect,
        s"trial $trial keys=${keys.map(_._2)} rows=$rows")
    }
  }

  test("reference default is asc nulls-first (sort.kt:81)") {
    val s = spark
    import s.implicits._
    val df = Seq(Option(3), None, Option(1)).toDF("i")
    val got = df.sortByKeys(SortKey("i")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(null, 1, 3))
  }
}
