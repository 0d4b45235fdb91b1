package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Cdc

/** Property test for the CDC merge law: for ANY base snapshot and ANY
  * changelog with unique (key, seq), `applyChangeLog` must equal the
  * sequential in-memory replay — apply changes per key in ascending seq
  * order onto the base map, drop deleted keys at the end. The distributed
  * formulation (union + per-key top-1 by seq) is a non-obvious rewrite of
  * that replay; this pins their equivalence across random cases,
  * including delete-then-resurrect chains and keys absent from the base.
  */
class CdcLawSpec extends AnyFunSuite {
  import SparkFixture._

  private val genBase: Gen[Map[Int, String]] = for {
    n  <- Gen.choose(0, 15)
    ks <- Gen.listOfN(n, Gen.choose(0, 9))
    vs <- Gen.listOfN(n, Gen.resize(3, Gen.alphaNumStr))
  } yield ks.zip(vs).toMap

  // (key, value, seq, isDelete); seqs deduped per key afterwards
  private val genChanges: Gen[List[(Int, String, Long, Boolean)]] = for {
    n  <- Gen.choose(0, 25)
    cs <- Gen.listOfN(n, for {
      k   <- Gen.choose(0, 12)
      v   <- Gen.resize(3, Gen.alphaNumStr)
      seq <- Gen.choose(1L, 8L)
      del <- Gen.prob(0.3)
    } yield (k, v, seq, del))
  } yield cs.groupBy(c => (c._1, c._3)).values.map(_.head).toList

  private def model(base: Map[Int, String],
      changes: List[(Int, String, Long, Boolean)]): Map[Int, String] =
    changes.groupBy(_._1).foldLeft(base) { case (acc, (k, cs)) =>
      // replay THIS key's changes in seq order; last op wins
      val (v, deleted) = cs.sortBy(_._3)
        .foldLeft((acc.get(k), acc.get(k).isEmpty)) {
          case (_, (_, nv, _, false)) => (Some(nv), false)
          case (_, (_, _, _, true))   => (None, true)
        }
      if (deleted || v.isEmpty) acc - k else acc.updated(k, v.get)
    }

  test("applyChangeLog equals the sequential replay model") {
    val s = spark
    import s.implicits._
    val gen = for {
      b <- genBase; c <- genChanges
    } yield (b, c)
    (0 until 40).foreach { i =>
      val (base, changes) = gen.pureApply(
        Gen.Parameters.default, Seed(0xC0FFEEL + i))
      val baseDf = base.toSeq.toDF("id", "v")
      val chDf = changes.map { case (k, v, seq, del) =>
        (k, v, seq, if (del) Cdc.Delete else Cdc.Upsert)
      }.toDF("id", "v", "seq", "op")
      val got = Cdc.applyChangeLog(baseDf, chDf, Seq("id"), "seq", "op")
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got == model(base, changes), s"case $i: base=$base changes=$changes")
    }
  }
}
