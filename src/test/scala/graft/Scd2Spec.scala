package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.Cdc

/** SCD2 build + point-in-time join: closed-form interval semantics and a
  * differential law against a sequential in-memory history model on
  * random changelogs (incl. duplicate (key, seq) rows and delete gaps).
  */
class Scd2Spec extends AnyFunSuite {
  import SparkFixture._

  private def scd2(rows: Seq[(Int, String, Long, String)]) = {
    val s = spark
    import s.implicits._
    Cdc.scd2Build(rows.toDF("k", "v", "seq", "op"), Seq("k"), "seq", "op")
  }

  test("scd2Build: upsert chain closes intervals, delete opens a gap") {
    val hist = scd2(Seq(
      (1, "a", 1L, "U"), (1, "b", 3L, "U"), (1, "", 5L, "D"),
      (1, "c", 7L, "U"),
      (2, "x", 2L, "U")))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4)))
    assert(hist.toSeq == Seq(
      (1, "a", 1L, Some(3L), false),
      (1, "b", 3L, Some(5L), false), // closed BY the delete at 5
      (1, "c", 7L, None, true),      // resurrection opens fresh
      (2, "x", 2L, None, true)))
  }

  test("scd2Build: key ending in delete has no current version") {
    val hist = scd2(Seq((1, "a", 1L, "U"), (1, "", 9L, "D")))
      .collect().map(r => (r.getString(1), Option(r.get(3))))
    assert(hist.toSeq == Seq(("a", Some(9L))))
  }

  test("scd2Build: duplicate (key, seq) is deterministic — payload " +
      "orders the tie, first becomes a zero-length interval") {
    val hist = scd2(Seq((1, "zz", 4L, "U"), (1, "aa", 4L, "U")))
      .orderBy("valid_from", "v").collect()
      .map(r => (r.getString(1), r.getLong(2), Option(r.get(3))))
    assert(hist.toSeq == Seq(("aa", 4L, Some(4L)), ("zz", 4L, None)))
  }

  // ---- differential law vs sequential model -------------------------

  private type Chg = (Int, String, Long, Boolean) // key, value, seq, del

  private val genChanges: Gen[List[Chg]] = for {
    n  <- Gen.choose(1, 30)
    cs <- Gen.listOfN(n, for {
      k   <- Gen.choose(0, 6)
      v   <- Gen.resize(3, Gen.alphaNumStr)
      seq <- Gen.choose(1L, 9L)
      del <- Gen.prob(0.25)
    } yield (k, v, seq, del))
  } yield cs

  /** In-memory history: per key, order by (seq, op, value) exactly as the
    * operator documents; valid_to = next row's seq; drop deletes. */
  private def model(cs: List[Chg])
      : List[(Int, String, Long, Option[Long])] =
    cs.groupBy(_._1).toList.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(c => (c._3, if (c._4) "D" else "U", c._2))
      sorted.zipWithIndex.collect {
        case ((_, v, seq, false), i) =>
          (k, v, seq, sorted.lift(i + 1).map(_._3))
      }
    }

  test("law: scd2Build equals the sequential history model") {
    val s = spark
    import s.implicits._
    val cases = Gen.listOfN(12, genChanges)
      .apply(Gen.Parameters.default, Seed(4111L)).get
    cases.foreach { cs =>
      val df = cs.map(c => (c._1, c._2, c._3, if (c._4) "D" else "U"))
        .toDF("k", "v", "seq", "op")
      val got = Cdc.scd2Build(df, Seq("k"), "seq", "op").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      assert(got == model(cs).toSet, s"changelog: $cs")
    }
  }

  test("pointInTimeJoin: fact picks the version valid at its ts; " +
      "delete gap yields null on left, drops on inner") {
    val s = spark
    import s.implicits._
    val dim = scd2(Seq(
      (1, "a", 1L, "U"), (1, "b", 3L, "U"), (1, "", 5L, "D"),
      (1, "c", 7L, "U")))
    val facts = Seq((1, 0L), (1, 1L), (1, 4L), (1, 6L), (1, 99L), (2, 1L))
      .toDF("k", "ts")
    val left = Cdc.pointInTimeJoin(facts, dim, Seq("k"), "ts")
      .orderBy("k", "ts").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getAs[String]("v"))))
    assert(left.toSeq == Seq(
      (1, 0L, None),        // before first version
      (1, 1L, Some("a")),
      (1, 4L, Some("b")),
      (1, 6L, None),        // inside the delete gap [5, 7)
      (1, 99L, Some("c")),  // open current interval
      (2, 1L, None)))       // key never existed
    val inner = Cdc.pointInTimeJoin(facts, dim, Seq("k"), "ts", "inner")
    assert(inner.count() == 3)
  }

  test("law: pointInTimeJoin equals the per-fact model scan") {
    val s = spark
    import s.implicits._
    val cases = Gen.listOfN(8, genChanges)
      .apply(Gen.Parameters.default, Seed(4112L)).get
    cases.foreach { cs =>
      val df = cs.map(c => (c._1, c._2, c._3, if (c._4) "D" else "U"))
        .toDF("k", "v", "seq", "op")
      val dim = Cdc.scd2Build(df, Seq("k"), "seq", "op")
      val facts = (for (k <- 0 to 6; ts <- 0L to 10L) yield (k, ts))
        .toDF("k", "ts")
      val hist = model(cs)
      val want = (for (k <- 0 to 6; ts <- 0L to 10L) yield {
        val v = hist.find(h => h._1 == k && h._3 <= ts &&
          h._4.forall(ts < _)).map(_._2)
        (k, ts, v)
      }).toSet
      val got = Cdc.pointInTimeJoin(facts, dim, Seq("k"), "ts").collect()
        .map(r => (r.getInt(0), r.getLong(1),
          Option(r.getAs[String]("v")))).toSet
      assert(got == want, s"changelog: $cs")
    }
  }
}
