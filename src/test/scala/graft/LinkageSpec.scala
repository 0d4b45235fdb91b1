package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Linkage
import graft.ops.Linkage.FieldRule

/** Entity resolution: blocking bound + cap, closed-form comparator
  * weights, threshold clustering, and field-level survivorship. */
class LinkageSpec extends AnyFunSuite {
  import SparkFixture._

  private def recs = {
    val s = spark
    import s.implicits._
    // two true entities (1≈2, 3≈4) + a singleton 5; 4 is fresher but
    // missing the phone that 3 carries (survivorship must backfill it)
    Seq(
      (1L, "acme corp", Option("555-0001"), Option(10.0), "NY", 1L),
      (2L, "acme corp inc", Option("555-0001"), Option(10.004), "NY", 2L),
      (3L, "globex", Option("555-0202"), Option(50.0), "CA", 1L),
      (4L, "globex", Option.empty[String], Option(50.0), "CA", 2L),
      (5L, "initech", Option("555-0909"), Option(77.0), "NY", 1L)
    ).toDF("id", "name", "phone", "bal", "state", "fresh")
  }

  test("blockCandidates: per-key pairs union-distinct; null keys drop") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option("k"), "x"), (2L, Option("k"), "x"),
      (3L, Option.empty[String], "x"), (4L, Option("j"), "y"))
      .toDF("id", "k1", "k2")
    val pairs = Linkage.blockCandidates(df, "id",
      Seq(col("k1"), col("k2"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k1: (1,2); k2 "x": (1,2) again (dedup) + (1,3)? no — 3 has k2="x"
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("blockCandidates: maxBlockSize drops the stop-word block") {
    val s = spark
    import s.implicits._
    val df = (1L to 6L).map(i => (i, if (i <= 4) "big" else "small"))
      .toDF("id", "k")
    val capped = Linkage.blockCandidates(df, "id", Seq(col("k")),
      maxBlockSize = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((5L, 6L))) // 4-member "big" block dropped
    val uncapped = Linkage.blockCandidates(df, "id", Seq(col("k")))
      .count()
    assert(uncapped == 6 + 1) // C(4,2) + C(2,2)
  }

  test("scorePairs: closed-form weights, null transparency, BIGINT sum") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val scored = Linkage.scorePairs(recs, "id", pairs, Seq(
      FieldRule.tokenJaccard("name", 900000L),
      FieldRule.exact("phone", 200000L, -200000L),
      FieldRule.numericWithin("bal", 0.01, 100000L, -100000L)))
      .orderBy("id_a").collect()
    // pair (1,2): jac tokens {acme,corp} vs {acme,corp,inc} → (4-3)*9e5/3
    val r12 = scored(0)
    assert(r12.getAs[Long]("w_name_jac") == 300000L)
    assert(r12.getAs[Long]("w_phone_eq") == 200000L)
    assert(r12.getAs[Long]("w_bal_near") == 100000L) // |Δ|=0.004 ≤ 0.01
    assert(r12.getAs[Long]("score") == 600000L)
    // pair (3,4): identical name → +9e5; null phone → exact DISAGREES
    // (null vs value is evidence against); bal equal → +1e5
    val r34 = scored(1)
    assert(r34.getAs[Long]("w_name_jac") == 900000L)
    assert(r34.getAs[Long]("w_phone_eq") == -200000L)
    assert(r34.getAs[Long]("w_bal_near") == 100000L)
    assert(r34.getAs[Long]("score") == 800000L)
  }

  test("scorePairs: numericWithin is null-transparent (0, not penalty)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option(5.0)), (2L, Option.empty[Double]))
      .toDF("id", "bal")
    val w = Linkage.scorePairs(df, "id", Seq((1L, 2L)).toDF("id_a", "id_b"),
      Seq(FieldRule.numericWithin("bal", 1.0, 7L, -7L)))
      .head().getAs[Long]("w_bal_near")
    assert(w == 0L)
  }

  test("tokenJaccard: both-empty token sets agree at +scale") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "..."), (2L, "—")).toDF("id", "name")
    val w = Linkage.scorePairs(df, "id", Seq((1L, 2L)).toDF("id_a", "id_b"),
      Seq(FieldRule.tokenJaccard("name", 1000L)))
      .head().getAs[Long]("w_name_jac")
    assert(w == 1000L)
  }

  test("editSimilarity: affine map of levenshtein, both-empty agrees") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "kitten"), (2L, "sitting"), (3L, ""), (4L, ""))
      .toDF("id", "name")
    val scored = Linkage.scorePairs(df, "id",
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"),
      Seq(FieldRule.editSimilarity("name", 700L))).orderBy("id_a").collect()
    // L=7, d=3 → floor((2*(7-3)-7)*700/7) = floor(100) = 100
    assert(scored(0).getAs[Long]("w_name_edit") == 100L)
    assert(scored(1).getAs[Long]("w_name_edit") == 700L)
  }

  test("fieldOf: longest-prefix column resolution; unknown rule throws") {
    val s = spark
    import s.implicits._
    // both `bal` and `bal_usd` exist; rule on bal_usd must hit bal_usd
    val df = Seq((1L, 1.0, 9.0), (2L, 2.0, 9.0)).toDF("id", "bal", "bal_usd")
    val w = Linkage.scorePairs(df, "id", Seq((1L, 2L)).toDF("id_a", "id_b"),
      Seq(FieldRule.numericWithin("bal_usd", 0.5, 11L, -11L)))
      .head().getAs[Long]("w_bal_usd_near")
    assert(w == 11L) // 9.0 vs 9.0 — resolved to bal_usd, not bal
    val err = intercept[IllegalArgumentException] {
      Linkage.scorePairs(df, "id", Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq(FieldRule.exact("nope", 1L, -1L))).collect()
    }
    assert(err.getMessage.contains("nope_eq"))
  }

  test("linkClusters + goldenRecords: survivorship backfills, " +
      "singletons kept, base row = rank desc / id asc") {
    val pairs = Linkage.blockCandidates(recs, "id", Seq(col("state"),
      substring(col("name"), 1, 4)))
    val scored = Linkage.scorePairs(recs, "id", pairs, Seq(
      FieldRule.tokenJaccard("name", 900000L),
      FieldRule.exact("phone", 200000L, -200000L),
      FieldRule.numericWithin("bal", 0.01, 100000L, -100000L)))
    val clusters = Linkage.linkClusters(scored, 500000L)
    val golden = Linkage.goldenRecords(recs, "id", clusters, "fresh")
      .orderBy("cluster").collect()
    assert(golden.length == 3)
    val g1 = golden(0) // cluster 1 = {1,2}: base row is 2 (fresh 2)
    assert(g1.getAs[Long]("cluster") == 1L)
    assert(g1.getAs[Long]("n_members") == 2L)
    assert(g1.getAs[Long]("id") == 2L)
    assert(g1.getAs[String]("name") == "acme corp inc")
    val g3 = golden(1) // cluster 3 = {3,4}: base 4, phone BACKFILLED from 3
    assert(g3.getAs[Long]("id") == 4L)
    assert(g3.getAs[String]("phone") == "555-0202")
    assert(g3.getAs[Double]("bal") == 50.0)
    val g5 = golden(2) // singleton restored without appearing in clusters
    assert(g5.getAs[Long]("cluster") == 5L)
    assert(g5.getAs[Long]("n_members") == 1L)
    assert(g5.getAs[String]("name") == "initech")
  }

  test("goldenRecords: rank tie breaks to lowest id; all-null field " +
      "backfills to null (no ANSI error)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (10L, Option.empty[String], 5L), (11L, Option.empty[String], 5L))
      .toDF("id", "phone", "fresh")
    val clusters = Seq((10L, 10L), (11L, 10L)).toDF("id", "cluster")
    val g = Linkage.goldenRecords(df, "id", clusters, "fresh").head()
    assert(g.getAs[Long]("id") == 10L) // tie on fresh → lowest id
    assert(g.getAs[String]("phone") == null)
  }
}
