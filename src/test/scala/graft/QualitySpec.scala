package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Quality

class QualitySpec extends AnyFunSuite {
  import SparkFixture._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("check") ->
      ((r.getAs[Long]("n_total"), r.getAs[Long]("n_ok"),
        r.getAs[Long]("ratio_micros"), r.getAs[Boolean]("passed")))).toMap

  test("report: fused scalar checks — exact counts, micro ratios, " +
      "null predicate fails the row") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Option("a"), Option(10.0)), (2, Option("b"), Option(250.0)),
      (3, Option.empty[String], Option(50.0)),
      (4, Option("c"), Option.empty[Double])
    ).toDF("id", "tag", "v")
    val rep = byName(Quality.report(df, Seq(
      Quality.notNull("tag"),                       // 3/4
      Quality.inRange("v", 0, 100, 500000L),        // 2/4 (null + 250 fail)
      Quality.matchesPattern("tag", "^[ab]$", 400000L), // 2/4
      Quality.inSet("id", Seq(1, 2, 3, 4)))))       // 4/4
    assert(rep("not_null:tag") == ((4L, 3L, 750000L, false)))
    assert(rep("in_range:v") == ((4L, 2L, 500000L, true)))
    assert(rep("pattern:tag") == ((4L, 2L, 500000L, true)))
    assert(rep("in_set:id") == ((4L, 4L, 1000000L, true)))
  }

  test("report: unique counts rows whose key is singleton; " +
      "ref integrity nulls and misses fail") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Option(10)), (1, Option(20)), (2, Option(30)),
      (3, Option.empty[Int])).toDF("k", "fk")
    val ref = Seq(10, 30, 99).toDF("rk")
    val rep = byName(Quality.report(df, Seq(
      Quality.Unique(Seq("k"), 400000L),
      Quality.RefIntegrity("fk", ref, "rk", 400000L))))
    // k: {1,1,2,3} → 2 singleton rows of 4
    assert(rep("unique:k") == ((4L, 2L, 500000L, true)))
    // fk: 10 ✓, 20 ✗, 30 ✓, null ✗
    assert(rep("ref:fk") == ((4L, 2L, 500000L, true)))
  }

  test("report: empty frame passes everything vacuously") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "x")).toDF("k", "t").where(lit(false))
    val rep = byName(Quality.report(df, Seq(
      Quality.notNull("t"), Quality.Unique(Seq("k")))))
    assert(rep("not_null:t") == ((0L, 0L, 1000000L, true)))
    assert(rep("unique:k") == ((0L, 0L, 1000000L, true)))
  }

  test("report: passed is exact integer arithmetic at the boundary") {
    val s = spark
    import s.implicits._
    // 1/3 ok with threshold 333333 (pass: 3·333333 = 999999 ≤ 1000000)
    // and 333334 (fail: 1000002 > 1000000)
    val df = Seq(Option(1), None, None).toDF("v")
    val rep = Quality.report(df, Seq(
      Quality.notNull("v", 333333L), Quality.notNull("v", 333334L)))
      .collect().map(r => (r.getAs[Long]("min_ratio_micros"),
        r.getAs[Boolean]("passed"))).toMap
    assert(rep(333333L) && !rep(333334L))
  }

  test("report: duplicate ref keys do not fan out the count") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2).toDF("fk")
    val ref = Seq(1, 1, 1).toDF("rk")
    val rep = byName(Quality.report(df,
      Seq(Quality.RefIntegrity("fk", ref, "rk"))))
    assert(rep("ref:fk") == ((2L, 1L, 500000L, false)))
  }

  test("profileTable: rows/nulls/distinct/min/max per column, one agg") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option("b")), (2L, Option("a")), (3L, None),
      (4L, Option("a"))).toDF("id", "tag")
    val got = Quality.profileTable(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.getString(4)), Option(r.getString(5)))))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("tag") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    // all-null column: min/max null, distinct 0
    val alln = Seq(Option.empty[String], None).toDF("x")
    val gn = Quality.profileTable(alln, Seq("x")).collect().head
    assert(gn.getLong(1) == 2L && gn.getLong(2) == 2L &&
      gn.getLong(3) == 0L && gn.isNullAt(4) && gn.isNullAt(5))
  }

  test("profileTable: approxDistinct swaps in HLL within its error bound") {
    val s = spark
    import s.implicits._
    // 5000 distinct ids + a low-cardinality tag; HLL++ at the default
    // 5% rsd must land within ±10% (3 sigma) of exact — a measured
    // error pin, not a tautology (the sketch_distinct_verify pattern)
    val df = (1 to 5000).map(i => (i.toLong, s"t${i % 7}")).toDF("id", "tag")
    val got = Quality.profileTable(df, Seq("id", "tag"),
        approxDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("id") - 5000L) <= 500L, s"hll id: ${got("id")}")
    assert(math.abs(got("tag") - 7L) <= 1L, s"hll tag: ${got("tag")}")
  }

  test("profileNumeric: mean/min/max/deciles per column; all-null safe") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toDouble, Option.empty[Double]))
      .toDF("v", "z")
    val got = Quality.profileNumeric(df, Seq("v", "z"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = got("v")
    assert(v.getLong(1) == 100L && v.getLong(2) == 0L)
    assert(v.getDouble(3) == 50.5 && v.getDouble(4) == 1.0 &&
      v.getDouble(5) == 100.0)
    // R-7 deciles of 1..100: p10 = 10.9, p50 = 50.5, p90 = 90.1
    assert(v.getDouble(6) == 10.9 && v.getDouble(10) == 50.5 &&
      v.getDouble(14) == 90.1, s"deciles ${v.mkString(",")}")
    val z = got("z")
    assert(z.getLong(1) == 100L && z.getLong(2) == 100L && z.isNullAt(3) &&
      z.isNullAt(6) && z.isNullAt(14))
  }

  test("histogram: equi-depth bins, clipping, empty-bin rows, null drop") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => Option(i.toDouble)).toDF("v")
      .union(Seq(Option.empty[Double]).toDF("v"))
    val got = Quality.histogram(df, "v", 4)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    // quartile edges of 1..100 (R-7): 1, 25.75, 50.5, 75.25, 100
    assert(got == Seq((1L, 1.0, 25.75, 25L), (2L, 25.75, 50.5, 25L),
      (3L, 50.5, 75.25, 25L), (4L, 75.25, 100.0, 25L)), s"got $got")
    // heavy ties: constant column still yields all bins (empties at 0)
    val const = Seq.fill(10)(5.0).toDF("v")
    val cg = Quality.histogram(const, "v", 4).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(cg.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(cg.map(_._2).sum == 10L)
  }

  test("psiDrift: identical snapshots near zero, tail cut registers high") {
    val s = spark
    import s.implicits._
    val base = (1 to 200).map(_.toDouble).toDF("v")
    val same = Quality.psiDrift(base, base, "v", bins = 10)
      .agg(sum(col("contrib_nano"))).head.getLong(0)
    assert(same == 0L, s"identical snapshots must give PSI 0, got $same")
    // cut the top 30%: out-of-range semantics keep every current row
    // (clipped into bins), and PSI crosses the 0.25 'act' threshold
    val drift = Quality.psiDrift(base, base.where(col("v") <= 140), "v", 10)
    val rows = drift.orderBy("bin").collect()
    assert(rows.map(_.getAs[Long]("cur_n")).sum == 140L)
    val psi = rows.map(_.getAs[Long]("contrib_nano")).sum / 1e9
    assert(psi > 0.25, s"tail cut should breach 0.25, got $psi")
  }

  test("keyOverlap: containment and jaccard exact; nulls excluded; " +
      "disjoint and empty sides safe") {
    val s = spark
    import s.implicits._
    val a = Seq(Option(1L), Option(2L), Option(3L), Option(3L),
      Option.empty[Long]).toDF("k")
    val b = Seq(2L, 3L, 4L, 5L).toDF("k")
    val r = Quality.keyOverlap(a, "k", b, "k").collect().head
    // distinct A = {1,2,3}, B = {2,3,4,5}, common = {2,3}
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("n_common")) == ((3L, 4L, 2L)))
    assert(r.getAs[Long]("contain_a_micro") == 666667L &&
      r.getAs[Long]("contain_b_micro") == 500000L &&
      r.getAs[Long]("jaccard_micro") == 400000L)
    // disjoint: all ratios zero
    val dj = Quality.keyOverlap(Seq(1L).toDF("k"), "k",
      Seq(9L).toDF("k"), "k").collect().head
    assert(dj.getAs[Long]("n_common") == 0L &&
      dj.getAs[Long]("jaccard_micro") == 0L)
    // empty side: no NaN/null ratios
    val em = Quality.keyOverlap(Seq(1L).toDF("k").limit(0), "k",
      b, "k").collect().head
    assert(em.getAs[Long]("n_a") == 0L &&
      em.getAs[Long]("contain_a_micro") == 0L)
  }

  test("embeddingDrift: identical → zero drift; exact 2x-scale case; " +
      "degenerate side throws the named guard") {
    val s = spark
    import s.implicits._
    val base = Seq(
      Tuple1(Seq(1.0f, 0.0f)), Tuple1(Seq(0.0f, 2.0f)),
      Tuple1(Seq(-1.0f, 1.0f)), Tuple1(Seq(2.0f, -1.0f)))
      .toDF("embedding")
    // identical snapshots: no drift, trace ratio exactly 1e6
    val same = graft.ops.Quality.embeddingDrift(base, base).head()
    assert(same.getAs[Long]("n_base") == 4L &&
      same.getAs[Long]("n_cur") == 4L)
    assert(same.getAs[Long]("mean_shift_micro") == 0L)
    assert(same.getAs[Long]("cov_fro_delta_micro") == 0L)
    assert(same.getAs[Long]("trace_ratio_micro") == 1000000L)
    // current = base scaled by 2 (exact in fp): cov scales by 4 →
    // trace ratio exactly 4e6; mean shift = ‖μ‖ (2μ − μ); cov fro
    // delta = 3·‖C‖_F
    val scaled = base.select(transform(col("embedding"),
      x => x * lit(2.0f)).as("embedding"))
    val d = graft.ops.Quality.embeddingDrift(base, scaled).head()
    assert(d.getAs[Long]("trace_ratio_micro") == 4000000L, d)
    // μ = (0.5, 0.5) → ‖μ‖ = √0.5
    assert(d.getAs[Long]("mean_shift_micro") ==
      math.round(math.sqrt(0.5) * 1e6), d)
    // a zeroed dimension (the pipeline-bug shape) must register
    val zeroed = base.select(transform(col("embedding"),
      x => x * lit(0.0f)).as("embedding"))
    val z = graft.ops.Quality.embeddingDrift(base, zeroed).head()
    assert(z.getAs[Long]("cov_fro_delta_micro") > 0L)
    assert(z.getAs[Long]("trace_ratio_micro") == 0L)
    // one-row side: named guard
    val e = intercept[IllegalArgumentException] {
      graft.ops.Quality.embeddingDrift(base, base.limit(1))
    }
    assert(e.getMessage.contains("embeddingDrift"))
  }

  test("ksDrift: identical → 0; disjoint ranges → 1e9; hand case exact") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = Quality.ksDrift(a, a, "v").collect().head
    assert(same.getAs[Long]("n_base") == 100L &&
      same.getAs[Long]("n_cur") == 100L &&
      same.getAs[Long]("d_nano") == 0L)
    // disjoint supports: sup|F1−F2| = 1
    val b = (101 to 150).map(_.toDouble).toDF("v")
    assert(Quality.ksDrift(a, b, "v").collect().head
      .getAs[Long]("d_nano") == 1000000000L)
    // hand case: base {1,2,3,4}, cur {3,4}: sup at v=2 → |2/4 − 0/2| = 0.5
    val h = Quality.ksDrift(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"),
      Seq(3.0, 4.0).toDF("v"), "v").collect().head
    assert(h.getAs[Long]("d_nano") == 500000000L)
  }

  test("chiSquareDrift: homogeneous mix → all-zero chi; " +
      "null is a real level; counts exact") {
    val s = spark
    import s.implicits._
    val base = (Seq.fill(30)("en") ++ Seq.fill(10)("de")).toDF("lang")
    // same 3:1 mix at half the size → expected == observed, chi = 0
    val cur = (Seq.fill(15)("en") ++ Seq.fill(5)("de")).toDF("lang")
    val rows = Quality.chiSquareDrift(base, cur, "lang")
      .orderBy("category").collect()
    assert(rows.map(r => (r.getAs[String]("category"),
      r.getAs[Long]("base_n"), r.getAs[Long]("cur_n"))).toSeq ==
      Seq(("de", 10L, 5L), ("en", 30L, 15L)))
    assert(rows.forall(_.getAs[Long]("chi_nano") == 0L))
    // missingness drift registers through the "(null)" level
    val curNull = (Seq.fill(15)(Option("en")) ++ Seq.fill(5)(Option.empty[String]))
      .toDF("lang")
    val withNull = Quality.chiSquareDrift(base, curNull, "lang")
      .orderBy("category").collect()
    assert(withNull.map(_.getAs[String]("category")).toSeq ==
      Seq("(null)", "de", "en"))
    assert(withNull.map(_.getAs[Long]("chi_nano")).sum > 0L)
  }

  test("tableFingerprint: order/partition-independent, content-sensitive") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, Option("x")), (2L, Option("y")), (3L, None))
      .toDF("id", "v")
    val f1 = Quality.tableFingerprint(a, Seq("id", "v")).collect().head
    // reversed order, different partitioning → identical fingerprint
    val b = Seq((3L, Option.empty[String]), (2L, Option("y")),
      (1L, Option("x"))).toDF("id", "v").repartition(7)
    val f2 = Quality.tableFingerprint(b, Seq("id", "v")).collect().head
    assert(f1 == f2)
    // null vs empty string must differ
    val c = Seq((1L, Option("x")), (2L, Option("y")), (3L, Option("")))
      .toDF("id", "v")
    val f3 = Quality.tableFingerprint(c, Seq("id", "v")).collect().head
    assert(f1 != f3)
    // empty frame: zeros, not nulls
    val e = Quality.tableFingerprint(a.limit(0), Seq("id", "v"))
      .collect().head
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getLong(2) == 0L)
  }

  test("columnEntropy: uniform pair → ln 2, constant → 0 with null " +
      "norm, nulls excluded") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("b", Option.empty[String].orNull),
      ("b", "x")).toDF("u", "k")
    val got = Quality.columnEntropy(df, Seq("u", "k"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val u = got("u")
    assert(u.getAs[Long]("n") == 4L && u.getAs[Long]("n_distinct") == 2L)
    assert(u.getAs[Double]("entropy") == 0.693147)
    assert(u.getAs[Double]("norm_entropy") == 1.0)
    val k = got("k")
    assert(k.getAs[Long]("n") == 3L) // the null row is excluded
    assert(k.getAs[Long]("entropy_nano") == 0L)
    assert(k.isNullAt(k.fieldIndex("norm_entropy")))
  }

  test("fdViolations: violated keys surface, null-only second value " +
      "does not flag, holds-FD yields empty") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Option("a")), (1L, Option("b")), (1L, Option("a")), // violates
      (2L, Option("a")), (2L, Option.empty[String]),           // null only
      (3L, Option("c")), (3L, Option("c"))                     // holds
    ).toDF("k", "v")
    val got = Quality.fdViolations(df, Seq("k"), "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("k") == 1L && r.getAs[Long]("n_rows") == 3L &&
      r.getAs[Long]("n_dep") == 2L && r.getAs[Long]("n_null_dep") == 0L)
    // key 2 is reported nowhere, but its null count is visible if asked
    val all = Quality.fdViolations(df.where(col("k") === 2), Seq("k"), "v")
    assert(all.count() == 0L)
    // FD that holds globally → empty report
    val ok = Seq((1L, "x"), (2L, "y"), (1L, "x")).toDF("k", "v")
    assert(Quality.fdViolations(ok, Seq("k"), "v").count() == 0L)
  }

  test("kAnonymityReport: exact class sizes, null quasi rows form a " +
      "class, empty frame passes vacuously") {
    val s = spark
    import s.implicits._
    // classes: (25,A)x3, (25,B)x1, (null,A)x2 → k=1, 1 class below 2
    val df = Seq(
      (Option(25), "A"), (Option(25), "A"), (Option(25), "A"),
      (Option(25), "B"),
      (Option.empty[Int], "A"), (Option.empty[Int], "A")
    ).toDF("nation", "seg")
    val r = Quality.kAnonymityReport(df, Seq("nation", "seg"), 2L).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("k_anonymity") == 1L)
    assert(r.getAs[Long]("classes_below_k") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 1L)
    assert(r.getAs[Long]("rows_below_micro") == 166667L)
    assert(!r.getAs[Boolean]("passed"))
    // k=1 always passes on non-empty data
    val r1 = Quality.kAnonymityReport(df, Seq("nation", "seg"), 1L).head()
    assert(r1.getAs[Boolean]("passed"))
    // empty frame: vacuous pass, k_anonymity 0
    val e = Quality.kAnonymityReport(df.where(lit(false)),
      Seq("nation", "seg"), 5L).head()
    assert(e.getAs[Long]("n_rows") == 0L &&
      e.getAs[Long]("n_classes") == 0L &&
      e.getAs[Long]("k_anonymity") == 0L &&
      e.getAs[Long]("rows_below_micro") == 0L &&
      e.getAs[Boolean]("passed"))
  }

  test("lDiversityReport: all-null sensitive class scores 0 diversity; " +
      "distinct counts ignore nulls; empty passes") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("g1", Option(10.0)), ("g1", Option(20.0)), ("g1", Option(10.0)),
      ("g2", Option(5.0)), ("g2", Option(5.0)),      // homogeneous
      ("g3", Option.empty[Double])                   // all-null → 0
    ).toDF("q", "v")
    val r = Quality.lDiversityReport(df, Seq("q"), "v", 2L).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("l_diversity") == 0L)   // g3
    assert(r.getAs[Long]("classes_below_l") == 2L) // g2 (1), g3 (0)
    assert(r.getAs[Long]("rows_below_l") == 3L)
    assert(!r.getAs[Boolean]("passed"))
    val e = Quality.lDiversityReport(df.where(lit(false)),
      Seq("q"), "v", 3L).head()
    assert(e.getAs[Long]("l_diversity") == 0L && e.getAs[Boolean]("passed"))
  }
}
