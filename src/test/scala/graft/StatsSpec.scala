package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Stats

class StatsSpec extends AnyFunSuite {
  import SparkFixture._

  test("linearRegression recovers an exact line and flags degenerate x") {
    val s = spark
    import s.implicits._
    // y = 3x + 2 exactly → slope 3, intercept 2, r2 1
    val exact = Seq((1.0, 5.0), (2.0, 8.0), (3.0, 11.0), (4.0, 14.0))
      .toDF("x", "y").withColumn("g", lit("a"))
    val row = Stats.linearRegression(exact, "x", "y", Seq("g")).head()
    assert(row.getAs[Long]("n") == 4L)
    assert(row.getAs[Double]("slope") == 3.0)
    assert(row.getAs[Double]("intercept") == 2.0)
    assert(row.getAs[Double]("r2") == 1.0)
    // constant x → null fit, not NaN/crash
    val degen = Seq((5.0, 1.0), (5.0, 2.0)).toDF("x", "y")
      .withColumn("g", lit("a"))
    val d = Stats.linearRegression(degen, "x", "y", Seq("g")).head()
    assert(d.isNullAt(d.fieldIndex("slope")) &&
      d.isNullAt(d.fieldIndex("r2")))
  }

  test("linearRegression ignores null pairs (regr_* contract)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1.0), Some(5.0)), (Some(2.0), Some(8.0)),
      (None: Option[Double], Some(99.0)), (Some(3.0), None),
      (Some(3.0), Some(11.0))).toDF("x", "y").withColumn("g", lit("a"))
    val row = Stats.linearRegression(df, "x", "y", Seq("g")).head()
    assert(row.getAs[Long]("n") == 3L && row.getAs[Double]("slope") == 3.0)
  }

  test("linearRegressionMulti recovers an exact plane; collinear and " +
      "constant predictors throw named errors") {
    val s = spark
    import s.implicits._
    // y = 2·x1 + 3·x2 + 5 exactly
    val df = Seq((1.0, 2.0), (2.0, 5.0), (3.0, 3.0), (4.0, 7.0),
      (5.0, 4.0)).toDF("x1", "x2")
      .withColumn("y", lit(2.0) * col("x1") + lit(3.0) * col("x2") + 5)
    val got = Stats.linearRegressionMulti(df, Seq("x1", "x2"), "y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("(intercept)") - 5.0) < 1e-6, got)
    assert(math.abs(got("x1") - 2.0) < 1e-6 &&
      math.abs(got("x2") - 3.0) < 1e-6, got)
    assert(got("r2") == 1.0)
    // collinear: x2 = 2·x1
    val coll = df.withColumn("x2", col("x1") * 2)
    val e1 = intercept[IllegalStateException] {
      Stats.linearRegressionMulti(coll, Seq("x1", "x2"), "y")
    }
    assert(e1.getMessage.contains("collinear"))
    // constant predictor
    val const = df.withColumn("x2", lit(7.0))
    val e2 = intercept[IllegalStateException] {
      Stats.linearRegressionMulti(const, Seq("x1", "x2"), "y")
    }
    assert(e2.getMessage.contains("constant"))
  }

  test("spearman: monotone nonlinear → 1; ties use fractional ranks") {
    val s = spark
    import s.implicits._
    // y = x³ is monotone: Pearson < 1 but Spearman = 1 exactly
    val mono = Seq((1.0, 1.0), (2.0, 8.0), (3.0, 27.0), (4.0, 64.0),
      (5.0, 125.0)).toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").head().getAs[Double]("rho") == 1.0)
    // tie case by hand: x=[1,2,2,3] → ranks [1,2.5,2.5,4];
    // y=[10,20,30,30] → ranks [1,2,3.5,3.5]; Pearson = 3.75/4.5
    val ties = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 30.0))
      .toDF("x", "y")
    val rho = Stats.spearman(ties, "x", "y").head().getAs[Double]("rho")
    assert(math.abs(rho - 0.833333) < 1e-6, s"rho=$rho")
  }

  test("spearmanBy: per-group rho; agrees with the global form on a " +
      "single group") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 8.0), ("a", 3.0, 27.0),
      ("b", 1.0, 9.0), ("b", 2.0, 4.0), ("b", 3.0, 1.0))
      .toDF("g", "x", "y")
    val got = Stats.spearmanBy(df, "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(got == Map("a" -> 1.0, "b" -> -1.0), got)
    // tie case equals the global implementation exactly
    val ties = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 30.0))
      .toDF("x", "y").withColumn("g", lit("z"))
    val grouped = Stats.spearmanBy(ties, "x", "y", Seq("g"))
      .head().getAs[Double]("rho")
    val global = Stats.spearman(ties, "x", "y").head().getAs[Double]("rho")
    assert(grouped == global)
  }

  test("anovaF matches the hand-computed F on a textbook 3-group case") {
    val s = spark
    import s.implicits._
    // groups: a=(1,2,3) m=2; b=(2,3,4) m=3; c=(4,5,6) m=5; grand=10/3
    // SSB = 3·((2-10/3)² + (3-10/3)² + (5-10/3)²) = 3·(16/9+1/9+25/9) = 14
    // SSW = 2+2+2 = 6; F = (14/2)/(6/6) = 7
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 3.0), ("b", 4.0), ("c", 4.0), ("c", 5.0), ("c", 6.0))
      .toDF("g", "v")
    val row = Stats.anovaF(df, "v", "g").head()
    assert(row.getAs[Long]("k") == 3L && row.getAs[Long]("n") == 9L)
    assert(math.abs(row.getAs[Double]("f") - 7.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("eta_sq") - 0.7) < 1e-6)
    // single group → null F
    val one = df.where(col("g") === "a")
    assert(Stats.anovaF(one, "v", "g").head()
      .isNullAt(2))
  }

  test("jackknifeCi: zero-variance data → se 0, CI collapses to mean") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i => (i, 5.0)).toDF("id", "v")
    val row = Stats.jackknifeCi(df, "v", "id", k = 4).head()
    assert(row.getAs[Double]("mean") == 5.0)
    assert(row.getAs[Double]("se") == 0.0)
    assert(row.getAs[Double]("lo") == 5.0 && row.getAs[Double]("hi") == 5.0)
    assert(row.getAs[Long]("k") == 4L && row.getAs[Long]("n") == 40L)
  }

  test("jackknifeCi matches the hand formula on an uneven 2-bucket case") {
    val s = spark
    import s.implicits._
    // bucket 0: ids 2,4 → values 10, 20; bucket 1: id 1,3 → 1, 3
    val df = Seq((2L, 10.0), (4L, 20.0), (1L, 1.0), (3L, 3.0))
      .toDF("id", "v")
    val row = Stats.jackknifeCi(df, "v", "id", k = 2).head()
    // S=34, N=4, mean=8.5; θ̂₀ = (34-30)/2 = 2, θ̂₁ = (34-4)/2 = 15
    // var = (1/2)·Σ(θᵢ-8.5)² = 0.5·(42.25+42.25) = 42.25 → se 6.5
    assert(row.getAs[Double]("mean") == 8.5)
    assert(math.abs(row.getAs[Double]("se") - 6.5) < 1e-9)
    assert(math.abs(row.getAs[Double]("lo") - (8.5 - 1.96 * 6.5)) < 1e-6)
  }

  test("zipfFit: exact power law freq = 1000/rank → slope −1, r2 1") {
    val s = spark
    import s.implicits._
    // craft a corpus where token w_r appears floor(1000/r) times
    val docs = (1 to 20).flatMap { r =>
      Seq.fill(1000 / r)(f"w$r%02d")
    }.mkString(" ")
    val df = Seq(Tuple1(docs)).toDF("text")
    val row = Stats.zipfFit(df, "text", topN = 20).head()
    assert(row.getAs[Long]("vocab") == 20L)
    assert(row.getAs[Long]("top_n") == 20L)
    // floor() quantization keeps it off exactly −1, but barely
    val slope = row.getAs[Double]("slope")
    assert(slope < -0.97 && slope > -1.03, s"slope=$slope")
    assert(row.getAs[Double]("r2") > 0.999)
  }

  test("linearRegressionMulti: constant RESPONSE throws the mirrored " +
      "named guard instead of returning a fake all-zero fit") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 2.0), (2.0, 5.0), (3.0, 3.0), (4.0, 7.0),
      (5.0, 4.0)).toDF("x1", "x2").withColumn("y", lit(7.0))
    val e = intercept[IllegalStateException] {
      Stats.linearRegressionMulti(df, Seq("x1", "x2"), "y")
    }
    assert(e.getMessage.contains("response 'y' is constant"))
  }

  test("jackknifeCi: fractional bucket key throws the named integral " +
      "guard (pmod of a double is not k buckets)") {
    val s = spark
    import s.implicits._
    val df = Seq((1.5, 10.0), (2.5, 20.0), (3.5, 30.0))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.jackknifeCi(df, "v", "id", k = 2)
    }
    assert(e.getMessage.contains("integral"))
    // casting the key restores the documented contract
    val ok = Stats.jackknifeCi(
      df.withColumn("id", col("id").cast("long")), "v", "id", k = 2)
    assert(ok.head().getAs[Long]("n") == 3L)
  }

  test("heapsFit: a negative id throws a named guard instead of " +
      "landing in a phantom bucket") {
    val s = spark
    import s.implicits._
    val df = Seq((-1L, "a b c"), (0L, "a d"), (1L, "e f"), (2L, "a g"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Stats.heapsFit(df, "text", "doc_id", checkpoints = 2).collect()
    }
    assert(e.getMessage.contains("negative id"), e.getMessage)
    // non-negative ids still fit
    val ok = Stats.heapsFit(df.where(col("doc_id") >= 0), "text",
      "doc_id", checkpoints = 2).collect()
    assert(ok.length == 2)
  }

  test("mahalanobisScores: exact d2 on an identity-covariance square, " +
      "mean(d2) = k identity, null rows score null, singular guard + " +
      "ridge escape") {
    val s = spark
    import s.implicits._
    // square corners: mu = (1,1), cov = I -> every corner d2 = 2
    val sq = Seq((1L, 0.0, 0.0), (2L, 2.0, 0.0), (3L, 0.0, 2.0),
      (4L, 2.0, 2.0)).toDF("id", "x", "y")
    val got = Stats.mahalanobisScores(sq, Seq("x", "y"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("mahalanobis_d2")).toMap
    got.values.foreach(v => assert(math.abs(v - 2.0) < 1e-12, v.toString))
    // mean(d2) = k on arbitrary non-degenerate data (population-cov law)
    val arb = Seq((1.0, 2.0, 0.5), (2.0, 1.0, 3.5), (4.0, 4.0, 1.0),
      (0.5, 3.0, 2.0), (3.0, 0.0, 0.0), (5.0, 2.5, 4.0))
      .toDF("a", "b", "c")
    val mean = Stats.mahalanobisScores(arb, Seq("a", "b", "c"))
      .agg(avg(col("mahalanobis_d2"))).head().getDouble(0)
    assert(math.abs(mean - 3.0) < 1e-9, mean.toString)
    // null in any column -> null score, excluded from moments
    val wn = Seq((1L, Option(0.0), Option(0.0)),
      (2L, Option(2.0), Option(0.0)), (3L, Option(0.0), Option(2.0)),
      (4L, Option(2.0), Option(2.0)),
      (5L, Option.empty[Double], Option(9.0))).toDF("id", "x", "y")
    val wg = Stats.mahalanobisScores(wn, Seq("x", "y")).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("mahalanobis_d2"))).toMap
    assert(wg(5L).isEmpty)
    assert(math.abs(wg(1L).get - 2.0) < 1e-12) // moments unchanged
    // collinear columns throw the named guard; ridge regularizes
    val lin = Seq((0.0, 0.0), (1.0, 2.0), (2.0, 4.0), (3.0, 6.0))
      .toDF("x", "y")
    val e = intercept[IllegalStateException] {
      Stats.mahalanobisScores(lin, Seq("x", "y"))
    }
    assert(e.getMessage.contains("singular"))
    val rr = Stats.mahalanobisScores(lin, Seq("x", "y"), ridge = 0.1)
      .agg(min(col("mahalanobis_d2")), max(col("mahalanobis_d2")))
      .head()
    assert(rr.getDouble(0) >= 0.0 && !rr.getDouble(1).isNaN)
  }
}
