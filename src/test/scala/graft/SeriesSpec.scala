package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Series
import graft.ops.Series._

/** Mirrors `SeriesTests.kt:44-71`: per-group lag-diff and moving average
  * against hand-computed expectations. */
class SeriesSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val df = {
    val s = spark
    import s.implicits._
    // (city, day, temp) series — two cities interleaved
    Seq(("A", 1, 10.0), ("A", 2, 13.0), ("A", 3, 12.0), ("A", 4, 16.0),
      ("B", 1, 20.0), ("B", 2, 18.0), ("B", 3, 21.0))
      .toDF("city", "day", "temp")
  }

  test("diff: current minus previous, 0 for first row of each group") {
    val res = df.diff("temp", Seq("city"), Seq(col("day")), "d")
      .orderBy("city", "day").collect().map(_.getDouble(3))
    assert(res.toSeq == Seq(0.0, 3.0, -1.0, 4.0, 0.0, -2.0, 3.0))
  }

  test("movingAverage: trailing k with shrinking head window") {
    val res = df.movingAverage("temp", 3, Seq("city"), Seq(col("day")), "ma")
      .orderBy("city", "day").collect().map(_.getDouble(3))
    val exp = Seq(10.0, 11.5, 35.0 / 3, 41.0 / 3, 20.0, 19.0, 59.0 / 3)
    res.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
  }

  test("withPrev/withNext: lag and lead within group") {
    val res = df.withPrev("temp", Seq("city"), Seq(col("day")), "p")
      .withNext("temp", Seq("city"), Seq(col("day")), "n")
      .orderBy("city", "day").collect()
    assert(res(0).isNullAt(3) && res(0).getDouble(4) == 13.0)
    assert(res(3).getDouble(3) == 12.0 && res(3).isNullAt(4))
  }

  test("withNeighbours names columns by offset") {
    val res = df.withNeighbours("temp", Seq(-2, 1), Seq("city"), Seq(col("day")))
    assert(res.columns.contains("temp_m2") && res.columns.contains("temp_p1"))
  }

  test("runningSum accumulates within group") {
    val res = df.runningSum("temp", Seq("city"), Seq(col("day")), "rs")
      .orderBy("city", "day").collect().map(_.getDouble(3))
    assert(res.toSeq == Seq(10.0, 23.0, 35.0, 51.0, 20.0, 38.0, 59.0))
  }

  test("rowNumberIn: per-group 1-based ids") {
    val res = df.rowNumberIn(Seq("city"), Seq(col("day")), "rn")
      .orderBy("city", "day").collect().map(_.getInt(3))
    assert(res.toSeq == Seq(1, 2, 3, 4, 1, 2, 3))
  }

  test("movingAverageByTime: inclusive 1h bound, ties share a frame") {
    val s = spark
    import s.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      (1L, ts(0), 1.0),
      (1L, ts(30), 3.0),
      (1L, ts(60), 5.0),   // exactly 1h after the first → still in frame
      (1L, ts(61), 7.0),   // first row now out of frame
      (1L, ts(61), 9.0),   // tie: RANGE frame includes BOTH 61-min rows
      (2L, ts(0), 100.0)   // other partition untouched
    ).toDF("user_id", "ts", "value")
    val got = ev.movingAverageByTime("value", "ts", 3600L * 1000000L,
      Seq("user_id"), "ma")
      .select(col("user_id"), col("ts"), col("value"), col("ma"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (1L, 1.0, 1.0),
      (1L, 3.0, 2.0),              // (1+3)/2
      (1L, 5.0, 3.0),              // (1+3+5)/3 — boundary row included
      (1L, 7.0, 6.0),              // (3+5+7+9)/4 — tie partner included
      (1L, 9.0, 6.0),              // same frame as its tie
      (2L, 100.0, 100.0)))
  }

  test("spec refuses empty partition keys (scale guard)") {
    intercept[IllegalArgumentException] { Series.spec(Nil, Seq(col("day"))) }
  }

  test("winsorizeBy: exact R-7 bounds clip tails, body passes through exact") {
    val s = spark
    import s.implicits._
    // group g: 1..10 → p10 = 1.9, p90 = 9.1 (R-7); 1→1.9, 10→9.1
    val d = (1 to 10).map(i => ("g", i.toDouble)).toDF("k", "x")
    val r = graft.ops.Series.winsorizeBy(d, "x", Seq("k"), 0.1, 0.9)
      .orderBy("x").select("x", "x_w").as[(Double, Double)]
      .collect().toSeq
    assert(r.head == ((1.0, 1.9)))
    assert(r.last == ((10.0, 9.1)))
    // everything strictly inside the bounds is untouched, bit-for-bit
    assert(r.filter(v => v._1 > 1.9 && v._1 < 9.1).forall(v => v._1 == v._2))
  }

  test("robustZBy: median/MAD scoring, MAD=0 group yields null") {
    val s = spark
    import s.implicits._
    // group a: 1,2,3,4,100 → med 3, |dev| = 2,1,0,1,97 → MAD 1
    // group b: constant → MAD 0 → null
    val d = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(5.0, 5.0, 5.0).map(("b", _))).toDF("k", "x")
    val r = graft.ops.Series.robustZBy(d, "x", Seq("k"))
      .select("k", "x", "x_rz").as[(String, Double, Option[Double])]
      .collect().toSeq.sortBy(v => (v._1, v._2))
    val a = r.filter(_._1 == "a").map(_._3.get)
    // (x − 3)/1.4826: the outlier scores 65.4, the body stays small
    assert(a == Seq(-1.348982, -0.674491, 0.0, 0.674491, 65.425604))
    assert(r.filter(_._1 == "b").forall(_._3.isEmpty))
  }

  test("ewmaBy: head-normalized bounded decay, null-transparent") {
    val s = spark
    import s.implicits._
    val d = Seq(("a", 1, Some(1.0)), ("a", 2, Some(2.0)),
      ("a", 3, None), ("a", 4, Some(4.0)), ("b", 1, Some(7.0)))
      .toDF("k", "t", "x")
    val r = graft.ops.Series.ewmaBy(d, "x", Seq("k"), Seq("t"),
        alpha = 0.5, k = 3, as = "e")
      .orderBy("k", "t").select("k", "t", "e")
      .as[(String, Int, Option[Double])].collect().toSeq
    // a@1: 1/1; a@2: (2+0.5)/1.5; a@3: null x drops out of BOTH sums →
    // (0.5·2+0.25·1)/0.75; a@4: (4+0.25·2)/1.25; b@1 head = own value
    assert(r == Seq(
      ("a", 1, Some(1.0)), ("a", 2, Some(1.666667)),
      ("a", 3, Some(1.666667)), ("a", 4, Some(3.6)),
      ("b", 1, Some(7.0))))
  }

  test("partitioned window plans have partition keys in Window exec") {
    val plan = df.diff("temp", Seq("city"), Seq(col("day")), "d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("Window [") || plan.contains("partitionBy") ||
      plan.contains("city"))
  }

  test("mergeIntervals: overlap and abutment merge, gaps split, nulls drop") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // key a: [0,10] ∪ [5,8] (contained) ∪ [10,20] (touching) → [0,20];
      // then a gap, [30,40] alone
      ("a", Some(0L), Some(10L)), ("a", Some(5L), Some(8L)),
      ("a", Some(10L), Some(20L)), ("a", Some(30L), Some(40L)),
      // key b: same bounds as a's first island — keys never cross-merge
      ("b", Some(15L), Some(25L)),
      // null bounds drop
      ("b", None, Some(99L)), ("b", Some(99L), None)
    ).toDF("k", "s", "e")
    val got = Series.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("a", 0L, 20L, 3L), ("a", 30L, 40L, 1L),
      ("b", 15L, 25L, 1L)), s"got $got")
    // single Exchange: windows and the island agg share the key partitioning
    val plan = Series.mergeIntervals(iv, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n$plan")
  }

  test("temperatureMixture: sqrt weights, budget split, repeat factors") {
    val s = spark
    import s.implicits._
    // tokens: small=100, big=400 → sqrt 10, 20 → weights 1/3, 2/3
    val df = Seq(("small", 60L), ("small", 40L), ("big", 400L))
      .toDF("src", "n")
    val got = graft.ops.Sampling.temperatureMixture(df, "src", "n",
        tokenBudget = 300L)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(("big", 400L, 666667L, 200L, 0.5),
      ("small", 100L, 333333L, 100L, 1.0)), s"got $got")
    // α = 1 is natural proportions: weights equal token shares
    val nat = graft.ops.Sampling.temperatureMixture(df, "src", "n",
        tokenBudget = 500L, alpha = 1.0)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(nat == Seq(("big", 800000L, 400L), ("small", 200000L, 100L)),
      s"got $nat")
  }

  test("globalCumSum: matches the single-partition global window " +
      "differential across bucket counts; totals exact") {
    val s = spark
    import s.implicits._
    // unique order values, shuffled insertion order, two value columns
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1 to 500).toList)
      .map(i => (i.toDouble, (i % 7).toLong, (i % 3).toLong))
    val df = rows.toDF("v", "a", "b").repartition(11)
    val expect = df
      .withColumn("cum_a", sum(col("a")).over(
        org.apache.spark.sql.expressions.Window.orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .withColumn("cum_b", sum(col("b")).over(
        org.apache.spark.sql.expressions.Window.orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .orderBy("v").collect()
      .map(r => (r.getDouble(0), r.getLong(3), r.getLong(4))).toSeq
    for (buckets <- Seq(1, 4, 32)) {
      val got = Series.globalCumSum(df, "v", Seq("a", "b"),
          buckets = buckets, withTotals = true)
        .orderBy("v").collect()
      assert(got.map(r => (r.getAs[Double]("v"), r.getAs[Long]("cum_a"),
        r.getAs[Long]("cum_b"))).toSeq == expect,
        s"buckets=$buckets mismatch")
      assert(got.head.getAs[Long]("total_a") == rows.map(_._2).sum &&
        got.head.getAs[Long]("total_b") == rows.map(_._3).sum)
    }
  }

  test("groupedCumSum: input lineage is cut - the upstream computes " +
      "exactly once across the kernel's internal actions (r20)") {
    // the kernel consumes its input through three separate actions
    // (bucket-edge percentile, per-bucket partials collect, the final
    // decorated result) plus whatever the caller runs; without the
    // entry checkpoint the producing lineage re-executes per action.
    val s = spark
    import s.implicits._
    val acc = s.sparkContext.longAccumulator("cumsum-upstream-computes")
    val src = s.createDataset((1 to 100).map(i => (i.toDouble, 1L)))
      .repartition(4)
      .mapPartitions { it => acc.add(1L); it }
      .toDF("v", "x")
    val out = Series.globalCumSum(src, "v", Seq("x"), buckets = 8)
    assert(out.count() == 100)
    assert(out.agg(max(col("cum_x"))).collect().head.getLong(0) == 100L)
    assert(acc.value == 4,
      s"upstream partitions computed ${acc.value} task-times - expected " +
        "4 (once per partition): the kernel must read its input from " +
        "the one-shot checkpoint, not recompute it per action")
  }

  test("groupedCumSum: per-group differential vs partitioned window; " +
      "per-group totals; groups with disjoint value ranges") {
    val s = spark
    import s.implicits._
    // three groups with deliberately DIFFERENT value ranges (group edges
    // must come from the group's own percentiles, not shared ones) and
    // different sizes; unique order values within each group
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      (1 to 400).map(i => ("g1", i.toDouble, (i % 5).toLong)) ++
      (1 to 150).map(i => ("g2", i * 1000.0, (i % 3).toLong)) ++
      (1 to 7).map(i => ("g3", -i * 0.25, 1L))).toList
    val df = rows.toDF("g", "v", "x").repartition(13)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val expect = df.withColumn("cum_x", sum(col("x")).over(w))
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3))).toSeq
    for (buckets <- Seq(1, 4, 32)) {
      val got = Series.groupedCumSum(df, Seq("g"), "v", Seq("x"),
          buckets = buckets, withTotals = true)
        .orderBy("g", "v").collect()
      assert(got.map(r => (r.getAs[String]("g"), r.getAs[Double]("v"),
        r.getAs[Long]("cum_x"))).toSeq == expect,
        s"buckets=$buckets mismatch")
      val totals = got.map(r =>
        r.getAs[String]("g") -> r.getAs[Long]("total_x")).toMap
      assert(totals == Map("g1" -> (1 to 400).map(_ % 5).sum.toLong,
        "g2" -> (1 to 150).map(_ % 3).sum.toLong, "g3" -> 7L),
        s"buckets=$buckets totals $totals")
    }
  }
}
