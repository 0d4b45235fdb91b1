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

  test("spec refuses empty partition keys (scale guard)") {
    intercept[IllegalArgumentException] { Series.spec(Nil, Seq(col("day"))) }
  }

  test("partitioned window plans have partition keys in Window exec") {
    val plan = df.diff("temp", Seq("city"), Seq(col("day")), "d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("Window [") || plan.contains("partitionBy") ||
      plan.contains("city"))
  }
}
