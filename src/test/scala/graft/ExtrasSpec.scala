package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Extras
import graft.ops.Selection._

class ExtrasSpec extends AnyFunSuite {
  import SparkFixture._

  test("joinAll folds frames on shared keys") {
    val a = person.select(col("name"), col("age")).distinct()
    val b = person.groupBy("name").agg(count(lit(1)).as("n"))
    val c = person.groupBy("name").agg(max(col("weight")).as("w"))
    val res = Extras.joinAll(Seq(a, b, c), Seq("name"))
    assert(res.columns.toSeq == Seq("name", "age", "n", "w"))
    assert(res.count() == 7)
  }

  test("sortWithinGroups co-locates and sorts groups without global sort") {
    val res = Extras.sortWithinGroups(person, Seq("name"), Seq(col("age")))
    assert(res.count() == 7)
    // Sort [...], false, 0 — the `false` flag marks a per-partition
    // (non-global) sort; a global sort would print `true`
    val sortLine = res.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Sort [")).getOrElse("")
    assert(sortLine.contains("false, 0"), sortLine)
    // per-partition order: within any partition, same-name rows ascend
    val parts = res.rdd.mapPartitions(it => Iterator(it.toSeq)).collect()
    parts.foreach { rows =>
      rows.groupBy(_.getString(0)).values.foreach { g =>
        val ages = g.map(_.getInt(1))
        assert(ages == ages.sorted)
      }
    }
  }

  test("mapFrameColumn / aggFrameColumn operate on FrameColumn cells") {
    import graft.ops.Agg._
    val grouped = person.selectNames(Seq("name", "age"))
      .toGroupedFrames(Seq("name"))
    val summed = Extras.aggFrameColumn(grouped, "groups", "age", "total")
    val res = summed.orderBy("name").collect()
    assert(res.map(_.getAs[Double]("total")).toSeq == Seq(35.0, 75.0, 90.0))
  }

  test("joinOnStruct matches all leaf fields pairwise") {
    val s = spark
    import s.implicits._
    val a = Seq((1, ("x", 1)), (2, ("y", 2))).toDF("id", "key")
    val b = Seq((("x", 1), "hit")).toDF("key", "tag")
    val res = Extras.joinOnStruct(a, b, "key")
    assert(res.count() == 1)
    assert(res.head().getString(2) == "hit")
  }

  test("asofJoin attaches the latest right row at or before each ts") {
    val s = spark
    import s.implicits._
    def ts(x: Int) = new java.sql.Timestamp(x * 1000L)
    val quotes = Seq((1L, ts(10), 100.0), (1L, ts(20), 110.0),
      (2L, ts(15), 50.0)).toDF("key", "ts", "px")
    val trades = Seq((1L, ts(5)), (1L, ts(10)), (1L, ts(25)),
      (2L, ts(14))).toDF("key", "ts")
    val res = Extras.asofJoin(trades, quotes, Seq("key"), "ts", "ts",
        Seq("px")).orderBy("key", "ts").collect()
    assert(res(0).isNullAt(2))              // t=5: no quote yet
    assert(res(1).getDouble(2) == 100.0)    // t=10: exact tie included
    assert(res(2).getDouble(2) == 110.0)    // t=25: latest quote
    assert(res(3).isNullAt(2))              // key 2, t=14 < 15
  }

  test("asofJoin: tolerance nulls stale matches; forward picks the " +
      "next row at-or-after") {
    val s = spark
    import s.implicits._
    def ts(x: Int) = new java.sql.Timestamp(x * 1000L)
    val quotes = Seq((1L, ts(10), 100.0), (1L, ts(50), 110.0))
      .toDF("key", "ts", "px")
    val trades = Seq((1L, ts(5)), (1L, ts(10)), (1L, ts(30)),
      (1L, ts(100))).toDF("key", "ts")
    // backward with 20 s tolerance: t=30 matches (gap 20, inclusive),
    // t=100 is 50 s past the last quote → null
    val tol = Extras.asofJoin(trades, quotes, Seq("key"), "ts", "ts",
        Seq("px"), toleranceUs = Some(20000000L))
      .orderBy("ts").collect()
    assert(tol(0).isNullAt(2))
    assert(tol(1).getDouble(2) == 100.0)
    assert(tol(2).getDouble(2) == 100.0)   // gap exactly 20 s: inclusive
    assert(tol(3).isNullAt(2))             // stale beyond tolerance
    // forward: earliest quote at-or-after; past the last quote → null
    val fwd = Extras.asofJoin(trades, quotes, Seq("key"), "ts", "ts",
        Seq("px"), forward = true)
      .orderBy("ts").collect()
    assert(fwd(0).getDouble(2) == 100.0)   // t=5 → quote at 10
    assert(fwd(1).getDouble(2) == 100.0)   // exact tie included
    assert(fwd(2).getDouble(2) == 110.0)   // t=30 → quote at 50
    assert(fwd(3).isNullAt(2))             // nothing after t=100
    // forward + tolerance compose: 20 s bound kills the t=30 → 50 match
    val ft = Extras.asofJoin(trades, quotes, Seq("key"), "ts", "ts",
        Seq("px"), forward = true, toleranceUs = Some(5000000L))
      .orderBy("ts").collect()
    assert(ft(0).getDouble(2) == 100.0 && ft(2).isNullAt(2))
  }

  test("dataFrameOfProducts builds from case classes via encoders") {
    val df = graft.sources.IO.dataFrameOfProducts(spark,
      Seq(ExtrasSpec.P(1, "x"), ExtrasSpec.P(2, "y")))
    assert(df.columns.toSeq == Seq("a", "b") && df.count() == 2)
  }

  test("concatAll unions many frames with widening") {
    val s = spark
    import s.implicits._
    val res = Extras.concatAll(Seq(
      Seq(1).toDF("x"), Seq(2L).toDF("x"), Seq(3.5).toDF("x")))
    assert(res.count() == 3)
    assert(res.schema("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }
}

object ExtrasSpec {
  // top-level so a TypeTag exists (method-local case classes have none)
  final case class P(a: Int, b: String)
}
