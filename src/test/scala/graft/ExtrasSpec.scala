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
