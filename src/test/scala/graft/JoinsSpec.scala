package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Joins._
import graft.ops.Selection._
import graft.ops.Surgery._
import graft.ops.RowOps._

/** Mirrors the reference join battery (`person/JoinTests.kt:41-118`):
  * same fixtures, same golden row/col counts and nullness expectations.
  * Key = (name, city match origin); right `age` clashes → `age_1`. */
class JoinsSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val right = person2.renameInto("origin" -> "city")
  private def joined(how: String) =
    person.joinDedupNames(right, Seq("name", "city"), how)

  test("inner join: 7 rows, 6 cols, age_1 never null, Mark-Moscow x4") {
    val res = joined("inner").cache()
    assert(res.columns.length == 6)
    assert(res.count() == 7)
    assert(res.filter(col("age_1").isNull).count() == 0)
    assert(res.filter(col("name") === "Mark" && col("city") === "Moscow").count() == 4)
    assert(res.select("city", "name").distinct().count() == 3)
    assert(res.filter(col("grade").isNull).count() == 0)
  }

  test("left join: 10 rows, age_1 nullable, 3 unmatched") {
    val res = joined("left").cache()
    assert(res.columns.length == 6)
    assert(res.count() == 10)
    assert(res.filter(col("age_1").isNull).count() > 0)
    assert(res.select("city", "name").distinct().count() == 6)
    assert(res.filter(col("grade").isNull).count() == 3)
    assert(res.filter(col("age").isNull).count() == 0)
  }

  test("right join: 9 rows, 2 new Bob-Paris entries") {
    val res = joined("right").cache()
    assert(res.columns.length == 6)
    assert(res.count() == 9)
    assert(res.filter(col("grade").isNull).count() == 0)
    val newEntries = res.filter(col("age").isNull)
    assert(newEntries.count() == 2)
    assert(newEntries.filter(col("name") === "Bob" && col("city") === "Paris"
      && col("weight").isNull).count() == 2)
  }

  test("outer join: 12 rows, name never null") {
    val res = joined("full").cache()
    assert(res.columns.length == 6)
    assert(res.count() == 12)
    assert(res.filter(col("name").isNull).count() == 0)
    assert(res.select("city", "name").distinct().count() == 7)
  }

  test("filterJoin = left_semi: no right columns, rows with matching city") {
    val res = person.filterJoin(
      person2.renameInto("origin" -> "city").selectNames(Seq("city")),
      Seq("city"))
    assert(res.columns.toSeq == person.columns.toSeq)
    // cities London/Tokyo/Moscow match; Dubai/Milan/null don't
    assert(res.count() == 4)
  }

  test("excludeJoin = left_anti: 3 unmatched rows") {
    val res = person.excludeJoin(
      person2.renameInto("origin" -> "city").selectNames(Seq("city")),
      Seq("city"))
    assert(res.count() == 3)
  }

  test("natural join keys = intersecting column names") {
    val a = person.selectNames(Seq("name", "age"))
    assert(a.naturalKeys(person2).toSet == Set("name", "age"))
  }

  test("broadcast hint produces a broadcast join in the plan") {
    val res = person.innerJoin(right.selectNames(Seq("name", "grade"))
      .distinctByFirst(Seq("name"), Seq(col("grade"))),
      Seq("name"), hintBroadcast = true)
    assert(res.queryExecution.executedPlan.toString.contains("Broadcast"))
  }
}
