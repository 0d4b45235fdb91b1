package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RowOps._
import graft.ops.Joins._
import graft.ops.Selection._

/** Ports of the reference's `person/JoinTests.kt` over its exact
  * fixtures: person ⋈ person2 on (name, city = origin) — the reference's
  * `city.match(right.origin)` is a rename-match, expressed here by
  * renaming `origin` to `city` on the right side. */
class JoinParitySpec extends AnyFunSuite {
  import SparkFixture._

  // right side with origin renamed to city (match key) — keeps grade, age
  private def right = person2.selectAs(
    "name" -> "name", "origin" -> "city", "grade" -> "grade", "age" -> "age2")

  test("inner join (JoinTests.kt:41-50)") {
    val res = person.joinDedupNames(right, Seq("name", "city"), "inner")
    assert(res.count() == 7)
    assert(res.columns.length == 6)
    assert(res.filter(col("name") === "Mark" && col("city") === "Moscow")
      .count() == 4)
    assert(res.select("city", "name").distinct().count() == 3)
    assert(res.filter(col("grade").isNull).count() == 0)
  }

  test("left join (JoinTests.kt:52-64)") {
    val res = person.joinDedupNames(right, Seq("name", "city"), "left")
    assert(res.count() == 10)
    assert(res.select("city", "name").distinct().count() == 6)
    assert(res.filter(col("grade").isNull).count() == 3)
    assert(res.filter(col("age").isNull).count() == 0)
  }

  test("right join (JoinTests.kt:66-80)") {
    val res = person.joinDedupNames(right, Seq("name", "city"), "right")
    assert(res.count() == 9)
    assert(res.select("city", "name").distinct().count() == 4)
    assert(res.filter(col("grade").isNull).count() == 0)
    val newEntries = res.filter(col("age").isNull)
    assert(newEntries.count() == 2)
    assert(newEntries.filter(col("name") === "Bob" && col("city") === "Paris"
      && col("weight").isNull).count() == 2)
  }

  test("outer join (JoinTests.kt:82-96)") {
    val res = person.joinDedupNames(right, Seq("name", "city"), "full")
    assert(res.count() == 12)
    assert(res.filter(col("name").isNull).count() == 0)
    assert(res.select("city", "name").distinct().count() == 7)
    // distinct person columns = original person + the appended Bob/Paris
    assert(res.select("name", "age", "city", "weight").distinct()
      .count() == 8)
  }

  test("filter join = semi on the match key (JoinTests.kt:98-104)") {
    val res = person.filterJoin(
      person2.selectAs("origin" -> "city"), Seq("city"))
    assert(res.count() == 4)
    assert(res.columns.toSeq == person.columns.toSeq)
    assert(res.select("city").distinct().collect().map(_.getString(0))
      .toSet == Set("London", "Tokyo", "Moscow"))
  }

  test("exclude join = anti on the match key (JoinTests.kt:106-120)") {
    val res = person.excludeJoin(
      person2.selectAs("origin" -> "city"), Seq("city"))
    assert(res.count() == 3)
    assert(res.collect().map(r => Option(r.getString(2))).toSet ==
      Set(Some("Dubai"), Some("Milan"), None))
  }
}
