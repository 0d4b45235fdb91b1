package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.RowOps._
import graft.ops.Surgery._
import graft.ops.Agg._
import graft.ops.Reshape._
import graft.ops.Selection._

/** Direct ports of the reference's own `person/DataFrameTests.kt` cases,
  * asserting the REFERENCE'S expected values over the identical 7-row
  * fixture (`person/BaseTest.kt:11-19`) — the "a user of the reference
  * could switch" proof at the test level. Reference line numbers cited
  * per test. */
class PersonParitySpec extends AnyFunSuite {
  import SparkFixture._

  private val byNameAge = Seq(col("name"), col("age"))

  test("groupBy flagship aggregate (DataFrameTests.kt:585-615)") {
    val g = person
      .groupAgg(Seq("name"), Seq(
        count(lit(1)).as("n"),
        count_if(col("age") > 25).as("old_count"),
        median(col("age")).as("median_age"),
        min(col("age")).as("min_age"),
        every(col("weight").isNotNull).as("all_with_weights"),
        count_if(col("city") === "London").as("from_London"),
        count_if(col("city") === "Moscow").as("from_Moscow"),
        count_if(col("city").isNull).as("from_null")))
      .orderBy("name").collect()
    assert(g.map(_.getString(0)).toSeq == Seq("Alice", "Bob", "Mark"))
    assert(g.map(_.getLong(1)).toSeq == Seq(2L, 2L, 3L))        // n
    assert(g.map(_.getLong(2)).toSeq == Seq(0L, 2L, 2L))        // old count
    assert(g.map(_.getDouble(3)).toSeq == Seq(17.5, 37.5, 30.0))// median age
    assert(g.map(_.getInt(4)).toSeq == Seq(15, 30, 20))         // min age
    assert(g.map(_.getBoolean(5)).toSeq == Seq(true, true, false))
    assert(g.map(_.getLong(6)).toSeq == Seq(1L, 0L, 0L))        // from London
    assert(g.map(_.getLong(7)).toSeq == Seq(0L, 0L, 2L))        // from Moscow
    assert(g.map(_.getLong(8)).toSeq == Seq(1L, 0L, 0L))        // from null
    // oldest origin (maxBy age → city): null, Dubai, Milan
    val oldest = person.maxByRow(Seq("name"), "age")
      .orderBy("name").select("city").collect()
    assert(oldest.map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("Dubai"), Some("Milan")))
    // youngest origin (minBy age → city): London, Tokyo, Moscow
    val youngest = person.minByRow(Seq("name"), "age")
      .orderBy("name").select("city").collect()
    assert(youngest.map(_.getString(0)).toSeq ==
      Seq("London", "Tokyo", "Moscow"))
  }

  test("sort by name, age desc (DataFrameTests.kt:313-328)") {
    val cities = person
      .sortByKeys(SortKey("name"), SortKey("age", desc = true))
      .select("city").collect().map(r => Option(r.getString(0)))
    assert(cities.toSeq == Seq(None, Some("London"), Some("Dubai"),
      Some("Tokyo"), Some("Milan"), Some("Moscow"), Some("Moscow")))
  }

  test("sort nulls first / nulls last (DataFrameTests.kt:330-354)") {
    val first = person.sortByKeys(SortKey("city"))
      .select("city").collect().map(r => Option(r.getString(0)))
    assert(first.head.isEmpty && first.tail.flatten.toSeq ==
      Seq("Dubai", "London", "Milan", "Moscow", "Moscow", "Tokyo"))
    val last = person.sortByKeys(SortKey("city", nullsLast = true))
      .select("city").collect().map(r => Option(r.getString(0)))
    assert(last.last.isEmpty && last.init.flatten.toSeq ==
      Seq("Dubai", "London", "Milan", "Moscow", "Moscow", "Tokyo"))
  }

  test("update, conditional update, update at indices (DataFrameTests.kt:215-275)") {
    val doubled = person.setCol("age", col("age") * 2)
    assert(doubled.select(sum(col("age"))).head().getLong(0) ==
      2 * (15 + 45 + 20 + 40 + 30 + 20 + 30))
    val nulled = person.updateWhere("age",
      col("age") > 25, lit(null).cast(IntegerType))
    assert(nulled.filter(col("age").isNull).count() == 4)
    assert(nulled.filter(col("age").isNotNull).select(sum(col("age")))
      .head().getLong(0) == 15 + 20 + 20)
    // at(2, 4): positional rewrite hits exactly two rows
    val at = person.updateAt("age", Seq(2L, 4L), Seq.empty, lit(100))
    assert(at.filter(col("age") === 100).count() == 2)
  }

  test("dropNulls any/all semantics (DataFrameTests.kt:404-460)") {
    assert(person.dropNulls(Seq("weight"))
      .filter(col("weight").isNull).count() == 0)
    // null out Alice's weights, then:
    val filtered = person.updateWhere("weight",
      col("name") === "Alice", lit(null).cast(IntegerType))
    // whereAllNull: drop only rows where BOTH weight and city are null
    assert(filtered.dropNulls(Seq("weight", "city"),
      whereAllNull = true).count() == 6)
    // default any-null: keep rows where both present
    assert(filtered.dropNulls(Seq("weight", "city")).count() == 3)
    assert(filtered.dropNulls().count() == 3)
  }

  test("nullToZero (DataFrameTests.kt:277-300)") {
    val w = person.nullToZero(Seq("weight"))
      .sortByKeys(SortKey("name"), SortKey("age"))
      .select("weight").collect().map(_.getInt(0))
    assert(w.sorted.toSeq == Seq(0, 0, 54, 55, 68, 87, 90))
  }

  test("distinct and distinctBy (DataFrameTests.kt:871-886)") {
    assert(person.select("name", "city").distinct().count() == 6)
    assert(person.distinctByFirst(Seq("name"), byNameAge).count() == 3)
    assert(person.distinctByFirst(Seq("name", "city"), byNameAge).count() == 6)
    // distinctByExpr { age / 10 } → 4; { city?.get(0) } → 5
    assert(person.withColumn("__k", (col("age") / 10).cast(IntegerType))
      .distinctByFirst(Seq("__k"), byNameAge).count() == 4)
    assert(person.withColumn("__k", substring(col("city"), 1, 1))
      .distinctByFirst(Seq("__k"), byNameAge).count() == 5)
  }

  test("append row with nulls widens nullability (DataFrameTests.kt:888-902)") {
    val s = spark
    import s.implicits._
    val extra = Seq(("Bob", Option.empty[Int], Option("Paris"),
      Option.empty[Int])).toDF("name", "age", "city", "weight")
    val res = person.appendRows(extra)
    assert(res.count() == 8)
    val bob = res.filter(col("city") === "Paris").head()
    assert(bob.getString(0) == "Bob" && bob.isNullAt(1) && bob.isNullAt(3))
  }

  test("rename keeps order and drops old names (DataFrameTests.kt:904-916)") {
    val r = person.renameInto("name" -> "name2", "age" -> "age2")
    assert(r.columns.toSeq == Seq("name2", "age2", "city", "weight"))
  }

  test("nunique (DataFrameTests.kt:926-929)") {
    assert(person.select(count_distinct(col("name"))).head().getLong(0) == 3)
  }

  test("pivot matches boolean matrix (DataFrameTests.kt:938-953)") {
    val m = person.selectNames(Seq("name", "city"))
      .pivotMatches(Seq("name"), "city",
        Seq("London", "Dubai", "Moscow", "Milan", "Tokyo"))
      .orderBy("name").collect()
    def cell(row: Int, c: Int) = m(row).getBoolean(c)
    assert(cell(0, 1) && !cell(0, 2))   // Alice: London yes, Dubai no
    assert(cell(1, 2) && cell(1, 5))    // Bob: Dubai, Tokyo
    assert(cell(2, 3) && cell(2, 4))    // Mark: Moscow, Milan
    assert(!cell(2, 1))                 // Mark not London
  }

  test("merge rows keeps nulls by default, drops on request (DataFrameTests.kt:1033-1060)") {
    val kept = person.selectNames(Seq("name", "city")).mergeRows(Seq("city"))
      .orderBy("name").collect()
    val cities = kept.map(_.getSeq[String](1))
    assert(cities(0).length == 2 && cities(0).contains(null)) // Alice
    assert(cities(1).toSet == Set("Dubai", "Tokyo"))
    assert(cities(2).sorted.toSeq == Seq("Milan", "Moscow", "Moscow"))
    val dropped = person.selectNames(Seq("name", "city"))
      .mergeRows(Seq("city"), dropNulls = true).orderBy("name").collect()
    assert(dropped(0).getSeq[String](1).toSeq == Seq("London"))
  }

  test("chunked(2) yields 4 chunks (DataFrameTests.kt:206-213)") {
    val chunks = person.chunked(2, byNameAge)
      .select(count_distinct(col("chunk"))).head().getLong(0)
    assert(chunks == 4)
  }

  test("min, nullable max, nullable minBy (DataFrameTests.kt:680-748)") {
    assert(person.select(min(col("age"))).head().getInt(0) == 15)
    assert(person.select(max(col("weight"))).head().getInt(0) == 90)
    // reference drops nulls before minBy (DataFrameTests.kt:723)
    val lightest = person.dropNulls(Seq("weight"))
      .minByRow(Seq.empty, "weight").select("name", "weight").head()
    assert(lightest.getString(0) == "Alice" && lightest.getInt(1) == 54)
  }
}
