package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SchemaOps
import graft.ops.RowOps._
import graft.ops.Surgery._
import graft.ops.Agg._
import graft.ops.Selection._

/** Ports of the reference's nested-column battery
  * (`person/DataFrameTreeTests.kt`) over its own fixture: person with
  * name+city grouped under the `nameAndCity` ColumnGroup
  * (`DataFrameTreeTests.kt:104`). */
class TreeParitySpec extends AnyFunSuite {
  import SparkFixture._

  private def df2 = SchemaOps.nest(person, Seq("name", "city"), "nameAndCity")

  test("nest puts name+city under a struct, preserving position") {
    assert(df2.columns.toSeq == Seq("nameAndCity", "age", "weight"))
    assert(df2.schema("nameAndCity").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("name", "city"))
  }

  test("filter by nested field (DataFrameTreeTests.kt:222-228)") {
    val viaTree = df2.filterRows(col("nameAndCity.city").isNull)
      .selectNames(Seq("weight")).collect()
    val viaFlat = person.filterRows(col("city").isNull)
      .selectNames(Seq("weight")).collect()
    assert(viaTree.map(_.getInt(0)).toSeq == viaFlat.map(_.getInt(0)).toSeq)
  }

  test("select nested field alongside top-level (DataFrameTreeTests.kt:230-235)") {
    val res = df2.select(col("nameAndCity.name").as("name"), col("age"))
      .orderBy("name", "age").collect()
    val exp = person.select(col("name"), col("age"))
      .orderBy("name", "age").collect()
    assert(res.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      exp.map(r => (r.getString(0), r.getInt(1))).toSeq)
  }

  test("sort by nested key then ungroup matches flat sort (DataFrameTreeTests.kt:237-241)") {
    val sorted = df2
      .orderBy(col("nameAndCity.name"), col("age"))
    val cities = SchemaOps.flatten(sorted).select("nameAndCity_city")
      .collect().map(r => Option(r.getString(0)))
    val expected = person.sortByKeys(SortKey("name"), SortKey("age"))
      .select("city").collect().map(r => Option(r.getString(0)))
    assert(cities.toSeq == expected.toSeq)
  }

  test("groupBy a nested key (DataFrameTreeTests.kt:251-256)") {
    val g = df2.groupAgg(Seq("nameAndCity.name"),
        Seq(max(col("age")).as("age")))
      .orderBy("name").collect()
    assert(g.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("Alice", 20), ("Bob", 45), ("Mark", 40)))
  }

  test("move a field out of the group (DataFrameTreeTests.kt:243-249)") {
    val moved = df2
      .addCols("name" -> col("nameAndCity.name"))
      .removeCols(Seq("nameAndCity.name"))
    assert(moved.columns.contains("name"))
    assert(moved.schema("nameAndCity").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("city"))
  }

  test("distinct collapses a doubled nested frame (DataFrameTreeTests.kt:258-262)") {
    assert(df2.appendRows(df2).distinct().count() == 7)
  }

  test("flatten round-trips the nesting (flatten.kt:9-31)") {
    val flat = SchemaOps.flatten(df2)
    assert(flat.columns.toSeq ==
      Seq("nameAndCity_name", "nameAndCity_city", "age", "weight"))
    assert(flat.count() == 7)
    val un = SchemaOps.unnest(df2, "nameAndCity")
    assert(un.columns.toSeq == Seq("name", "city", "age", "weight"))
  }
}
