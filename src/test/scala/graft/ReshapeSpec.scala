package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Reshape._
import graft.ops.Selection._
import graft.core.TypeWidening

class ReshapeSpec extends AnyFunSuite {
  import SparkFixture._

  test("pivotAgg: explicit values give deterministic columns") {
    val res = person.pivotAgg(Seq("name"), "city",
      Seq("London", "Moscow", "Tokyo"), Seq(count(lit(1))))
    assert(res.columns.toSeq == Seq("name", "London", "Moscow", "Tokyo"))
    val mark = res.filter(col("name") === "Mark").head()
    assert(mark.getLong(2) == 2) // Mark in Moscow twice
  }

  test("pivotAgg default back-fills holes") {
    val res = person.pivotAgg(Seq("name"), "city",
      Seq("London", "Dubai"), Seq(count(lit(1))), default = Some(0L))
    val mark = res.filter(col("name") === "Mark").head()
    assert(mark.getLong(1) == 0L && mark.getLong(2) == 0L)
  }

  test("pivotMatches: boolean presence matrix, holes are false") {
    val res = person.pivotMatches(Seq("name"), "city", Seq("London", "Dubai"))
    val alice = res.filter(col("name") === "Alice").head()
    assert(alice.getBoolean(1) && !alice.getBoolean(2))
  }

  test("gather melts columns to key/value with widening") {
    val res = person.selectNames(Seq("name", "age", "weight"))
      .gather(Seq("age", "weight"), "key", "value")
    assert(res.columns.toSeq == Seq("name", "key", "value"))
    assert(res.count() == 12) // 14 cells minus 2 null weights (dropNulls)
    val kept = person.selectNames(Seq("name", "age", "weight"))
      .gather(Seq("age", "weight"), dropNulls = false)
    assert(kept.count() == 14)
  }

  test("gather guards empty selection and name clashes") {
    intercept[IllegalArgumentException] { person.gather(Nil) }
    intercept[IllegalArgumentException] {
      person.gather(Seq("age"), keyName = "city")
    }
  }

  test("gather explodes Many (array) cells per element, like the reference") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Seq("a", "b"), Seq("x"))).toDF("id", "l1", "l2")
    val g = df.gather(Seq("l1", "l2"))
    assert(g.schema("value").dataType == StringType)
    val rows = g.orderBy("key", "value").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("l1", "a"), ("l1", "b"), ("l2", "x")))
    // keep-arrays escape hatch
    val kept = df.gather(Seq("l1", "l2"), explodeMany = false)
    assert(kept.schema("value").dataType.isInstanceOf[ArrayType])
    assert(kept.count() == 2)
  }

  test("pivot matches then gather-true round-trips the source (DataFrameTests.kt:966-975)") {
    import graft.ops.RowOps._
    val filtered = person.dropNulls(Seq("city"))
      .withColumn("city", lower(col("city")))
    val cities = Seq("london", "dubai", "moscow", "milan", "tokyo")
    val matrix = filtered.pivotMatches(Seq("name", "age"), "city", cities)
    val gathered = matrix.gather(cities, keyName = "city",
        where = Some(v => v === true))
      .drop("value")
      .orderBy("name", "age").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val expected = filtered.select("name", "age", "city")
      .orderBy("name", "age").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(gathered.toSeq == expected.toSeq)
  }

  test("gather ColumnGroups from nested JSON then ungroup (reference GatherTests.kt)") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_gather_json")
    val json =
      """{"name":"abc","normal":{"c1":"a","c2":"b","c3":"c"},"reversed":{"c1":"c","c2":"b","c3":"a"},"first":{"c1":"c"}}
        |{"name":"qw","normal":{"c1":"q","c2":"w"},"reversed":{"c1":"w","c2":"q"},"first":{"c1":"q"}}""".stripMargin
    java.nio.file.Files.writeString(tmp.resolve("d.json"), json)
    val df = graft.sources.IO.readJson(s, tmp.toString)
    // struct schemas differ (first has only c1) — widening null-fills
    val g = graft.core.SchemaOps.unnest(
      df.gather(Seq("normal", "reversed", "first"), keyName = "mode"),
      "value")
    val rows = g.orderBy("name", "mode")
      .select("name", "mode", "c1", "c2", "c3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
    assert(rows.toSeq == Seq(
      ("abc", "first", "c", None, None),
      ("abc", "normal", "a", Some("b"), Some("c")),
      ("abc", "reversed", "c", Some("b"), Some("a")),
      ("qw", "first", "q", None, None),
      ("qw", "normal", "q", Some("w"), None),
      ("qw", "reversed", "w", Some("q"), None)))
  }

  test("gather over struct columns emits struct value cells, widening unequal fields") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 10, "x", 2.5)).toDF("id", "a1", "a2", "b1")
      .select(col("id"),
        struct(col("a1").as("n"), col("a2").as("tag")).as("ga"),
        struct(col("b1").as("n")).as("gb"))
    val g = df.gather(Seq("ga", "gb"))
    val vt = g.schema("value").dataType.asInstanceOf[StructType]
    // widened value struct: n widens int∪double→double, tag nullable
    assert(vt.fieldNames.toSeq == Seq("n", "tag"))
    assert(vt("n").dataType == DoubleType)
    val rows = g.orderBy("key").select("key", "value.n", "value.tag").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ga", "gb"))
    assert(rows(0).getDouble(1) == 10.0 && rows(0).getString(2) == "x")
    assert(rows(1).getDouble(1) == 2.5 && rows(1).isNullAt(2))
  }

  test("pivotAggNested emits value.{aggs} structs; groupByValue flips to agg.{values}") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", "A", 1.0), ("x", "B", 2.0), ("y", "A", 4.0))
      .toDF("g", "k", "v")
    val sep = df.pivotAggNested(Seq("g"), "k", Seq("A", "B"),
      Seq("total" -> sum(col("v")), "cnt" -> count(lit(1))),
      default = Some(0))
    assert(sep.columns.toSeq == Seq("g", "A", "B"))
    assert(sep.schema("A").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("total", "cnt"))
    val y = sep.filter(col("g") === "y").select("B.total", "B.cnt").head()
    assert(y.getDouble(0) == 0.0 && y.getLong(1) == 0L) // default-filled hole
    val gbv = df.pivotAggNested(Seq("g"), "k", Seq("A", "B"),
      Seq("total" -> sum(col("v")), "cnt" -> count(lit(1))),
      groupByValue = true)
    assert(gbv.columns.toSeq == Seq("g", "total", "cnt"))
    assert(gbv.schema("total").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("A", "B"))
    assert(gbv.filter(col("g") === "x").select("total.B").head().getDouble(0) == 2.0)
  }

  test("splitInto pads ragged splits with null") {
    val s = spark
    import s.implicits._
    val df = Seq("a-b-c", "x").toDF("v")
    val res = df.splitInto("v", "-", 3).orderBy("v")
    val rows = res.collect()
    assert(rows(0).getString(1) == "a" && rows(0).getString(3) == "c")
    assert(rows(1).getString(1) == "x" && rows(1).isNullAt(2))
  }

  test("splitIntoBy takes any array expression, auto-sizes via max-size scan") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c", "x y").toDF("v")
    // custom splitter: uppercased words; width discovered from the data
    val res = df.splitIntoBy("v", c => transform(split(c, " "), w => upper(w)))
      .orderBy("v").collect()
    assert(res(0).length == 4, "expected auto-width 3")
    assert(res(0).getString(1) == "A" && res(0).getString(3) == "C")
    assert(res(1).getString(2) == "Y" && res(1).isNullAt(3))
    // explicit n skips the scan and pads/truncates to that width
    val fixed = df.splitIntoBy("v", c => split(c, " "), n = 2,
      names = Seq("p1", "p2"))
    assert(fixed.columns.toSeq == Seq("v", "p1", "p2"))
  }

  test("splitIntoRows explodes tokens") {
    val s = spark
    import s.implicits._
    val res = Seq("a b", "c").toDF("v").splitIntoRows("v", " ", "tok")
    assert(res.count() == 3)
  }

  test("merge into array/string/struct") {
    val arr = person.mergeIntoArray(Seq("age", "weight"), "vals")
    assert(arr.schema("vals").dataType == ArrayType(IntegerType, true))
    assert(!arr.columns.contains("age"))
    val str = person.mergeIntoString(Seq("name", "city"), "-", "tag")
    assert(str.filter(col("tag") === "Alice-London").count() == 1)
    val st = person.mergeIntoStruct(Seq("age", "weight"), "aw")
    assert(st.schema("aw").dataType.isInstanceOf[StructType])
  }

  test("mergeRows keeps nulls by default (reference mergeRows.kt)") {
    val res = person.selectNames(Seq("name", "weight")).mergeRows(Seq("weight"))
      .orderBy("name").collect()
    // Mark: weights null, null, 90 → nulls kept, sorted nulls-first
    val mark = res(2).getSeq[Any](1)
    assert(mark.size == 3 && mark.count(_ == null) == 2)
    val dropped = person.selectNames(Seq("name", "weight"))
      .mergeRows(Seq("weight"), dropNulls = true).orderBy("name").collect()
    assert(dropped(2).getSeq[Any](1) == Seq(90))
  }

  test("explodeLockstep pads shorter arrays with null, null cells too") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Seq("x", "y", "z"), Option(Seq(7, 8))),
      (2, Seq("p"), Option.empty[Seq[Int]])
    ).toDF("id", "a", "b")
    val res = df.explodeLockstep(Seq("a", "b")).orderBy("id", "a").collect()
    assert(res.length == 4)
    assert(res(2).isNullAt(2))       // (1, z, null)
    assert(res(3).getString(1) == "p" && res(3).isNullAt(2))
  }

  test("explodeLockstep dropEmpty=false keeps all-empty rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Seq.empty[String])).toDF("id", "a")
    assert(df.explodeLockstep(Seq("a")).count() == 0)
    assert(df.explodeLockstep(Seq("a"), dropEmpty = false).count() == 1)
  }

  test("unionWide aligns by name, widens types, null-fills") {
    val s = spark
    import s.implicits._
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((2L, 1.5)).toDF("k", "extra")
    val u = TypeWidening.unionByNameWide(Seq(a, b))
    assert(u.schema("k").dataType == LongType)
    assert(u.columns.toSeq == Seq("k", "v", "extra"))
    assert(u.count() == 2)
    assert(u.filter(col("v").isNull).count() == 1)
  }

  test("unionWide rebuilds divergent structs instead of casting") {
    val s = spark
    import s.implicits._
    val a = Seq((1, ("x", 1))).toDF("id", "s")
    val b = s.range(1).select(col("id").cast("int"),
      struct(lit(2.5).as("_2"), lit("w").as("_3")).as("s"))
    val u = TypeWidening.unionByNameWide(Seq(a, b))
    val f = u.schema("s").dataType.asInstanceOf[StructType]
    assert(f.fieldNames.toSeq == Seq("_1", "_2", "_3"))
    assert(u.count() == 2)
  }

  test("transposeRow: single row to (name, value)") {
    val res = person.limit(1).transposeRow()
    assert(res.columns.toSeq == Seq("name", "value"))
    assert(res.count() == 4)
  }
}
