package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RowOps._

class RowOpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("filterRows / dropRows partition the frame") {
    assert(person.filterRows(col("age") > 25).count() == 4)
    assert(person.dropRows(col("age") > 25).count() == 3)
  }

  test("dropRows keeps rows where the predicate is null (not dropped)") {
    // city == "Moscow" is null for Alice's null city → kept by drop
    assert(person.dropRows(col("city") === "Moscow").count() == 5)
  }

  test("dropNulls any/all") {
    assert(person.dropNulls(Seq("city", "weight")).count() == 4)
    assert(person.dropNulls(Seq("city", "weight"), whereAllNull = true).count() == 7)
  }

  test("dropNa drops NaN as well as null") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    assert(df.dropNa(Seq("x")).count() == 2)
  }

  test("distinctByFirst keeps first row per key by explicit order") {
    val res = person.distinctByFirst(Seq("name"), Seq(col("age")))
    assert(res.count() == 3)
    assert(res.filter(col("name") === "Mark").head().getInt(1) == 20)
  }

  test("updateWhere keeps original where predicate fails") {
    val res = person.updateWhere("age", col("name") === "Alice", lit(99))
    assert(res.filter(col("age") === 99).count() == 2)
    assert(res.filter(col("name") === "Bob" && col("age") === 45).count() == 1)
  }

  test("fillNullsWith / nullToZero") {
    val res = person.fillNullsWith("weight", lit(-1))
    assert(res.filter(col("weight") === -1).count() == 2)
    val z = person.nullToZero(Seq("weight"))
    assert(z.filter(col("weight") === 0).count() == 2)
  }

  test("betweenRows inclusive and strict") {
    assert(person.betweenRows("age", 20, 30).count() == 4)
    assert(person.betweenRows("age", 20, 30, includeBoundaries = false).count() == 0)
  }

  test("digitize assigns numpy-style bin indices") {
    val res = person.digitize("age", Seq(20.0, 30.0, 40.0))
    val byAge = res.select("age", "bin").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(byAge(15) == 0 && byAge(20) == 1 && byAge(30) == 2 &&
      byAge(40) == 3 && byAge(45) == 3)
    val right = person.digitize("age", Seq(20.0, 30.0, 40.0), right = true)
    assert(right.select("age", "bin").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap.apply(20) == 0)
  }

  test("sortByKeys honors desc and nullsLast per key") {
    val res = person.sortByKeys(SortKey("city", desc = false, nullsLast = true),
      SortKey("age", desc = true)).collect()
    assert(res.last.isNullAt(2)) // null city last
    assert(res.head.getString(2) == "Dubai")
  }

  test("addRowNumber: contiguous 0-based ids, no Window in plan") {
    val res = person.addRowNumber(Seq(col("age"), col("name")))
    val ids = res.select("row_number").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 7L))
    assert(!res.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("chunked assigns floor(rowNumber/size)") {
    val res = person.chunked(3, Seq(col("age"), col("name")))
    val counts = res.groupBy("chunk").count().orderBy("chunk").collect()
    assert(counts.map(_.getLong(1)).toSeq == Seq(3L, 3L, 1L))
  }

  test("duplicateRows replicates every row n times") {
    assert(person.duplicateRows(3).count() == 21)
  }

  test("shuffled is a permutation") {
    val res = person.shuffled()
    assert(res.count() == 7)
    assert(res.select(sum(col("age"))).head().getLong(0) == 200L)
  }

  test("appendRows unions with widening") {
    val s = spark
    import s.implicits._
    val extra = Seq(("Zoe", 99L)).toDF("name", "age") // long vs int age
    val res = person.appendRows(extra)
    assert(res.count() == 8)
    assert(res.schema("age").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("packSequences: greedy contiguous packs close after crossing capacity") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 300L), (4L, 100L),
      (5L, 500L)).toDF("doc_id", "n_tok")
    // shards=2: shard1 = ids 1,3,5 (pre 0,300,600 → bins 0,0,1);
    //           shard0 = ids 2,4   (pre 0,300   → bins 0,0)
    val got = docs.packSequences("doc_id", "n_tok", capacity = 512L,
        shards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 3L, 2L -> 0L, 4L -> 0L))
    // law: a pack's pre-sum window spans < capacity before its last doc
    val one = docs.packSequences("doc_id", "n_tok", 512L, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}
