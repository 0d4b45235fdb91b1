package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Surgery._
import graft.core.SchemaOps
import graft.sources.IO

class SurgeryIOSpec extends AnyFunSuite {
  import SparkFixture._

  test("renameInto") {
    val res = person.renameInto("name" -> "who", "age" -> "years")
    assert(res.columns.toSeq == Seq("who", "years", "city", "weight"))
  }

  test("removeCols drops top-level and nested fields, prunes empty groups") {
    val nested = SchemaOps.nest(person, Seq("city", "weight"), "info")
    val res = nested.removeCols(Seq("info.weight"))
    val f = res.schema("info").dataType.asInstanceOf[StructType]
    assert(f.fieldNames.toSeq == Seq("city"))
    // removing the last field drops the group entirely
    val gone = res.removeCols(Seq("info.city"))
    assert(!gone.columns.contains("info"))
  }

  test("nest/unnest/flatten round-trip with clash handling") {
    val nested = SchemaOps.nest(person, Seq("city", "weight"), "info")
    assert(nested.columns.toSeq == Seq("name", "age", "info"))
    val un = SchemaOps.unnest(nested, "info")
    assert(un.columns.toSeq == Seq("name", "age", "city", "weight"))
    val flat = SchemaOps.flatten(nested)
    assert(flat.columns.toSeq == Seq("name", "age", "info_city", "info_weight"))
  }

  test("move and insertAt control column position") {
    val moved = SchemaOps.move(person, Seq("weight"), 0)
    assert(moved.columns.head == "weight")
    val ins = SchemaOps.insertAt(person, "x", lit(1), 2)
    assert(ins.columns.toSeq == Seq("name", "age", "x", "city", "weight"))
  }

  test("convert matrix: numbers, strings, lenient bool, epoch") {
    val s = spark
    import s.implicits._
    val df = Seq(("1", "YES", 1700000000000L)).toDF("n", "b", "e")
    val res = df.convertTo("n", IntegerType).convertToBoolean("b")
      .epochMillisToTimestamp("e")
    val row = res.head()
    assert(row.getInt(0) == 1 && row.getBoolean(1))
    assert(res.schema("e").dataType == TimestampType)
  }

  test("parseCascade picks long/double/bool/date and leaves mixed as string") {
    val s = spark
    import s.implicits._
    assert(Seq("1", "2").toDF("v").parseCascade("v").schema("v").dataType == LongType)
    assert(Seq("1.5", "2").toDF("v").parseCascade("v").schema("v").dataType == DoubleType)
    assert(Seq("YES", "no").toDF("v").parseCascade("v").schema("v").dataType == BooleanType)
    assert(Seq("2024-01-01").toDF("v").parseCascade("v").schema("v").dataType == DateType)
    assert(Seq("abc", "1").toDF("v").parseCascade("v").schema("v").dataType == StringType)
  }

  test("parseCascade survives a non-conforming value past the sample (try_cast)") {
    val s = spark
    import s.implicits._
    // 5-row sample sees only numerics; "abc" sits beyond it — must become
    // a null cell, not an ANSI cast failure of the whole job
    val vals = (1 to 5).map(_.toString) :+ "abc"
    val out = vals.toDF("v").coalesce(1).parseCascade("v", sampleRows = 5)
    assert(out.schema("v").dataType == LongType)
    val got = out.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.count(_.isEmpty) == 1 && got.flatten.sum == 15)
  }

  test("slicing: takeRows/takeLastRows/rowsAt/firstRow/singleRow") {
    assert(person.takeRows(3).count() == 3)
    val last2 = person.takeLastRows(2, Seq(col("age")))
    assert(last2.collect().map(_.getInt(1)).toSeq == Seq(40, 45))
    val at = person.rowsAt(Seq(0L, 6L), Seq(col("age"), col("name")))
    assert(at.count() == 2)
    assert(person.firstRow(Some(col("age") === 45)).getString(0) == "Bob")
    intercept[IllegalArgumentException] {
      person.singleRow(Some(col("name") === "Mark"))
    }
  }

  test("replaceAllValues substitutes across string columns") {
    val res = person.replaceAllValues(Map("Moscow" -> "MOW"), Seq("city"))
    assert(res.filter(col("city") === "MOW").count() == 2)
  }

  test("CSV round-trip: null-string set + type inference cascade") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val path = tmp + "/t.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "id,name,score\n1,alice,3.5\n2,NA,4.0\n3,bob,N/A\n")
    val df = IO.readDelim(s, path)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.filter(col("name").isNull).count() == 1)
    assert(df.filter(col("score").isNull).count() == 1)
    IO.writeCSV(df, tmp + "/out", singleFile = true)
    assert(IO.readCSV(s, tmp + "/out").count() == 3)
  }

  test("read() sniffs format by extension") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_sniff").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp + "/d.json"),
      """{"a": 1, "b": {"c": "x"}}""" + "\n")
    val df = IO.read(s, tmp + "/d.json")
    assert(df.schema("b").dataType.isInstanceOf[StructType]) // nested inference
  }

  test("fileStats manifest prunes files; pruned scan equals full filter") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stats_spec").toString + "/t"
    // two partitions × sorted key runs split at 25 rows/file → every
    // file covers a narrow, known key envelope
    val df = (0 until 200)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i % 7))
      .toDF("k", "p", "pay")
    IO.writePartitioned(df, tmp, partitionCols = Seq("p"),
      sortCols = Seq("k"), maxRecordsPerFile = 25L)
    val manifest = IO.fileStats(s, tmp, Seq("k"))
    val nFiles = manifest.count()
    assert(nFiles >= 8, s"expected >= 8 files, got $nFiles") // 2 × 100/25
    // narrow range: result identical to the full-scan filter...
    val pruned = IO.statsPrunedRead(s, tmp, manifest, "k", lit(40L), lit(59L))
    val full = s.read.parquet(tmp).filter(col("k").between(40L, 59L))
    assert(pruned.select("k", "p", "pay").except(full.select("k", "p", "pay"))
      .isEmpty && full.select("k", "p", "pay")
      .except(pruned.select("k", "p", "pay")).isEmpty)
    assert(pruned.count() == 20)
    // ...while actually touching fewer files than the table holds
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched < nFiles, s"no pruning: $touched of $nFiles files")
    // hive partition column survives the leaf-file read (basePath)
    assert(pruned.columns.contains("p"))
    // range beyond every envelope → zero files kept, empty result
    assert(IO.statsPrunedRead(s, tmp, manifest, "k",
      lit(10000L), lit(20000L)).isEmpty)
  }

  test("writeShards: deterministic assignment, every shard populated, " +
      "rows hash-ordered inside each file, rerun byte-stable") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_shard_unit").toString + "/out"
    IO.writeShards(docs, tmp, "doc_id", nShards = 4, seed = 7L)
    val back = s.read.parquet(tmp)
    // lossless: every row lands exactly once
    assert(back.count() == docs.count())
    assert(back.select("doc_id").except(docs.select("doc_id")).isEmpty)
    // every shard populated; no shard hogs the corpus (SHA mixing —
    // binomial spread, not an affine stride)
    val counts = back.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3), counts)
    assert(counts.values.max < 3 * counts.values.min, counts)
    // inside each FILE the rows are ordered by the hash key (the
    // training loader's streaming-shuffle contract)
    val perFile = back
      .select(input_file_name().as("f"), col("shard_ord"))
      .collect().groupBy(_.getString(0))
      .map { case (_, rows) => rows.map(_.getLong(1)).toSeq }
    assert(perFile.nonEmpty &&
      perFile.forall(o => o == o.sorted), "in-file order violated")
    // rerun reproduces the identical assignment (seeded determinism)
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft_shard_unit2").toString + "/out"
    IO.writeShards(docs, tmp2, "doc_id", nShards = 4, seed = 7L)
    val a1 = s.read.parquet(tmp).select("doc_id", "shard", "shard_ord")
    val a2 = s.read.parquet(tmp2).select("doc_id", "shard", "shard_ord")
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty)
    // a different seed is a different global shuffle
    val tmp3 = java.nio.file.Files
      .createTempDirectory("graft_shard_unit3").toString + "/out"
    IO.writeShards(docs, tmp3, "doc_id", nShards = 4, seed = 8L)
    val a3 = s.read.parquet(tmp3).select("doc_id", "shard", "shard_ord")
    assert(a1.except(a3).count() > 0)
  }

  test("dataFrameOf builders and display sinks") {
    val s = spark
    val df = IO.dataFrameOf(s, Seq("a", "b"), Seq(Seq(1, "x"), Seq(2, "y")))
    assert(df.schema("a").dataType == IntegerType)
    val byCols = IO.dataFrameOfColumns(s, Seq("a" -> Seq(1, 2), "b" -> Seq("x", "y")))
    assert(byCols.count() == 2)
    assert(IO.toHTML(df).contains("<td>x</td>"))
    assert(IO.renderToString(df).contains("a"))
    assert(IO.schemaString(df).contains("a"))
    val m = IO.toMap(df)
    assert(m("a") == Seq(1, 2))
  }
}
