package graft

import org.scalatest.funsuite.AnyFunSuite

/** Robustness contract for the 100 TB reality that any filter can leave
  * a table (or every partition of it) EMPTY: every registered query,
  * run against 0-row copies of all ten tables, must either produce a
  * frame (possibly empty, possibly one row of zeros/nulls — both fine)
  * or throw a DOCUMENTED guard (`require`/explicit IllegalState with a
  * message naming the operator). What must never happen is an opaque
  * crash — NoSuchElementException from a blind head(), a
  * NullPointerException, a divide-by-zero — because at scale that
  * surfaces as an executor stack trace with no operator name on it. */
class EmptyInputSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_sf").toString
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, dir).collect() // force full execution
      } catch {
        case e: IllegalArgumentException if e.getMessage != null => // guard
        case e: IllegalStateException if e.getMessage != null =>    // guard
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          opaque += s"$name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(160)}"
      }
    }
    assert(opaque.isEmpty,
      s"opaque $label failures (${opaque.size}):\n" + opaque.mkString("\n"))
  }

  test("every registered query survives empty tables (result or " +
      "documented guard, never an opaque crash)") {
    sweep(emptyDir, "empty-input")
  }

  /** The other degenerate shape: rows EXIST but every non-key value is
    * null (a bad upstream export, a schema-drifted source). Key/id
    * columns stay populated so per-key machinery engages. */
  private lazy val nullDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_null_sf").toString
    val src = "/root/testdata/sf0.001"
    val keep: Map[String, Set[String]] = Map(
      "region" -> Set("r_regionkey"),
      "nation" -> Set("n_nationkey", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey"),
      "orders" -> Set("o_orderkey", "o_custkey"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber"),
      "events" -> Set("event_id", "user_id"),
      "documents" -> Set("doc_id"),
      "embeddings" -> Set("vec_id"))
    keep.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet").limit(20)
      val nulled = df.select(df.schema.fields.map { f =>
        if (keys(f.name)) org.apache.spark.sql.functions.col(f.name)
        else org.apache.spark.sql.functions.lit(null)
          .cast(f.dataType).as(f.name)
      }.toSeq: _*)
      nulled.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query survives all-null value columns " +
      "(result or documented guard, never an opaque crash)") {
    sweep(nullDir, "all-null-input")
  }
}
