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

  test("every registered query survives empty tables (result or " +
      "documented guard, never an opaque crash)") {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect() // force full execution
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
      s"opaque empty-input failures (${opaque.size}):\n" +
        opaque.mkString("\n"))
  }
}
