package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Third degenerate-shape sweep (after EmptyInputSpec's 0-row and
  * all-null shapes): HOT-KEY SKEW — one key holding ~99% of rows, the
  * shape a 100 TB corpus actually arrives in (one mega-user in events,
  * one boilerplate page mirrored across a crawl, one hot join key).
  * Every registered query must either produce a frame or throw a
  * DOCUMENTED guard (a named require/IllegalState — e.g. adamicAdar's
  * hub cap firing IS the correct behavior here); never an opaque crash
  * or an OOM. The documented serial bounds (RFM's largest-tie-class
  * window task, sessionize's per-entity partitions) are expected to go
  * SLOW, not fail — which is exactly what this sweep pins.
  *
  * Skew construction (deterministic, pmod(id, 100) != 0 → the hot 99%):
  *  - events: user_id → one hot user
  *  - documents: text/lang/source → one identical document (hot content
  *    key, hot shingle set, hot LSH buckets, hot source)
  *  - embeddings: embedding/label → one identical vector (hot ANN cell,
  *    hot hyperplane bucket, zero-distance ties)
  *  - orders: o_custkey → one hot customer (skewed FK)
  *  - lineitem: l_orderkey/l_partkey/l_suppkey → one hot key each
  *    (skewed join keys; (orderkey, linenumber) collisions included —
  *    dedup machinery must absorb them)
  *  - customer: c_nationkey/c_mktsegment → one hot group
  *  - region/nation/supplier/part: copied as-is (bounded dims)
  */
class SkewInputSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val skewDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skew_sf").toString
    val src = "/root/testdata/sf0.001"
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def hot(id: org.apache.spark.sql.Column) = pmod(id, lit(100L)) =!= 0L

    Seq("region", "nation", "supplier", "part").foreach { t =>
      load(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    load("events").select(col("event_id"), col("ts"),
        when(hot(col("event_id")), lit(1L)).otherwise(col("user_id"))
          .as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    load("documents").select(col("doc_id"),
        when(hot(col("doc_id")),
          lit("the quick brown fox jumps over the lazy dog again and " +
            "again in the one page every mirror of this crawl serves"))
          .otherwise(col("text")).as("text"),
        when(hot(col("doc_id")), lit("en")).otherwise(col("lang"))
          .as("lang"),
        when(hot(col("doc_id")), lit("web")).otherwise(col("source"))
          .as("source"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = load("embeddings")
    val hotVec = emb.orderBy("vec_id").limit(1)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    emb.select(col("vec_id"),
        when(hot(col("vec_id")), lit(hotVec)).otherwise(col("embedding"))
          .as("embedding"),
        when(hot(col("vec_id")), lit(0)).otherwise(col("label"))
          .as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    load("orders").select(col("o_orderkey"),
        when(hot(col("o_orderkey")), lit(1L)).otherwise(col("o_custkey"))
          .as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = load("lineitem")
    li.select((Seq(
        when(hot(col("l_linenumber") + col("l_orderkey")), lit(1L))
          .otherwise(col("l_orderkey")).as("l_orderkey"),
        when(hot(col("l_orderkey")), lit(1L)).otherwise(col("l_partkey"))
          .as("l_partkey"),
        when(hot(col("l_orderkey")), lit(1L)).otherwise(col("l_suppkey"))
          .as("l_suppkey")) ++
        li.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey"))
          .map(col)).toSeq: _*)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    load("customer").select(col("c_custkey"), col("c_name"),
        when(hot(col("c_custkey")), lit(0)).otherwise(col("c_nationkey"))
          .as("c_nationkey"),
        col("c_acctbal"),
        when(hot(col("c_custkey")), lit("BUILDING"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("every registered query survives 99%-one-key skew (result or " +
      "documented guard, never an opaque crash)") {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, skewDir).collect() // force full execution
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
      s"opaque skew-input failures (${opaque.size}):\n" +
        opaque.mkString("\n"))
  }
}
