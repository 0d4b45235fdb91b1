package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Agg._
import graft.sources.IO

/** Scale-mechanism tests: salted aggregation equivalence and bucketed
  * exchange-free joins. */
class ScaleSpec extends AnyFunSuite {
  import SparkFixture._

  test("sumForSalted equals plain groupBy sum (skew-safe two-phase)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val plain = t.lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("count"), sum(col("l_quantity")).as("l_quantity"))
      .orderBy("l_returnflag").collect()
    val salted = t.lineitem
      .sumForSalted(Seq("l_returnflag"), Seq("l_quantity"), 8)
      .orderBy("l_returnflag").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(p.getLong(1) == s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("bucketed tables join without an exchange") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS graft_bkt_a")
    s.sql("DROP TABLE IF EXISTS graft_bkt_b")
    // a previously-interrupted run can leave an orphan managed-table dir
    // with no catalog entry — saveAsTable then refuses the location
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    val t = Tables(s, "/root/testdata/sf0.001")
    IO.writeBucketed(t.orders.select("o_orderkey", "o_totalprice"),
      "graft_bkt_a", Seq("o_orderkey"), 4)
    IO.writeBucketed(t.orders.select("o_orderkey", "o_orderstatus"),
      "graft_bkt_b", Seq("o_orderkey"), 4)
    // small tables would broadcast (also exchange-free, but not the
    // mechanism under test) — force the shuffle-join path to show the
    // bucketed scans align without any hash-partition Exchange
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("graft_bkt_a")
        .join(s.table("graft_bkt_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(plan.contains("Bucketed: true"), plan.take(1500))
      assert(joined.count() == t.orders.count())
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup cache hygiene: no orphaned persisted RDDs after release") {
    val s = spark
    val docs = Tables(s, "/root/testdata/sf0.001").documents
    // track NEW persisted RDDs only: the fixture session is shared
    // across suites and the ContextCleaner may asynchronously drop other
    // specs' unmanaged caches mid-test, so counts are racy
    val beforeIds = s.sparkContext.getPersistentRDDs.keySet
    def newIds = s.sparkContext.getPersistentRDDs.keySet -- beforeIds
    // nearDupClusters releases its internal pairs/shingle/candidate caches
    // itself; only the materialized result frame stays, on the handle
    val handle = new graft.core.CacheHandle
    val clusters = graft.ops.Dedup.nearDupClusters(
      docs, "text", "doc_id", cache = handle)
    assert(clusters.count() > 0)
    assert(handle.size == 1, s"expected only the labels cache, got ${handle.size}")
    assert(newIds.size == 1,
      s"internal LSH caches leaked past nearDupClusters: $newIds")
    handle.release(blocking = true)
    assert(newIds.isEmpty, "handle.release() left persisted RDDs behind")
    // pairs path: caches live on the caller's handle, released explicitly
    val h2 = new graft.core.CacheHandle
    val pairs = graft.ops.Dedup.nearDupPairs(docs, "text", "doc_id", cache = h2)
    assert(pairs.count() >= 0 && h2.size == 2)
    h2.release(blocking = true)
    assert(newIds.isEmpty)
  }

  test("checkpointSmall caps squared size estimates (self-join loops stay flat)") {
    // join estimates MULTIPLY children's BigInt sizeInBytes, and
    // localCheckpoint copies the product into the new LogicalRDD — an
    // iterated self-join loop squares it per round until join-size
    // estimation alone costs minutes (BigInteger Toom-Cook on
    // million-bit estimates; measured ×2.5/round past ~17 rounds before
    // the cap). 22 rounds would reach ~2^(20·2^22) bits uncapped; the
    // cap keeps every round's estimate within one squaring of
    // Long.MaxValue.
    val s = spark
    import graft.core.CacheHandle
    var (labels, free) = CacheHandle.checkpointSmall(
      s.range(100).select(col("id").as("node"), col("id").as("label")))
    (1 to 22).foreach { _ =>
      val (next, f2) = CacheHandle.checkpointSmall(
        labels.join(labels.select(col("node").as("label"),
          col("label").as("ll")), Seq("label"), "left")
          .select(col("node"),
            coalesce(col("ll"), col("label")).as("label")))
      free(false); labels = next; free = f2
    }
    val bits =
      labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits <= 140, s"size estimate must stay capped, got $bits bits")
    assert(labels.count() == 100)
    free(false)
  }
}
