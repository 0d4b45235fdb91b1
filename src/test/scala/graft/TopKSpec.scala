package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftExtensions

/** The custom TopKPerGroup plan (LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions): equivalence vs the window formulation and
  * plan-shape checks. */
class TopKSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val scored = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.orders.select(col("o_orderstatus"), col("o_orderkey"),
      col("o_totalprice"))
  }

  test("heap top-k matches window row_number top-k") {
    val k = 7
    val heap = GraftExtensions.topKPerGroup(scored,
        Seq("o_orderstatus"), "o_totalprice", k)
      .select("o_orderstatus", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("o_orderstatus", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // ties: both keep k rows; compare via score sets per group instead of
    // ids when prices tie — prices are doubles, ties effectively absent
    assert(heap == win)
  }

  test("plan contains the custom exec node and a single hash exchange") {
    val df = GraftExtensions.topKPerGroup(scored,
      Seq("o_orderstatus"), "o_totalprice", 3)
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix in plan display
    assert(plan.contains("TopKPerGroup"), plan.take(800))
    assert(plan.contains("hashpartitioning(o_orderstatus"), plan.take(800))
  }

  test("k larger than any group returns everything") {
    val df = GraftExtensions.topKPerGroup(scored,
      Seq("o_orderstatus"), "o_totalprice", 1000000)
    assert(df.count() == scored.count())
  }
}
