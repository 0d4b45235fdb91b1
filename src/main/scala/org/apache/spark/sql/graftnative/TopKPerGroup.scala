// Shim package (see NativeExpressions.scala) — needs private[sql] planner
// plumbing: Dataset.ofRows, ClusteredDistribution, UnsafeProjection.
package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator custom plan (the brief's option (c)): top-k rows per
  * group by a numeric score, executed as a bounded HEAP per group instead
  * of the window formulation's full per-partition sort. At 100 TB the
  * window plan sorts every scored candidate; this keeps k rows per group
  * in memory — O(n log k) time, O(groups·k) space, same one shuffle.
  *
  * Logical node + strategy registered through `SparkSessionExtensions`
  * (see [[GraftExtensions]], wired in graft.GraftSession).
  */
case class TopKPerGroup(groupCols: Seq[Expression], scoreCol: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "TopKPerGroup: k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}

case class TopKPerGroupExec(groupCols: Seq[Expression],
    scoreCol: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // one hash-shuffle on the group keys; heaps stay executor-local
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupCols
    val scoreExpr = scoreCol
    val schema = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, schema)
      val score = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(scoreExpr, schema)
      // per group: bounded min-heap keyed by score — eject the smallest
      // when over k, so what remains is the top-k by score desc
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[(Double, UnsafeRow)]]()
      val ord = Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
      iter.foreach { row =>
        val s = score.eval(row) match {
          case null          => Double.NegativeInfinity
          case d: Double     => d
          case f: Float      => f.toDouble
          case n: Number     => n.doubleValue()
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) {
          heap.enqueue((s, row.copy().asInstanceOf[UnsafeRow]))
        } else if (heap.head._1 < s) {
          heap.dequeue()
          heap.enqueue((s, row.copy().asInstanceOf[UnsafeRow]))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala
        .flatMap(h => h.dequeueAll.reverseIterator.map((p: (Double, UnsafeRow)) => p._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}

object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, score, k, child) =>
      TopKPerGroupExec(groups, score, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Registration + DataFrame-level entry point. */
object GraftExtensions {
  /** Wire into a session builder:
    * `.withExtensions(GraftExtensions.inject)` (done by
    * `graft.GraftSession.build`), or externally via
    * `spark.sql.extensions=org.apache.spark.sql.graftnative.GraftSqlExtensions`.
    * Injects the heap top-k planner strategy AND the SQL function surface
    * (`graft_text_stats`, `graft_simhash64`, ... — see [[SqlFunctions]]). */
  val inject: org.apache.spark.sql.SparkSessionExtensions => Unit = { e =>
    e.injectPlannerStrategy(_ => GraftStrategy)
    SqlFunctions.functions.foreach(e.injectFunction)
    SqlTableFunctions.functions.foreach(e.injectTableFunction)
  }

  /** Top-k rows per group by descending numeric score, heap-executed.
    * Columns are referenced by NAME and resolved against the child's
    * analyzed output (a `Column` arrives as a lazy ColumnNode wrapper the
    * analyzer won't resolve inside a foreign logical node). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], score: String,
      k: Int): DataFrame = {
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-register for sessions not built with .withExtensions (runtime
    // experimental-strategies hook; idempotent)
    if (!session.experimental.extraStrategies.contains(GraftStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ GraftStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"topKPerGroup: no column $n"))
    val plan = TopKPerGroup(groupCols.map(attr), attr(score), k, analyzed)
    org.apache.spark.sql.classic.Dataset.ofRows(session, plan)
  }
}

/** Config-file entry point: `spark.sql.extensions=org.apache.spark.sql.graftnative.GraftSqlExtensions`
  * installs the library into ANY session (spark-submit, thrift server,
  * notebooks) with no code change — the idiomatic way to ship a Spark
  * library to a 1000-executor cluster. */
class GraftSqlExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.inject(e)
}
