package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom `Aggregator[IN,BUF,OUT]` surface (SURVEY §2.11): the typed
  * two-step (partial/merge/finish) plug-in point the reference models with
  * its TwoStepAggregator (`impl/aggregation/aggregators/Aggregators.kt`).
  * [[graft.ops.Agg.stdRef]] covers the same math as a raw expression (and
  * stays in codegen); this form exists for semantics a Column expression
  * can't fold — arbitrary JVM state per group.
  */
object Aggregators {

  /** Reference-exact "std" √Σ(x−μ)² as a typed Aggregator: buffer =
    * (Σx, Σx², n), merged associatively — Catalyst plans the map-side
    * partial automatically. */
  val refStd: Aggregator[java.lang.Double, (Double, Double, Long), Double] =
    new Aggregator[java.lang.Double, (Double, Double, Long), Double] {
      def zero: (Double, Double, Long) = (0.0, 0.0, 0L)
      def reduce(b: (Double, Double, Long), x: java.lang.Double) =
        if (x == null) b else (b._1 + x, b._2 + x * x, b._3 + 1)
      def merge(a: (Double, Double, Long), b: (Double, Double, Long)) =
        (a._1 + b._1, a._2 + b._2, a._3 + b._3)
      def finish(b: (Double, Double, Long)): Double =
        if (b._3 == 0) Double.NaN
        else math.sqrt(b._2 - b._1 * b._1 / b._3)
      def bufferEncoder: Encoder[(Double, Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
          Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form, usable inside any groupBy().agg(...). */
  def refStdUdaf(c: Column): Column = udaf(refStd).apply(c)
}
