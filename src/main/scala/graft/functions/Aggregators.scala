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

  /** Misra-Gries heavy-hitters sketch: one-pass top-frequency items with
    * bounded memory, as a typed Aggregator so Catalyst plans the map-side
    * partial automatically — each task builds a ≤ `k`-entry counter map
    * and only those maps cross the wire, never the token stream itself
    * (the exact `vocabulary` roll-up shuffles one (word, count) row per
    * distinct word; at 100 TB this sketch caps the shuffle at k entries
    * per task regardless of vocabulary size).
    *
    * Guarantees (classic MG + Agarwal et al. mergeable-summaries merge —
    * combine counts, subtract the (k+1)-th largest, keep positives):
    *  - every item with true count > N/(k+1) survives in the sketch;
    *  - each reported count is an UNDERCOUNT by at most N/(k+1);
    *  - when k ≥ the number of distinct items, nothing is ever evicted
    *    and the sketch is EXACT — the regime the oracle query pins.
    */
  final class HeavyHitters(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 1, "HeavyHitters: k must be >= 1")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) b
      else b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None => // decrement-all: one "vote" against every counter
          b.flatMap { case (t, c) =>
            if (c > 1) Some(t -> (c - 1)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c) }
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (t, c) =>
          if (c - cut > 0) Some(t -> (c - cut)) else None }
      }
    }
    def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (t, c) => (-c, t) }
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: array<struct<_1: item, _2: count>> sorted by
    * (count desc, item). */
  def heavyHittersUdaf(k: Int)(c: Column): Column =
    udaf(new HeavyHitters(k), Encoders.STRING).apply(c)

  /** Count-min row bucket for `key` at hash row `row`: seeded Murmur3 of
    * the UTF-16 string, floor-mod width. Shared by sketch build (per
    * input row) and probe (folded into the plan as a literal index) —
    * the two MUST agree or estimates are garbage. Deterministic across
    * JVMs/runs: MurmurHash3 is a pure function of (bytes, seed). */
  def cmsBucket(key: String, row: Int, width: Int): Int =
    math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c + row),
      width)

  /** Count-min sketch (Cormode–Muthukrishnan): `depth × width` counter
    * grid; every item increments one counter per row (seeded hash),
    * point estimate = MIN over rows — an OVERCOUNT only (collisions add,
    * never subtract), with est ≤ true + e/width·N at probability
    * ≥ 1 − e^−depth. The frequency-sketch complement to [[HeavyHitters]]
    * (which keeps top items but forgets the rest): CMS answers "how
    * often did THIS key occur" for ANY key in fixed memory.
    *
    * Buffer = flat Array[Long] of depth·width (row-major) — merge is
    * elementwise sum, so Catalyst plans map-side partials and only
    * depth·width longs per task cross the wire, never the stream. The
    * 100 TB shape: the sketch IS the aggregation (exact per-key counts
    * need a vocabulary-sized shuffle; this caps at a few KB per task
    * regardless of cardinality). */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1, "CountMin: depth must be >= 1")
    require(width >= 2, "CountMin: width must be >= 2")
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], x: String): Array[Long] = {
      if (x != null) {
        var r = 0
        while (r < depth) {
          b(r * width + cmsBucket(x, r, width)) += 1L
          r += 1
        }
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form over a string column. */
  def countMinUdaf(depth: Int, width: Int)(c: Column): Column =
    udaf(new CountMin(depth, width), Encoders.STRING).apply(c)

  /** Point estimate for a PLAN-TIME key against a built sketch column:
    * min over the depth rows, each index folded to a literal via
    * [[cmsBucket]] — pure element_at/least projection, no UDF at probe
    * time. */
  def cmsEstimate(cms: Column, key: String, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, least, lit}
    val cells = (0 until depth).map(r =>
      element_at(cms, lit(r * width + cmsBucket(key, r, width) + 1)))
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** Mergeable covariance-moment state over a float-vector column — the
    * ONE-PASS covariance matrix for [[graft.ops.Similarity.pcaTrain]].
    * Buffer = flat Array[Double] of 1 + dim + dim² (count, per-dim sums,
    * LOWER-TRIANGULAR raw co-moment sums Σxᵢxⱼ, row-major); merge is
    * elementwise sum, so Catalyst plans map-side partials and only
    * ~8·dim² bytes per task cross the wire (dim=64 → 32 KB) — never the
    * vectors. The alternative (posexplode pairs + covar_pop) shuffles
    * n·dim² rows: 4×10¹² at n=10⁹, dim=64 — the difference between a
    * one-pass profile and an un-runnable job. Raw moments (not Welford)
    * are fine here: embedding coordinates are O(1), so Σx² carries no
    * catastrophic cancellation, and the consumer re-centers with the
    * exact same sums. Null vectors are skipped (null-in, null-out like
    * any aggregate); a NON-null vector whose length ≠ dim throws a
    * named error — silently skipping or truncating a mixed-dimension
    * corpus would report moments over an unannounced subset. */
  final class CovarianceMoments(dim: Int)
      extends Aggregator[scala.collection.Seq[Float], Array[Double],
        Array[Double]] {
    require(dim >= 1 && dim <= 512,
      s"CovarianceMoments: dim must be in [1, 512] (the dim^2 buffer is " +
        s"8*dim^2 bytes per task), got $dim")
    private val off = 1 + dim
    def zero: Array[Double] = new Array[Double](1 + dim + dim * dim)
    def reduce(b: Array[Double], x: scala.collection.Seq[Float])
        : Array[Double] = {
      if (x != null) {
        if (x.length != dim) throw new IllegalArgumentException(
          s"CovarianceMoments: vector of length ${x.length} != dim " +
            s"$dim - mixed-dimension corpus; filter or pad explicitly " +
            "(null vectors are skipped, mismatched ones are an error)")
        b(0) += 1.0
        var i = 0
        while (i < dim) {
          val xi = x(i).toDouble
          b(1 + i) += xi
          var j = 0
          while (j <= i) {
            b(off + i * dim + j) += xi * x(j).toDouble
            j += 1
          }
          i += 1
        }
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Array[Double] = b
    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form over an array&lt;float&gt; column. */
  def covarianceMomentsUdaf(dim: Int)(c: Column): Column =
    udaf(new CovarianceMoments(dim),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[scala.collection.Seq[Float]]()).apply(c)
}
