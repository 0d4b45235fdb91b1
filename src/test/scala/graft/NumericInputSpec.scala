package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fifth degenerate-shape sweep (after empty / all-null / hot-key skew /
  * unicode-hostile): NUMERIC-HOSTILE VALUES — the float and integer
  * extremes a real 100 TB corpus inevitably carries in its measure
  * columns. Every registered query must produce a frame, throw a
  * DOCUMENTED named guard, or fail with the ENGINE'S OWN loud ANSI
  * arithmetic/cast error — never an opaque crash (NPE, ClassCast,
  * codegen failure, index-out-of-bounds) and never a hang.
  *
  * On accepting ANSI errors: this session runs Spark 4 ANSI mode, so a
  * deliberately poisoned `sum(Long.MaxValue · k)` or a micro-rounding
  * `CAST(inf AS BIGINT)` raises a named SparkArithmeticException
  * instead of silently wrapping or nulling. At 100 TB that loud refusal
  * to corrupt IS the correct engine behavior for impossible arithmetic
  * on poisoned inputs — the sweep treats it as a documented outcome and
  * hunts the genuinely dangerous failure classes instead: wrong-type
  * crashes, unbounded loops, and kernels that assume finite floats.
  *
  * Hostile construction (deterministic, cycled by id):
  *  - every DOUBLE measure column (events.value, o_totalprice,
  *    l_quantity/extendedprice/discount/tax, c_acctbal, s_acctbal,
  *    p_retailprice) cycles NaN, +Inf, -Inf, -0.0, the 4.9e-324
  *    denormal, ±Double.MaxValue, original;
  *  - embeddings get NaN islands, ±Inf elements, all-(-0.0f) vectors,
  *    denormal and Float.MaxValue vectors (length PRESERVED — mixed
  *    dims are a separate named-guard contract);
  *  - integer measure columns (documents.n_chars, embeddings.label,
  *    p_size, l_linenumber) take Long/Int extremes and -1;
  *  - ~1% of events.user_id becomes Long.MaxValue (an id-typed measure
  *    that flows through datediff/sessionize/rfm);
  *  - primary-key id columns stay sane: several REGISTRATION fixtures
  *    shift ids (`doc_id + 10000` dup-augmentation oracles), so extreme
  *    ids would only test the test harness's own arithmetic, not
  *    library operators.
  */
class NumericInputSpec extends AnyFunSuite {
  import SparkFixture._

  /** id-cycled hostile double: 7 extreme classes + original. */
  private def hostileD(id: Column, orig: Column): Column = {
    val m = pmod(id, lit(8L))
    when(m === 0L, lit(Double.NaN))
      .when(m === 1L, lit(Double.PositiveInfinity))
      .when(m === 2L, lit(Double.NegativeInfinity))
      .when(m === 3L, lit(-0.0))
      .when(m === 4L, lit(java.lang.Double.MIN_VALUE)) // 4.9e-324 denormal
      .when(m === 5L, lit(java.lang.Double.MAX_VALUE))
      .when(m === 6L, lit(-java.lang.Double.MAX_VALUE))
      .otherwise(orig)
  }

  private def hostileLong(id: Column, orig: Column): Column = {
    val m = pmod(id, lit(13L))
    when(m === 0L, lit(Long.MaxValue))
      .when(m === 1L, lit(Long.MinValue))
      .when(m === 2L, lit(-1L))
      .otherwise(orig)
  }

  private def hostileInt(id: Column, orig: Column): Column = {
    val m = pmod(id, lit(13L))
    when(m === 0L, lit(Int.MaxValue))
      .when(m === 1L, lit(Int.MinValue))
      .when(m === 2L, lit(-1))
      .otherwise(orig)
  }

  private lazy val numDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_numeric_sf").toString
    val src = "/root/testdata/sf0.001"
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")

    Seq("region", "nation").foreach { t =>
      load(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    load("events").select(col("event_id"), col("ts"),
        when(pmod(col("event_id"), lit(101L)) === 0L, lit(Long.MaxValue))
          .otherwise(col("user_id")).as("user_id"),
        col("event_type"),
        hostileD(col("event_id"), col("value")).as("value"),
        col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    load("documents").select(col("doc_id"), col("text"), col("lang"),
        col("source"),
        hostileLong(col("doc_id"), col("n_chars")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: poison ELEMENTS, keep length (mixed dim = separate
    // contract); class by vec_id so whole vectors are reproducible
    val m = pmod(col("vec_id"), lit(8L))
    val e = col("embedding")
    val poisoned =
      when(m === 1L, // NaN island at position 0
        concat(array(lit(Float.NaN)), slice(e, 2, 10000)))
      .when(m === 2L, concat(array(lit(Float.PositiveInfinity)),
        slice(e, 2, 10000)))
      .when(m === 3L, concat(array(lit(Float.NegativeInfinity)),
        slice(e, 2, 10000)))
      .when(m === 4L, transform(e, _ => lit(-0.0f)))
      .when(m === 5L, transform(e, _ => lit(java.lang.Float.MIN_VALUE)))
      .when(m === 6L, transform(e, _ => lit(java.lang.Float.MAX_VALUE)))
      .otherwise(e)
    load("embeddings").select(col("vec_id"),
        poisoned.as("embedding"),
        hostileInt(col("vec_id"), col("label")).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    load("orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        hostileD(col("o_orderkey"), col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = load("lineitem")
    val lid = col("l_orderkey") * 7L + col("l_linenumber")
    li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        hostileInt(col("l_orderkey"), col("l_linenumber"))
          .as("l_linenumber"),
        hostileD(lid, col("l_quantity")).as("l_quantity"),
        hostileD(lid + 1L, col("l_extendedprice")).as("l_extendedprice"),
        hostileD(lid + 2L, col("l_discount")).as("l_discount"),
        hostileD(lid + 3L, col("l_tax")).as("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    load("customer").select(col("c_custkey"), col("c_name"),
        col("c_nationkey"),
        hostileD(col("c_custkey"), col("c_acctbal")).as("c_acctbal"),
        col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    load("supplier").select(col("s_suppkey"), col("s_name"),
        col("s_nationkey"),
        hostileD(col("s_suppkey"), col("s_acctbal")).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    load("part").select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"),
        hostileInt(col("p_partkey"), col("p_size")).as("p_size"),
        hostileD(col("p_partkey"), col("p_retailprice"))
          .as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  /** Engine-named loud arithmetic refusals on poisoned inputs (ANSI
    * overflow / cast-out-of-range) — documented outcomes, see class doc. */
  private def isLoudAnsi(t: Throwable): Boolean = {
    val cls = t.getClass.getName
    val msg = Option(t.getMessage).getOrElse("")
    cls.contains("Arithmetic") ||
      msg.contains("ARITHMETIC_OVERFLOW") ||
      msg.contains("CAST_OVERFLOW") ||
      msg.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      msg.contains("CANNOT_PARSE") ||
      msg.contains("overflow")
  }

  test("vecFinite contract: ranking ops exclude poisoned vectors, " +
      "per-row codecs null them, clean rows unchanged") {
    val s = spark
    import s.implicits._
    import graft.ops.Similarity
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(Float.NaN, 0.5f, 0.0f, 0.0f), 0),
      (4L, Array(Float.PositiveInfinity, 0.0f, 0.0f, 0.0f), 0),
      (5L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    // lshTopK: the poisoned ids 3 and 4 appear on NEITHER side
    val topk = Similarity.lshTopK(vecs, vecs, k = 3,
      deterministicPlanes = true).collect()
    val ids = topk.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(3L) && !ids.contains(4L), s"poisoned ids: $ids")
    assert(topk.nonEmpty)
    // quantizeInt8: poisoned rows preserved with null codes/scale/mse
    val q = Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q.size == 5)
    assert(q(3L).isNullAt(2) && q(4L).isNullAt(2)) // codes
    assert(!q(1L).isNullAt(2) && q(1L).getAs[Double]("scale") == 1.0)
    // randomProjection: poisoned rows preserved with null proj
    val p = Similarity.randomProjection(vecs, k = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(3L).isNullAt(2) && p(4L).isNullAt(2))
    assert(p(1L).getString(2).split(",").length == 4)
    // mmrRerank: poisoned corpus/query rows never ranked
    val mmr = Similarity.mmrRerank(vecs, vecs, nCandidates = 3, k = 2)
      .collect()
    val mmrIds = mmr.flatMap(r => Seq(r.getLong(0),
      r.getAs[Long]("id"))).toSet
    assert(!mmrIds.contains(3L) && !mmrIds.contains(4L))
    assert(mmr.nonEmpty)
  }

  test("every registered query survives numeric-hostile values (frame, " +
      "documented guard, or loud ANSI refusal — never an opaque crash)") {
    val opaque = scala.collection.mutable.ListBuffer[String]()
    val ansi = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, numDir).collect() // force full execution
      } catch {
        case e: IllegalArgumentException if e.getMessage != null => // guard
        case e: IllegalStateException if e.getMessage != null =>    // guard
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          if (isLoudAnsi(root) || isLoudAnsi(e)) ansi += name
          else opaque += s"$name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(160)}"
      }
    }
    info(s"loud ANSI refusals (documented outcome): ${ansi.size} " +
      ansi.mkString("[", ", ", "]"))
    assert(opaque.isEmpty,
      s"opaque numeric-input failures (${opaque.size}):\n" +
        opaque.mkString("\n"))
  }
}
