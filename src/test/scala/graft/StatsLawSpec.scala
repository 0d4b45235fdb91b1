package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.{Events, Stats}

/** Laws for the round-13 statistics / product-analytics tier. Spark
  * jobs per case, so fewer iterations than the pure-lattice law specs —
  * each seed generates a fresh random dataset. */
class StatsLawSpec extends AnyFunSuite {
  import SparkFixture._

  private def cases[A](ga: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong * 7919)))
    }

  private val userEvents: Gen[List[(Long, Int, Double)]] = for {
    nUsers <- Gen.choose(3, 25)
    rows <- Gen.listOfN(nUsers * 4, for {
      u <- Gen.choose(1L, nUsers.toLong)
      sec <- Gen.choose(0, 500000)
      v <- Gen.choose(-50.0, 50.0)
    } yield (u, sec, v))
  } yield rows

  test("law: rfm tiles partition entities into near-equal ordered tiers") {
    val s = spark
    import s.implicits._
    cases(userEvents, 6) { rows =>
      val ev = rows.map { case (u, sec, v) =>
        (u, new java.sql.Timestamp(sec * 1000L), v) }
        .toDF("u", "ts", "v")
      val got = Events.rfmSegments(ev, "u", "ts", "v").collect()
      val n = got.length
      for (metric <- Seq("r", "f", "m")) {
        val byTile = got.groupBy(_.getAs[Long](metric))
          .view.mapValues(_.length).toMap
        // ntile law: occupied tiles are 1..k' contiguous, sizes differ
        // by at most 1, and larger tiles never follow smaller ones
        val tiles = byTile.keys.toSeq.sorted
        assert(tiles == (1L to tiles.max).toSeq, s"$metric tiles $tiles")
        val sizes = tiles.map(byTile)
        assert(sizes.max - sizes.min <= 1,
          s"$metric sizes $sizes over $n entities")
        assert(sizes == sizes.sortBy(x => -x),
          s"$metric extra rows must land in the FIRST tiles: $sizes")
      }
    }
  }

  test("law: spearman is symmetric, bounded, and rank-invariant") {
    val s = spark
    import s.implicits._
    val pairsGen = Gen.listOfN(40, for {
      x <- Gen.choose(-100, 100); y <- Gen.choose(-100, 100)
    } yield (x.toDouble, y.toDouble))
    cases(pairsGen, 6) { pairs =>
      val df = pairs.toDF("x", "y")
      def rho(d: org.apache.spark.sql.DataFrame, a: String, b: String) =
        Stats.spearman(d, a, b).head().getAs[Double]("rho")
      val r1 = rho(df, "x", "y")
      assert(r1 >= -1.0 && r1 <= 1.0, s"rho=$r1")
      assert(rho(df, "y", "x") == r1, "symmetry")
      // strictly monotone transform of x preserves all ranks exactly
      val cubed = df.withColumn("x", col("x") * col("x") * col("x"))
      assert(rho(cubed, "x", "y") == r1, "rank invariance under x³")
    }
  }

  test("law: linear attribution conserves conversion credit to within " +
      "per-touch rounding") {
    val s = spark
    import s.implicits._
    cases(userEvents, 6) { rows =>
      val ev = rows.zipWithIndex.map { case ((u, sec, v), i) =>
        (u, new java.sql.Timestamp(sec * 1000L), i.toLong,
          if (v > 25) "p" else "t") }
        .toDF("u", "ts", "event_id", "t")
      val got = Events.linearAttribution(ev, "u", "ts",
        Seq("ts", "event_id"), "t", "p", gapUs = 3600000000L)
        .collect()
      val totalCredit = got.map(_.getAs[Long]("credit_micro")).sum
      val nConv = ev.where(col("t") === "p").count()
      val maxLen = rows.length.toLong
      // each conversion distributes r·round(1e6/r) ∈ 1e6 ± r/2
      assert(math.abs(totalCredit - 1000000L * nConv) <=
        nConv * maxLen / 2 + nConv,
        s"credit $totalCredit vs ${1000000L * nConv} (nConv=$nConv)")
    }
  }

  test("hot session: one entity, 300k events in a single session — " +
      "the suffix-sum window spills, never OOMs, credits conserve") {
    val s = spark
    import s.implicits._
    val n = 300000
    val ev = s.range(n.toLong).select(
      lit(1L).as("u"),
      org.apache.spark.sql.functions.timestamp_seconds(col("id"))
        .as("ts"),
      col("id").as("event_id"),
      when(col("id") % 1000 === 999, "p").otherwise("t").as("t"))
    val got = Events.linearAttribution(ev, "u", "ts",
      Seq("ts", "event_id"), "t", "p", gapUs = 3600000000L)
      .collect()
    val nConv = n / 1000
    val total = got.map(_.getAs[Long]("credit_micro")).sum
    // each conversion at rank r distributes r·round(1e6/r) ∈ 1e6 ± r/2
    assert(math.abs(total - 1000000L * nConv) <= nConv.toLong * n / 2,
      s"total=$total nConv=$nConv")
    assert(got.map(_.getAs[Long]("n_touches")).sum == n.toLong)
  }

  test("law: jackknife CI brackets the mean with nonnegative se") {
    val s = spark
    import s.implicits._
    val dataGen = Gen.listOfN(60, for {
      id <- Gen.choose(1L, 1000L); v <- Gen.choose(-1000.0, 1000.0)
    } yield (id, v))
    cases(dataGen, 6) { data =>
      val df = data.toDF("id", "v")
      val r = Stats.jackknifeCi(df, "v", "id", k = 5).head()
      val (m, se) = (r.getAs[Double]("mean"), r.getAs[Double]("se"))
      assert(se >= 0.0)
      assert(r.getAs[Double]("lo") <= m + 1e-6 &&
        m <= r.getAs[Double]("hi") + 1e-6)
    }
  }

  test("law: mmr rank-1 equals bruteforce top-1 and every pick is a " +
      "candidate (random vectors)") {
    val s = spark
    import s.implicits._
    val vecGen = Gen.listOfN(30, Gen.listOfN(8,
      Gen.choose(-1.0, 1.0).map(_.toFloat)))
    cases(vecGen, 4) { vecs =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val q = corpus.where(col("vec_id") === 0)
      val picks = graft.ops.Similarity.mmrRerank(corpus, q,
        nCandidates = 10, k = 3, lambdaMicro = 600000L)
        .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
      assert(picks.distinct.size == picks.size, "no repeats")
      val cand = graft.ops.Similarity.bruteForceTopK(corpus, q, 10)
        .collect()
      val candIds = cand.map(_.getAs[Long]("neighbor_id")).toSet
      assert(picks.forall(candIds), s"picks $picks outside candidates")
      // λ > 0 ⇒ the first pick is pure relevance = bruteforce rank 1
      val top1 = cand.filter(_.getAs[Int]("rank") == 1)
        .head.getAs[Long]("neighbor_id")
      assert(picks.head == top1, s"rank-1 ${picks.head} != $top1")
    }
  }

  test("law: Kaplan-Meier survival is non-increasing in [0, 1]") {
    val s = spark
    import s.implicits._
    cases(userEvents, 6) { rows =>
      val ev = rows.map { case (u, sec, v) =>
        (u, new java.sql.Timestamp(sec * 1000000L)) }.toDF("u", "ts")
      val curve = Events.kaplanMeier(ev, "u", "ts")
        .orderBy("t_days").collect()
        .map(_.getAs[Double]("survival"))
      assert(curve.forall(sv => sv >= 0.0 && sv <= 1.0))
      curve.sliding(2).foreach {
        case Array(a, b) => assert(b <= a + 1e-9, s"increasing: $a -> $b")
        case _ =>
      }
    }
  }
}
