package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.{Cdc, Events, Joins, Series}
import graft.ops.RowOps._
import graft.functions.TextFunctions

/** Round-9 pipeline operators: salted join, CDC merge, resample+fill,
  * funnel, collocations. */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkFixture._

  // ---------------- saltedSkewJoin ----------------

  test("saltedSkewJoin matches the plain join exactly (inner and left)") {
    val s = spark
    import s.implicits._
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "lv")
    val right = Seq((1, 10), (2, 20), (4, 40)).toDF("k", "rv")
    for (how <- Seq("inner", "left")) {
      val plain  = left.join(right, Seq("k"), how)
      val salted = Joins.saltedSkewJoin(left, right, Seq("k"), 5, how)
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(salted.collect().map(_.toSeq).sortBy(_.mkString(","))
        .toSeq == plain.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq,
        how)
    }
  }

  test("saltedSkewJoin joins on the salt key (plan carries __salt)") {
    val s = spark
    import s.implicits._
    val left  = Seq((1, "a")).toDF("k", "lv")
    val right = Seq((1, 10)).toDF("k", "rv")
    val plan = Joins.saltedSkewJoin(left, right, Seq("k"), 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan)
    intercept[IllegalArgumentException] {
      Joins.saltedSkewJoin(left, right, Seq("k"), 4, "full")
    }
  }

  // ---------------- Cdc.applyChangeLog ----------------

  test("applyChangeLog: update, delete, resurrect, insert, untouched") {
    val s = spark
    import s.implicits._
    val base = Seq((1, "one"), (2, "two"), (3, "three"), (4, "four"))
      .toDF("id", "v")
    val changes = Seq(
      (1, "ONE", 10L, "U"),   // plain update
      (2, "dead", 10L, "D"),  // delete
      (3, "gone", 10L, "D"),  // delete...
      (3, "back", 20L, "U"),  // ...then resurrect with later seq
      (5, "five", 10L, "U")   // fresh insert
    ).toDF("id", "v", "seq", "op")
    val out = Cdc.applyChangeLog(base, changes, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq(1 -> "ONE", 3 -> "back", 4 -> "four", 5 -> "five"))
  }

  test("applyChangeLog: a change always beats the base snapshot") {
    val s = spark
    import s.implicits._
    val base    = Seq((1, "old"), (2, "keep")).toDF("id", "v")
    // a change outranks the base at EVERY seq — including Long.MinValue
    // itself, which ties the base sentinel and is broken by change-side
    // rank, not by seq
    val changes = Seq(
      (1, "new", Long.MinValue + 1, "U"),
      (2, "edge", Long.MinValue, "U"))
      .toDF("id", "v", "seq", "op")
    val out = Cdc.applyChangeLog(base, changes, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("new", "edge"))
  }

  // ---------------- Series.resampleWithFill ----------------

  test("resampleWithFill densifies gaps and forward-fills") {
    val s = spark
    import s.implicits._
    // user u: events in buckets 0 (v=2,4), 3 (v=10); buckets 1,2 missing
    val df = Seq(
      ("u", 5L, 2.0), ("u", 9L, 4.0), ("u", 35L, 10.0),
      ("w", 12L, 7.0))
      .toDF("uid", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Series.resampleWithFill(df, "ts", "value", 10L, Seq("uid"))
      .orderBy("uid", "bucket")
      .select("uid", "bucket", "filled_avg", "n_events")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq(
      ("u", 0L, 3.0, 2L),  // mean of 2,4
      ("u", 1L, 3.0, 0L),  // gap: filled forward, zero events
      ("u", 2L, 3.0, 0L),
      ("u", 3L, 10.0, 1L),
      ("w", 1L, 7.0, 1L))) // single-bucket series: no gaps invented
  }

  // ---------------- Events.funnel ----------------

  test("funnel: greedy earliest strictly-ordered match") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // u1 completes: view@10, click@20, purchase@30 (noise ignored)
      ("u1", 10L, "view"), ("u1", 15L, "view"), ("u1", 20L, "click"),
      ("u1", 25L, "error"), ("u1", 30L, "purchase"),
      // u2: click BEFORE view never counts; no purchase
      ("u2", 5L, "click"), ("u2", 10L, "view"), ("u2", 20L, "click"),
      // u3: click at the SAME ts as view does not advance (strict order)
      ("u3", 10L, "view"), ("u3", 10L, "click"),
      // u4: no view at all → no row
      ("u4", 10L, "purchase"))
      .toDF("uid", "us", "et")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Events.funnel(df, "uid", "ts", "et",
        Seq("view", "click", "purchase"))
      .orderBy("uid").collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getInt(4))).toSeq
    assert(out == Seq(
      ("u1", Some(10L), Some(20L), Some(30L), 3),
      ("u2", Some(10L), Some(20L), None, 2),
      ("u3", Some(10L), None, None, 1)))
  }

  // ---------------- Sampling.prioritySample ----------------

  test("prioritySample: top-k by w/u priority with DLT estimator weight") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).map(i => (i, (i % 7 + 1) * 10.0))
      .toDF("id", "w")
    def sel(id: Long) = (id % 1048576L) * 2654435761L % 1000000L
    def pri(id: Long, w: Double) = w * 1000000.0 / (sel(id) + 1).toDouble
    val model = (0L until 50L).map(i => (i, (i % 7 + 1) * 10.0))
      .map { case (i, w) => (i, w, pri(i, w)) }
      .sortBy { case (i, _, p) => (-p, i) }
    val tau = model(10)._3
    val expect = model.take(10)
      .map { case (i, w, p) => (i, p, math.max(w, tau)) }.sortBy(_._1)
    val out = graft.ops.Sampling.prioritySample(df, "id", "w", 10)
      .select("id", "priority", "est_weight")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(out == expect)
  }

  test("prioritySample: input smaller than k is exhaustive, est = true w") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "w")
    val out = graft.ops.Sampling.prioritySample(df, "id", "w", 10)
      .select("id", "est_weight")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 5.0), (2L, 7.0)))
  }

  // ---------------- Dedup.sourceOverlap ----------------

  test("sourceOverlap counts distinct shared content keys per source pair") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("hello  world", "a"), ("Hello World", "b"),  // same normalized key
      ("hello world", "c"),                          // in a third source too
      ("only in a", "a"),
      ("shared two", "a"), ("shared two", "b"),
      ("shared two", "b")) // same-source duplicate counts once
      .toDF("text", "src")
    val out = graft.ops.Dedup.sourceOverlap(df, "text", "src")
      .orderBy("source_a", "source_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      ("a", "b", 2L),   // hello-world + shared-two
      ("a", "c", 1L),
      ("b", "c", 1L)))
  }

  // ---------------- Similarity.centroidsBy / Series.standardizeBy ----

  test("centroidsBy: exact per-key per-dim means") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 6.0f)),
      (2, Seq(10.0f, 0.0f))).toDF("label", "vec")
    val out = graft.ops.Similarity.centroidsBy(df, "vec", "label")
      .orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(out == Seq((1, 0, 2.0), (1, 1, 4.0), (2, 0, 10.0), (2, 1, 0.0)))
  }

  test("standardizeBy: z-scores per group; constant group yields null") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val out = graft.ops.Series.standardizeBy(df, "v", Seq("g"), "z")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), Option(r.get(2)))).toSeq
    // group a: μ=2, σ_pop=1 → z = ∓1; group b constant → null, not ±Inf
    assert(out == Seq(("a", Some(-1.0)), ("a", Some(1.0)),
      ("b", None), ("b", None)))
  }

  // ---------------- Dedup.snapshotDiff ----------------

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "bye")).toDF("id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "hi")).toDF("id", "text")
    val out = graft.ops.Dedup.snapshotDiff(v1, v2, "text", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  // ---------------- Dedup.fuzzyContamination ----------------

  test("fuzzyContamination finds edited cross-corpus copies, broadcasts bench") {
    val s = spark
    import s.implicits._
    val mk = (seed: Int) => (1 to 60)
      .map(i => s"w${(i * seed) % 97}").mkString(" ")
    val train = Seq((1L, mk(3)), (2L, mk(5)), (3L, mk(7))).toDF("id", "text")
    // bench doc 10 = train doc 2 with a short suffix (near-dup, j≈0.9);
    // bench doc 11 is unrelated
    val bench = Seq((10L, mk(5) + " edited tail"), (11L, mk(11)))
      .toDF("id", "text")
    val res = graft.ops.Dedup.fuzzyContamination(train, bench, "text", "id",
      numHashes = 64, bands = 32, shingleN = 3, minJaccard = 0.8)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), "bench side must broadcast")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 10L)))
  }

  // ---------------- Graph.pageRank ----------------

  test("pageRank: dangling-node closed form and mass conservation") {
    val s = spark
    import s.implicits._
    // a → b, b dangles. After one iteration from (.5, .5):
    // dangling mass = .5; r(a) = .15/2 + .85·(0 + .5/2) = 0.2875
    //                 r(b) = .15/2 + .85·(.5 + .5/2) = 0.7125
    val e1 = Seq((0L, 1L)).toDF("s", "d")
    val one = graft.ops.Graph.pageRank(e1, "s", "d", 0.85, 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(one.map(_._1) == Seq(0L, 1L))
    assert(math.abs(one(0)._2 - 0.2875) < 1e-12 &&
      math.abs(one(1)._2 - 0.7125) < 1e-12)
    // larger graph: total mass stays 1 after 10 iterations
    val e2 = (0L until 30L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 30), (i, (i * 11 + 3) % 30))).toDF("s", "d")
    val mass = graft.ops.Graph.pageRank(e2, "s", "d", 0.85, 10)
      .agg(sum(col("rank"))).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
  }

  // ---------------- Graph.connectedComponents / bfsDistances ----------------

  test("connectedComponents: chain collapses in O(log d) rounds; equals label prop") {
    val s = spark
    import s.implicits._
    // a 64-node chain + a separate triangle: propagate-only needs ~64
    // rounds, pointer jumping must finish inside maxIters = 10
    val chain = (0L until 63L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val edges = (chain ++ tri).toDF("a", "b")
    val got = graft.ops.Graph.connectedComponents(edges, "a", "b",
        maxIters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 63L).forall(got(_) == 0L))
    assert(Seq(100L, 101L, 102L).forall(got(_) == 100L))
    assert(got.size == 67)
    // law: identical labels to min-label propagation on a random-ish graph
    val rnd = (0L until 80L).map(i => (i, (i * 13 + 5) % 40)).toDF("a", "b")
    val cc = graft.ops.Graph.connectedComponents(rnd, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = rnd.where(col("a") =!= col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b")).cache()
    val lp = graft.ops.Dedup.propagateMinLabels(pairs, maxIters = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    pairs.unpersist()
    assert(cc == lp, "pointer jumping must agree with label propagation")
  }

  test("connectedComponentsStar: scrambled-id 1k chain, few rounds; law") {
    val s = spark
    import s.implicits._
    // the measured prop+jump adversary (r13 probe: > 64 rounds on this
    // exact graph): a 1000-node chain whose ids are a seeded shuffle —
    // star contraction must finish within its O(log^2 n) budget
    val n = 1000
    val perm = new scala.util.Random(42).shuffle((0 until n).toVector)
    val chain = (0 until n - 1)
      .map(i => (perm(i).toLong, perm(i + 1).toLong))
      .toDF("a", "b")
    val got = graft.ops.Graph.connectedComponentsStar(chain, "a", "b",
        maxIters = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "one component labeled by min id")
    // law: identical labels to prop+jump on graphs the latter handles
    val rnd = (0L until 80L).map(i => (i, (i * 13 + 5) % 40)).toDF("a", "b")
    val star = graft.ops.Graph.connectedComponentsStar(rnd, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val jump = graft.ops.Graph.connectedComponents(rnd, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == jump, "star contraction must agree with prop+jump")
    // self-loop-only nodes are out of scope, like connectedComponents
    val loops = Seq((5L, 5L), (1L, 2L)).toDF("a", "b")
    val lr = graft.ops.Graph.connectedComponentsStar(loops, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lr == Map(1L -> 1L, 2L -> 1L))
  }

  test("connectedComponentsAuto: probe path on a friendly graph, star " +
      "fallback on the scrambled-chain adversary — labels exact both ways") {
    val s = spark
    import s.implicits._
    // friendly (small diameter, id-correlated): prop+jump converges
    // inside the probe — auto output identical to prop+jump's
    val rnd = (0L until 80L).map(i => (i, (i * 13 + 5) % 40)).toDF("a", "b")
    val auto = graft.ops.Graph.connectedComponentsAuto(rnd, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val jump = graft.ops.Graph.connectedComponents(rnd, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(auto == jump)
    // adversary (r13 GO case): prop+jump cannot converge in the probe
    // budget; auto must land on the star path and still label exactly
    val n = 300
    val perm = new scala.util.Random(7).shuffle((0 until n).toVector)
    val chain = (0 until n - 1)
      .map(i => (perm(i).toLong, perm(i + 1).toLong)).toDF("a", "b")
    val got = graft.ops.Graph.connectedComponentsAuto(chain, "a", "b",
        probeIters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("bfsDistances: exact hops, horizon cutoff, multi-source min") {
    val s = spark
    import s.implicits._
    // chain 0-1-...-9 plus isolated edge (50, 51)
    val edges = ((0L until 9L).map(i => (i, i + 1)) :+ (50L, 51L))
      .toDF("a", "b")
    val seeds = Seq(0L, 6L).toDF("node")
    val got = graft.ops.Graph.bfsDistances(edges, "a", "b", seeds,
        maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // node 4 is 4 hops from 0 but 2 from 6; node 5 is min(5, 1) = 1
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 2L, 5L -> 1L, 6L -> 0L, 7L -> 1L, 8L -> 2L, 9L -> 3L),
      s"got $got")
    // horizon 0 = sources only; unreachable component never appears
    val zero = graft.ops.Graph.bfsDistances(edges, "a", "b", seeds,
        maxHops = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(zero == Map(0L -> 0L, 6L -> 0L))
  }

  test("kCore: trees peel off a cycle; cascade peel; empty core valid; " +
      "degree within core; non-convergence throws") {
    val s = spark
    import s.implicits._
    // triangle {0,1,2} with a 2-deep tail 2-10-11: 11 peels, then 10 —
    // only the triangle survives k=2, every degree counted in-core
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 10L), (10L, 11L))
      .toDF("a", "b")
    val core = graft.ops.Graph.kCore(g, "a", "b", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // k=3 on the same graph: nothing survives — empty frame, no throw
    assert(graft.ops.Graph.kCore(g, "a", "b", k = 3).count() == 0L)
    // K4 is its own 3-core
    val k4 = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
      .toDF("a", "b")
    val c3 = graft.ops.Graph.kCore(k4, "a", "b", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c3 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a 10-path peels from both ends, 5 rounds — maxIters 2 must THROW
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      graft.ops.Graph.kCore(path, "a", "b", k = 2, maxIters = 2)
    }
    // ...and to an empty core with the default budget
    assert(graft.ops.Graph.kCore(path, "a", "b", k = 2).count() == 0L)
  }

  test("degreeStats: star graph → assortativity exactly −1") {
    val s = spark
    import s.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = graft.ops.Graph.degreeStats(star, "a", "b").head()
    assert(r.getAs[Long]("nodes") == 4L && r.getAs[Long]("edges") == 3L)
    assert(r.getAs[Long]("min_deg") == 1L && r.getAs[Long]("max_deg") == 3L)
    assert(r.getAs[Double]("avg_deg") == 1.5)
    // endpoint-degree pairs (3,1)×3 + (1,3)×3 → perfect anticorrelation
    assert(r.getAs[Double]("assortativity") == -1.0)
    // regular graph (cycle): zero degree variance → null, not a throw
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("a", "b")
    val c = graft.ops.Graph.degreeStats(cyc, "a", "b").head()
    assert(c.isNullAt(c.fieldIndex("assortativity")))
  }

  test("adamicAdar: path endpoints score 1/ln 2; linked pairs excluded; " +
      "hub cap prunes wedge centers") {
    val s = spark
    import s.implicits._
    // path 1-2-3: only candidate (1,3) through center 2 (deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = graft.ops.Graph.adamicAdar(path, "a", "b").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getAs[Long]("u"), r.getAs[Long]("v")) == (1L, 3L))
    assert(r.getAs[Long]("common") == 1L)
    assert(r.getAs[Long]("aa_nano") == math.round(1e9 / math.log(2.0)))
    // triangle: every pair already linked → empty
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("a", "b")
    assert(graft.ops.Graph.adamicAdar(tri, "a", "b").count() == 0L)
    // star center deg 3: capping maxDegree=2 removes ALL candidates
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    assert(graft.ops.Graph.adamicAdar(star, "a", "b", maxDegree = 2)
      .count() == 0L)
    val full = graft.ops.Graph.adamicAdar(star, "a", "b").collect()
    assert(full.length == 3 &&
      full.forall(_.getAs[Long]("aa_nano") ==
        math.round(1e9 / math.log(3.0))))
  }

  // ---------------- Similarity.rankFusion ----------------

  test("rankFusion: micro contributions sum, missing-list candidates, ties") {
    val s = spark
    import s.implicits._
    // query 1: list A ranks (10, 11), list B ranks (11, 12)
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "id", "rank")
    val got = graft.ops.Similarity.rankFusion(Seq(a, b), k = 60, topN = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // 11: round(1e6/62) + round(1e6/61) = 16129 + 16393 = 32522
    // 10: round(1e6/61) = 16393; 12: round(1e6/62) = 16129
    assert(got == Seq((11L, 32522L, 1), (10L, 16393L, 2),
      (12L, 16129L, 3)), s"got $got")
    // exact tie (same ranks in both lists) breaks on id ascending
    val t1 = Seq((1L, 7L, 1), (1L, 5L, 2)).toDF("query_id", "id", "rank")
    val t2 = Seq((1L, 5L, 1), (1L, 7L, 2)).toDF("query_id", "id", "rank")
    val tie = graft.ops.Similarity.rankFusion(Seq(t1, t2), topN = 2)
      .orderBy("fused_rank").collect().map(_.getLong(1)).toSeq
    assert(tie == Seq(5L, 7L))
  }

  test("heapsFit: hand-computed growth curve and two-point exact fit") {
    val s = spark
    import s.implicits._
    // doc i carries i+1 distinct tokens w0..wi → with 2 checkpoints:
    // bucket 0 = docs 0-4 (15 tokens, vocab 5), bucket 1 = docs 5-9
    val docs = (0 until 10).map(i =>
      (i.toLong, (0 to i).map("w" + _).mkString(" "))).toDF("id", "text")
    val got = graft.ops.Stats.heapsFit(docs, "text", "id",
      checkpoints = 2).orderBy("checkpoint").collect()
    assert(got.length == 2)
    val c1 = got(0); val c2 = got(1)
    assert(c1.getAs[Long]("docs_through") == 5L &&
      c1.getAs[Long]("n_tokens") == 15L && c1.getAs[Long]("vocab") == 5L)
    assert(c2.getAs[Long]("docs_through") == 10L &&
      c2.getAs[Long]("n_tokens") == 55L && c2.getAs[Long]("vocab") == 10L)
    // two points → exact fit: beta = ln2 / ln(55/15), r2 = 1
    val beta = math.log(2.0) / math.log(55.0 / 15.0)
    assert(math.abs(c1.getAs[Double]("beta") - beta) < 1e-5)
    assert(c1.getAs[Double]("r2") == 1.0)
  }

  test("mmrRerank: λ=1 reduces to relevance order; λ=0.5 swaps in the " +
      "diverse candidate") {
    val s = spark
    import s.implicits._
    // query (1,0,0); d most relevant but near-duplicate of a;
    // c less relevant but diverse
    val corpus = Seq(
      (1L, Seq(0.9f, 0.43589f, 0.0f)),   // a: rel ≈ .90, sim(a,d) ≈ .99
      (2L, Seq(0.95f, 0.3122f, 0.0f)),   // d: rel ≈ .95
      (3L, Seq(0.8f, -0.6f, 0.0f))       // c: rel  = .80, sim(c,d) ≈ .57
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    def picks(lam: Long) =
      graft.ops.Similarity.mmrRerank(corpus, q, nCandidates = 3, k = 2,
        lambdaMicro = lam)
        .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    // pure relevance: d then a
    assert(picks(1000000L) == Seq(2L, 1L))
    // balanced: d then the diverse c (a is a near-dup of d)
    assert(picks(500000L) == Seq(2L, 3L))
  }

  test("cohortLtv: hand-computed cumulative revenue per cohort age") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    val ev = Seq(
      ("A", ts("2024-01-05"), "purchase", 10.0),
      ("A", ts("2024-02-10"), "purchase", 5.0),
      ("B", ts("2024-01-20"), "view", 99.0) // non-revenue type ignored
    ).toDF("u", "ts", "t", "v")
    val got = graft.ops.Events.cohortLtv(ev, "u", "ts", "t",
      "purchase", "v")
      .collect().map(r => (r.getAs[String]("cohort_month"),
        r.getAs[Int]("age_month")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("revenue"),
          r.getAs[Double]("cum_revenue"), r.getAs[Long]("ltv_micro")))
      .toMap
    assert(got(("2024-01", 0)) == ((2L, 10.0, 10.0, 5000000L)))
    assert(got(("2024-01", 1)) == ((2L, 5.0, 15.0, 7500000L)))
    assert(got.size == 2)
  }

  test("personalizedPageRank: mass conserves and concentrates on the " +
      "seed; off-graph seed keeps its teleport mass") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val r = graft.ops.Graph.personalizedPageRank(e, "a", "b", seeds, "n",
      damping = 0.5, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.75) < 1e-12 &&
      math.abs(r(2L) - 0.25) < 1e-12, s"r=$r")
    // seed absent from the edge set: teleport + dangling return all
    // mass to it each round — rank stays 1, graph nodes get 0
    val e2 = Seq((10L, 11L)).toDF("a", "b")
    val seeds2 = Seq(Tuple1(99L)).toDF("n")
    val r2 = graft.ops.Graph.personalizedPageRank(e2, "a", "b", seeds2,
      "n", damping = 0.5, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r2(99L) - 1.0) < 1e-12 && r2(10L) == 0.0 &&
      r2(11L) == 0.0, s"r2=$r2")
  }

  test("linearAttribution: suffix-sum credits equal the per-conversion " +
      "1/r shares; sessions split credit") {
    val s = spark
    import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // one session: a@1, b@2, p@3, p@4 → contribs 1e6/3, 1e6/4
    val ev = Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (1L, ts(3), 3L, "p"), (1L, ts(4), 4L, "p"))
      .toDF("u", "ts", "event_id", "t")
    val got = graft.ops.Events.linearAttribution(ev, "u", "ts",
      Seq("ts", "event_id"), "t", "p", gapUs = 1800000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") == ((583333L, 1L))) // 333333 + 250000
    assert(got("b") == ((583333L, 1L)))
    assert(got("p") == ((833333L, 2L))) // rn3 credit + rn4 self 250000
    // a gap splits the session: the early touch earns nothing
    val ev2 = Seq((1L, ts(1), 1L, "a"), (1L, ts(4000), 2L, "b"),
      (1L, ts(4001), 3L, "p")).toDF("u", "ts", "event_id", "t")
    val g2 = graft.ops.Events.linearAttribution(ev2, "u", "ts",
      Seq("ts", "event_id"), "t", "p", gapUs = 1800000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("a") == 0L && g2("b") == 500000L && g2("p") == 500000L)
  }

  test("lastTouchAttribution: closest non-conversion touch wins; bare " +
      "conversion lands in (none)") {
    val s = spark
    import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // u1: a, p, p → both purchases credit a (conv rows skipped looking
    // back); u2: lone purchase → (none)
    val ev = Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "p"),
      (1L, ts(3), 3L, "p"), (2L, ts(1), 4L, "p"))
      .toDF("u", "ts", "event_id", "t")
    val got = graft.ops.Events.lastTouchAttribution(ev, "u", "ts",
      Seq("ts", "event_id"), "t", "p", gapUs = 1800000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 2L, "(none)" -> 1L))
  }

  test("timeToConversion: clock opens at first start; conversions " +
      "before it do not count") {
    val s = spark
    import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "purchase"),  // converts, 10 s
      (2L, ts(5), "purchase"), (2L, ts(7), "view"),   // purchase precedes
      (3L, ts(0), "view")                             // never converts
    ).toDF("u", "ts", "t")
    val r = graft.ops.Events.timeToConversion(ev, "u", "ts", "t",
      "view", "purchase").head()
    assert(r.getAs[Long]("n_started") == 3L)
    assert(r.getAs[Long]("n_converted") == 1L)
    assert(r.getAs[Long]("rate_micro") == 333333L)
    assert(r.getAs[Double]("median_s") == 10.0)
    assert(r.getAs[Double]("p90_s") == 10.0)
  }

  test("hapaxReport: counts and ratio on a hand corpus") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("a a b c")).toDF("text")
    val r = graft.ops.Stats.hapaxReport(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("hapax") == 2L && r.getAs[Long]("dis") == 1L)
    assert(r.getAs[Double]("hapax_ratio") == 0.666667)
  }

  test("normStats: exact norms, zero-vector count, R-7 median") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = graft.ops.Similarity.normStats(df).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("min_norm") == 0.0)
    assert(r.getAs[Double]("max_norm") == 5.0)
    assert(r.getAs[Double]("avg_norm") == 2.0)
    assert(r.getAs[Double]("p50_norm") == 1.0)
  }

  test("mmrRerank: a STRING id column works (tie-break negates the " +
      "integer score, never the id)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      ("a", Seq(0.9f, 0.43589f, 0.0f)),
      ("d", Seq(0.95f, 0.3122f, 0.0f)),
      ("c", Seq(0.8f, -0.6f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(("q1", Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val picks = graft.ops.Similarity.mmrRerank(corpus, q,
      nCandidates = 3, k = 2, lambdaMicro = 500000L)
      .orderBy("rank").collect().map(_.getAs[String]("id")).toSeq
    // same geometry as the numeric-id spec: d first, then the diverse c
    assert(picks == Seq("d", "c"))
  }

  test("pcaTrain: exact 2-D line case — component along the line, " +
      "eigenvalues (E[t^2], 0)") {
    val s = spark
    import s.implicits._
    // x = t·(0.6, 0.8), t ∈ {-2,-1,0,1,2} → mean 0, cov = E[t²]·wwᵀ,
    // E[t²] = 2; principal direction ±(0.6, 0.8), sign-normalized +
    val df = Seq(-2f, -1f, 0f, 1f, 2f)
      .map(t => Tuple1(Seq(0.6f * t, 0.8f * t))).toDF("embedding")
    val m = graft.ops.Similarity.pcaTrain(df, "embedding", k = 2)
    assert(m.n == 5L)
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-6, m.eigenvalues.toSeq)
    assert(math.abs(m.eigenvalues(1)) < 1e-9)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-6 &&
      math.abs(m.components(0)(1) - 0.8) < 1e-6, m.components(0).toSeq)
    assert(m.mean.forall(x => math.abs(x) < 1e-7))
    assert(math.abs(m.totalVariance - 2.0) < 1e-6)
  }

  test("CovarianceMoments: split-invariance law — merged partials equal " +
      "the whole-input state bit-for-bit") {
    val agg = new graft.functions.Aggregators.CovarianceMoments(3)
    // all values are exact binary fractions, so every sum/product is
    // exact and bit-identity across addition orders is well-defined
    val rows: Seq[Seq[Float]] = Seq(
      Seq(1f, 2f, 3f), Seq(-1f, 0.5f, 2f), Seq(4f, 4f, 4f),
      Seq(0f, 0f, 1f), Seq(2.5f, -3f, 0.25f))
    val whole = rows.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    // every contiguous split point: state(A) ⊕ state(B) == state(A ∪ B)
    (1 until rows.size).foreach { cut =>
      val a = rows.take(cut).foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val b = rows.drop(cut).foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val merged = agg.merge(a, b)
      assert(merged.sameElements(whole), s"cut=$cut")
    }
    // nulls are skipped (null-in, null-out); a non-null vector of the
    // wrong length is a NAMED error, not a silent skip — a mixed-dim
    // corpus must not pass as moments over an unannounced subset
    val withNull = agg.reduce(
      rows.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)), null)
    assert(withNull.sameElements(whole))
    val err = intercept[IllegalArgumentException] {
      agg.reduce(rows.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
        Seq(1f))
    }
    assert(err.getMessage.contains("mixed-dimension"))
  }

  test("pcaTrain laws on real embeddings: orthonormal components, " +
      "projected variance equals each eigenvalue, whitening normalizes") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = graft.ops.Similarity.pcaTrain(emb, "embedding", k = 4)
    // orthonormality of the driver-side eigensolve
    for (i <- 0 until 4; j <- i until 4) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"($i,$j) -> $dot")
    }
    // eigenvalues descend and explain no more than the total variance
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues.sum <= m.totalVariance + 1e-9)
    // distributed projection: var_pop along component c == eigenvalue c
    val proj = graft.ops.Similarity.pcaProject(emb, m)
    val vars = proj
      .select(posexplode(col("proj")).as(Seq("c", "x")))
      .groupBy("c").agg(var_pop(col("x")).as("v"))
      .collect().map(r => r.getAs[Int]("c") -> r.getAs[Double]("v")).toMap
    (0 until 4).foreach { c =>
      assert(math.abs(vars(c) - m.eigenvalues(c)) < 1e-6,
        s"c=$c var=${vars(c)} ev=${m.eigenvalues(c)}")
    }
    // whitened variances are 1
    val wvars = graft.ops.Similarity.pcaProject(emb, m, whiten = true)
      .select(posexplode(col("proj")).as(Seq("c", "x")))
      .groupBy("c").agg(var_pop(col("x")).as("v"))
      .collect().map(_.getAs[Double]("v"))
    assert(wvars.forall(v => math.abs(v - 1.0) < 1e-6), wvars.toSeq)
  }

  test("normStats: approxP50 stays within measured error of the exact " +
      "median") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => (i.toLong, Seq(i.toFloat, 0.0f)))
      .toDF("vec_id", "embedding")
    val exact = graft.ops.Similarity.normStats(df).head()
      .getAs[Double]("p50_norm")
    val approx = graft.ops.Similarity.normStats(df, approxP50 = true)
      .head().getAs[Double]("p50_norm")
    // accuracy 10000 ⇒ rank error ≤ n/10000 = 0.5 ranks here; allow 2
    assert(math.abs(approx - exact) <= 2.0,
      s"approx=$approx exact=$exact")
  }

  test("rfmSegments: exact ntile remainder split; ties break on entity") {
    val s = spark
    import s.implicits._
    // 7 users, one event each: user u at day u with value u.
    // All frequencies tie at 1 → tie-break by user id; monetary = u;
    // recency_days = 7−u (user 7 most recent). ntile(5) over 7 rows:
    // tile sizes [2,2,1,1,1] → rn→tile = [1,1,2,2,3,4,5].
    val ev = (1 to 7).map(u => (u.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${u}%02d 12:00:00"),
      u.toDouble)).toDF("u", "ts", "v")
    val got = graft.ops.Events.rfmSegments(ev, "u", "ts", "v")
      .collect().map(r => r.getAs[Long]("u") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("r"),
          r.getAs[Long]("f"), r.getAs[Long]("m"),
          r.getAs[String]("segment"))).toMap
    val tile = Array(1L, 1L, 2L, 2L, 3L, 4L, 5L)
    (1 to 7).foreach { u =>
      val (rd, r, f, m, seg) = got(u.toLong)
      assert(rd == 7L - u, s"user $u recency $rd")
      // recency desc puts user 1 first; freq ties resolve by user id;
      // monetary ascends with u — all three give rank u
      assert((r, f, m) == ((tile(u - 1), tile(u - 1), tile(u - 1))),
        s"user $u tiles ($r,$f,$m)")
      assert(seg == s"${tile(u - 1)}${tile(u - 1)}${tile(u - 1)}")
    }
  }

  test("kaplanMeier: hand-computed survival curve with censoring, " +
      "and a wiped-out risk set → survival exactly 0") {
    val s = spark
    import s.implicits._
    def ts(d: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime +
        d * 86400000L)
    // A: 0→10 obs; B: 2→4 obs; C: 1 only (t=0) obs;
    // D: 0→29 censored (within 7d of max ts day 29)
    val ev = Seq(("A", ts(0)), ("A", ts(10)), ("B", ts(2)), ("B", ts(4)),
      ("C", ts(1)), ("D", ts(0)), ("D", ts(29))).toDF("e", "ts")
    val got = graft.ops.Events.kaplanMeier(ev, "e", "ts")
      .collect().map(r => r.getAs[Long]("t_days") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("events"),
          r.getAs[Long]("censored"), r.getAs[Double]("survival"))).toMap
    assert(got(0L) == ((4L, 1L, 0L, 0.75)))
    assert(got(2L) == ((3L, 1L, 0L, 0.5)))
    assert(got(10L) == ((2L, 1L, 0L, 0.25)))
    assert(got(29L) == ((1L, 0L, 1L, 0.25))) // censor: no factor
    // both remaining entities fail at t=5 → factor floors, S = 0
    val wipe = Seq(("A", ts(0)), ("A", ts(5)), ("B", ts(1)), ("B", ts(6)),
      ("E", ts(30))).toDF("e", "ts")
    val w = graft.ops.Events.kaplanMeier(wipe, "e", "ts")
      .collect().map(r => r.getAs[Long]("t_days") ->
        r.getAs[Double]("survival")).toMap
    assert(w(0L) == 1.0 && w(5L) == 0.0)
  }

  // ---------------- Events.transitionMatrix / topPaths ----------------

  test("transitionMatrix: lag pairs, conditional micros, first event free") {
    val s = spark
    import s.implicits._
    // user 1: a→b→a→b ; user 2: a→b — pairs: a→b ×3, b→a ×1
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (1L, 4L, "b"), (2L, 1L, "a"), (2L, 2L, "b"))
      .toDF("u", "seq", "t")
    val got = graft.ops.Events.transitionMatrix(ev, "u", Seq("seq"), "t")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got(("a", "b")) == ((3L, 1000000L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got.size == 2)
    // split destination: a→b, a→c from one source → 500000 each
    val ev2 = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "a"),
      (2L, 2L, "c")).toDF("u", "seq", "t")
    val g2 = graft.ops.Events.transitionMatrix(ev2, "u", Seq("seq"), "t")
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    assert(g2 == Map("b" -> 500000L, "c" -> 500000L))
  }

  test("topPaths: ordered prefixes, maxLen cut, count ties on path") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),
      (3L, 1L, "x"), (3L, 2L, "y"),
      (4L, 1L, "x"), (4L, 2L, "y")
    ).toDF("u", "seq", "t")
    val got = graft.ops.Events.topPaths(ev, "u", Seq("seq"), "t",
        maxLen = 3, k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    // a>b>c from users 1 (cut at 3) and 2; x>y from 3 and 4 — tie on
    // count breaks lexicographically
    assert(got == Seq((1L, "a>b>c", 2L), (2L, "x>y", 2L)), s"got $got")
  }

  // ---------------- Series.cusum ----------------

  test("cusum: fold matches prefix-sum identity; reset and alarm") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def t(sec: Int) = new Timestamp(sec * 1000L)
    // drift 150: values 200,200 → S 50,100; dip then spike: 100 resets
    // to 0, 260 → 110
    val ev = Seq(
      (1L, t(1), 1L, 200.0), (1L, t(2), 2L, 200.0),
      (2L, t(1), 1L, 100.0), (2L, t(2), 2L, 260.0),
      (3L, t(1), 1L, 10.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = graft.ops.Series.cusum(ev, Seq("user_id"),
        Seq("ts", "event_id"), "value",
        driftMicro = 150000000L, thresholdMicro = 100000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 100000000L, true),
      (2L, 2L, 110000000L, true), (3L, 1L, 0L, false)), s"got $got")
  }

  test("cusum: hot key with 1e6 events stays window-bound") {
    // the r12 collect_list form built a 1M-element array for this key;
    // the prefix-sum identity sorts within the partition instead. A
    // constant +1-micro drift makes the expected excursion exactly n.
    val s = spark
    import org.apache.spark.sql.functions._
    val n = 1000000L
    val ev = s.range(n).select(
      lit(1L).as("user_id"),
      timestamp_seconds(col("id")).as("ts"),
      col("id").as("event_id"),
      lit(151.0).as("value"))
    val got = graft.ops.Series.cusum(ev, Seq("user_id"),
        Seq("ts", "event_id"), "value",
        driftMicro = 150000000L, thresholdMicro = 1000000L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == n && r.getLong(2) == n * 1000000L &&
      r.getBoolean(3), s"got ${r.mkString(",")}")
  }

  // ---------------- Events.firstTouchAttribution ----------------

  test("firstTouchAttribution: session entry gets the credit, gaps split") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val gap = 60L // seconds
    val ev = Seq(
      // user 1 session A: view → click → purchase (credit: view)
      (1L, t(0), 1L, "view"), (1L, t(10), 2L, "click"),
      (1L, t(20), 3L, "purchase"),
      // user 1 session B after a gap: click → purchase (credit: click)
      (1L, t(200), 4L, "click"), (1L, t(210), 5L, "purchase"),
      // user 2: purchase opens its own session (credit: purchase)
      (2L, t(0), 1L, "purchase"),
      // user 3: no purchase → no credit
      (3L, t(0), 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Events.firstTouchAttribution(ev, "user_id", "ts",
        Seq("ts", "event_id"), "event_type", "purchase",
        gapUs = gap * 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L),
      s"got $got")
  }

  // ---------------- Dedup.dedupRateReport ----------------

  test("dedupRateReport: later source charged, normalization folds case") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "Hello  World", "a"),   // keeper (lowest id for the key)
      (2L, "hello world", "b"),    // dup of 1 after normalization
      (3L, "unique text", "b"),
      (4L, "hello world", "b"),    // another dup
      (5L, null: String, "c")      // null text: in n_docs, never a dupe
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.Dedup.dedupRateReport(df, "text", "doc_id",
        "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 0L, 0L), ("b", 3L, 2L, 666667L),
      ("c", 1L, 0L, 0L)), s"got $got")
  }

  // ---------------- Events.associationRules ----------------

  test("associationRules: support/confidence/lift, cap drops wide baskets") {
    val s = spark
    import s.implicits._
    // baskets: {x,y} ×3, {x,z} ×1, {y} ×1 → N=5 capped baskets, plus a
    // wide basket (5 items > cap 4) that must vanish from every count
    val rows =
      Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"),
        (4L, "x"), (4L, "z"), (5L, "y")) ++
      (1 to 5).map(i => (9L, s"w$i"))
    val df = rows.toDF("basket", "item")
    val got = graft.ops.Events.associationRules(df, "basket", "item",
        maxBasketSize = 4, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // x,y: pair 3, n_x 4, n_y 4, conf 750000, lift 5·3/(4·4) = 937500
    assert(got(("x", "y")) == ((3L, 4L, 4L, 750000L, 937500L)),
      s"got ${got(("x", "y"))}")
    // x,z: pair 1, conf 1/4, lift 5·1/(4·1) = 1250000
    assert(got(("x", "z")) == ((1L, 4L, 1L, 250000L, 1250000L)))
    // nothing from the wide basket
    assert(!got.keys.exists(p => p._1.startsWith("w") ||
      p._2.startsWith("w")))
  }

  // ---------------- Series.percentRankBy ----------------

  test("percentRankBy: uniform ranks, tie sharing, singleton zero") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 40.0),
      ("solo", 7.0)).toDF("k", "v")
    val got = graft.ops.Series.percentRankBy(df, "v", Seq("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    // (rank-1)/(n-1) over 4 rows: 10→0, 20→1/3 (both), 40→1
    assert(got == Set(("g", 10.0, 0.0), ("g", 20.0, 0.333333),
      ("g", 40.0, 1.0), ("solo", 7.0, 0.0)), s"got $got")
  }

  // ---------------- RowOps.dropConsecutiveRepeats ----------------

  test("dropConsecutiveRepeats: runs collapse, transitions survive, nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1L, Option("up")), (1L, 2L, Option("up")), (1L, 3L, Option("down")),
      (1L, 4L, Option("down")), (1L, 5L, Option("up")),
      (1L, 6L, None), (1L, 7L, None), (1L, 8L, Option("up")),
      (2L, 1L, Option("up"))
    ).toDF("k", "seq", "v")
    val got = df.dropConsecutiveRepeats(Seq("k"), Seq("seq"), Seq("v"))
      .orderBy("k", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // kept: 1,3,5 (null run collapses to 6), 8; key 2's first row
    assert(got == Seq((1L, 1L), (1L, 3L), (1L, 5L), (1L, 6L), (1L, 8L),
      (2L, 1L)), s"got $got")
  }

  // ---------------- Eval.abTest ----------------

  test("abTest: exact counts, z sign, degenerate pool null") {
    val s = spark
    import s.implicits._
    // a: 4 rows 1 conv (25%); b: 4 rows 3 conv (75%) → lift +500000
    val df = Seq(("a", true), ("a", false), ("a", false), ("a", false),
      ("b", true), ("b", true), ("b", true), ("b", false),
      ("c", true)).toDF("g", "conv")
    val r = graft.ops.Eval.abTest(df, "g", col("conv"), "a", "b")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 4L, 3L)))
    assert(r.getLong(4) == 250000L && r.getLong(5) == 750000L)
    assert(r.getLong(6) == 500000L)
    // z = 0.5 / sqrt(.5·.5·(1/4+1/4)) = 1.414213562…
    assert(math.abs(r.getLong(7) - 1414213562L) <= 1L, s"z=${r.getLong(7)}")
    // all-convert pool → z null, rates still reported
    val deg = Seq(("a", true), ("b", true)).toDF("g", "conv")
    val d = graft.ops.Eval.abTest(deg, "g", col("conv"), "a", "b")
      .collect().head
    assert(d.isNullAt(7) && d.getLong(4) == 1000000L)
  }

  // ---------------- Agg.weightedPercentile ----------------

  test("weightedPercentile: weighted median shifts with weights, ties safe") {
    val s = spark
    import s.implicits._
    // values 1..4 weight 1 → median (p=.5) is 2 (cum 2 ≥ 2 = .5·4)
    val flat = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("g", 4.0, 1L)).toDF("k", "v", "w")
    val m1 = graft.ops.Agg.weightedPercentile(flat, Seq("k"), "v", "w",
      500000L).collect().head.getDouble(1)
    assert(m1 == 2.0)
    // weight piled on 4 drags the weighted median there
    val heavy = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("g", 4.0, 10L)).toDF("k", "v", "w")
    val m2 = graft.ops.Agg.weightedPercentile(heavy, Seq("k"), "v", "w",
      500000L).collect().head.getDouble(1)
    assert(m2 == 4.0)
    // duplicate values accumulate as peers (RANGE frame): p=.5 of
    // weights (1,1,1,9) on values (5,5,5,9) → cum at value 5 is 3 < 6,
    // so 9 wins; zero/negative weights drop
    val ties = Seq(("g", 5.0, 1L), ("g", 5.0, 1L), ("g", 5.0, 1L),
      ("g", 9.0, 9L), ("g", 0.5, 0L), ("g", 0.1, -3L)).toDF("k", "v", "w")
    val m3 = graft.ops.Agg.weightedPercentile(ties, Seq("k"), "v", "w",
      500000L).collect().head.getDouble(1)
    assert(m3 == 9.0)
    // p = 0 picks the minimum (cum ≥ 0 everywhere)
    val m0 = graft.ops.Agg.weightedPercentile(flat, Seq("k"), "v", "w",
      0L).collect().head.getDouble(1)
    assert(m0 == 1.0)
  }

  // ---------------- Quality.benfordReport ----------------

  test("benfordReport: string-form digits, all 9 rows, positives only") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 19L, 123L, 2L, 250L, 9L, -5L, 0L)
      .toDF("v")
      .union(Seq(Option.empty[Long]).toDF("v"))
    val got = graft.ops.Quality.benfordReport(df, "v")
      .orderBy("digit")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // digits of 1, 19, 123, 2, 250, 9 → 1:3, 2:2, 9:1; -5, 0, null drop
    assert(got.map(_._1) == (1L to 9L))
    assert(got.map(_._2) == Seq(3L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // expected shares sum to ~1e6 micros
    val exp = graft.ops.Quality.benfordReport(df, "v")
      .agg(sum(col("expected_micro"))).head.getLong(0)
    assert(math.abs(exp - 1000000L) <= 5L, s"expected sum $exp")
  }

  // ---------------- Web.canonicalizeUrl ----------------

  test("canonicalizeUrl: case, slash, fragment, tracking params; junk null") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      "HTTP://Example.COM/p/1",
      "http://example.com/p/1/",
      "http://example.com/p/1?utm_source=feed#top",
      "http://example.com/p/1?id=7&utm_b=2&ref=x",
      "http://example.com/p/1?refresh=1&ref_id=9",
      "not a url at all"
    ).toDF("u")
    val got = urls.select(graft.ops.Web.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got(0) == Some("http://example.com/p/1"))
    assert(got(1) == Some("http://example.com/p/1"))
    assert(got(2) == Some("http://example.com/p/1"))
    assert(got(3) == Some("http://example.com/p/1?id=7"))
    // 'ref' drops exactly: refresh/ref_id are NOT tracking params
    assert(got(4) == Some("http://example.com/p/1?refresh=1&ref_id=9"))
    assert(got(5).isEmpty)
  }

  // ---------------- TextFunctions.stripBoilerplateLines ----------------

  test("stripBoilerplateLines: group-share threshold, order kept, nulls pass") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "d1", Option("nav bar\nunique one\nfooter")),
      (2L, "d1", Option("nav bar\nunique two\nfooter")),
      (3L, "d1", Option("nav bar\nunique three")),
      (4L, "d2", Option("nav bar\nother domain text")),
      (5L, "d2", Option.empty[String])
    ).toDF("id", "dom", "text")
    // d1: nav bar 3/3, footer 2/3 → at 2/3 threshold both strip
    val got = graft.functions.TextFunctions.stripBoilerplateLines(
        df, "text", "dom", "id", minShareMicro = 660000L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(2)), r.getLong(3), r.getLong(4))).toSeq
    assert(got(0) == ((1L, Some("unique one"), 3L, 2L)), s"got ${got(0)}")
    assert(got(1) == ((2L, Some("unique two"), 3L, 2L)))
    assert(got(2) == ((3L, Some("unique three"), 2L, 1L)))
    // d2 has ONE doc: its every line is 100% share → stripped to empty
    assert(got(3) == ((4L, Some(""), 2L, 2L)))
    // null text passes through as null with zero counts
    assert(got(4) == ((5L, None, 0L, 0L)))
  }

  // ---------------- Similarity.quantizeInt8 ----------------

  test("quantizeInt8: max-abs codes, zero-vector guard, mse audit") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),   // scale 2: codes 64, -127, 32
      (2L, Seq(0.0f, 0.0f)),          // zero vector → scale 0, codes 0
      (3L, Seq(127.0f))               // single value → code 127, mse 0
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.quantizeInt8(df)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Int](2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got(0)._2 == 2.0 &&
      got(0)._3 == Seq(64, -127, 32), s"got ${got(0)}")
    assert(got(1)._2 == 0.0 && got(1)._3 == Seq(0, 0) && got(1)._4 == 0L)
    assert(got(2)._3 == Seq(127) && got(2)._4 == 0L)
    // codes bounded by construction
    assert(got.flatMap(_._3).forall(c => c >= -127 && c <= 127))
  }

  test("randomProjection: deterministic Rademacher signs, exact " +
      "ten-thousandths, k columns") {
    val s = spark
    import s.implicits._
    def sign(i: Long, j: Long): Double =
      if (((i * 73856093L + j * 19349663L) % 1000003L) % 2L == 0L) 1.0
      else -1.0
    val v = Seq(1.0f, 2.0f, 3.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.randomProjection(df, k = 4).head()
    assert(got.getAs[Long]("dim") == 3L)
    val proj = got.getAs[String]("proj").split(",").map(_.toLong)
    assert(proj.length == 4)
    val want = (0 until 4).map { j =>
      val sum = v.indices.map(i => v(i).toDouble * sign(i, j)).sum
      math.round(sum / math.sqrt(4.0) * 1e4)
    }
    assert(proj.toSeq == want, s"${proj.toSeq} vs $want")
    // same input → same output (no hidden RNG state)
    val again = graft.ops.Similarity.randomProjection(df, k = 4).head()
    assert(again.getAs[String]("proj") == got.getAs[String]("proj"))
  }

  test("fleschReadability: hand-computed score, bands, empty → null") {
    val s = spark
    import s.implicits._
    val df = Seq(("The cat sat.", 1L), ("", 2L)).toDF("t", "id")
    val f = graft.functions.TextFunctions.fleschReadability(col("t"))
    val rows = df.select(col("id"), f.as("r")).orderBy("id").collect()
    val r1 = rows(0).getStruct(1)
    // 3 words, 1 sentence, 1 vowel-group each → 206.835−3.045−84.6
    assert(r1.getAs[Long]("n_words") == 3L)
    assert(r1.getAs[Long]("n_sentences") == 1L)
    assert(r1.getAs[Long]("n_syllables") == 3L)
    assert(r1.getAs[Double]("flesch") == 119.19)
    assert(r1.getAs[String]("band") == "very_easy")
    val r2 = rows(1).getStruct(1)
    assert(r2.getAs[Long]("n_words") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("flesch")) &&
      r2.isNullAt(r2.fieldIndex("band")))
  }

  // ---------------- Agg.skewReport ----------------

  test("skewReport: heavy key surfaces with share and x-median weight") {
    val s = spark
    import s.implicits._
    // key "hot" 8 rows; 4 singleton keys → median per-key count 1
    val df = (Seq.fill(8)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val got = graft.ops.Agg.skewReport(df, Seq("k"), topK = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // hot: share 8/12 = 666667 micro; ×median = 8e6 (median count 1)
    assert(got.head == ((1L, "hot", 8L, 666667L, 8000000L)), s"got $got")
    assert(got.map(_._2) == Seq("hot", "a", "b"))
  }

  // ---------------- Eval.fleissKappa ----------------

  test("fleissKappa: perfect agreement, pe=1 pin, unequal raters fail fast") {
    val s = spark
    import s.implicits._
    // two raters, two items, both agree, two categories used
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("item", "label")
    val p = graft.ops.Eval.fleissKappa(perfect, "item", "label")
      .collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0 && p.getDouble(3) == 0.5 &&
      p.getDouble(4) == 1.0)
    // every rating one category: pe = 1 → kappa pinned to 1
    val uni = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "label")
    val u = graft.ops.Eval.fleissKappa(uni, "item", "label").collect().head
    assert(u.getDouble(3) == 1.0 && u.getDouble(4) == 1.0)
    // unequal rater counts must fail fast, not average away
    val bad = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("item", "label")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Eval.fleissKappa(bad, "item", "label")
    }
    assert(e.getMessage.contains("unequal rater counts"))
  }

  // ---------------- IO.compactionPlan ----------------

  test("compactionPlan: cumulative buckets, dense ids, partition isolation") {
    val s = spark
    import s.implicits._
    val files = Seq(
      ("p1", 1L, 6L), ("p1", 2L, 6L), ("p1", 3L, 6L),
      // p2 leads with an oversized file; the trailing small file shares
      // the bucket its cumulative end lands in
      ("p2", 1L, 25L), ("p2", 2L, 3L)
    ).toDF("p", "f", "bytes")
    val got = graft.sources.IO.compactionPlan(files, "bytes", "f", 10L,
        Seq("p"))
      .orderBy("p", "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("p1", 1L, 1L, 6L, 1L, 1L),   // cum 6 → bucket 0
      ("p1", 2L, 2L, 12L, 2L, 3L),  // cums 12, 18 → bucket 1
      ("p2", 1L, 2L, 28L, 1L, 2L)), // cums 25, 28 → bucket 2, dense → 1
      s"got $got")
  }

  test("compactFiles: one file per planned group; fingerprint unchanged") {
    val s = spark
    import s.implicits._
    import graft.sources.IO
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_unit").toString
    val src = base + "/src"
    val dst = base + "/dst"
    val df = (1 to 2000).map(i => (i.toLong, s"g${i % 2}", s"payload $i"))
      .toDF("id", "g", "payload")
    IO.writePartitioned(df, src, partitionCols = Seq("g"),
      sortCols = Seq("id"), maxRecordsPerFile = 100L)
    val stats = IO.fileStats(s, src, Seq("id", "g"))
      .withColumn("file", regexp_replace(col("file"), "^file:/+", "/"))
    val manifest = IO.fsManifest(s, src).join(stats, Seq("file"))
      .withColumn("g", col("min_g"))
    val nSrcFiles = manifest.count()
    val plan = IO.compactionPlan(manifest, "bytes", "min_id", 8192L,
      Seq("g")).collect()
    val written = IO.compactFiles(s, manifest, dst, "file", "bytes",
      "min_id", "id", 8192L, partitionCols = Seq("g")).collect()
    // one output file per planned group, and fewer files than the input
    assert(written.length == plan.length, s"${written.length} != ${plan.length}")
    assert(written.length < nSrcFiles)
    assert(written.map(_.getString(3)).distinct.length == written.length)
    // integrity: order-independent fingerprint before == after
    val cols = Seq("id", "g", "payload")
    val fp = (p: String) => graft.ops.Quality.tableFingerprint(
      s.read.parquet(p).select(cols.map(col): _*), cols).collect().head
    assert(fp(src) == fp(dst))
    // each output file is internally sorted by the data order column
    val perFile = s.read.parquet(dst)
      .withColumn("f", input_file_name())
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("f")).orderBy(monotonically_increasing_id())))
      .withColumn("sorted_rn", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy(col("f")).orderBy(col("id"))))
    assert(perFile.filter(col("rn") =!= col("sorted_rn")).count() == 0)
  }

  test("bloomIndex/bloomPrunedScan: pruned read equals full filter, " +
      "actually skips files, absent keys read nothing wrong") {
    val s = spark
    import s.implicits._
    import graft.sources.IO
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_unit").toString + "/t"
    // 1000 ids range-split across 8 files → each file holds ~125 ids
    (0L until 1000L).map(i => (i, s"payload $i")).toDF("id", "payload")
      .repartitionByRange(8, col("id"))
      .write.mode("overwrite").parquet(dir)
    val full = s.read.parquet(dir)
    val nFiles = full.inputFiles.length
    assert(nFiles == 8, s"expected 8 files, got $nFiles")
    val idx = IO.bloomIndex(s, dir, "id", mBits = 1L << 14, numHashes = 7)
    // probe 3 ids from the same range → at most a couple candidate files
    val got = IO.bloomPrunedScan(s, dir, idx, "id", Seq(10L, 20L, 30L))
    assert(got.inputFiles.length < nFiles,
      s"bloom pruned nothing: ${got.inputFiles.length} of $nFiles")
    assert(got.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq(10L, 20L, 30L).map(i => (i, s"payload $i")))
    // scattered probes still return exactly the full-scan filter rows
    val scattered = Seq(1L, 500L, 999L)
    assert(IO.bloomPrunedScan(s, dir, idx, "id", scattered)
      .orderBy("id").collect().map(_.getLong(0)).toSeq == scattered)
    // absent key: zero rows (exact filter kills any false-positive file)
    assert(IO.bloomPrunedScan(s, dir, idx, "id", Seq(123456L)).count() == 0L)
  }

  // ---------------- Dedup.clusterRepresentatives ----------------

  test("clusterRepresentatives keeps max score, ties to lowest id") {
    val s = spark
    import s.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "cluster")
    val scored = Seq((1L, 10L), (2L, 30L), (3L, 30L), (9L, 5L))
      .toDF("doc_id", "score")
    val out = graft.ops.Dedup.clusterRepresentatives(
        clusters, scored, "doc_id", "score")
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // cluster 1: ids 2 and 3 tie at 30 → lowest id (2) wins, not first (1)
    assert(out == Seq((1L, 2L, 30L), (9L, 9L, 5L)))
  }

  test("clusterRepresentatives: string ids and Long.MinValue ids survive") {
    val s = spark
    import s.implicits._
    // string ids: the old ordered-struct-max impl negated the id, which
    // implicitly cast strings to double → null representatives
    val sc = Seq(("a", 1L), ("b", 1L)).toDF("id", "cluster")
    val ss = Seq(("a", 10L), ("b", 10L)).toDF("doc_id", "score")
    val sOut = graft.ops.Dedup.clusterRepresentatives(sc, ss, "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(sOut == Seq((1L, "a", 10L))) // tie → lexicographically lowest id
    // Long.MinValue id: negation would overflow back to MinValue
    val mc = Seq((Long.MinValue, 7L), (4L, 7L)).toDF("id", "cluster")
    val ms = Seq((Long.MinValue, 3L), (4L, 3L)).toDF("doc_id", "score")
    val mOut = graft.ops.Dedup.clusterRepresentatives(mc, ms, "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mOut == Seq((7L, Long.MinValue, 3L)))
  }

  // ---------------- Events.retentionCohorts ----------------

  test("retentionCohorts: cohort by first bucket, distinct actives per cell") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", 5L), ("u1", 6L),   // duplicate activity in bucket 0 counts once
      ("u1", 15L), ("u1", 35L), // buckets 1, 3
      ("u2", 2L),               // bucket 0 only
      ("u3", 12L), ("u3", 25L)) // first bucket 1, active 1, 2
      .toDF("uid", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Events.retentionCohorts(df, "uid", "ts", 10L)
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 2L),  // u1, u2
      (0L, 1L, 1L),  // u1
      (0L, 3L, 1L),  // u1
      (1L, 0L, 1L),  // u3
      (1L, 1L, 1L))) // u3
  }

  // ---------------- TextFunctions.filterAttrition ----------------

  test("filterAttrition charges each doc to the FIRST failing rule") {
    val s = spark
    import s.implicits._
    val good = ("the cat sat on the mat and it was a fine day in town " * 3)
    val docs = Seq(
      good,          // passes all four rules
      "hi",          // fails rule 1 (too short)
      good + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" +
        "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!",
      // ^ fails rule 2 (punct soup) but NOT rule 1
      "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll"
      // ^ length ok, punct ok, fails rule 3 (no stopwords)
    ).toDF("text")
    val out = TextFunctions.filterAttrition(docs, "text")
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (1, "length_band", 4L, 1L, 3L),
      (2, "punct_ratio", 3L, 1L, 2L),
      (3, "stopword_ratio", 2L, 1L, 1L),
      (4, "mean_word_length", 1L, 0L, 1L)))
  }

  // ---------------- TextFunctions.bpePairCounts ----------------

  test("bpePairCounts: frequency-weighted char pairs over the vocab") {
    val s = spark
    import s.implicits._
    // "ab" ×3, "abc" ×1 → pair "a b": 3+1 = 4; "b c": 1
    val docs = Seq("ab ab", "ab abc").toDF("text")
    val out = TextFunctions.bpePairCounts(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 4L), ("b c", 1L)))
  }

  test("bpeTrain/bpeEncode: greedy merge semantics, runs, and replay law") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    // corpus engineered so merge 1 = (a,a) [cnt 9 in "aaaa"x3 words] —
    // the run case where greedy left-to-right differs from naive
    // re-scanning: "aaaa" must become [aa, aa], "aaa" → [aa, a]
    val docs = Seq("aaaa aaaa aaaa aaa xy", "xy xy").toDF("text")
    // snapshot, not isEmpty: the fixture session is shared across suites
    // and other specs legitimately hold unmanaged caches
    val rddsBefore = s.sparkContext.getPersistentRDDs.keySet
    val merges = TextFunctions.bpeTrain(docs, "text", 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // pairs: (a,a) = 3x3 (from aaaa) + 2 (from aaa) = 11; (x,y) = 3
    assert(merges == Seq((1, "a a", 11L), (2, "a aa", 3L)) ||
      merges.head == ((1, "a a", 11L)),
      s"first merge must be (a,a) with weighted count 11, got $merges")
    // after merge 1 the vocab pairs are: aaaa→[aa,aa]: (aa,aa)=3;
    // aaa→[aa,a]: (aa,a)=1; xy: (x,y)=3 → merge 2 = (aa,aa)? no:
    // ties/count: (aa,aa)=3, (x,y)=3 → tie broken by pair string:
    // "aa aa" < "x y"
    assert(merges(1) == ((2, "aa aa", 3L)), s"got ${merges(1)}")
    // encode replays training segmentation exactly
    val enc = docs.select(TextFunctions.bpeEncode(col("text"),
      Seq(("a", "a"), ("aa", "aa"))).as("t")).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(enc == List(
      List("aaaa", "aaaa", "aaaa", "aa", "a", "x", "y"),
      List("x", "y", "x", "y")))
    // exhaustion: more rounds than possible merges stops early
    val tiny = Seq("ab ab").toDF("text")
    val m2 = TextFunctions.bpeTrain(tiny, "text", 10).collect()
    assert(m2.length == 1 && m2(0).getString(1) == "a b")
    // no leaked persisted RDDs from the per-round checkpoints (NEW ids
    // only — old ids may be dropped asynchronously by the ContextCleaner)
    assert((s.sparkContext.getPersistentRDDs.keySet -- rddsBefore).isEmpty)
  }

  // ---------------- TextFunctions.collocations ----------------

  test("collocations: exact PMI values and rank order on a known corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "aa bb cc dd", "aa bb cc ee", "aa bb cc ff", "cc aa bb")
      .toDF("text")
    val out = TextFunctions.collocations(docs, "text", 2L, 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // N=11 bigrams. (bb,cc): c_ab=3, c_a(bb)=3, c_b(cc)=3 →
    // pmi = ln(3·11/9) ≈ 1.299283; (aa,bb): c_ab=4, c_a(aa)=4,
    // c_b(bb)=4 → pmi = ln(2.75) ≈ 1.011601. The rarer right-word
    // ranks (bb,cc) FIRST despite its lower raw count — the point of
    // PMI over frequency.
    assert(out == Seq(
      ("bb", "cc", 3L, math.rint(math.log(3.0 * 11 / 9) * 1e6) / 1e6),
      ("aa", "bb", 4L, math.rint(math.log(2.75) * 1e6) / 1e6)))
  }
}
