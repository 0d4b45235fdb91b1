package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Agg
import graft.ops.Agg._

class AggSpec extends AnyFunSuite {
  import SparkFixture._

  test("groupAgg: count/sum/min/max in one shuffle") {
    val res = person.groupAgg(Seq("name"), Seq(
      count(lit(1)).as("n"), sum(col("age")).as("sum_age"),
      min(col("age")).as("min_age"), max(col("age")).as("max_age")))
      .orderBy("name").collect()
    assert(res.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("Alice", 2L, 35L), ("Bob", 2L, 75L), ("Mark", 3L, 90L)))
  }

  test("stdRef = sqrt of sum of squared deviations (reference std.kt:58-64)") {
    // ages 15,45,20,40,30,20,30 → mean=200/7; Σ(x−μ)² computed by hand
    val ages = Seq(15.0, 45.0, 20.0, 40.0, 30.0, 20.0, 30.0)
    val mu = ages.sum / ages.size
    val expected = math.sqrt(ages.map(a => (a - mu) * (a - mu)).sum)
    val got = person.agg(Agg.stdRef(col("age")).as("s")).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"$got vs $expected")
  }

  test("medianExact: sorted middle (odd), mean of middles (even)") {
    assert(person.agg(Agg.medianExact(col("age"))).head().getDouble(0) == 30.0)
    val even = person.filter(col("weight").isNotNull) // 54,87,68,55,90
    assert(even.agg(Agg.medianExact(col("weight"))).head().getDouble(0) == 68.0)
  }

  test("meanRef: NaN poisons when skipNa=false, skipped when true, empty→NaN") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    assert(df.agg(Agg.meanRef(col("x"))).head().getDouble(0).isNaN)
    assert(df.agg(Agg.meanRef(col("x"), skipNa = true)).head().getDouble(0) == 2.0)
    val empty = df.filter(col("x") > 100)
    assert(empty.agg(Agg.meanRef(col("x"))).head().getDouble(0).isNaN)
  }

  test("maxByRow returns the whole argmax row per group") {
    val res = person.maxByRow(Seq("name"), "age").orderBy("name").collect()
    assert(res.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("Alice", 20), ("Bob", 45), ("Mark", 40)))
    // payload columns ride along
    assert(res.map(_.schema.fieldNames.toSeq).head ==
      Seq("name", "age", "city", "weight"))
  }

  test("minByRow ties break deterministically via struct order") {
    val res = person.minByRow(Seq("name"), "age").orderBy("name").collect()
    assert(res.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("Alice", 15), ("Bob", 30), ("Mark", 20)))
  }

  test("valuesFor collects sorted per-group lists") {
    val res = person.valuesFor(Seq("name"), Seq("age")).orderBy("name").collect()
    assert(res.map(_.getSeq[Int](1)).toSeq ==
      Seq(Seq(15, 20), Seq(30, 45), Seq(20, 30, 40)))
  }

  test("toGroupedFrames/ungroupFrames round-trips the frame") {
    val back = person.toGroupedFrames(Seq("name")).ungroupFrames()
    assert(back.count() == 7)
    assert(back.columns.toSet == person.columns.toSet)
    assert(back.orderBy("name", "age").select("age").collect().map(_.getInt(0)).toSeq
      == Seq(15, 20, 30, 45, 20, 30, 40))
  }

  test("sumOf/meanOf aggregate row expressions per group") {
    val r = person.sumOf(Seq("name"), col("age") * 2, "dbl")
      .orderBy("name").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(70L, 150L, 180L))
    val m = person.meanOf(Seq("name"), col("age") + 1, "m")
      .orderBy("name").collect()
    assert(math.abs(m(0).getDouble(1) - 18.5) < 1e-9)
  }

  test("countWhere") {
    assert(person.agg(Agg.countWhere(col("age") > 25)).head().getLong(0) == 4L)
  }

  test("nunique") {
    val r = person.nunique(Seq("name"), Seq("city")).orderBy("name").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L)) // null city not counted
  }

  test("describeAll profiles count/nulls/unique/top/mean/min/max") {
    val d = person.describeAll(Seq("age", "city")).orderBy("column").collect()
    val age = d(0)
    assert(age.getString(0) == "age")
    assert(age.getLong(1) == 7)      // count
    assert(age.getLong(2) == 0)      // nulls
    assert(age.getLong(3) == 5)      // unique
    assert(math.abs(age.getDouble(6) - 200.0 / 7) < 1e-9) // mean
    val city = d(1)
    assert(city.getLong(1) == 6 && city.getLong(2) == 1)
    assert(city.getString(4) == "Moscow" && city.getLong(5) == 2) // top, freq
  }

  test("describeAll and tryConvertTo survive quote/backtick column names") {
    // regression for the string-SQL unpivot/try_cast paths: these names
    // would have broken (or injected into) the parsed expression
    val s = SparkFixture.spark
    import s.implicits._
    import graft.ops.Surgery._
    val df = Seq(("1", "x"), ("2", "y"), ("zz", "y"))
      .toDF("it's `quoted`", "b`tick")
    val d = df.describeAll().orderBy("column").collect()
    assert(d.length == 2)
    assert(d(0).getString(0) == "b`tick" && d(0).getLong(5) == 2) // freq(y)
    assert(d(1).getString(0) == "it's `quoted`" && d(1).getLong(1) == 3)
    val c = df.tryConvertTo("it's `quoted`",
      org.apache.spark.sql.types.IntegerType)
    assert(c.schema("it's `quoted`").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // unparseable value nulls instead of throwing under ANSI
    assert(c.filter(graft.core.SchemaOps.colAt(Seq("it's `quoted`")).isNull)
      .count() == 1)
  }

  test("corrMatrix is symmetric with unit diagonal") {
    val m = person.na.drop().corrMatrix(Seq("age", "weight"))
      .orderBy("column").collect()
    assert(m.length == 2)
    assert(math.abs(m(0).getDouble(1) - 1.0) < 1e-9) // corr(age,age)
    assert(math.abs(m(1).getDouble(2) - 1.0) < 1e-9) // corr(weight,weight)
    assert(math.abs(m(0).getDouble(2) - m(1).getDouble(1)) < 1e-9)
  }

  test("rankBuckets: exact rank deciles, ties share a bucket") {
    val s = spark
    import s.implicits._
    // 10 rows, scores 1..10 → bucket(x) = #below(x)·10/10 = rank-1
    val df = (1 to 10).toDF("v").rankBuckets("v", 10)
    val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    (1 to 10).foreach(v => assert(got(v) == v - 1, s"score $v"))
    // ties: 4×a, 4×b, 2×c with n=2 → buckets by cumulative rank counts
    val t = Seq(1, 1, 1, 1, 5, 5, 5, 5, 9, 9).toDF("v").rankBuckets("v", 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toSet
    assert(t == Set(1 -> 0, 5 -> 0, 9 -> 1)) // 0·2/10=0, 4·2/10=0, 8·2/10=1
    // null scores rank first and are NOT dropped (null-safe join key)
    val withNull = Seq[Option[Int]](None, Some(3), Some(7)).toDF("v")
      .rankBuckets("v", 3)
    assert(withNull.count() == 3)
    val nb = withNull.collect()
      .map(r => Option(r.get(0)) -> r.getInt(1)).toMap
    assert(nb(None) == 0 && nb(Some(3)) == 1 && nb(Some(7)) == 2)
  }

  test("trimmedMeanBy: drops k lowest/highest; frac 0 is the mean; " +
      "tie choice can't move the result") {
    val s = spark
    import s.implicits._
    // g: 1..10 → k=1 → mean of 2..9 = 5.5; h: outlier-poisoned
    val df = ((1 to 10).map(v => ("g", v.toDouble)) ++
      Seq(("h", 1e9), ("h", 2.0), ("h", 3.0), ("h", 4.0), ("h", -1e9)))
      .toDF("k", "v")
    val got = Agg.trimmedMeanBy(df, Seq("k"), "v", 0.1)
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n"),
        r.getAs[Long]("n_trimmed"), r.getAs[Double]("trimmed_mean")))
    // h: n=5 → k=⌊0.5⌋=0, nothing trims → the poisoned mean 1.8 survives
    assert(got.toSeq == Seq(("g", 10L, 8L, 5.5), ("h", 5L, 5L, 1.8)))
    // frac 0.2 on h drops both outliers → mean(2,3,4) = 3
    val h = Agg.trimmedMeanBy(df, Seq("k"), "v", 0.2)
      .where(col("k") === "h").collect().head
    assert(h.getAs[Long]("n_trimmed") == 3L &&
      h.getAs[Double]("trimmed_mean") == 3.0)
    // all-tied group: any trimmed subset has the same mean
    val tied = Seq.fill(10)(("t", 7.0)).toDF("k", "v")
    assert(Agg.trimmedMeanBy(tied, Seq("k"), "v", 0.3)
      .collect().head.getAs[Double]("trimmed_mean") == 7.0)
  }

  test("giniConcentration: balanced → 0; one-holder → (n−1)/n; " +
      "null group is a level") {
    val s = spark
    import s.implicits._
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("g", "w")
    assert(Agg.giniConcentration(eq, "g", col("w")).collect().head
      .getAs[Long]("gini_nano") == 0L)
    // all mass in one of 4 groups → G = 3/4
    val one = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L))
      .toDF("g", "w")
    val g1 = Agg.giniConcentration(one, "g", col("w")).collect().head
    assert(g1.getAs[Long]("n_groups") == 4L &&
      g1.getAs[Long]("total") == 100L &&
      g1.getAs[Long]("gini_nano") == 750000000L)
    val withNull = Seq((Option("a"), 5L), (Option.empty[String], 5L))
      .toDF("g", "w")
    val g2 = Agg.giniConcentration(withNull, "g", col("w")).collect().head
    assert(g2.getAs[Long]("n_groups") == 2L &&
      g2.getAs[Long]("gini_nano") == 0L)
  }

  test("Incremental: state(A) ⊕ state(B) == state(A ∪ B) exactly; " +
      "delta-only keys appear; empty delta is identity; nulls counted") {
    val s = spark
    import s.implicits._
    import graft.ops.Incremental._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i => (s"k${i % 5}",
      if (i % 19 == 0) Option.empty[Double]
      else Option(rnd.nextDouble() * 1000 - 500))) :+
      (("knew", Option(42.5)))
    val all = rows.toDF("k", "v")
    val a = all.where(abs(hash(col("v"))) % 3 =!= 0 || col("v").isNull)
    val b = all.where(abs(hash(col("v"))) % 3 === 0 && col("v").isNotNull)
    def render(df: org.apache.spark.sql.DataFrame) =
      finalizeAggState(df, Seq("k")).orderBy("k").collect()
        .map(_.toSeq).toSeq
    val direct = render(aggState(all, Seq("k"), "v"))
    val merged = render(mergeAggState(aggState(a, Seq("k"), "v"),
      aggState(b, Seq("k"), "v"), Seq("k")))
    assert(merged == direct, "monoid law: split must be invisible")
    // empty delta: identity
    val empty = aggState(all.limit(0), Seq("k"), "v")
    assert(render(mergeAggState(aggState(all, Seq("k"), "v"), empty,
      Seq("k"))) == direct)
    // nulls: counted in n, absent from numeric fields
    val withNulls = Seq(("g", Option(1.0)), ("g", Option.empty[Double]))
      .toDF("k", "v")
    val st = aggState(withNulls, Seq("k"), "v").collect().head
    assert(st.getAs[Long]("n") == 2L && st.getAs[Long]("n_vals") == 1L &&
      st.getAs[Long]("sum_micro") == 1000000L)
    // all-null group finalizes with null mean/min/max, n intact
    val nul = Seq(("z", Option.empty[Double])).toDF("k", "v")
    val fz = finalizeAggState(aggState(nul, Seq("k"), "v"), Seq("k"))
      .collect().head
    assert(fz.getAs[Long]("n") == 1L && fz.isNullAt(3) && fz.isNullAt(4))
  }

  test("mutualInformation: independence → 0; determinism → MI = H, " +
      "NMI = 1; constant margin → NMI 0") {
    val s = spark
    import s.implicits._
    // uniform independent 2×2 → every cell term ln(1) = 0
    val ind = (for (a <- Seq("x", "y"); b <- Seq("1", "2");
      _ <- 1 to 25) yield (a, b)).toDF("a", "b")
    val i = graft.ops.Eval.mutualInformation(ind, "a", "b").collect().head
    assert(i.getAs[Long]("n") == 100L && i.getAs[Long]("mi_nano") == 0L &&
      i.getAs[Long]("nmi_micro") == 0L)
    // a determines b bijectively → MI == H_a == H_b == ln 2, NMI == 1
    val dep = (Seq.fill(5)(("x", "1")) ++ Seq.fill(5)(("y", "2")))
      .toDF("a", "b")
    val d = graft.ops.Eval.mutualInformation(dep, "a", "b").collect().head
    assert(d.getAs[Long]("mi_nano") == d.getAs[Long]("h_a_nano") &&
      d.getAs[Long]("h_a_nano") == d.getAs[Long]("h_b_nano"))
    assert(math.abs(d.getAs[Long]("mi_nano") - 693147181L) <= 2L,
      s"ln2 nanos, got ${d.getAs[Long]("mi_nano")}")
    assert(d.getAs[Long]("nmi_micro") == 1000000L)
    // one-level margin: H_b = 0 → NMI pinned 0, not a division blowup
    val const = Seq(("x", "k"), ("y", "k")).toDF("a", "b")
    val c = graft.ops.Eval.mutualInformation(const, "a", "b")
      .collect().head
    assert(c.getAs[Long]("h_b_nano") == 0L &&
      c.getAs[Long]("nmi_micro") == 0L)
  }

  test("mannWhitneyU: separation → cles 1; identity → cles 0.5, z 0; " +
      "hand case with ties matches the textbook U") {
    val s = spark
    import s.implicits._
    val lo = Seq(1.0, 2.0, 3.0).toDF("v")
    val hi = Seq(10.0, 11.0, 12.0).toDF("v")
    val sep = graft.ops.Eval.mannWhitneyU(hi, lo, "v").collect().head
    assert(sep.getAs[Long]("cles_micro") == 1000000L &&
      sep.getAs[Long]("z_micro") > 0L)
    val self = graft.ops.Eval.mannWhitneyU(lo, lo, "v").collect().head
    assert(self.getAs[Long]("cles_micro") == 500000L &&
      self.getAs[Long]("z_micro") == 0L)
    // a={1,2,2}, b={2,3}: ranks 1, 2.5×3(block of three 2s → ranks 2,3,4
    // average 3), 5 → R_a = 1+3+3 = 7, U_a = 7 − 6 = 1 → cles = 1/6
    val a = Seq(1.0, 2.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val h = graft.ops.Eval.mannWhitneyU(a, b, "v").collect().head
    assert(h.getAs[Long]("n_a") == 3L && h.getAs[Long]("n_b") == 2L)
    assert(h.getAs[Long]("cles_micro") == 166667L)
    // all-tied: σ = 0 → z pinned to 0, cles 0.5
    val t = Seq(5.0, 5.0).toDF("v")
    val tt = graft.ops.Eval.mannWhitneyU(t, t, "v").collect().head
    assert(tt.getAs[Long]("cles_micro") == 500000L &&
      tt.getAs[Long]("z_micro") == 0L)
  }

  test("quantileNormalize: equal within-group ranks map to identical " +
      "global values, fractional positions interpolate, nulls pass " +
      "through, all-null yields null column") {
    val s = spark
    import s.implicits._
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 10.0), ("B", 20.0), ("B", 30.0)).toDF("g", "v")
    val got = graft.ops.Agg.quantileNormalize(df, "v", "g", gridPoints = 4)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("v")) ->
        r.getAs[Double]("value_norm")).toMap
    // global sorted: 1,2,3,10,20,30; grid(0,.25,.5,.75,1) =
    // (1, 2.25, 6.5, 17.5, 30); both groups' ranks are 0, .5, 1
    assert(got(("A", 1.0)) == 1.0 && got(("B", 10.0)) == 1.0)
    assert(got(("A", 2.0)) == 6.5 && got(("B", 20.0)) == 6.5)
    assert(got(("A", 3.0)) == 30.0 && got(("B", 30.0)) == 30.0)
    // fractional grid position: 4 rows → pos 4/3 between grid pts 1,2
    val dfc = df.unionByName(Seq(("C", 5.0), ("C", 6.0), ("C", 7.0),
      ("C", 8.0)).toDF("g", "v"))
    val gc = graft.ops.Agg.quantileNormalize(dfc, "v", "g",
        gridPoints = 4)
      .where(col("g") === "C").collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Double]("value_norm"))
      .toMap
    // new global sorted: 1,2,3,5,6,7,8,10,20,30 (n=10); R-7 grid =
    // (1, 3.5, 6.5, 9.5, 30); C value 6 has rank 1/3 → pos 4/3:
    // 3.5 + 1/3·(6.5 − 3.5) = 4.5
    val exp = math.rint((3.5 + (1.0 / 3) * (6.5 - 3.5)) * 1e6) / 1e6
    assert(gc(6.0) == exp, s"${gc(6.0)} vs $exp")
    // nulls pass through untouched; all-null input → null column
    val wn = Seq(("A", Option(1.0)), ("A", Option.empty[Double]))
      .toDF("g", "v")
    val gw = graft.ops.Agg.quantileNormalize(wn, "v", "g").collect()
    assert(gw.length == 2 &&
      gw.count(_.isNullAt(gw.head.fieldIndex("value_norm"))) == 1)
    val an = graft.ops.Agg.quantileNormalize(
      Seq(("A", Option.empty[Double])).toDF("g", "v"), "v", "g")
    assert(an.collect().forall(_.isNullAt(2)))
  }

  test("informationGainReport: perfect predictor explains all label " +
      "entropy, independent feature explains none, ranking is by MI, " +
      "null is a real level") {
    val s = spark
    import s.implicits._
    // label = parity; det mirrors it exactly; ind is constant across
    // labels (factorizing counts → MI exactly 0); nul has a null level
    val df = (0 until 100).map { i =>
      (if (i % 2 == 0) "even" else "odd",          // det: perfect
        if (i < 50) "x" else "y",                   // ind: independent
        if (i % 4 == 0) Option("p") else None,      // nul: partial signal
        if (i % 2 == 0) "E" else "O")               // label
    }.toDF("det", "ind", "nul", "lab")
    val got = graft.ops.Eval.informationGainReport(df,
      Seq("det", "ind", "nul"), "lab").collect()
    assert(got.map(_.getAs[String]("feature")).toSeq ==
      Seq("det", "nul", "ind"), "MI ranking")
    val byF = got.map(r => r.getAs[String]("feature") -> r).toMap
    // det: MI = H(label) = ln 2 → explained = 1e6
    assert(byF("det").getAs[Long]("explained_micro") == 1000000L)
    assert(byF("det").getAs[Long]("mi_nano") ==
      byF("det").getAs[Long]("h_label_nano"))
    assert(byF("det").getAs[Double]("mi") == 0.693147)
    // ind: counts factorize exactly → every nano term 0
    assert(byF("ind").getAs[Long]("mi_nano") == 0L &&
      byF("ind").getAs[Long]("explained_micro") == 0L)
    // nul: the null level participates as a value — cells (p,E)=25,
    // ((null),E)=25, ((null),O)=50 → 0 < MI < H(label)
    val nulMi = byF("nul").getAs[Long]("mi_nano")
    assert(nulMi > 0L && nulMi < byF("nul").getAs[Long]("h_label_nano"))
    val exp = math.rint((0.25 * math.log(2.0) +
      0.25 * math.log(2.0 / 3.0) + 0.5 * math.log(4.0 / 3.0)) * 1e9)
    assert(math.abs(nulMi - exp) <= 2, s"$nulMi vs $exp")
    // every feature sees all 100 rows
    assert(got.forall(_.getAs[Long]("n") == 100L))
  }
}
