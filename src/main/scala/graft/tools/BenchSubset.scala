package graft.tools

/** Round-20 iteration probe: time a named subset of registered queries
  * with the EXACT Bench methodology (noop sink, cold reps — caches and
  * checkpoint RDDs dropped between reps, min-of-reps) so optimization
  * deltas can be measured without paying for the whole headline.
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchSubset q1,q2[ reps]"` */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("stat_spearman"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    graft.Tables(spark, sfDir).lineitem
      .write.format("noop").mode("overwrite").save()
    val cal = graft.Bench.calibrationProbe(spark)
    val out = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        dt
      }
      System.err.println(f"[subset] $name: min=${times.min}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> times.min
    }
    val calEnd = graft.Bench.calibrationProbe(spark)
    println(out.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", s"""},"cal":[$cal%.3f,$calEnd%.3f]"""))
    spark.stop()
  }
}
