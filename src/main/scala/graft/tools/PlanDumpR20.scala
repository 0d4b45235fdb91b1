package graft.tools

import java.nio.file.{Files, Paths}

/** Round-20 optimization evidence: dump `explain("formatted")` for the
  * named queries to `plans/r20/<query>_<tag>.txt` — the before/after
  * plan files the optimization round commits alongside the code.
  * Run: `sbt "runMain graft.tools.PlanDumpR20 <tag> <q1,q2,...>"`
  * (tag = "before" | "after"; default queries = the bench headline). */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.build("4")
    Files.createDirectories(Paths.get("plans/r20"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // cap iterative-lineage blowups (label propagation) like PlanDump
      val lines = full.linesIterator.toSeq
      val text = if (lines.size <= 600) full
        else lines.take(600).mkString("\n") +
          s"\n... [truncated ${lines.size - 600} lines - iterative lineage]\n"
      Files.writeString(Paths.get(s"plans/r20/${name}_$tag.txt"), text)
      println(s"[plandump-r20] wrote plans/r20/${name}_$tag.txt")
    }
    spark.stop()
  }
}
