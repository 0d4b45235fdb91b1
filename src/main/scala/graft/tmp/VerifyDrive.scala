package graft.tmp
import org.apache.spark.sql.functions._
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("4")
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val li = t.lineitem.select(
      col("l_orderkey").as("query_id"), col("l_linenumber").as("doc"),
      col("l_extendedprice").as("score"),
      when(col("l_returnflag") === "R", 2.0)
        .when(col("l_returnflag") === "A", 1.0)
        .otherwise(0.0).as("rel"))
    val r = graft.ops.Eval.rankingReport(
      li, "query_id", "doc", "score", "rel", k = 3)
    r.show(5, truncate = false)
    val n = r.count()
    val nonNull = r.where(col("ndcg").isNotNull).count()
    println(s"SENTINEL rows=$n ndcg_nonnull=$nonNull")
    r.explain("formatted")
    spark.stop()
  }
}
