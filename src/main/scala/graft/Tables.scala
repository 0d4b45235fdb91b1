package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Every `SparkEntry.queries` entry receives an `sfDir` and reads through
  * here, so filter/projection pushdown reaches the parquet scans.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet's `ts` encoding varies by generator version:
    * TIMESTAMP(NANOS) (older driver rounds — surfaces as long under
    * `nanosAsLong`, or refuses to map), or TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (current rounds — Spark reads
    * TIMESTAMP_NTZ). Normalize every encoding to a plain TimestampType
    * in the UTC session so downstream `window`/`unix_micros` queries and
    * the DuckDB oracle's `epoch_us` see identical instants. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      // integer `div`, NOT `/`: epoch nanos exceed double's 2^53
      // mantissa, so float division is off by ±1 microsecond
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ wall-clock == UTC instant under the UTC session timezone
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** Session factory used by mains and tests: local mode sized for the
  * container, AQE on, shuffle partitions matched to cores (not 200) so
  * small-SF local runs don't drown in empty tasks. On a real cluster the
  * same code runs unchanged — only master/shuffle-partitions change.
  */
object GraftSession {
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(
        org.apache.spark.sql.graftnative.GraftExtensions.inject)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r20: spark.sql.join.preferSortMergeJoin deliberately stays at
      // its default (true) — measured A/B at sf0.1 (4 cold reps × 2
      // rounds each way): allowing shuffled-hash regressed the LSH
      // band self-join ~0.45 s (hash-building the exploded band keys
      // loses to sort-merge) and moved nothing else beyond noise.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
