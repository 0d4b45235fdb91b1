package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Construction, sources and sinks (SURVEY §2.1), Spark-first.
  *
  * The reference parses CSV eagerly with commons-csv then runs a
  * per-column type-inference cascade (`io/csv.kt:222-274`); here the read
  * is a distributed `spark.read.csv` into string columns, the reference's
  * null-string set is normalized in-plan, and the same cascade
  * (`Surgery.parseAll`) picks the types — so gzip, splittable reads,
  * predicate pushdown on the parsed result all come from Spark.
  */
object IO {

  /** Reference null-string set (`io/csv.kt:23`): "NA", "N/A", "null", "". */
  val NullStrings: Seq[String] = Seq("NA", "N/A", "null", "")

  /** reference `DataFrame.readCSV` / `readTSV` / `readDelim`
    * (`io/csv.kt:59-194`): header, custom delimiter, gzip (transparent in
    * Spark), `skipLines`, `readLines`, per-column `ColType` overrides, and
    * the type-inference cascade when no override is given. */
  def readDelim(spark: SparkSession, path: String, delimiter: String = ",",
      header: Boolean = true, skipLines: Int = 0,
      readLines: Option[Int] = None,
      colTypes: Map[String, DataType] = Map.empty,
      inferTypes: Boolean = true): DataFrame = {
    import graft.ops.Surgery._
    val base =
      if (skipLines == 0) {
        spark.read
          .option("header", header).option("sep", delimiter)
          .csv(path)
      } else {
        // skipLines: drop leading lines before CSV parsing (no native
        // option) — text read, positional filter, re-parse. Small-file
        // utility; the zipWithIndex pass is distributed.
        import spark.implicits._
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= skipLines).map(_._1)
        spark.read.option("header", header).option("sep", delimiter)
          .csv(spark.createDataset(lines))
      }
    val limited = readLines.fold(base)(base.limit)
    // Normalize the reference null-string set in-plan.
    val nulled = limited.schema.fields.foldLeft(limited) { (d, f) =>
      d.withColumn(f.name,
        when(trim(col(f.name)).isin(NullStrings: _*), lit(null))
          .otherwise(col(f.name)))
    }
    val typed = colTypes.foldLeft(nulled) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
    if (inferTypes) typed.parseAll() else typed
  }

  def readCSV(spark: SparkSession, path: String, header: Boolean = true)
      : DataFrame = readDelim(spark, path, ",", header)
  def readTSV(spark: SparkSession, path: String, header: Boolean = true)
      : DataFrame = readDelim(spark, path, "\t", header)

  /** reference `writeCSV` (`io/csv.kt:283-295`). `singleFile` mirrors the
    * reference's one-file output (driver-side coalesce — small data only;
    * leave false for cluster-scale writes). */
  def writeCSV(df: DataFrame, path: String, header: Boolean = true,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", header).csv(path)
  }

  /** reference `DataFrame.readJson` (`io/json.kt:27-131`): Spark's native
    * recursive schema inference covers objects→structs and arrays; the
    * reference's synthetic `value` column for primitive roots is shimmed. */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.json(path)
    // named guard: JSON cannot carry a schema for zero rows — an empty
    // source infers zero columns and every downstream reference fails
    // with an opaque UNRESOLVED_COLUMN
    require(df.schema.nonEmpty,
      s"readJson: no JSON rows at $path - schema cannot be inferred " +
        "from an empty source")
    // Reference wraps a root-level primitive array into a `value` column;
    // Spark yields a single unnamed/corrupt column in that case.
    if (df.columns.sameElements(Array("_corrupt_record")))
      spark.read.text(path).select(col("value"))
    else df
  }

  def writeJson(df: DataFrame, path: String, singleFile: Boolean = false)
      : Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }

  /** Columnar ORC source/sink (beyond the reference's formats — a Spark
    * deployment reads whatever the lake holds; ORC is the other common
    * columnar layout and shares parquet's pushdown/pruning behavior). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
  def writeOrc(df: DataFrame, path: String, singleFile: Boolean = false)
      : Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").orc(path)
  }

  /** reference `DataFrame.read(fileOrUrl)` (`io/guess.kt:26-54`) — format
    * sniffing by extension, CSV fallback. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = path.toLowerCase.stripSuffix(".gz")
    if (p.endsWith(".json") || p.endsWith(".jsonl") || p.endsWith(".ndjson"))
      readJson(spark, path)
    else if (p.endsWith(".tsv")) readTSV(spark, path)
    else if (p.endsWith(".parquet")) spark.read.parquet(path)
    else if (p.endsWith(".orc")) readOrc(spark, path)
    else readCSV(spark, path)
  }

  // ---- builders (`Build.kt`) -----------------------------------------
  /** reference `dataFrameOf(header)(values...)` — header + flat row-major
    * value list. */
  def dataFrameOf(spark: SparkSession, names: Seq[String],
      values: Seq[Seq[Any]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(values.forall(_.length == names.length),
      "dataFrameOf: ragged rows")
    val schema = StructType(names.zipWithIndex.map { case (n, i) =>
      val sample = values.map(_(i)).find(_ != null)
      StructField(n, sample.map(sparkTypeOf).getOrElse(StringType), true)
    })
    val rows = values.map(v => org.apache.spark.sql.Row.fromSeq(v)).asJava
    spark.createDataFrame(rows, schema)
  }

  /** reference `Map<String, Iterable>.toDataFrame()` (`Build.kt:219-235`). */
  def dataFrameOfColumns(spark: SparkSession,
      cols: Seq[(String, Seq[Any])]): DataFrame = {
    require(cols.nonEmpty, "dataFrameOfColumns: no columns")
    val n = cols.head._2.length
    require(cols.forall(_._2.length == n), "dataFrameOfColumns: ragged")
    dataFrameOf(spark, cols.map(_._1),
      (0 until n).map(i => cols.map(_._2(i))))
  }

  /** reference `Iterable<T>.toDataFrame { ... }` (`Build.kt:36-60`) —
    * objects → frame. Spark-native: the Product encoder does the
    * reflection the reference hand-rolls. */
  def dataFrameOfProducts[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, data: Seq[T]): DataFrame =
    spark.createDataFrame(data)

  /** reference `Iterable<Pair<ColumnPath, Column>>.toDataFrame()`
    * (`Build.kt:103-150`) — assemble a NESTED frame from (path, values)
    * pairs; shared path prefixes become struct columns. Backbone of the
    * reference's pivot/aggregate output assembly. */
  def dataFrameOfPaths(spark: SparkSession,
      pairs: Seq[(Seq[String], Seq[Any])]): DataFrame = {
    require(pairs.nonEmpty, "dataFrameOfPaths: no columns")
    val n = pairs.head._2.length
    require(pairs.forall(_._2.length == n), "dataFrameOfPaths: ragged")
    val flatNames = pairs.indices.map(i => s"__p$i")
    val flat = dataFrameOf(spark, flatNames,
      (0 until n).map(r => pairs.map(_._2(r))))
    def assemble(items: Seq[(Seq[String], Int)]): Seq[Column] = {
      val heads = items.map(_._1.head).distinct // first-appearance order
      heads.map { h =>
        val group = items.filter(_._1.head == h)
        group match {
          case Seq((Seq(_), i)) => col(s"__p$i").as(h)
          case g =>
            struct(assemble(g.map { case (p, i) => (p.tail, i) }): _*).as(h)
        }
      }
    }
    flat.select(assemble(pairs.map(_._1).zipWithIndex): _*)
  }

  private def sparkTypeOf(v: Any): DataType = v match {
    case _: Int | _: java.lang.Integer => IntegerType
    case _: Long | _: java.lang.Long => LongType
    case _: Double | _: java.lang.Double => DoubleType
    case _: Float | _: java.lang.Float => FloatType
    case _: Boolean | _: java.lang.Boolean => BooleanType
    case _: java.math.BigDecimal | _: BigDecimal => DecimalType(38, 18)
    case _: java.sql.Timestamp => TimestampType
    case _: java.sql.Date => DateType
    case _ => StringType
  }

  // ---- bucketed storage (co-located joins) ---------------------------
  /** Write a table bucketed+sorted by join keys: repeated joins/aggs on
    * those keys read co-located buckets and skip the exchange entirely —
    * the storage-level answer to "this join shuffles 100 TB every run".
    * Uses the session catalog (`saveAsTable` — bucketing metadata lives
    * in the metastore). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${table.replace("`", "``")}`")
    // overwrite must also cover the ORPHAN-location case: a previous
    // session's in-memory catalog is gone but its warehouse directory is
    // not, and saveAsTable refuses to create a table over it
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  /** Hive-style partitioned + sorted data layout writer — the lakehouse
    * sink a 100 TB corpus lands in. `repartition(partitionCols)` first:
    * without it every task holds a writer per output partition and a
    * 1000-task × 1000-partition write emits a million small files; with
    * it each partition's rows converge on one task (AQE can still split
    * a skewed one). `sortWithinPartitions` then orders rows inside each
    * file so parquet row-group min/max statistics prune reads on the
    * sort key (the poor man's Z-order for one dimension).
    * `maxRecordsPerFile` caps file size for the hot-partition case. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      format: String = "parquet", maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: no partition cols")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format).save(path)
    // partitionBy over zero rows writes NO data files at all, and a later
    // read fails schema inference with an opaque AnalysisException. Probe
    // the WRITTEN OUTPUT (one FS listing), never the input: a df.isEmpty
    // pre-probe executes the upstream plan a second time per write, and a
    // non-deterministic upstream could flip between the probe and the
    // write, picking the wrong branch. Zero rows have no partition layout
    // to lose — overwrite with one schema-carrying empty file (built from
    // the schema alone, no plan re-execution) so the dataset stays
    // readable (the empty-incremental-batch case any 100 TB pipeline hits).
    val outPath = new org.apache.hadoop.fs.Path(path)
    val fs = outPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    def hasDataFile(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        if (st.isDirectory) hasDataFile(st.getPath)
        else st.getPath.getName.startsWith("part-")
      }
    if (!hasDataFile(outPath)) {
      df.sparkSession
        .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          df.schema)
        .coalesce(1).write.mode("overwrite").format(format).save(path)
    }
  }

  /** Deterministic training-shard writer: the corpus lands as
    * `shard=N/part-*.parquet` with rows pseudo-randomly ORDERED inside
    * each shard file — the layout a training data loader streams
    * (seeded global shuffle + fixed shard membership; re-running the
    * writer, on any cluster size, reproduces byte-identical shard
    * contents). Composition:
    * [[graft.ops.Sampling.shardAssign]] (engine-replayable SHA shard +
    * in-shard sort key — no RNG, no global sort) feeding
    * [[writePartitioned]] (one file per shard via repartition-first,
    * in-file ordering by the hash key). The `shard_ord` column is kept
    * in the output — it is the shuffle certificate (any reader can
    * verify the order), and dropping it would cost a schema projection
    * at every training read anyway. */
  def writeShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, seed: Long = 42L,
      maxRecordsPerFile: Long = 0L): Unit = {
    val assigned = graft.ops.Sampling.shardAssign(df, idCol, nShards, seed)
    writePartitioned(assigned, path, Seq("shard"), Seq("shard_ord"),
      maxRecordsPerFile = maxRecordsPerFile)
  }

  /** Per-file column-statistics manifest — the data-skipping primitive
    * (Delta/Iceberg-style file-level min/max, rebuilt over plain
    * parquet): one distributed scan grouped by `input_file_name()`
    * collects row count and per-column min/max/null-count. Persisted
    * next to the data it describes, a 100 TB table's manifest is only
    * ~(files × cols) rows — the thing a planner can afford to read
    * before deciding which terabytes NOT to. Pairs with
    * [[writePartitioned]]: in-file sort + `maxRecordsPerFile` gives
    * consecutive key runs per file, i.e. tight min/max envelopes. */
  def fileStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats: no stats columns")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(col(c).isNull.cast("long")).as(s"nulls_$c")) }
    spark.read.parquet(path)
      .withColumn("file", input_file_name())
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Stats-pruned range scan: read ONLY the files whose [min, max]
    * envelope on `keyCol` can intersect [lo, hi], then apply the exact
    * filter. Result ≡ full scan + filter, row for row: a pruned file's
    * envelope excludes every candidate row, and rows with a null key
    * can't satisfy a range predicate in either plan. The kept-file list
    * is collected driver-side — bounded by the FILE count (manifest
    * rows, not data rows), exactly what every table-format planner
    * holds in memory. `basePath` keeps hive-style partition columns in
    * the pruned read's schema. */
  def statsPrunedRead(spark: SparkSession, path: String,
      manifest: DataFrame, keyCol: String, lo: Column, hi: Column): DataFrame = {
    val kept = manifest
      .filter(col(s"max_$keyCol") >= lo && col(s"min_$keyCol") <= hi)
      .select("file").collect().map(_.getString(0))
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.option("basePath", path).parquet(kept.toSeq: _*)
    base.filter(col(keyCol).between(lo, hi))
  }

  /** The k double-hashed bloom bit positions of `key`: (h1 + i·h2) mod m
    * — shared verbatim by [[bloomIndex]] (build) and [[bloomPrunedScan]]
    * (probe), which is what makes "no false negatives" a construction
    * property rather than a convention. */
  private def bloomPositions(key: Column, mBits: Long,
      numHashes: Int): Column = {
    // both hashes reduce mod m BEFORE combining: i·h2 on raw 64-bit
    // hashes overflows ANSI long arithmetic; on residues the products
    // stay < 32·m (m is capped well under 2⁵⁷ by the build require)
    val h1 = pmod(xxhash64(key), lit(mBits))
    val h2 = pmod(xxhash64(key, lit("graft-bloom")), lit(mBits))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(mBits)))
  }

  /** Per-file BLOOM-FILTER index for point lookups — the data-skipping
    * companion to [[fileStats]]/[[statsPrunedRead]]: min/max envelopes
    * prune RANGE scans but are useless for `key = x` on a column the
    * layout isn't sorted by; a per-file bloom answers "which files can
    * contain this exact key" (the Delta/Iceberg bloom index shape).
    *
    * Output: a sparse posting manifest (file, word, bits, m_bits,
    * n_hashes) — one row per 64-bit WORD with any bit set, so index
    * size tracks actual key mass, not `m_bits`·files. Size it like any
    * bloom: m ≈ 1.44·log₂(1/fpp)·keys-per-file, k ≈ 0.693·m/n (the
    * defaults fit ~50k keys/file at ~1% fpp). Null keys are skipped —
    * a null never equals a probe.
    *
    * Scale shape: one scan with scan-side position explode → one
    * (file, word) bit_or shuffle with map-side partials; output is
    * manifest-scale. Build once at write time, store next to the data,
    * reuse across every lookup. */
  def bloomIndex(spark: SparkSession, path: String, keyCol: String,
      mBits: Long = 1L << 19, numHashes: Int = 7): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0 && mBits <= (1L << 40),
      s"bloomIndex: mBits must be a positive multiple of 64 (≤ 2^40), " +
        s"got $mBits")
    require(numHashes >= 1 && numHashes <= 32,
      s"bloomIndex: numHashes in [1, 32], got $numHashes")
    spark.read.parquet(path)
      .withColumn("file", input_file_name())
      .where(col(keyCol).isNotNull)
      .select(col("file"),
        explode(bloomPositions(col(keyCol), mBits, numHashes)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("long").as("word"),
        expr("shiftleft(1L, int(pos % 64))").as("bit"))
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
      .withColumn("m_bits", lit(mBits))
      .withColumn("n_hashes", lit(numHashes))
  }

  /** Bloom-pruned POINT-LOOKUP scan: read ONLY the files whose bloom
    * filter maybe-contains one of `values`, then apply the exact IN
    * filter. Result ≡ full scan + filter, row for row: a value present
    * in a file set every one of its bits at build time, so the file
    * can't fail the membership test (no false negatives); bloom false
    * POSITIVES only cost an extra file read — the exact filter removes
    * their rows. At 100 TB this is the difference between "open 3 files"
    * and "scan the table" for id-lookup debugging, sample extraction,
    * and tombstone audits.
    *
    * The candidate-file list is collected driver-side — bounded by the
    * FILE count (the [[statsPrunedRead]] planner convention). Probe
    * values must be passed at the key column's type (they are cast to
    * the scanned schema's type before hashing, so a Long probe against
    * a long column hashes identically to the build side). */
  def bloomPrunedScan(spark: SparkSession, path: String, index: DataFrame,
      keyCol: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "bloomPrunedScan: no probe values")
    val full = spark.read.parquet(path)
    val keyType = full.schema(keyCol).dataType
    val lits = values.map(v => lit(v).cast(keyType))
    val meta = index.select(col("m_bits"), col("n_hashes"))
      .limit(1).collect()
    val kept: Seq[String] =
      if (meta.isEmpty) Seq.empty // empty index: no key anywhere
      else {
        val (m, kh) = (meta(0).getLong(0), meta(0).getInt(1))
        val probe = spark.range(values.size)
          .select(element_at(array(lits: _*), col("id").cast("int") + 1)
            .as("__v"))
        val posFrame = probe.select(col("__v"),
            explode(bloomPositions(col("__v"), m, kh)).as("pos"))
          .distinct()
        val nPos = posFrame.groupBy(col("__v"))
          .agg(count(lit(1)).as("__np"))
        val matched = posFrame
          .select(col("__v"), col("pos"),
            (col("pos") / 64).cast("long").as("word"),
            expr("shiftleft(1L, int(pos % 64))").as("bit"))
          .join(index, Seq("word"))
          .where(col("bits").bitwiseAND(col("bit")) =!= 0L)
          .groupBy(col("file"), col("__v")).agg(count(lit(1)).as("__ok"))
        matched.join(nPos, Seq("__v"))
          .where(col("__ok") === col("__np"))
          .select(col("file")).distinct()
          .collect().map(_.getString(0)).toSeq
      }
    val base =
      if (kept.isEmpty) full.limit(0)
      else spark.read.option("basePath", path).parquet(kept: _*)
    base.where(col(keyCol).isin(values: _*))
  }

  // ---- display sinks --------------------------------------------------
  /** reference `toHTML` + `format{}` cell styling (`io/html.kt:11-56`,
    * `api/format.kt:41-138`) — driver-side render of the first `limit`
    * rows; `style(colName, value)` returns an inline CSS string (empty =
    * unstyled), the reference's RowColFormatter hook. */
  def toHTML(df: DataFrame, limit: Int = 100,
      style: (String, Any) => String = (_, _) => ""): String = {
    val rows = df.limit(limit).collect()
    val names = df.columns
    val head = names.map(c => s"<th>$c</th>").mkString
    val body = rows.map { r =>
      "<tr>" + names.zipWithIndex.map { case (c, i) =>
        val v = r.get(i)
        val css = style(c, v)
        val attr = if (css.isEmpty) "" else s""" style="$css""""
        s"<td$attr>${Option(v).getOrElse("null")}</td>"
      }.mkString + "</tr>"
    }.mkString("\n")
    s"<table>\n<tr>$head</tr>\n$body\n</table>"
  }

  /** reference `renderToString`/`print` (`io/string.kt:9-41`) — text grid
    * of the first `limit` rows (showString is private; rebuilt here). */
  def renderToString(df: DataFrame, limit: Int = 20): String = {
    val rows = df.limit(limit).collect()
    val cells = df.columns.toSeq +:
      rows.toSeq.map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("null")))
    val widths = cells.transpose.map(_.map(_.length).max)
    cells.map(r => r.zip(widths)
      .map { case (s, w) => s.padTo(w, ' ') }.mkString(" | "))
      .mkString("\n")
  }

  /** reference `schema()` printer (`api/schema.kt:11-38`). */
  def schemaString(df: DataFrame): String = df.schema.treeString

  /** reference `toMap` (`Operations.kt:300`) — driver-side transpose. */
  def toMap(df: DataFrame, limit: Int = 100000): Map[String, Seq[Any]] = {
    val rows = df.limit(limit).collect()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> rows.map(_.get(i)).toSeq
    }.toMap
  }

  /** Small-file COMPACTION plan (the OPTIMIZE/rewrite step every
    * lakehouse table needs after streaming or partitioned ingest):
    * CUMULATIVE-BUCKET packing — walk each partition's files in
    * `orderCol` order and bucket by floor((running bytes − 1) /
    * targetBytes), i.e. output groups are the targetBytes-aligned
    * slices of the byte-cumulative file list. The stateless window form
    * of bin packing: reset-accumulator greedy needs sequential state no
    * SQL window carries, while this rule is one running sum — same plan
    * from any engine, and each group's bytes stay under targetBytes
    * plus its largest boundary-straddling file (an oversized file
    * absorbs the bucket its cumulative end lands in, trailing
    * neighbors included). Order-preserving: consecutive files
    * co-locate, so in-file sort runs survive the rewrite — the
    * writePartitioned/fileStats envelope benefit.
    *
    * Output: one row per planned output group —
    * (partition cols…, grp, n_files, bytes, first, last) with `grp`
    * dense 1-based per partition and first/last the `orderCol` bounds
    * of the files it swallows.
    *
    * Scale shape: runs over the MANIFEST (one row per file — what a
    * table-format planner holds), not the data: windows partition on
    * the table partition keys, one hash shuffle of file-count rows. An
    * unpartitioned table runs one global window over its file list —
    * planner-scale by construction, same bound as [[statsPrunedRead]]'s
    * kept-file collect. */
  def compactionPlan(files: DataFrame, sizeCol: String, orderCol: String,
      targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame =
    assignGroups(files, sizeCol, orderCol, targetBytes, partitionCols)
      .groupBy((partitionCols.map(col) :+ col("grp")): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("bytes"),
        min(col(orderCol)).as("first"),
        max(col(orderCol)).as("last"))

  /** Per-FILE group assignment shared by [[compactionPlan]] (which
    * aggregates it) and [[compactFiles]] (which executes it): the input
    * manifest plus a dense 1-based `grp` per partition. */
  private def assignGroups(files: DataFrame, sizeCol: String,
      orderCol: String, targetBytes: Long,
      partitionCols: Seq[String]): DataFrame = {
    require(targetBytes > 0, "compactionPlan: targetBytes must be > 0")
    import org.apache.spark.sql.expressions.Window
    val part =
      if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val wRun = part.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDense = part.orderBy(col("__grp"))
    files
      .withColumn("__cum", sum(col(sizeCol)).over(wRun))
      // integer `div`, not `/`: float division of byte totals loses
      // exactness past 2^53 (9 PB of cumulative bytes per partition)
      .withColumn("__grp", expr(s"(__cum - 1) div ${targetBytes}L"))
      .withColumn("grp", dense_rank().over(wDense).cast(LongType))
  }

  /** File-system manifest: one row (file, bytes) per DATA file under
    * `path` (recursive; `_`/`.`-prefixed bookkeeping files skipped) —
    * the size side of a compaction manifest, joined with [[fileStats]]
    * for per-file key envelopes. Driver-side listing, bounded by the
    * FILE count like every table-format planner. Paths normalize the
    * local `file:` scheme away so they join against
    * `input_file_name()`-derived manifests. */
  def fsManifest(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        buf += ((st.getPath.toString.replaceFirst("^file:/+", "/"),
          st.getLen))
    }
    spark.createDataFrame(buf.toSeq).toDF("file", "bytes")
  }

  /** EXECUTE a [[compactionPlan]]: rewrite the small files described by
    * `manifest` into ONE parquet file per planned group under
    * `destPath`, preserving the hive partition layout (`partitionCols`
    * values become `col=value` directories) and sorting each output
    * file by `dataOrderCol` (so the rewrite keeps, and tightens, the
    * [[fileStats]] min/max envelopes). `destPath` is replaced
    * (compaction is a full rewrite of the described layout). Returns
    * one row per written file: (partitionCols…, grp, n_files_in,
    * out_file). Verify with [[graft.ops.Quality.tableFingerprint]] —
    * before == after is the integrity contract.
    *
    * `manifest` needs (`fileCol` path, `sizeCol` bytes, `orderCol`
    * per-file key — e.g. the [[fileStats]] min of the sort key — and
    * the partition value columns): build it by joining [[fsManifest]]
    * with [[fileStats]].
    *
    * Scale shape: the plan is computed distributed and collected at
    * MANIFEST scale (one row per input file — what any table-format
    * committer holds); each group is then an independent
    * read→sort→write-one-file Spark job, scheduled `maxParallel` at a
    * time from a driver pool (the Delta OPTIMIZE shape — group jobs
    * fan out across the cluster; no committer contention because each
    * group stages in its own temp dir and atomically renames into
    * place). Per-group memory is ~targetBytes and spills. */
  def compactFiles(spark: SparkSession, manifest: DataFrame,
      destPath: String, fileCol: String, sizeCol: String, orderCol: String,
      dataOrderCol: String, targetBytes: Long,
      partitionCols: Seq[String] = Nil, maxParallel: Int = 8): DataFrame = {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val destRoot = new Path(destPath)
    val destFs = destRoot.getFileSystem(hconf)
    if (destFs.exists(destRoot)) destFs.delete(destRoot, true)
    destFs.mkdirs(destRoot)
    val assigned = assignGroups(manifest, sizeCol, orderCol, targetBytes,
      partitionCols)
    val rows = assigned.select((partitionCols.map(c =>
        col(c).cast("string")) :+ col("grp") :+ col(fileCol)): _*)
      .collect()
    // named guard: with zero input files there is no schema to carry to
    // destPath, and a later read of the empty destination would fail
    // with an opaque UNABLE_TO_INFER_SCHEMA
    require(rows.nonEmpty,
      "compactFiles: empty manifest - nothing to compact (the write " +
        "side produced no data files)")
    val groups = rows.toSeq.groupBy { r =>
        (partitionCols.indices.map(r.getString).toList,
          r.getLong(partitionCols.size))
      }
      .toSeq.sortBy { case ((pvals, grp), _) => (pvals.mkString("/"), grp) }
      .map { case ((pvals, grp), rs) =>
        (pvals, grp, rs.map(_.getString(partitionCols.size + 1)).sorted) }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxParallel, groups.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val written =
      try Await.result(Future.sequence(groups.map { case (pvals, grp, files) =>
        Future {
          val partDir = partitionCols.zip(pvals)
            .map { case (c, v) => s"$c=$v" }.mkString("/")
          val outDir =
            if (partDir.isEmpty) destRoot else new Path(destRoot, partDir)
          val tmp = new Path(destRoot,
            s".graft_compact_tmp_${java.util.UUID.randomUUID}")
          spark.read.parquet(files: _*)
            .coalesce(1).sortWithinPartitions(col(dataOrderCol))
            .write.parquet(tmp.toString)
          val fs = tmp.getFileSystem(hconf)
          val partFile = fs.listStatus(tmp).map(_.getPath)
            .find(_.getName.startsWith("part-"))
            .getOrElse(sys.error(s"compactFiles: no output for group $grp"))
          fs.mkdirs(outDir)
          val out = new Path(outDir, f"compact-$grp%05d.parquet")
          if (!fs.rename(partFile, out))
            sys.error(s"compactFiles: rename failed for $out")
          fs.delete(tmp, true)
          org.apache.spark.sql.Row.fromSeq(
            pvals ++ Seq(grp, files.length.toLong,
              out.toString.replaceFirst("^file:/+", "/")))
        }
      }), Duration.Inf)
      finally pool.shutdown()
    val schema = StructType(
      partitionCols.map(c => StructField(c, StringType)) ++ Seq(
        StructField("grp", LongType), StructField("n_files_in", LongType),
        StructField("out_file", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(written.asJava, schema)
  }
}
