package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web
import graft.sources.WarcFiles
import org.apache.spark.sql.graftnative.GzipCompress

/** Member-boundary `.warc.gz` FILE ingestion ([[WarcFiles]], r16
  * verdict #1) — pins: the chunk index respects member boundaries and
  * the target size (bounded peak memory: cell size is capped by
  * max(member, target+member), never file size); the chunked reader's
  * records are BIT-IDENTICAL to the single-cell path; >1 task per
  * file; a corrupt tail degrades to one clean=false chunk whose cell
  * nulls loudly.
  */
class WarcFilesSpec extends AnyFunSuite {
  import SparkFixture._

  private val CRLF = "\r\n"

  private def record(tpe: String, uri: String, payload: String): String =
    "WARC/1.0" + CRLF +
      s"WARC-Type: $tpe" + CRLF +
      (if (uri != null) s"WARC-Target-URI: $uri" + CRLF else "") +
      "Content-Length: " + payload.getBytes("UTF-8").length + CRLF +
      CRLF + payload + CRLF + CRLF

  private def gz(s: String): Array[Byte] =
    GzipCompress.compute(s.getBytes("UTF-8"))

  /** n single-record members (+ one multi-record member at the end). */
  private def fileBytes(fileTag: String, n: Int): Array[Byte] = {
    val single = (1 to n).map(i =>
      gz(record("conversion", s"http://ex.com/$fileTag/$i", s"payload $fileTag-$i " * 3)))
    val multi = gz(
      record("metadata", null, s"meta $fileTag a") +
        record("metadata", null, s"meta $fileTag b"))
    (single :+ multi).reduce(_ ++ _)
  }

  private def writeTemp(files: (String, Array[Byte])*): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcfiles_spec")
    files.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    dir.toFile.deleteOnExit()
    dir
  }

  test("chunkIndex: whole members per chunk, target respected, " +
      "member_base cumulative, lengths tile the file exactly") {
    val bytes = fileBytes("f", 9) // 10 members
    val dir = writeTemp("a.warc.gz" -> bytes)
    val memberSizes = {
      // ground truth: sizes of the 10 members via the kernel walk
      val idx1 = WarcFiles.chunkIndex(spark, s"$dir/a.warc.gz", 1L)
        .orderBy("chunk_idx").collect()
      idx1.map(_.getAs[Long]("length"))
    }
    // target=1: every member is its own chunk
    assert(memberSizes.length == 10)
    val idx1 = WarcFiles.chunkIndex(spark, s"$dir/a.warc.gz", 1L)
      .orderBy("chunk_idx").collect()
    assert(idx1.forall(_.getAs[Int]("n_members") == 1))
    assert(idx1.forall(_.getAs[Boolean]("clean")))
    assert(idx1.map(_.getAs[Long]("length")).sum == bytes.length.toLong)
    assert(idx1.map(_.getAs[Long]("member_base")).toSeq ==
      (0L until 10L))
    // contiguity: each chunk starts where the previous ended
    val offs = idx1.map(r => (r.getAs[Long]("start"), r.getAs[Long]("length")))
    offs.sliding(2).foreach { case Array((s1, l1), (s2, _)) =>
      assert(s1 + l1 == s2)
    }
    // mid target: chunks close at >= target, never split a member, and
    // every chunk is <= target + one member (the bounded-memory claim)
    val target = memberSizes.take(3).sum // ~3 members per chunk
    val idxT = WarcFiles.chunkIndex(spark, s"$dir/a.warc.gz", target)
      .orderBy("chunk_idx").collect()
    assert(idxT.length > 1 && idxT.length < 10)
    assert(idxT.map(_.getAs[Long]("length")).sum == bytes.length.toLong)
    assert(idxT.map(_.getAs[Int]("n_members")).sum == 10)
    val maxMember = memberSizes.max
    idxT.foreach { r =>
      assert(r.getAs[Long]("length") <= target + maxMember)
    }
    // huge target: one chunk, all members
    val idxBig = WarcFiles.chunkIndex(spark, s"$dir/a.warc.gz", 1L << 30)
      .collect()
    assert(idxBig.length == 1 &&
      idxBig.head.getAs[Int]("n_members") == 10)
  }

  test("warcRecordsGzipFiles == the single-cell column path, " +
      "bit-for-bit, across multiple files and >1 task") {
    val s = spark
    import s.implicits._
    val fa = fileBytes("a", 7)
    val fb = fileBytes("b", 5)
    val dir = writeTemp("fa.warc.gz" -> fa, "fb.warc.gz" -> fb)
    val chunked = WarcFiles
      .warcRecordsGzipFiles(spark, s"$dir/*.warc.gz", 600L)
    // >1 chunk per file proves the file was actually split
    val nChunks = chunked.select("path", "chunk_idx").distinct().count()
    assert(nChunks > 2, s"expected multiple chunks, got $nChunks")
    // reference: whole file in one cell through the column reader
    val ref = Web.warcRecordsGzip(
      Seq(("fa.warc.gz", fa), ("fb.warc.gz", fb)).toDF("f", "gz"),
      "f", "gz")
    def key(df: org.apache.spark.sql.DataFrame, fCol: String) = df
      .select(col(fCol), col("member_idx").cast("long"), col("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        sha2(col("payload"), 256))
      .collect().map(_.toSeq).toSet
    val gotKeys = key(
      chunked.withColumn("f", element_at(split(col("path"), "/"), -1)),
      "f")
    assert(gotKeys == key(ref, "f"))
    // record count sanity: 7+1*2 and 5+1*2 records... single files have
    // n single-record members + one 2-record member
    assert(chunked.count() == (7 + 2) + (5 + 2))
  }

  test("corrupt tail: valid prefix parses, remainder is ONE " +
      "clean=false chunk whose cell nulls loudly; nothing dropped") {
    val good = fileBytes("g", 3)
    val corrupt = good ++ Array[Byte](0x1f, 0x8b.toByte, 8, 0) ++
      "this is not deflate".getBytes("UTF-8")
    val dir = writeTemp("c.warc.gz" -> corrupt)
    val idx = WarcFiles.chunkIndex(spark, s"$dir/c.warc.gz", 1L << 30)
      .orderBy("chunk_idx").collect()
    assert(idx.length == 2)
    assert(idx.head.getAs[Boolean]("clean") &&
      idx.head.getAs[Int]("n_members") == 4)
    assert(!idx.last.getAs[Boolean]("clean") &&
      idx.last.getAs[Int]("n_members") == 0)
    assert(idx.map(_.getAs[Long]("length")).sum == corrupt.length.toLong)
    val recs = WarcFiles.warcRecordsGzipFiles(spark, s"$dir/c.warc.gz",
      1L << 30)
    // 3 + 2 real records from the clean chunk, 1 null-member row from
    // the corrupt tail (visible for audit)
    assert(recs.where(col("clean")).count() == 5)
    val tail = recs.where(!col("clean")).collect()
    assert(tail.length == 1 && tail.head.isNullAt(
      tail.head.fieldIndex("member_idx")))
  }

  test("memberIndex: one row per member, 1-based, tiles the file; " +
      "corrupt tail is one clean=false row with the tail extent") {
    val good = fileBytes("m", 4) // 5 members
    val dir = writeTemp("m.warc.gz" -> good)
    val idx = WarcFiles.memberIndex(spark, s"$dir/m.warc.gz")
      .orderBy("member_idx").collect()
    assert(idx.length == 5)
    assert(idx.map(_.getAs[Long]("member_idx")).toSeq == (1L to 5L))
    assert(idx.forall(_.getAs[Boolean]("clean")))
    assert(idx.map(_.getAs[Long]("length")).sum == good.length.toLong)
    idx.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("offset") + a.getAs[Long]("length") ==
          b.getAs[Long]("offset"))
      case _ => ()
    }
    val corrupt = good ++ Array[Byte](0x1f, 0x8b.toByte, 8, 0) ++
      "junk".getBytes("UTF-8")
    val dir2 = writeTemp("c.warc.gz" -> corrupt)
    val idx2 = WarcFiles.memberIndex(spark, s"$dir2/c.warc.gz")
      .orderBy("member_idx").collect()
    assert(idx2.length == 6 && !idx2.last.getAs[Boolean]("clean"))
    assert(idx2.last.getAs[Long]("offset") == good.length.toLong)
    assert(idx2.map(_.getAs[Long]("length")).sum == corrupt.length.toLong)
  }

  test("chunksFromIndex + warcRecordsGzipFilesIndexed: pass 1 " +
      "replaced by a persisted index, records bit-identical to the " +
      "walking path, corrupt tail contract preserved") {
    val s = spark
    import s.implicits._
    val fa = fileBytes("a", 7)
    val fb = fileBytes("b", 5) ++
      Array[Byte](0x1f, 0x8b.toByte, 8, 0) ++ "junk".getBytes("UTF-8")
    val dir = writeTemp("fa.warc.gz" -> fa, "fb.warc.gz" -> fb)
    val idx = WarcFiles.memberIndex(spark, s"$dir/*.warc.gz")
      .localCheckpoint() // a "persisted corpus index"
    val chunks = WarcFiles.chunksFromIndex(idx, 600L)
      .orderBy("path", "chunk_idx").collect()
    // chunk frame invariants: tiling, member_base cumulative, the
    // tail is its own clean=false chunk
    chunks.groupBy(_.getAs[String]("path")).foreach { case (p, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq ==
        sorted.indices.toSeq)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("start") + x.getAs[Long]("length") ==
            y.getAs[Long]("start"), s"contiguity in $p")
        case _ => ()
      }
      val fileLen = if (p.endsWith("fa.warc.gz")) fa.length else fb.length
      assert(sorted.map(_.getAs[Long]("length")).sum == fileLen.toLong)
      var base = 0L
      sorted.foreach { c =>
        assert(c.getAs[Long]("member_base") == base)
        base += c.getAs[Int]("n_members")
      }
    }
    assert(chunks.count(r => !r.getAs[Boolean]("clean")) == 1)
    // records: indexed path == walking path, bit for bit
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("path"), col("member_idx").cast("long"), col("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        sha2(col("payload"), 256), col("clean"))
      .collect().map(_.toSeq).toSet
    val viaIndex = key(WarcFiles
      .warcRecordsGzipFilesIndexed(spark, idx, 600L))
    val viaWalk = key(WarcFiles
      .warcRecordsGzipFiles(spark, s"$dir/*.warc.gz", 600L))
    assert(viaIndex == viaWalk && viaIndex.nonEmpty)
  }

  test("warcCdx: per-record index carries the member extent, the " +
      "corpus-convention sha1:BASE32 digest, and joins back to " +
      "memberIndex offsets exactly") {
    val s = spark
    import s.implicits._
    val fa = fileBytes("x", 6)
    val dir = writeTemp("x.warc.gz" -> fa)
    val cdx = WarcFiles.warcCdx(spark, s"$dir/x.warc.gz", 600L)
      .orderBy("member_idx", "rec_idx").collect()
    // 6 single-record members + 1 two-record member = 8 records
    assert(cdx.length == 8)
    val idx = WarcFiles.memberIndex(spark, s"$dir/x.warc.gz")
      .collect().map(r => r.getAs[Long]("member_idx") ->
        ((r.getAs[Long]("offset"), r.getAs[Long]("length")))).toMap
    cdx.foreach { r =>
      val m = r.getAs[Long]("member_idx")
      assert((r.getAs[Long]("offset"), r.getAs[Long]("length")) == idx(m))
      assert(r.getAs[String]("digest")
        .matches("sha1:[A-Z2-7]{32}"))
    }
    // digest is of the PAYLOAD: recompute one in the JVM
    val rec = WarcFiles
      .warcRecordsGzipFiles(spark, s"$dir/x.warc.gz", 600L)
      .where(col("member_idx") === 1 && col("rec_idx") === 1)
      .select(col("payload")).collect().head.getAs[Array[Byte]](0)
    val sha = java.security.MessageDigest.getInstance("SHA-1").digest(rec)
    val want = "sha1:" + org.apache.spark.sql.graftnative.Base32Encode
      .compute(sha).toString
    assert(cdx.head.getAs[String]("digest") == want)
  }

  test("writeWarcGz: one member per record, files parse back " +
      "bit-identical, manifest is the write's ledger, null fields " +
      "still write") {
    val s = spark
    import s.implicits._
    val rows = (1 to 40).map(i => (s"http://w.ex/$i",
      s"2026-01-0${i % 9 + 1}T00:00:00Z",
      s"payload $i".getBytes("UTF-8")))
    val df = rows.toDF("uri", "date", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_write")
    dir.toFile.deleteOnExit()
    val m = WarcFiles.writeWarcGz(df, "uri", "date", "payload",
      dir.toString, 4).collect()
    assert(m.map(_.getAs[Long]("n_records")).sum == 40)
    assert(m.length > 1 && m.length <= 4) // hash sharding really splits
    // ledger bytes == on-disk file sizes
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.map(_.length).sum == m.map(_.getAs[Long]("bytes")).sum)
    assert(files.length == m.length)
    // read back through the chunked reader: bit-exact round trip
    val back = WarcFiles.warcRecordsGzipFiles(spark,
      dir.toString + "/*.warc.gz", 1L << 20)
    assert(back.count() == 40)
    val got = back.select(col("target_uri"), col("warc_date"),
      col("content_length"), col("payload").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val want = rows.map(t => (t._1, t._2, t._3.length.toLong,
      new String(t._3, "UTF-8"))).toSet
    assert(got == want)
    // every member is one record and clean
    val idx = WarcFiles.memberIndex(spark, dir.toString + "/*.warc.gz")
    assert(idx.count() == 40 && idx.where(!col("clean")).count() == 0)
    // null uri/date/payload: row still writes (uri header omitted,
    // date falls back to the mandatory-header default, empty payload),
    // nothing silently dropped
    val dir2 = java.nio.file.Files.createTempDirectory("graft_warc_write2")
    dir2.toFile.deleteOnExit()
    val df2 = Seq((Option.empty[String], Option.empty[String],
      Option.empty[Array[Byte]])).toDF("uri", "date", "payload")
    val m2 = WarcFiles.writeWarcGz(df2, "uri", "date", "payload",
      dir2.toString, 2).collect()
    assert(m2.map(_.getAs[Long]("n_records")).sum == 1)
    val b2 = WarcFiles.warcRecordsGzipFiles(spark,
      dir2.toString + "/*.warc.gz", 1024L).collect()
    assert(b2.length == 1)
    assert(b2.head.isNullAt(b2.head.fieldIndex("target_uri")))
    assert(b2.head.getAs[String]("warc_date") == WarcFiles.DefaultWarcDate)
    assert(b2.head.getAs[Long]("content_length") == 0L)
  }

  test("writeWarcGz: every record carries a deterministic urn:uuid " +
      "WARC-Record-ID and a WARC-Date (ISO 28500 mandatory headers); " +
      "re-running re-issues identical ids") {
    val s = spark
    import s.implicits._
    val df = (1 to 6).map(i => (s"http://w.ex/$i", "2026-02-02T00:00:00Z",
      s"p$i".getBytes("UTF-8"))).toDF("uri", "date", "payload")
    def idsOf(dir: String): Seq[String] = {
      WarcFiles.writeWarcGz(df, "uri", "date", "payload", dir, 2)
      // raw member text: the reader does not need to understand the
      // header for this pin — regex it straight out of the payload
      val cells = spark.read.format("binaryFile")
        .load(dir + "/*.warc.gz").select(col("content"))
        .collect().map(_.getAs[Array[Byte]](0))
      val txt = cells.map(c => new String(
        org.apache.spark.sql.graftnative.GunzipMembers.inflateAll(c),
        "ISO-8859-1")).mkString("\n")
      "(?m)^WARC-Record-ID: <(urn:uuid:[0-9a-f-]+)>".r
        .findAllMatchIn(txt).map(_.group(1)).toSeq.sorted
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft_warc_id1")
    val d2 = java.nio.file.Files.createTempDirectory("graft_warc_id2")
    d1.toFile.deleteOnExit(); d2.toFile.deleteOnExit()
    val ids1 = idsOf(d1.toString)
    assert(ids1.size == 6 && ids1.distinct.size == 6)
    // RFC 4122 shape: version nibble 3 (name-based), variant nibble 8
    ids1.foreach(id => assert(id.matches(
      "urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}"), id))
    assert(idsOf(d2.toString) == ids1) // deterministic across runs
  }

  test("writeWarcGz commit protocol: stale part files and _tmp debris " +
      "are cleaned, writes stage-and-rename so no truncated final file " +
      "is ever visible") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_commit")
    dir.toFile.deleteOnExit()
    // prior run with MORE shards + an aborted attempt's partial temp
    val big = (1 to 20).map(i => (s"http://w.ex/$i",
      "2026-01-01T00:00:00Z", s"old $i".getBytes("UTF-8")))
      .toDF("uri", "date", "payload")
    WarcFiles.writeWarcGz(big, "uri", "date", "payload", dir.toString, 8)
    val tmp = dir.resolve("_tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-00000.warc.gz.99999"),
      "partial garbage from a dead attempt".getBytes("UTF-8"))
    // second run with FEWER shards into the same dir
    val small = Seq(("http://w.ex/new", "2026-01-02T00:00:00Z",
      "new payload".getBytes("UTF-8"))).toDF("uri", "date", "payload")
    val m = WarcFiles.writeWarcGz(small, "uri", "date", "payload",
      dir.toString, 1).collect()
    assert(m.length == 1)
    // no orphan shards from the 8-shard run, no staging leftovers
    // (local ChecksumFileSystem .crc sidecars are invisible to globs)
    val files = dir.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == Seq("part-00000.warc.gz"),
      s"stale files survived: $files")
    val back = WarcFiles.warcRecordsGzipFiles(spark,
      dir.toString + "/*.warc.gz", 1024L)
      .select(col("payload").cast("string")).collect().map(_.getString(0))
    assert(back.toSeq == Seq("new payload"))
  }

  test("chunkFile peak memory is walker-buffer-bounded: a member far " +
      "larger than the walker's 64 KiB buffers indexes without " +
      "materializing it") {
    // 8 MB of low-entropy payload -> one member whose DECOMPRESSED size
    // (8 MB) and compressed size (~80 KB) both exceed... compressed
    // exceeds the 64 KiB buffer; the walker must stream it.
    val big = record("conversion", "http://ex.com/big",
      scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(8 * 1024 * 1024).mkString)
    val bytes = gz(big) ++ gz(record("metadata", null, "tail"))
    val in = new java.io.ByteArrayInputStream(bytes)
    val chunks = WarcFiles.chunkFile("mem", bytes.length.toLong, in, 1L)
    assert(chunks.length == 2 && chunks.forall(_.clean))
    assert(chunks.map(_.length).sum == bytes.length.toLong)
    assert(chunks.head.length > (1 << 16)) // bigger than the buffer
  }

  test("cdxj roundtrip law: cdxjRecords(warcCdxjLines(warcCdx)) " +
      "reproduces the index columns; junk lines yield all-null fields") {
    val dir = writeTemp(
      "a.warc.gz" -> fileBytes("a", 4),
      "b.warc.gz" -> fileBytes("b", 2))
    val s = spark
    import s.implicits._
    val cdx = WarcFiles.warcCdx(spark, s"$dir/*.warc.gz", 600L)
      .localCheckpoint()
    val lines = WarcFiles.warcCdxjLines(cdx)
    // line shape: "surt ts {json}"
    val sample = lines.orderBy("surt", "ts").select("line")
      .collect().map(_.getString(0))
    sample.foreach(l =>
      assert(l.matches("^[^ ]+ [0-9]{14} \\{.*\\}$"), l))
    assert(sample.exists(_.startsWith("com,ex)/a/1 00000000000000 {")))
    val parsed = WarcFiles.cdxjRecords(
      lines.withColumn("id", lit(1L)), "id", "line")
    def key(df: org.apache.spark.sql.DataFrame, urlCol: String,
        fileCol: org.apache.spark.sql.Column) =
      df.select(col(urlCol).as("url"),
      fileCol.as("filename"), col("offset"), col("length"),
      col("digest")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    val want = key(cdx.where(col("offset").isNotNull), "target_uri",
      element_at(split(col("path"), "/"), -1))
    val got = key(parsed, "url", col("filename"))
    assert(got == want && want.nonEmpty)
    // junk line: all-null fields, row kept
    val junk = WarcFiles.cdxjRecords(
      Seq((1L, "not a cdxj line at all")).toDF("id", "line"),
      "id", "line").collect().head
    assert((1 to 9).forall(junk.isNullAt))
  }

  test("selective index: warcRecordsGzipRanges fetches exactly the " +
      "selected members, gaps never surface foreign records; " +
      "chunksFromIndex(validateTiling=true) rejects the gapped index " +
      "and accepts the full one") {
    val dir = writeTemp("s.warc.gz" -> fileBytes("s", 6))
    val glob = s"$dir/*.warc.gz"
    val idx = WarcFiles.memberIndex(spark, glob).localCheckpoint()
    // full index tiles: the eager validation pass does not throw, and
    // the indexed reader still matches pass 1
    WarcFiles.chunksFromIndex(idx, 600L, validateTiling = true)
    val full = WarcFiles.warcRecordsGzipFilesIndexed(spark, idx, 600L)
    assert(full.count() ==
      WarcFiles.warcRecordsGzipFiles(spark, glob, 600L).count())
    // select every ODD member (gaps where the even ones were)
    val sel = idx.where(col("clean") && col("member_idx") % 2 === 1)
      .select(col("path"), col("offset"), col("length"))
    val recs = WarcFiles.warcRecordsGzipRanges(spark, sel)
      .select(col("target_uri"), col("payload").cast("string"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getString(1))).toSet
    // expected: records of odd members only, from the single-cell path
    val allRecs = WarcFiles.warcRecordsGzipFiles(spark, glob, 1L << 20)
      .where(col("member_idx") % 2 === 1)
      .select(col("target_uri"), col("payload").cast("string"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getString(1))).toSet
    assert(recs == allRecs && recs.nonEmpty)
    // the gapped selection must NOT pass chunk coalescing
    val ex = intercept[IllegalArgumentException] {
      WarcFiles.chunksFromIndex(
        sel.withColumn("clean", lit(true)), 600L, validateTiling = true)
    }
    assert(ex.getMessage.contains("tile"))
  }

  test("cdxClusterRecords: tab-separated secondary-index lines parse; " +
      "short/junk lines keep their row with null extents; a tab-less " +
      "line nulls surt/ts too (no fabricated range-scan keys)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "com,ex)/a 20260101000000\tcdx-00000.gz\t0\t1234\t7"),
      (2L, "com,ex)/b 20260102000000\tcdx-00001.gz\t99\tnotdigits\t8"),
      (3L, "no tabs at all"))
      .toDF("id", "line")
    val got = WarcFiles.cdxClusterRecords(rows, "id", "line")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getLong(5),
        if (r.isNullAt(6)) null else r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, "com,ex)/a", "20260101000000", "cdx-00000.gz", 0L, 1234L, 7L),
      (2L, "com,ex)/b", "20260102000000", "cdx-00001.gz", 99L, null, 8L),
      (3L, null, null, null, null, null, null)))
  }

  test("writeWetGz: conversion records with Content-Type, a " +
      "payload digest over exactly the written bytes, and an " +
      "optional WARC-Refers-To; read-back text equals input and the " +
      "digest resolves a revisit; a CRLF-bearing extra header value " +
      "is scrubbed, never a framing break") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("http://w.ex/1", "2026-01-01T00:00:00Z", "extracted text one",
        "urn:uuid:src-1"),
      ("http://w.ex/2", "2026-01-02T00:00:00Z", "extracted text two",
        null))
    val df = rows.toDF("uri", "date", "text", "refers")
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_write")
    dir.toFile.deleteOnExit()
    val m = WarcFiles.writeWetGz(df, "uri", "date", "text",
      dir.toString, 2, refersToCol = "refers").collect()
    assert(m.map(_.getAs[Long]("n_records")).sum == 2)
    val back = WarcFiles.warcRecordsGzipFiles(spark,
        dir.toString + "/*.warc.gz", 1L << 20)
      .orderBy("target_uri")
      .select(col("target_uri"), col("warc_type"),
        col("warc_refers_to"), col("warc_payload_digest"),
        col("payload"))
    val got = back.collect()
    assert(got.map(_.getString(1)).toSeq == Seq("conversion",
      "conversion"))
    assert(got.map(r => new String(r.getAs[Array[Byte]](4),
      "UTF-8")).toSeq == Seq("extracted text one",
      "extracted text two"))
    // refers-to round-trips (brackets stripped by the reader); the
    // null id OMITS the header instead of writing "null"
    assert(got.map(r => Option(r.getString(2)).orNull).toSeq ==
      Seq("urn:uuid:src-1", null))
    // the digest header covers exactly the written payload bytes
    val digestOk = back
      .where(col("warc_payload_digest") ===
        graft.ops.Web.payloadDigest(col("payload")))
      .count()
    assert(digestOk == 2)
    // a revisit carrying the crawler-convention digest resolves
    // against the WET records (conversion originals digest their
    // payload directly)
    val revisit = Seq(("revisit", "urn:uuid:rv-1", null: String,
        got.head.getString(3), "http://w.ex/1",
        "2026-02-01T00:00:00Z", null: Array[Byte]))
      .toDF("warc_type", "warc_record_id", "warc_refers_to",
        "warc_payload_digest", "target_uri", "warc_date", "payload")
    val full = WarcFiles.warcRecordsGzipFiles(spark,
        dir.toString + "/*.warc.gz", 1L << 20)
      .select(col("warc_type"), col("warc_record_id"),
        col("warc_refers_to"), col("warc_payload_digest"),
        col("target_uri"), col("warc_date"), col("payload"))
      .unionByName(revisit)
    val resolved = graft.ops.Web.warcRevisitResolve(full).collect()
    assert(resolved.length == 1 &&
      resolved.head.getAs[String]("resolved_via") == "digest" &&
      new String(resolved.head.getAs[Array[Byte]]("original_payload"),
        "UTF-8") == "extracted text one")
    // header-injection scrub: a value with CRLF cannot fork the
    // header block into a fake record header
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hdr_inj")
    dir2.toFile.deleteOnExit()
    val inj = Seq(("http://w.ex/x", "2026-01-01T00:00:00Z",
        "p".getBytes("UTF-8")))
      .toDF("uri", "date", "payload")
      .withColumn("hdrs", array(struct(lit("X-Note").as("name"),
        lit("evil\r\nWARC-Type: response").as("value"))))
    WarcFiles.writeWarcGz(inj, "uri", "date", "payload",
      dir2.toString, 1, warcType = "conversion", headersCol = "hdrs")
    val b2 = WarcFiles.warcRecordsGzipFiles(spark,
      dir2.toString + "/*.warc.gz", 1024L).collect()
    assert(b2.length == 1 &&
      b2.head.getAs[String]("warc_type") == "conversion")
  }

  test("writeWatGz + watEnvelopeJson: the serialize side is the " +
      "exact inverse of the r19 parse — metadata records round-trip " +
      "through watMetadata/watLinks/watRobotsFlags, null fields " +
      "serialize as absent keys") {
    val s = spark
    import s.implicits._
    val links = array(
      struct(lit("A@/href").as("path"), lit("/a").as("url"),
        lit("first").as("text"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("rel")),
      struct(lit("IMG@/src").as("path"), lit("i.png").as("url"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("rel")))
    val metas = array(struct(lit("robots").as("name"),
      lit("noindex").as("content")))
    val df = Seq(("http://w.ex/p/1", "2026-01-01T00:00:00Z"))
      .toDF("uri", "date")
      .withColumn("env", graft.ops.Web.watEnvelopeJson(
        col("uri"), col("date"), lit("200"), lit("text/html"),
        lit("T1"), lit(null).cast("string"), links, metas))
    // titleless/baseless fields serialize as ABSENT keys (compact
    // envelope), not "null" strings
    val envStr = df.select(col("env")).first().getString(0)
    assert(!envStr.contains("\"Base\""))
    assert(envStr.contains("\"WARC-Type\":\"metadata\""))
    val dir = java.nio.file.Files.createTempDirectory("graft_wat_write")
    dir.toFile.deleteOnExit()
    val m = WarcFiles.writeWatGz(df, "uri", "date", "env",
      dir.toString, 1).collect()
    assert(m.map(_.getAs[Long]("n_records")).sum == 1)
    val back = WarcFiles.warcRecordsGzipFiles(spark,
      dir.toString + "/*.warc.gz", 1L << 20)
    assert(back.select(col("warc_type")).first().getString(0) ==
      "metadata")
    val meta = back.select(
      graft.ops.Web.watMetadata(col("payload")).as("m"),
      graft.ops.Web.watRobotsFlags(col("payload")).as("r"))
      .first()
    val mm = meta.getStruct(0)
    assert(mm.getString(0) == "http://w.ex/p/1" &&
      mm.getString(1) == "2026-01-01T00:00:00Z" &&
      mm.getString(2) == "200" &&
      mm.getString(3) == "text/html" &&
      mm.getString(4) == "T1" && mm.isNullAt(5) &&
      mm.getInt(6) == 2)
    assert(meta.getStruct(1).getBoolean(0) &&
      !meta.getStruct(1).getBoolean(1))
    val l = graft.ops.Web.watLinks(
        back.select(lit(1L).as("id"), col("payload")), "id", "payload")
      .orderBy("link_idx")
      .select(col("url"), col("path"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).orNull)).toSeq
    assert(l == Seq(("/a", "A@/href", "first"),
      ("i.png", "IMG@/src", null)))
  }

  test("writeCdxjGz: zipnum shards in global (surt, ts) order, one " +
      "gzip member per block, cluster.idx names every block with " +
      "contiguous sequence numbers and tiling extents") {
    val s = spark
    import s.implicits._
    // 23 lines in SHUFFLED input order; surt/ts sort restores them
    val n = 23
    val rows = scala.util.Random.javaRandomToRandom(
      new java.util.Random(11)).shuffle((0 until n).toList).map { i =>
      val surt = f"ex,h$i%03d)/p"
      val ts = "20260101000000"
      (surt, ts, s"$surt $ts " + s"""{"url": "http://h$i.ex/p"}""")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_w")
    dir.toFile.deleteOnExit()
    val m = graft.sources.WarcFiles.writeCdxjGz(
      rows.toDF("surt", "ts", "line"), dir.toString, 3, blockLines = 4)
      .orderBy("shard").collect()
    assert(m.map(_.getAs[Long]("n_lines")).sum == n)
    val files = dir.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files.contains("cluster.idx") &&
      files.count(_.matches("cdx-[0-9]{5}\\.gz")) == m.length)
    // shard bytes in the manifest == on-disk sizes
    m.foreach { r =>
      val f = new java.io.File(r.getAs[String]("path"))
      assert(f.length == r.getAs[Long]("bytes"))
    }
    // global order: lines concatenated in shard-name order == sorted
    val gotLines = files.filter(_.endsWith(".gz")).flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(f))
      val members = org.apache.spark.sql.graftnative.GunzipMembers
        .compute(bytes)
      (0 until members.numElements()).flatMap(i =>
        new String(members.getBinary(i), "UTF-8")
          .split("\n").filter(_.nonEmpty))
    }
    assert(gotLines == rows.map(_._3).sorted)
    // every member holds <= blockLines lines
    files.filter(_.endsWith(".gz")).foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(f))
      val members = org.apache.spark.sql.graftnative.GunzipMembers
        .compute(bytes)
      (0 until members.numElements()).foreach(i => assert(
        new String(members.getBinary(i), "UTF-8")
          .split("\n").count(_.nonEmpty) <= 4))
    }
    // cluster.idx: contiguous sequence, keys = each block's first
    // line, extents tile each shard file
    val cl = graft.sources.WarcFiles.cdxClusterRecords(
      spark.read.textFile(dir.toString + "/cluster.idx").toDF("line")
        .withColumn("id", monotonically_increasing_id()), "id", "line")
      .orderBy("cluster_id").collect()
    assert(cl.map(_.getAs[Long]("cluster_id")).toSeq ==
      (0L until cl.length))
    cl.groupBy(_.getAs[String]("filename")).foreach { case (f, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("offset"))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("offset") +
          a.getAs[Long]("length") == b.getAs[Long]("offset"))
        case _ => ()
      }
      assert(sorted.map(_.getAs[Long]("length")).sum ==
        new java.io.File(dir.resolve(f).toString).length)
    }
    assert(cl.head.getAs[String]("surt") == "ex,h000)/p")
    // two-level read-back: every line parses back, ids globalized
    val back = graft.sources.WarcFiles.readCdxjGz(spark, dir.toString)
      .collect()
    assert(back.length == n)
    assert(back.map(_.getAs[String]("url")).toSet ==
      (0 until n).map(i => s"http://h$i.ex/p").toSet)
    assert(back.map(r => (r.getAs[Long]("cluster_id"),
      r.getAs[Int]("line_no"))).distinct.length == n)
  }

  test("writeCdxjGz roundtrip law over a real corpus index: " +
      "readCdxjGz(writeCdxjGz(warcCdxjLines(warcCdx))) == " +
      "cdxjRecords(lines); stale shards and debris pre-cleaned") {
    val s = spark
    import s.implicits._
    val wdir = writeTemp(
      "a.warc.gz" -> fileBytes("a", 5),
      "b.warc.gz" -> fileBytes("b", 3))
    val cdx = WarcFiles.warcCdx(spark, s"$wdir/*.warc.gz", 600L)
      .localCheckpoint()
    val lines = WarcFiles.warcCdxjLines(cdx).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_rt")
    dir.toFile.deleteOnExit()
    // prior run with MORE shards + tmp debris must be cleaned
    WarcFiles.writeCdxjGz(lines, dir.toString, 7, blockLines = 2)
    val tmp = dir.resolve("_tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("cdx-00000.gz.999"),
      "debris".getBytes("UTF-8"))
    WarcFiles.writeCdxjGz(lines, dir.toString, 2, blockLines = 3)
    val files = dir.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files.forall(f => f == "cluster.idx" ||
      f.matches("cdx-[0-9]{5}\\.gz")), files.toString)
    assert(files.count(_.endsWith(".gz")) <= 2)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("surt"), col("ts"), col("url"), col("filename"),
        col("offset"), col("length"), col("digest"))
      .collect().map(_.toSeq).toSet
    val want = key(WarcFiles.cdxjRecords(
      lines.withColumn("id", lit(1L)), "id", "line"))
    val got = key(WarcFiles.readCdxjGz(spark, dir.toString))
    assert(got == want && got.nonEmpty)
  }

  test("cdxjLookup: inclusive surt-range lookup returns exactly the " +
      "range members across shard and block boundaries; empty range " +
      "is empty; prefix idiom works") {
    val s = spark
    import s.implicits._
    val n = 40
    val rows = (0 until n).map { i =>
      val surt = f"ex,h$i%03d)/p"
      val ts = "20260101000000"
      (surt, ts, s"$surt $ts " + s"""{"url": "http://h$i.ex/p"}""")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_lk")
    dir.toFile.deleteOnExit()
    // 4 shards x 3-line blocks: ranges cross BOTH boundaries
    WarcFiles.writeCdxjGz(rows.toDF("surt", "ts", "line"),
      dir.toString, 4, blockLines = 3)
    def lookup(a: String, b: String): Seq[String] =
      WarcFiles.cdxjLookup(spark, dir.toString, a, b)
        .select(col("surt")).collect().map(_.getString(0)).sorted.toSeq
    // mid-range spanning shard/block boundaries, inclusive endpoints
    assert(lookup("ex,h007)/p", "ex,h023)/p") ==
      (7 to 23).map(i => f"ex,h$i%03d)/p"))
    // single key
    assert(lookup("ex,h011)/p", "ex,h011)/p") == Seq("ex,h011)/p"))
    // range before / after all keys
    assert(lookup("aa", "ab").isEmpty)
    assert(lookup("zz", "zzz").isEmpty)
    // prefix idiom: p to p + "￿"
    assert(lookup("ex,h03", "ex,h03￿") ==
      (30 until 40).map(i => f"ex,h$i%03d)/p"))
    // full range == full read
    assert(lookup("", "￿").size == n)
  }

  test("cdxjLookup: shard-boundary bound survives >5-digit shard " +
      "names (r19 advice: 'cdx-100000.gz' sorts lexicographically " +
      "BEFORE 'cdx-99999.gz' — the next-shard-first window must " +
      "order by the parsed numeric id, or boundary blocks are " +
      "silently pruned)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_big")
    dir.toFile.deleteOnExit()
    def gz(lines: Seq[String]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      g.close(); bos.toByteArray
    }
    def line(k: String, i: Int): String =
      s"ex,$k)/p/$i 20260101000000 " +
        s"""{"url": "http://$k.ex/p/$i"}"""
    val shardA = gz((1 to 3).map(line("a", _)))
    val shardB = gz((1 to 3).map(line("b", _)))
    java.nio.file.Files.write(dir.resolve("cdx-99999.gz"), shardA)
    java.nio.file.Files.write(dir.resolve("cdx-100000.gz"), shardB)
    java.nio.file.Files.write(dir.resolve("cluster.idx"),
      (s"ex,a)/p/1 20260101000000\tcdx-99999.gz\t0\t${shardA.length}\t0\n" +
       s"ex,b)/p/1 20260101000000\tcdx-100000.gz\t0\t${shardB.length}\t1\n")
        .getBytes("UTF-8"))
    // a range INSIDE the numerically-later shard: a name-ordered
    // lead() would bound cdx-100000.gz by cdx-99999.gz's first key
    // ("ex,a)/p/1" < start) and wrongly prune its only block
    val got = WarcFiles.cdxjLookup(s, dir.toString,
        "ex,b)/p/2", "ex,b)/p/3")
      .select(col("surt")).collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("ex,b)/p/2", "ex,b)/p/3"))
    // and the numerically-earlier shard still bounds correctly
    val gotA = WarcFiles.cdxjLookup(s, dir.toString,
        "ex,a)/p/2", "ex,a)/p/3")
      .select(col("surt")).collect().map(_.getString(0)).sorted.toSeq
    assert(gotA == Seq("ex,a)/p/2", "ex,a)/p/3"))
  }

  test("writeCdxjGz: empty input still ships an empty cluster.idx " +
      "and no shards; readCdxjGz of it is empty, not an error") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_e")
    dir.toFile.deleteOnExit()
    val m = WarcFiles.writeCdxjGz(
      Seq.empty[(String, String, String)].toDF("surt", "ts", "line"),
      dir.toString, 3).collect()
    assert(m.isEmpty)
    val files = dir.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
    assert(files == Seq("cluster.idx"))
    assert(WarcFiles.readCdxjGz(spark, dir.toString).count() == 0)
  }

  test("cdxjLookupUrl: every capture of ONE url, ts-ordered with a " +
      "1-based capture_seq; the surt canonicalization (www-strip, " +
      "case fold) applies to the query url; junk url fails loudly " +
      "instead of silently finding nothing") {
    val s = spark
    import s.implicits._
    // 3 captures of the target url at SHUFFLED timestamps + decoys
    // on both sides of the key so block pruning has work to do
    val rows = Seq(
      ("com,example)/p", "20260103000000",
        """com,example)/p 20260103000000 {"url": "http://example.com/p", "digest": "sha1:C3"}"""),
      ("com,example)/p", "20260101000000",
        """com,example)/p 20260101000000 {"url": "http://example.com/p", "digest": "sha1:C1"}"""),
      ("com,example)/p", "20260102000000",
        """com,example)/p 20260102000000 {"url": "http://example.com/p", "digest": "sha1:C2"}"""),
      ("com,example)/a", "20260101000000",
        """com,example)/a 20260101000000 {"url": "http://example.com/a"}"""),
      ("com,example)/pz", "20260101000000",
        """com,example)/pz 20260101000000 {"url": "http://example.com/pz"}"""),
      ("org,other)/p", "20260101000000",
        """org,other)/p 20260101000000 {"url": "http://other.org/p"}"""))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_url")
    dir.toFile.deleteOnExit()
    WarcFiles.writeCdxjGz(rows.toDF("surt", "ts", "line"),
      dir.toString, 2, blockLines = 2)
    // www-strip + case fold: the QUERY url canonicalizes to the
    // written surt
    val got = WarcFiles.cdxjLookupUrl(spark, dir.toString,
        "http://www.Example.com/p")
      .select(col("ts"), col("digest"), col("capture_seq"))
      .orderBy("capture_seq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq(
      ("20260101000000", "sha1:C1", 1),
      ("20260102000000", "sha1:C2", 2),
      ("20260103000000", "sha1:C3", 3)))
    intercept[IllegalArgumentException] {
      WarcFiles.cdxjLookupUrl(spark, dir.toString, "not a url")
    }
  }

  test("surtKey: reversed host, www-strip, query kept, junk -> null") {
    val s = spark
    import s.implicits._
    val got = Seq("https://www.Example.com/a/b?x=1",
      "http://sub.ex.org", "http://www2.ex.org/p", "not a url")
      .toDF("u").select(Web.surtKey(col("u"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("com,example)/a/b?x=1", "org,ex,sub)/",
      "org,ex,www2)/p", null))
  }
}
