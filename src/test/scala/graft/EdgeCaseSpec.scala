package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.RowOps._
import graft.ops.Surgery._
import graft.ops.Agg._
import graft.ops.Reshape._
import graft.ops.Joins._
import graft.ops.Series._

/** Empty-frame and degenerate-input behavior: every operator must come
  * back with the right (empty) shape, not throw — at 100 TB a partition
  * or a filtered branch being empty is the common case, not the edge. */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkFixture._

  private def emptyDocs = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }
  private def emptyKV = {
    val s = spark
    import s.implicits._
    Seq.empty[(String, Double)].toDF("k", "v")
  }

  test("aggregation family on an empty frame") {
    assert(emptyKV.groupAgg(Seq("k"), Seq(sum(col("v")).as("s"))).count() == 0)
    assert(emptyKV.meanFor(Seq("k"), Seq("v")).count() == 0)
    assert(emptyKV.minByRow(Seq("k"), "v").count() == 0)
    val d = emptyKV.describeAll(Seq("v")).collect()
    assert(d.length == 1 && d(0).getLong(1) == 0L) // count=0 row, no throw
  }

  test("reshape family on an empty frame") {
    assert(emptyKV.pivotAgg(Seq("k"), "k", Seq("x"),
      Seq(sum(col("v")))).count() == 0)
    assert(emptyKV.pivotAggNested(Seq("k"), "k", Seq("x"),
      Seq("s" -> sum(col("v")))).count() == 0)
    assert(emptyKV.gather(Seq("v")).count() == 0)
    assert(emptyKV.mergeRows(Seq("v")).count() == 0)
    assert(emptyKV.splitInto("k", "-", 2).count() == 0)
    // explicit n works on empty input; auto-n has nothing to scan
    assert(emptyKV.splitIntoBy("k", c => split(c, "-"), n = 2).count() == 0)
    val e = intercept[IllegalArgumentException] {
      emptyKV.splitIntoBy("k", c => split(c, "-"))
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("joins and unions on an empty side") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a")).toDF("id", "x")
    val right = Seq.empty[(Long, String)].toDF("id", "y")
    assert(left.innerJoin(right, Seq("id")).count() == 0)
    assert(left.leftJoin(right, Seq("id")).count() == 1)
    assert(left.unionWide(right.select(col("id"), col("y").as("x"))).count() == 1)
  }

  test("dedup family on an empty corpus") {
    assert(graft.ops.Dedup.exactDedup(emptyDocs, "text", "doc_id").count() == 0)
    assert(graft.ops.Dedup.nearDupPairs(emptyDocs, "text", "doc_id").count() == 0)
    val clusters = graft.ops.Dedup.nearDupClusters(emptyDocs, "text", "doc_id")
    assert(clusters.count() == 0)
    assert(clusters.columns.toSeq == Seq("id", "cluster"))
  }

  test("series windows on an empty frame") {
    assert(emptyKV.runningSum("v", Seq("k"), Seq(col("v")), "rs").count() == 0)
    assert(emptyKV.movingAverage("v", 3, Seq("k"), Seq(col("v")), "ma").count() == 0)
  }

  test("sessionize on an empty event set") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[graft.streaming.Streaming.Event].toDS()
    assert(graft.streaming.Streaming.sessionize(empty, 1000).count() == 0)
  }

  test("media kernels on degenerate blobs: null, empty, truncated, 1x1") {
    val s = spark
    import s.implicits._
    import graft.ops.Multimodal
    val blobs = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),    // null cell
      (2L, Array.empty[Byte]),                 // zero bytes
      (3L, Array[Byte](82, 73, 70, 70, 0, 0)), // truncated RIFF header
      (4L, {                                   // real 1x1 PNG
        val img = new java.awt.image.BufferedImage(1, 1,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        img.setRGB(0, 0, 0x808080)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      })).toDF("id", "blob")
    // default path: garbage bytes FAIL FAST (never silent fake features)
    val e = intercept[Exception] {
      Multimodal.decodeImageFeatures(blobs, "blob").count()
    }
    def chainMsgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chainMsgs(t.getCause)
    assert(chainMsgs(e).contains("allowStubFeatures"), chainMsgs(e))
    // opt-in: 1x1 decodes for real, null → null struct, garbage → stub
    val img = Multimodal.decodeImageFeatures(blobs, "blob",
        allowStubFeatures = true)
      .select(col("id"), col("image_features.width"),
        col("image_features.luma_mean")).collect().sortBy(_.getLong(0))
    assert(img.length == 4)
    assert(img(0).isNullAt(1), "null blob propagates a null struct")
    assert(img(3).getInt(1) == 1 &&
      img(3).getDouble(2) == 0x80 / 255.0, "1x1 decodes exactly")
    // audio decode: nothing here is PCM — stubs need the opt-in too
    assert(Multimodal.decodeAudioFeatures(blobs, "blob",
      allowStubFeatures = true).count() == 4)
    // resize: undecodable passes through, the 1x1 really rescales
    val rz = Multimodal.resizeImageBytes(blobs, "blob", 4, 4)
    assert(rz.count() == 4)
    val rz1 = Multimodal.decodeImageFeatures(
      rz.filter(col("id") === 4), "resized")
      .select(col("image_features.width"), col("image_features.luma_mean"))
      .head()
    assert(rz1.getInt(0) == 4 && rz1.getDouble(1) == 0x80 / 255.0)
    // frame sampling: unreadable blobs → zero rows, no throw; the still
    // PNG reads as a single-frame container (one row)
    val vf = Multimodal.sampleVideoFrames(blobs, "blob")
      .select(col("id"), col("frame.frame_idx")).collect()
    assert(vf.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((4L, 0)))
  }
}
