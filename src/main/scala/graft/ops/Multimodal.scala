package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (brief): image/audio/
  * video as opaque `binary` columns with typed metadata, decode/feature/
  * resize/frame-sample as per-partition batch transforms.
  *
  * IMAGE DECODE IS REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio.ImageIO` — no external
  * dependency): width/height/channels/luma_mean come from actual decoded
  * pixels, proven end-to-end by the `multimodal_decode` oracle query
  * (deterministic generated PNGs, DuckDB checks the closed-form
  * expectations). The vision EMBEDDING is likewise real: a fixed seeded
  * hyperplane projection of the downsampled decoded luma patch — no
  * model weights, but a genuine pixels→vector function the oracle
  * re-derives in closed form (see [[decodeImageFeatures]]). Bytes that
  * no installed codec accepts fall back to a DETERMINISTIC FAKE
  * (xxhash-seeded, clearly marked) so the pipeline shape stays testable
  * with arbitrary blobs. The audio/video kernels remain stubs — those
  * need codecs this container doesn't have; the partition-batched
  * execution (`mapPartitions`, the JVM analogue of `mapInPandas`
  * batches), schema contract, and column plumbing around them are real.
  *
  * Scale notes: media blobs make wide rows — the media table should be
  * stored with the binary column in its own parquet column chunk (free
  * with columnar storage), read with a projection that defers blob IO
  * until after metadata filters, and repartitioned by size before decode
  * so one task ≈ one GPU/CPU batch.
  */
object Multimodal {

  /** Metadata contract carried alongside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("byte_len", LongType),
    StructField("checksum", LongType)))

  /** Wrap a binary column with its metadata struct (ingest side). */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String,
      format: String): DataFrame =
    df.withColumn(s"${binCol}_meta", struct(
      lit(mediaType).as("media_type"), lit(format).as("format"),
      length(col(binCol)).cast(LongType).as("byte_len"),
      xxhash64(col(binCol)).as("checksum")))

  val imageFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("luma_mean", DoubleType),
    StructField("embedding", ArrayType(FloatType))))

  /** The vision embedding's fixed hyperplanes: 8 planes over the 8×8
    * luma patch, coefficient (i,j) = floorMod((i·64+j) · 2654435761,
    * 1024) − 512 (Knuth's multiplicative hash constant). Integer
    * coefficients make the projection EXACT — every embedding value is an
    * integer with |v| ≤ 255·64·512 < 2²⁴, representable losslessly in
    * Float32 — so an independent engine can re-derive it in closed form
    * (the `multimodal_decode` oracle does, in DuckDB SQL). */
  val EmbPlanes = 8
  private val PatchGrid = 8 // 8×8 = 64 luma cells
  private[ops] def embCoef(i: Int, j: Int): Long =
    Math.floorMod((i.toLong * 64 + j) * 2654435761L, 1024L) - 512L

  /** Image decode + feature extract. Bytes any JDK-shipped codec accepts
    * (PNG/BMP/GIF/JPEG) are REALLY decoded: width/height from the image,
    * channels from the color model, luma_mean = Σ(r+g+b) / (3·n·255)
    * computed over the actual pixels with an exact integer sum (one
    * division at the end — bit-reproducible across engines). The 8-dim
    * EMBEDDING is a REAL function of the decoded pixels: the image is
    * downsampled to an 8×8 integer luma patch (per-cell floor-mean of
    * per-pixel (r+g+b)/3), then projected onto the 8 fixed [[embCoef]]
    * hyperplanes — a deterministic, closed-form-verifiable stand-in for
    * a vision encoder that exercises the identical decode → downsample →
    * project plumbing (swap the projection for model weights and nothing
    * else changes). Undecodable bytes fall back to the deterministic
    * hash-derived fake (clearly marked STUB) so arbitrary blobs keep the
    * pipeline shape testable. Runs per-partition (batched), not per-row
    * UDF. */
  def decodeImageFeatures(df: DataFrame, binCol: String,
      as: String = "image_features"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(as, imageFeatureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // one iterator per partition = one decode batch; a real vision
      // encoder would materialize the batch here — ImageIO decodes
      // row-at-a-time but amortizes codec lookup per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        val feat = if (img != null) {
          val (w, ht) = (img.getWidth, img.getHeight)
          var sum = 0L
          val cellSum = new Array[Long](PatchGrid * PatchGrid)
          val cellCnt = new Array[Long](PatchGrid * PatchGrid)
          var y = 0
          while (y < ht) {
            val cy = y * PatchGrid / ht
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val rgb = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
              sum += rgb
              val cell = cy * PatchGrid + x * PatchGrid / w
              cellSum(cell) += rgb / 3 // integer per-pixel luma
              cellCnt(cell) += 1
              x += 1
            }
            y += 1
          }
          val embedding = Array.tabulate(EmbPlanes) { i =>
            var acc = 0L
            var j = 0
            while (j < PatchGrid * PatchGrid) {
              if (cellCnt(j) > 0)
                acc += embCoef(i, j) * (cellSum(j) / cellCnt(j))
              j += 1
            }
            acc.toFloat // exact: |acc| < 2^24
          }
          Row(w, ht, img.getColorModel.getNumComponents,
            sum.toDouble / (3.0 * w * ht * 255.0), embedding)
        } else {
          val h = fakeHash(bytes)
          val embedding = Array.tabulate(8)(i =>
            ((h >> (i * 7)) % 97).toFloat / 97f)      // STUB embedding
          Row(
            (math.abs(h) % 1920 + 32).toInt,          // STUB width
            (math.abs(h >> 11) % 1080 + 32).toInt,    // STUB height
            3,
            (math.abs(h >> 22) % 256).toDouble / 255.0, // STUB luma
            embedding)
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic test-image generator: for each row, a real
    * (id%48+8)×(id%37+8) RGB PNG filled with the constant gray value
    * id%256, encoded by the JDK PNG codec. Gives the decode path
    * closed-form ground truth (width/height/channels/luma are pure
    * functions of the id) that an independent engine can verify —
    * see the `multimodal_decode` oracle query. */
  def encodeTestPng(df: DataFrame, idCol: String, as: String = "img")
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField(as, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx) match {
          case l: Long => l
          case i: Int  => i.toLong
          case other   => other.toString.toLong
        }
        val w = (id % 48 + 8).toInt
        val h = (id % 37 + 8).toInt
        val g = (id % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: a real kernel re-encodes pixels; the fake rewrites the
    * metadata contract only (shape plumbing is what's under test). */
  def resizeImage(df: DataFrame, featCol: String, w: Int, h: Int)
      : DataFrame =
    df.withColumn(featCol, col(featCol)
      .withField("width", lit(w)).withField("height", lit(h)))

  /** STUB video frame-sampling: emits `n` frame rows per video blob with
    * frame_idx + a per-frame fake checksum — the explode/partition shape
    * of a real frame sampler. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_checksum",
        xxhash64(col(binCol), col("frame_idx")))

  private def fakeHash(bytes: Array[Byte]): Long = {
    // xxhash-shaped mixing, deterministic on content; STUB ONLY
    var h = 0x9E3779B97F4A7C15L
    if (bytes != null) bytes.foreach { b =>
      h = java.lang.Long.rotateLeft(h ^ (b * 0xC2B2AE3D27D4EB4FL), 31) *
        0x9E3779B185EBCA87L
    }
    h
  }
}
