package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (brief): image/audio/
  * video as opaque `binary` columns with typed metadata, decode/feature/
  * resize/frame-sample as per-partition batch transforms.
  *
  * The decode kernels are STUBS — this container has no image/audio
  * codecs, so each kernel derives a DETERMINISTIC FAKE from the bytes
  * (xxhash-seeded) and is clearly marked. Everything around them — the
  * schema contract, the partition-batched execution (`mapPartitions`, the
  * JVM analogue of `mapInPandas` batches), the column plumbing — is real
  * and is what a production decode would slot into.
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

  /** STUB image decode + feature extract. A real implementation would
    * decode `bytes` with an image codec and run a vision encoder per
    * partition-batch; this fake derives (width, height, channels,
    * luma_mean, 8-dim embedding) deterministically from the blob hash so
    * tests are stable. Runs per-partition (batched), not per-row UDF. */
  def decodeImageFeatures(df: DataFrame, binCol: String,
      as: String = "image_features"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(as, imageFeatureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // one iterator per partition = one decode batch; a real kernel
      // would materialize the batch and call the codec/encoder here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val h = fakeHash(bytes)
        val feat = Row(
          (math.abs(h) % 1920 + 32).toInt,            // STUB width
          (math.abs(h >> 11) % 1080 + 32).toInt,      // STUB height
          3,
          (math.abs(h >> 22) % 256).toDouble / 255.0, // STUB luma
          Array.tabulate(8)(i =>
            ((h >> (i * 7)) % 97).toFloat / 97f))     // STUB embedding
        Row.fromSeq(r.toSeq :+ feat)
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
