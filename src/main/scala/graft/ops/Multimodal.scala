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
    * else changes). Null bytes yield a null feature struct (plain SQL
    * null propagation — missing media is data, not an error). Non-null
    * bytes NO codec reads FAIL FAST by default, with the blob's magic
    * bytes in the message — a pipeline must never mistake fabricated
    * features for decoded ones; `allowStubFeatures = true` opts into the
    * deterministic hash-derived fake (clearly marked STUB) for
    * shape-testing arbitrary blobs. Runs per-partition (batched), not
    * per-row UDF. */
  def decodeImageFeatures(df: DataFrame, binCol: String,
      as: String = "image_features",
      allowStubFeatures: Boolean = false): DataFrame = {
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
        } else if (bytes == null) {
          null // null blob → null struct, never an error
        } else if (!allowStubFeatures) {
          throw undecodable("decodeImageFeatures", "image", bytes,
            "allowStubFeatures")
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

  val audioFeatureType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("num_samples", LongType),
    StructField("mean_abs", DoubleType),   // exact integer ratio
    StructField("peak", IntegerType)))

  /** Audio decode + feature extract — REAL for WAV/AIFF/AU PCM (the
    * JDK's `javax.sound.sampled` ships those codecs; no external
    * dependency): sample_rate/channels/bits come from the parsed header,
    * num_samples/mean_abs/peak from the actual decoded 16-bit samples
    * (integer |sample| sum, one division at the end — bit-reproducible).
    * Null bytes yield a null feature struct; non-null bytes the JDK
    * audio stack can't parse FAIL FAST by default (magic bytes in the
    * message) — `allowStubFeatures = true` opts into the deterministic
    * hash-derived fake (clearly marked STUB) for shape-testing. Runs
    * per-partition like the image path. Proven end-to-end by the
    * `multimodal_audio` oracle query: generated square-wave WAVs have
    * closed-form features (mean_abs = peak = the amplitude) that DuckDB
    * re-derives independently. */
  def decodeAudioFeatures(df: DataFrame, binCol: String,
      as: String = "audio_features",
      allowStubFeatures: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(as, audioFeatureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feat =
          if (bytes == null) null // null blob → null struct
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val data = ais.readAllBytes()
            ais.close()
            val bits = fmt.getSampleSizeInBits
            require(bits == 16 && fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            val n = data.length / 2
            var sumAbs = 0L
            var peak = 0
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xFF
              val hi = data(2 * i + 1)
              val s =
                if (fmt.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xFF)
                else (hi << 8) | lo
              val a = math.abs(s)
              sumAbs += a
              if (a > peak) peak = a
              i += 1
            }
            Row(fmt.getSampleRate.toInt, fmt.getChannels, bits,
              (n / fmt.getChannels).toLong,
              if (n == 0) 0.0 else sumAbs.toDouble / n, peak)
          } catch {
            case _: Exception if allowStubFeatures =>
              val h = fakeHash(bytes)               // STUB fallback
              Row((math.abs(h) % 48000 + 8000).toInt, 1, 16,
                math.abs(h >> 7) % 100000,
                (math.abs(h >> 17) % 32768).toDouble, // STUB mean
                (math.abs(h >> 27) % 32768).toInt)    // STUB peak
            case e: Exception =>
              throw undecodable("decodeAudioFeatures", "audio", bytes,
                "allowStubFeatures", e)
          }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic test-audio generator: per row, a real 16-bit mono PCM
    * WAV at 8 kHz — a square wave of amplitude `id % 1000 + 100` over
    * `id % 800 + 100` samples (sign flips every 4 samples), encoded with
    * a hand-built RIFF header. Every feature of the decoded result is a
    * closed-form function of the id: mean_abs = peak = amplitude,
    * num_samples = the sample count — ground truth an independent engine
    * can verify (see `multimodal_audio`). */
  def encodeTestWav(df: DataFrame, idCol: String, as: String = "wav")
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
        val amp = (id % 1000 + 100).toInt
        val n = (id % 800 + 100).toInt
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1)                // PCM
          .putShort(1)                // mono
          .putInt(8000)               // sample rate
          .putInt(16000)              // byte rate
          .putShort(2)                // block align
          .putShort(16)               // bits
          .put("data".getBytes("US-ASCII")).putInt(2 * n)
        var i = 0
        while (i < n) {
          bb.putShort(if ((i / 4) % 2 == 0) amp.toShort else (-amp).toShort)
          i += 1
        }
        Row.fromSeq(r.toSeq :+ bb.array())
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic PATTERN-image generator for the visual-dedup pipeline
    * demo: a 16×16 gray PNG whose pixel (x,y) has gray value
    * (7x + 13y + 31·(id mod k)) mod 256 — exactly `k` distinct images
    * across all ids, so ids sharing `id mod k` decode to IDENTICAL pixel
    * grids (hence identical luma-patch embeddings, cosine exactly 1),
    * while different classes wrap the mod at different places and stay
    * visually distinct. Gives pixels→embedding→LSH dedup a closed-form
    * pair oracle: (a, b) pair ⇔ a ≡ b (mod k). */
  def encodeTestPatternPng(df: DataFrame, idCol: String, k: Int,
      as: String = "img"): DataFrame = {
    require(k > 0)
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
        val cls = (id % k).toInt
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val g = (7 * x + 13 * y + 31 * cls) % 256
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB metadata resize: rewrites the feature struct's dims only —
    * kept for pipelines that track intended dims without touching blobs.
    * For a REAL pixel resize use [[resizeImageBytes]]. */
  def resizeImage(df: DataFrame, featCol: String, w: Int, h: Int)
      : DataFrame =
    df.withColumn(featCol, col(featCol)
      .withField("width", lit(w)).withField("height", lit(h)))

  /** REAL image resize: decode (ImageIO), rescale with a DETERMINISTIC
    * nearest-neighbor pixel map (src = ⌊dst·srcDim/dstDim⌋ — no AA, no
    * platform-dependent filtering, bit-identical everywhere), re-encode
    * PNG. Composes with [[decodeImageFeatures]]: resizing a constant
    * image preserves its luma exactly, which the `multimodal_resize`
    * oracle checks end-to-end through a double encode→decode cycle.
    * Undecodable bytes pass through unchanged (a resize of a blob no
    * codec understands is the identity, not a crash). Per-partition
    * like the other media kernels. */
  def resizeImageBytes(df: DataFrame, binCol: String, w: Int, h: Int,
      as: String = "resized"): DataFrame = {
    require(w > 0 && h > 0)
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField(as, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        val out =
          if (img == null) bytes
          else {
            val (sw, sh) = (img.getWidth, img.getHeight)
            val dst = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            var y = 0
            while (y < h) {
              val sy = y * sh / h
              var x = 0
              while (x < w) {
                dst.setRGB(x, y, img.getRGB(x * sw / w, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB video frame-sampling: emits `n` frame rows per video blob with
    * frame_idx + a per-frame fake checksum — the explode/partition shape
    * of a real frame sampler, for blobs in formats no JDK codec reads
    * (mp4 etc.). EVERY output row is fabricated, so the call FAILS FAST
    * unless the caller states `allowStubFrames = true` — a pipeline must
    * opt into fake frame checksums explicitly, never receive them by
    * default. For REAL multi-frame decode use [[sampleVideoFrames]]. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
      allowStubFrames: Boolean = false): DataFrame = {
    require(allowStubFrames,
      "sampleFrames emits STUB frame checksums only (no JDK codec reads " +
        "mp4-style containers); pass allowStubFrames = true to opt in, " +
        "or use sampleVideoFrames for containers the JDK really decodes " +
        "(animated GIF / still images)")
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_checksum",
        xxhash64(col(binCol), col("frame_idx")))
  }

  val frameFeatureType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("luma_mean", DoubleType)))

  /** REAL multi-frame sampling for container formats the JDK decodes
    * (animated GIF): every `every`-th frame is actually decoded and
    * measured (exact integer luma sum, like the still-image path),
    * emitted as one row per sampled frame — the explode shape a video
    * frame sampler has, with genuine pixels behind it. Blobs no codec
    * reads yield zero rows (callers route those through the
    * [[sampleFrames]] stub shape instead); a still image reads as a
    * single-frame container. Proven end-to-end by the
    * `multimodal_video` oracle: generated animated GIFs whose frame k is
    * constant gray (id+16·k)%256 — constant frames survive GIF
    * palettization losslessly, so decoded luma is closed-form. */
  def sampleVideoFrames(df: DataFrame, binCol: String, every: Int = 1)
      : DataFrame = {
    require(every > 0)
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("frame", frameFeatureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val frames =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Seq.empty
            else {
              val reader = readers.next()
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              val out = (0 until n by every).map { i =>
                val img = reader.read(i)
                val (w, h) = (img.getWidth, img.getHeight)
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val p = img.getRGB(x, y)
                    sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                    x += 1
                  }
                  y += 1
                }
                Row(i, w, h, sum.toDouble / (3.0 * w * h * 255.0))
              }
              reader.dispose()
              out
            }
          } catch { case _: Exception => Seq.empty }
        frames.map(f => Row.fromSeq(r.toSeq :+ f))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic test-video generator: per row, a real animated GIF of
    * `frames` frames, each a constant-gray 16×16 image with gray value
    * (id + 16·k) % 256 for frame k — every decoded frame's luma is a
    * closed-form function of (id, k), and constant frames are exact
    * under GIF palettization. Encoded with the JDK GIF sequence writer. */
  def encodeTestGif(df: DataFrame, idCol: String, frames: Int,
      as: String = "vid"): DataFrame = {
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
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var k = 0
        while (k < frames) {
          val g = ((id + 16L * k) % 256).toInt
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          k += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Fail-fast error for non-null bytes no codec reads: carries the
    * container's magic bytes so the message names WHAT arrived (an mp4's
    * `....ftyp`, a WebP's `RIFF....WEBP`) and how to opt into the stub. */
  private def undecodable(op: String, kind: String, bytes: Array[Byte],
      flag: String, cause: Throwable = null): IllegalArgumentException = {
    val magic = bytes.take(12).map(b => f"$b%02x").mkString(" ")
    new IllegalArgumentException(
      s"$op: undecodable $kind bytes (${bytes.length} bytes, magic " +
        s"[$magic]) — no JDK codec matched; pass $flag = true to tag " +
        s"the row with deterministic STUB features instead", cause)
  }

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
