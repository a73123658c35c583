package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media-feature record produced by the decode stage. `byte_sum` is the
  * exact integer payload sum so downstream means stay order-independent.
  * `width`/`height`/`pixel_mean` are REAL decoded values for image
  * payloads (pixel_mean = mean RGB channel value, scale-2); non-image
  * payloads keep the metadata dims and pixel_mean 0. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    byte_sum: Long,
    header_hash: Long,
    mean_byte: Double,
    width: Int,
    height: Int,
    pixel_mean: Double)

/** Output record of the resize stage. */
case class ResizedMedia(
    media_id: Long,
    media_type: String,
    ok: Int,
    in_w: Int,
    in_h: Int,
    out_w: Int,
    out_h: Int,
    out_bytes: Long,
    out_pixel_mean: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded batch-wise on executors.
  *
  * The Spark-side architecture — schema (binary payload + metadata
  * struct), partition spreading before the CPU-heavy decode, a typed
  * `mapPartitions` batch stage (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one iterator per batch, amortized setup), and
  * downstream relational ops on the extracted features.
  *
  * The IMAGE codec is real: payloads whose magic bytes announce
  * PNG/JPEG/GIF/BMP decode through `javax.imageio` (in the JDK — no
  * external libraries) to true width/height and the mean RGB channel
  * value; MultimodalSpec drives generated PNGs through the stage and
  * checks the decoded values pixel-for-pixel. Audio/video payloads have
  * no JDK codec, so they deterministically fall back to raw byte
  * features (length, header hash, byte mean) — the place an ffmpeg
  * binding would slot in without touching any signature or schema. The
  * registered harness query wraps text as payloads (none sniff as
  * images), so its DuckDB oracle stays byte-exact. */
object MultimodalOps {

  /** Harness media source: wraps `documents` as binary payloads so the
    * pipeline has real bytes to move (text → UTF-8 payload, dims from
    * doc stats). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
          "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          (col("n_chars") % 1920).cast("int").as("width"),
          (col("n_chars") % 1080).cast("int").as("height"),
          col("source").as("origin")).as("meta"))

  /** Raw byte features, computed for every payload regardless of type:
    * 8-byte header hash, exact byte sum, scale-2 byte mean. */
  private def byteStats(payload: Array[Byte]): (Long, Long, Double) = {
    var h = 1125899906842597L
    var i = 0
    val n = math.min(payload.length, 8)
    while (i < n) { h = 31 * h + payload(i); i += 1 }
    var s = 0L
    i = 0
    while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
    val mean = if (payload.length == 0) 0.0 else s.toDouble / payload.length
    (h, s, math.round(mean * 100) / 100.0)
  }

  /** Magic-byte sniff for the formats `javax.imageio` decodes out of the
    * box: PNG (89 'P' 'N' 'G'), JPEG (FF D8 FF), GIF ("GIF8"), BMP
    * ("BM"). */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** Decoded image summary: true dims + exact integer RGB channel sum
    * (order-independent, so the mean is deterministic). */
  private def pixelStats(im: java.awt.image.BufferedImage)
      : (Int, Int, Double) = {
    val (w, h) = (im.getWidth, im.getHeight)
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = im.getRGB(x, y)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val mean =
      if (w * h == 0) 0.0 else s.toDouble / (3.0 * w * h)
    (w, h, math.round(mean * 100) / 100.0)
  }

  /** Batch decode: typed mapPartitions — one setup per partition (the
    * codec-context init point), then a streaming loop. Image payloads
    * (by magic bytes) decode through the JDK's ImageIO to real
    * width/height/pixel-mean; everything else keeps raw byte features
    * and the metadata dims. Input is spread so decode parallelism
    * doesn't depend on file count. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val spread = media.repartition(
      spark.sparkContext.defaultParallelism, col("media_id"))
    spread
      .select(col("media_id"), col("media_type"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // codec init, once per partition: no temp-file cache for the
        // in-memory streams ImageIO reads below
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, mtype, payload, w, h) =>
          val (hash, byteSum, mean) = byteStats(payload)
          // Try, not a bare call: magic bytes only SNIFF — text that
          // happens to start with "BM"/"GIF8" makes the JDK reader claim
          // the stream and THROW on the malformed body, and a decode
          // stage must degrade to byte features, never fail the job.
          val decoded =
            if (looksLikeImage(payload))
              scala.util.Try(Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))))
                .toOption.flatten
            else None
          decoded match {
            case Some(im) =>
              val (iw, ih, pmean) = pixelStats(im)
              MediaFeatures(id, mtype, payload.length.toLong, byteSum,
                hash, mean, iw, ih, pmean)
            case None =>
              MediaFeatures(id, mtype, payload.length.toLong, byteSum,
                hash, mean, w, h, 0.0)
          }
        }
      }
  }

  /** Deterministic image resize — the preprocessing stage a vision
    * training pipeline runs between decode and tensorization. Sniffed
    * image payloads decode (same Try discipline as [[decodeFeatures]]),
    * scale to `target`×`target` with NEAREST-NEIGHBOR interpolation
    * (bit-deterministic — no AA, no platform-dependent filtering), and
    * re-encode as PNG (lossless, so the emitted pixel mean is exact);
    * non-images and failed decodes degrade to ok = 0 with zeroed output
    * fields, never a failed job. Same typed mapPartitions batch shape
    * as the decode stage — the resize kernel is where a GPU/native
    * library would slot in without touching the schema. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   target: Int = 32): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.repartition(spark.sparkContext.defaultParallelism,
        col("media_id"))
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, mtype, payload) =>
          val decoded =
            if (looksLikeImage(payload))
              scala.util.Try(Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))))
                .toOption.flatten
            else None
          decoded match {
            case Some(im) =>
              val out = new java.awt.image.BufferedImage(target, target,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints
                  .VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
              g.drawImage(im, 0, 0, target, target, null)
              g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              val (_, _, pmean) = pixelStats(out)
              ResizedMedia(id, mtype, 1, im.getWidth, im.getHeight,
                target, target, buf.size().toLong, pmean)
            case None =>
              ResizedMedia(id, mtype, 0, 0, 0, 0, 0, 0L, 0.0)
          }
        }
      }
  }

  /** Frame sampling for video rows: every `stepBytes` offset becomes a
    * sampled "frame" (offset list via sequence + explode — at scale this
    * is a generator, not a driver loop). */
  def sampleFrames(media: DataFrame, stepBytes: Int = 64): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("frame_offset", explode(expr(
        s"CASE WHEN n_bytes >= $stepBytes THEN " +
          s"sequence(0L, n_bytes - 1, $stepBytes) ELSE array(0L) END")))
      .select(col("media_id"), col("frame_offset"),
        substring(col("payload"), 1, 16).as("frame_stub"))

  /** Per-type feature rollup. avg_byte is computed from exact integer
    * sums (graft.util.Num scale-0 rounding) so the rollup is DuckDB
    * oracle-comparable. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("byte_sum")).as("byte_sum_total"))
      .withColumn("avg_byte", graft.util.Num.r(
        col("byte_sum_total").cast("double") / col("total_bytes"), 2))
      .drop("byte_sum_total")
}
