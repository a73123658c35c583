package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media-feature record produced by the decode stage. `byte_sum` is the
  * exact integer payload sum so downstream means stay order-independent. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    byte_sum: Long,
    header_hash: Long,
    mean_byte: Double,
    width: Int,
    height: Int)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded batch-wise on executors.
  *
  * The Spark-side architecture is real and tested — schema (binary payload
  * + metadata struct), partition spreading before the CPU-heavy decode, a
  * typed `mapPartitions` batch stage (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one iterator per batch, amortized setup), and
  * downstream relational ops on the extracted features.
  *
  * The codec itself is STUBBED: this container has no image/audio
  * libraries, so [[decodeStub]] derives deterministic fake features
  * (length, header hash, mean byte). A real deployment replaces only the
  * body of decodeStub with e.g. javax.imageio / ffmpeg bindings; every
  * signature, schema, and partitioning decision stays as-is.
  */
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

  /** ======= STUB DECODER =======
    * Stands in for the real image/audio decode (not available in this
    * container). Deterministic: features derive only from the bytes. */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Double) = {
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

  /** Batch decode: typed mapPartitions — one setup per partition (where a
    * real codec would init its native context), then a streaming loop.
    * Input is spread so decode parallelism doesn't depend on file count. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val spread = media.repartition(
      spark.sparkContext.defaultParallelism, col("media_id"))
    spread
      .select(col("media_id"), col("media_type"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // real codec: initialize decoder context here, once per partition
        rows.map { case (id, mtype, payload, w, h) =>
          val (hash, byteSum, mean) = decodeStub(payload)
          MediaFeatures(id, mtype, payload.length.toLong, byteSum, hash,
            mean, w, h)
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
