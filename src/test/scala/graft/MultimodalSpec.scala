package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payloads survive the typed mapPartitions
  * decode stage with deterministic features; frame sampling generates
  * bounded offsets; rollup aggregates are consistent. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decode stage is deterministic and preserves every row") {
    val media = MultimodalOps.mediaTable(spark, dir)
    val feats = MultimodalOps.decodeFeatures(spark, media)
    val n = media.count()
    assert(feats.count() == n)
    // deterministic: same input → identical features
    val a = feats.collect().map(f => f.media_id -> f).toMap
    val b = MultimodalOps.decodeFeatures(spark,
      MultimodalOps.mediaTable(spark, dir)).collect()
    b.foreach { f => assert(a(f.media_id) == f) }
    // payload length must match the documents' byte length
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(encode(col("text"), "UTF-8"))
        .cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.values.foreach { f => assert(f.n_bytes == doc(f.media_id)) }
  }

  test("frame sampling yields offsets within payload bounds") {
    val media = MultimodalOps.mediaTable(spark, dir)
    val frames = MultimodalOps.sampleFrames(media, stepBytes = 100)
    val bad = frames.join(
        media.select(col("media_id"),
          length(col("payload")).cast("long").as("n")), Seq("media_id"))
      .filter(col("frame_offset") >= col("n")).count()
    assert(bad == 0)
    assert(frames.count() >= media.filter(col("media_type") === "video")
      .count()) // at least one frame per video
  }

  test("feature rollup covers all three media types") {
    val stats = MultimodalOps.featureStats(
      MultimodalOps.decodeFeatures(spark,
        MultimodalOps.mediaTable(spark, dir)))
      .collect().map(r => r.getAs[String]("media_type") -> r).toMap
    assert(stats.keySet == Set("image", "audio", "video"))
    stats.values.foreach { r =>
      assert(r.getAs[Long]("n_media") > 0)
      assert(r.getAs[Long]("total_bytes") > 0)
    }
  }
}
