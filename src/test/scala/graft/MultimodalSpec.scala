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

  test("real PNG payloads decode to true dimensions and pixel mean") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val gray = png(3, 2)((_, _) => 0x646464) // r=g=b=100 everywhere
    val checker = png(4, 4)((x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff) // half black half white
    val media = Seq(
      (1L, "image", gray, 0, 0, "t"),      // meta dims WRONG on purpose
      (2L, "image", checker, 0, 0, "t"),
      (3L, "audio", Array[Byte](1, 2, 3), 7, 9, "t"))
      .toDF("media_id", "media_type", "payload", "w", "h", "origin")
      .select(col("media_id"), col("media_type"), col("payload"),
        struct(col("w").as("width"), col("h").as("height"),
          col("origin")).as("meta"))
    val f = MultimodalOps.decodeFeatures(spark, media)
      .collect().map(x => x.media_id -> x).toMap
    // decoded dims override the (wrong) metadata; pixel means are exact
    assert(f(1L).width == 3 && f(1L).height == 2, "true PNG dims")
    assert(f(1L).pixel_mean == 100.0)
    assert(f(2L).width == 4 && f(2L).height == 4)
    assert(f(2L).pixel_mean == 127.5)
    // non-image payloads keep metadata dims and no pixel stats
    assert(f(3L).width == 7 && f(3L).height == 9 && f(3L).pixel_mean == 0.0)
    // byte features stay exact over the PNG CONTAINER bytes
    assert(f(1L).n_bytes == gray.length.toLong)
    assert(f(2L).n_bytes == checker.length.toLong)
  }

  test("resize stage emits exact 32x32 lossless output, degrades on " +
      "non-images") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val gray = png(8, 8)((_, _) => 0x646464) // r=g=b=100 everywhere
    val media = Seq(
      (1L, "image", gray),
      (2L, "audio", Array[Byte](1, 2, 3)))
      .toDF("media_id", "media_type", "payload")
    val out = MultimodalOps.resizeImages(spark, media)
      .collect().map(r => r.media_id -> r).toMap
    val img = out(1L)
    assert(img.ok == 1 && img.in_w == 8 && img.in_h == 8)
    assert(img.out_w == 32 && img.out_h == 32 && img.out_bytes > 0)
    // nearest-neighbor scaling of a constant image stays constant, and
    // PNG is lossless, so the output mean is exactly the input's
    assert(img.out_pixel_mean == 100.0, s"got ${img.out_pixel_mean}")
    assert(out(2L).ok == 0 && out(2L).out_bytes == 0L)
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
