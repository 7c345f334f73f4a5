package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** The multimodal plumbing contract: schema, per-partition batching,
  * determinism. The codec itself is a documented stub (no media libs in
  * this container) — what must hold is that the Spark-side pipeline is
  * lossless, deterministic, and independent of physical partitioning. */
class MediaSpec extends SparkSuite {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "an image payload"),
      (1L, "an audio payload"),
      (2L, "a video payload with more bytes in it"),
      (3L, "another image"),
      (4L, ""))
      .toDF("doc_id", "text")
  }

  test("decode is deterministic and invariant to partitioning") {
    val media = Media.syntheticMedia(spark, docsDf)
    val once = Media.decode(media).collect().sortBy(_.media_id).toSeq
    val again = Media.decode(media).collect().sortBy(_.media_id).toSeq
    val skewed = Media.decode(media.repartition(7)).collect().sortBy(_.media_id).toSeq
    assert(once == again)
    assert(once == skewed) // mapPartitions output must not depend on layout
  }

  test("decode is lossless and typed: one feature row per media row") {
    val media = Media.syntheticMedia(spark, docsDf)
    val out = Media.decode(media).collect()
    assert(out.length == 5)
    assert(out.map(_.media_id).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // kind routing: doc_id % 3 -> image/audio/video
    assert(out.find(_.media_id == 0L).get.kind == "image")
    assert(out.find(_.media_id == 1L).get.kind == "audio")
    assert(out.find(_.media_id == 2L).get.kind == "video")
  }

  test("stub metadata derives from payload bytes only") {
    val media = Media.syntheticMedia(spark, docsDf)
    val out = Media.decode(media).collect()
    val img = out.find(_.media_id == 0L).get
    assert(img.n_bytes == "an image payload".getBytes("UTF-8").length.toLong)
    assert(img.width >= 1 && img.width <= 1920)
    assert(img.height >= 1 && img.height <= 1080)
    assert(out.find(_.media_id == 4L).get.n_bytes == 0L) // empty payload ok
    // video frame count is payload-derived; non-video is a single frame
    assert(out.find(_.media_id == 2L).get.frames >= 1)
    assert(out.find(_.media_id == 3L).get.frames == 1)
  }
}
