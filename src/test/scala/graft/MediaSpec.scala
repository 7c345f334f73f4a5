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

  test("frameSamplePlan: uniform indices hand-derived, short clips " +
      "dedup, first and last frames always sampled") {
    import spark.implicits._
    val feats = Seq(
      (1L, "video", 0L, 0L, 1, 1, 15),   // 15 frames, k=8
      (2L, "video", 0L, 0L, 1, 1, 3),    // shorter than k -> dedup
      (3L, "image", 0L, 0L, 1, 1, 1))    // not a video -> absent
      .toDF("media_id", "kind", "n_bytes", "fingerprint",
        "width", "height", "frames")
    val out = Media.frameSamplePlan(feats, k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).sorted.toSeq }
    // floor(i*14/7) = 0,2,4,6,8,10,12,14
    assert(out(1L) == Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L))
    // frames=3: floor(i*2/7) over i=0..7 -> 0,0,0,0,1,1,1,2 -> {0,1,2}
    assert(out(2L) == Seq(0L, 1L, 2L))
    assert(!out.contains(3L))
  }

  test("audioWindowPlan: full windows only, hop spacing, short assets " +
      "plan nothing") {
    import spark.implicits._
    val feats = Seq(
      (1L, "audio", 200L, 0L, 1, 1, 1),  // 100 samples, win 64 hop 32
      (2L, "audio", 100L, 0L, 1, 1, 1),  // 50 samples < 64 -> nothing
      (3L, "video", 400L, 0L, 1, 1, 9))  // not audio -> absent
      .toDF("media_id", "kind", "n_bytes", "fingerprint",
        "width", "height", "frames")
    val out = Media.audioWindowPlan(feats, win = 64L, hop = 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // 100 samples: starts 0 and 32 (64+32=96 <= 100; 64+64=128 > 100)
    assert(out.toSet == Set((1L, 0L, 0L), (1L, 1L, 32L)))
  }

  test("patchPlan: fixed grid, integer nearest-neighbor source coords, " +
      "row-major byte offsets — hand-derived") {
    import spark.implicits._
    import graft.multimodal.Media
    val features = Seq((7L, "image", 100L, 50L), (8L, "audio", 10L, 10L))
      .toDF("media_id", "kind", "width", "height")
    val out = Media.patchPlan(features, s = 64, p = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(out.length == 16 && out.forall(_._1 == 7L)) // images only
    // patch_no 6 = (py 1, px 2): src_y = 16*50 div 64 = 12,
    // src_x = 32*100 div 64 = 50, offset = (12*100 + 50)*3 = 3750
    val p6 = out.find(_._2 == 6L).get
    assert(p6 == ((7L, 6L, 1L, 2L, 12L, 50L, 3750L)))
    // patch_no 0 anchors at the origin
    assert(out.find(_._2 == 0L).get == ((7L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }
}
