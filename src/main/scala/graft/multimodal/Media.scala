package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns + typed metadata, processed in
  * per-partition batches (the Scala analogue of `mapInPandas`: one decoder
  * instantiation per partition, streamed row batches, no per-row setup).
  *
  * The actual codec step is STUBBED — no image/audio libraries ship in this
  * container — behind [[MediaCodec.decodeStub]], a deterministic fake that
  * derives pseudo-metadata from the bytes. The Spark-side contract (schema,
  * partitioning, batch iteration, encoder round-trip) is real and tested;
  * swapping the stub for a JNI/javacv decoder changes no plan shape.
  */
object Media {

  /** Raw media row: opaque payload + provenance. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded feature row the stub emits. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      fingerprint: Long,
      width: Int,
      height: Int,
      frames: Int)

  object MediaCodec {
    /** Deterministic fake decode: metadata derived from payload bytes only.
      * A real decoder (image dims, audio duration, frame count) plugs in
      * here with the identical signature.
      *
      * The fingerprint is the portable 60-bit md5 prefix of the payload
      * (the byte-level analogue of [[graft.functions.Hash64.hash60]]), and
      * every derived column is integer arithmetic over it — so DuckDB can
      * recompute the whole feature row and q30 gets a full rows+schema+hash
      * oracle (round 2's bespoke 31-fold left it rows-only). The digest
      * instance is per-partition (decode batches amortize setup cost, the
      * same shape a real codec handle needs). */
    def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val n = r.content.length.toLong
        val hex = md.digest(r.content).map(b => f"$b%02x").mkString
        val fp = java.lang.Long.parseLong(hex.take(15), 16) // 60 bits, >= 0
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = n,
          fingerprint = fp,
          width = (fp % 1920).toInt + 1,
          height = ((fp / 7) % 1080).toInt + 1,
          frames = if (r.kind == "video") (n % 240).toInt + 1 else 1)
      }
    }
  }

  /** documents.text → fake media table (deterministic payload bytes), the
    * harness stand-in for a real binary-column source. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Per-partition batch decode — the `mapInPandas` analogue. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(MediaCodec.decodeStub)
  }

  /** Uniform FRAME-SAMPLING plan — the real (non-stubbed) half of
    * video feature extraction: which `k` frame indices to decode per
    * video, spread uniformly over [0, frames−1] (the CLIP/VideoMAE
    * ingestion convention). The expensive per-frame decode then reads
    * ONLY these (media_id, frame_no) rows — at 100 TB the plan is what
    * turns "decode every frame" into "decode k per asset". Indices are
    * ⌊i·(frames−1)/(k−1)⌋ (exact in doubles below 2⁵³ — frames is a
    * count, the floor is engine-portable), deduplicated for clips
    * shorter than k frames.
    *
    * @return (media_id, frames, frame_no) — videos only */
  def frameSamplePlan(features: DataFrame, k: Int): DataFrame = {
    require(k >= 2)
    features.filter(col("kind") === "video")
      .select(col("media_id"), col("frames").cast("long").as("frames"))
      .select(col("media_id"), col("frames"),
        explode(array_distinct(transform(
          sequence(lit(0L), lit(k.toLong - 1)),
          i => floor(i.cast("double") * (col("frames") - 1)
            .cast("double") / (k - 1).toDouble).cast("long"))))
          .as("frame_no"))
  }

  /** ViT PATCH-GRID plan — the image analogue of [[frameSamplePlan]]:
    * the resize-to-S + P×P patchify layout every ViT-family encoder
    * consumes, as a decode schedule. Per image, the FIXED (S/P)² patch
    * grid with each patch's nearest-neighbor SOURCE coordinates
    * (`src = dst·dim div S` — pure integer division, engine-portable)
    * and the raw row-major RGB byte offset the decoder would seek to.
    * The per-image row count is a constant (S/P)² — at 100 TB the plan
    * stays a bounded multiple of the asset count, never of pixel
    * count; only the per-patch DECODE is the env-forced stub.
    *
    * @return (media_id, width, height, patch_no, py, px, src_y, src_x,
    *         byte_offset) — images only */
  def patchPlan(features: DataFrame, s: Int = 224, p: Int = 16)
      : DataFrame = {
    require(s >= p && p >= 1 && s % p == 0)
    val g = s / p
    features.filter(col("kind") === "image")
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .select(col("media_id"), col("width"), col("height"),
        explode(sequence(lit(0L), lit((g.toLong * g - 1))))
          .as("patch_no"))
      .withColumn("py", expr(s"patch_no div $g"))
      .withColumn("px", expr(s"patch_no % $g"))
      .withColumn("src_y", expr(s"py * $p * height div $s"))
      .withColumn("src_x", expr(s"px * $p * width div $s"))
      .withColumn("byte_offset", expr("(src_y * width + src_x) * 3"))
  }

  /** Audio WINDOWING plan — the layout step of any STFT/fbank feature
    * extractor: fixed `win` samples every `hop`, full windows only
    * (assets shorter than one window plan no rows — documented; the
    * tail partial window is a padding policy the decoder owns).
    * Samples are derived from the payload size (s16 mono: bytes/2) —
    * real plumbing; only the sample DECODE is the env-forced stub.
    *
    * @return (media_id, n_samples, win_no, start_sample) — audio only */
  def audioWindowPlan(features: DataFrame, win: Long = 400L,
      hop: Long = 160L): DataFrame = {
    require(win >= 1 && hop >= 1)
    features.filter(col("kind") === "audio")
      .select(col("media_id"),
        expr("n_bytes div 2").as("n_samples"))
      .filter(col("n_samples") >= win)
      .select(col("media_id"), col("n_samples"),
        explode(sequence(lit(0L),
          expr(s"(n_samples - $win) div $hop"))).as("win_no"))
      .select(col("media_id"), col("n_samples"), col("win_no"),
        (col("win_no") * hop).as("start_sample"))
  }
}
