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
}
