package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Assembled streaming jobs — the user-facing compositions mirroring the
  * reference's two deployables, so "switching engines" is a one-line
  * `spark-submit` change, not a rebuild from operators:
  *
  *  - [[EtlJob]] ≙ `pubg_streaming.py`: source → parse → flatten →
  *    watermarked dedup → parquet sink (+ optional console tap), fixed:
  *    event time from the envelope, bounded dedup state, schema-evolution
  *    -ready sink.
  *  - [[AnalyticsJob]] ≙ `advanced_analytics.py`: source → flatten →
  *    foreachBatch four-query pipeline with per-epoch persist and an
  *    idempotent replay guard the reference lacks.
  *
  * Sources are injected as DataFrames: production wires
  * `Kafka.Source(...).reader(spark).load()` + [[Kafka.valueAsString]];
  * tests wire a MemoryStream (StreamsSpec runs both jobs end to end).
  */
object Jobs {

  /** @param console also start a console tap of the flattened stream
    * @param checks row-level quality expectations ([[Streams.qualityGate]]
    *        semantics); violating rows divert to `quarantinePath` (with a
    *        `failed_checks` column, replayable) instead of the main sink
    * @param quarantinePath parquet destination for gated-out rows;
    *        required when `checks` is non-empty */
  final case class EtlConfig(
      outputPath: String,
      checkpoint: String,
      dedupKeys: Seq[String] = Seq("match_id", "account_id"),
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      console: Boolean = false,
      checks: Seq[(String, org.apache.spark.sql.Column)] = Nil,
      quarantinePath: Option[String] = None)

  object EtlJob {
    /** Start the ETL pipeline on a raw envelope stream (string `value`
      * column). Returns the parquet sink query (the console tap and
      * quarantine sink, if any, are coordinated via [[Streams.awaitAny]]).
      * The quarantine runs as its own query over the same source — the
      * standard two-reader shape; a transactional dual-write needs a
      * foreachBatch sink instead. */
    def start(raw: DataFrame, cfg: EtlConfig): StreamingQuery = {
      val flat0 = Streams.etlFlatten(raw)
      val kept =
        if (cfg.checks.isEmpty) flat0
        else {
          val qPath = cfg.quarantinePath.getOrElse(
            sys.error("quarantinePath required when checks are set"))
          val (good, bad) = Streams.qualityGate(flat0, cfg.checks)
          Streams.parquetSink(bad, qPath, s"${cfg.checkpoint}-quarantine",
            cfg.trigger).start()
          good
        }
      val flat = Streams.dedupWithinWatermark(
        kept, cfg.dedupKeys, "event_time", cfg.watermark)
      if (cfg.console) Streams.consoleSink(flat, cfg.trigger).start()
      Streams.parquetSink(flat, cfg.outputPath, cfg.checkpoint, cfg.trigger).start()
    }
  }

  final case class AnalyticsConfig(
      checkpoint: String,
      markerDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))

  object AnalyticsJob {
    /** Start the four-query analytics pipeline with an idempotent sink
      * guard; `sink` receives (subQueryName, result, epochId) exactly once
      * per committed epoch (for sinks that are themselves idempotent —
      * see [[Streams.idempotentSink]]'s contract). */
    def start(raw: DataFrame, cfg: AnalyticsConfig)(
        sink: (String, DataFrame, Long) => Unit): StreamingQuery =
      Streams.analyticsPipeline(
        Streams.etlFlatten(raw), cfg.checkpoint, cfg.trigger)(
        Streams.idempotentSink(cfg.markerDir)(sink))
  }

  /** Block until any job of the session terminates (S6). */
  def await(spark: SparkSession, timeoutMs: Long = -1L): Boolean =
    Streams.awaitAny(spark, timeoutMs)
}
