package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Kafka source/sink option plumbing (S1/S5 config surface).
  *
  * The engine's operators consume generic DataFrames, so Kafka is pure
  * configuration — these builders carry the exact option surface the
  * reference jobs set (`/root/reference/spark_apps/pubg_streaming.py:19-25`
  * source; `advanced_analytics.py:223-228` batch sink) so the same code
  * runs unmodified against a real topic. The harness ships no broker or
  * connector jar, which is why `options` is exposed for tests and `load()`
  * is left to the caller's cluster.
  */
object Kafka {

  /** S1: streaming source config. `startingOffsets`/`failOnDataLoss`
    * mirror the reference's replay-tolerant settings. */
  case class Source(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = false,
      extra: Map[String, String] = Map.empty) {

    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++ extra

    /** Configured reader; call `.load()` where the connector is on the
      * classpath, then [[valueAsString]] to enter the envelope ETL path. */
    def reader(spark: SparkSession): DataStreamReader =
      options.foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
  }

  /** Kafka's value column is binary; the envelope pipeline
    * ([[Streams.etlFlatten]]) wants the JSON string — the reference's
    * `CAST(value AS STRING)` step. */
  def valueAsString(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) AS value")

  /** S5: sink config, usable for both the reference's per-epoch batch
    * write and a continuous streaming sink. The payload must already be a
    * `value` string column — see `graft.queries.Wire`'s
    * `to_json(struct(...))` wire format. */
  case class Sink(
      bootstrapServers: String,
      topic: String,
      extra: Map[String, String] = Map.empty) {

    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic) ++ extra

    /** Batch form (`advanced_analytics.py:223-228`). */
    def batchWriter(df: DataFrame): org.apache.spark.sql.DataFrameWriter[Row] =
      options.foldLeft(df.write.format("kafka").mode("append")) {
        case (w, (k, v)) => w.option(k, v)
      }

    /** Streaming form; pair with [[Streams.idempotentSink]] when the
      * per-epoch payload must not re-publish on replay. */
    def streamWriter(df: DataFrame, checkpoint: String): DataStreamWriter[Row] =
      (options + ("checkpointLocation" -> checkpoint))
        .foldLeft(df.writeStream.format("kafka")) {
          case (w, (k, v)) => w.option(k, v)
        }
  }
}
