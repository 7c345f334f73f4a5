package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format ingestion with a dead-letter split — the batch-file
  * sibling of [[graft.ingest.Ingest.parseWithDeadLetter]] (Kafka wire
  * JSON): read the file as raw LINES, parse each with
  * `from_json`/`from_csv` against an explicit schema, and split
  * (good, bad). Malformed rows are never dropped silently (every
  * discarded line is observable and replayable) and never fail the job
  * (FAILFAST at 100 TB turns one bad line into a dead pipeline).
  *
  * Parsing from a text scan instead of the built-in json/csv readers is
  * deliberate: the readers' `columnNameOfCorruptRecord` channel rejects
  * plans that reference ONLY the corrupt column (the dead-letter side
  * would need a cache() workaround), while `from_json`/`from_csv` are
  * ordinary expressions — one splittable scan, two narrow filters, no
  * shuffle, no caching contract. The cost is jsonl-only JSON (one doc
  * per line — which is what corpus interchange uses anyway).
  *
  * An EXPLICIT schema is required on purpose: inference reads the data
  * twice and infers from whatever slice it samples — at corpus scale
  * schema is a contract, not a guess.
  */
object TextFiles {

  /** A parse is good when the struct materialized AND at least one
    * declared field is non-null — `from_csv` happily returns all-null
    * structs for garbage lines, same trap as the Kafka envelope. */
  private def split(lines: DataFrame, parsed: org.apache.spark.sql.Column,
      schema: StructType): (DataFrame, DataFrame) = {
    val anyField = schema.fieldNames
      .map(f => parsed.getField(f).isNotNull)
      .reduce(_ || _)
    val tagged = lines.withColumn("__p", parsed)
    (tagged.filter(col("__p").isNotNull && anyField).select(col("__p.*")),
      tagged.filter(col("__p").isNull || !anyField)
        .select(col("value").as("raw_value")))
  }

  /** JSON-lines with dead-letter: @return (good rows, bad raw lines). */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val lines = spark.read.text(path)
    split(lines, from_json(col("value"), schema), schema)
  }

  /** CSV with dead-letter: @return (good rows, bad raw lines). With
    * `header=true` the first line of EACH FILE is dropped by literal
    * match against the expected header (a header line is also not data
    * in any other reader; matching it explicitly keeps the text-scan
    * plan). Type-mismatched fields null out and count as bad only when
    * EVERY field fails — pass required-field predicates downstream to
    * [[graft.streaming.Streams.qualityGate]] for stricter gates. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): (DataFrame, DataFrame) = {
    val lines0 = spark.read.text(path)
    val headerLine = schema.fieldNames.mkString(sep)
    val lines = if (header) lines0.filter(col("value") =!= headerLine) else lines0
    split(lines,
      from_csv(col("value"), schema, Map("sep" -> sep)), schema)
  }
}
