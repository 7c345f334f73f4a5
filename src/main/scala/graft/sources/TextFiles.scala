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
    * `header=true` the FIRST LINE of each file is dropped when it
    * matches the expected header text — identified positionally (the
    * min-monotonic-id row of the file's offset-0 block), so a
    * legitimate data row that happens to equal the header text is kept,
    * not silently removed. The header lookup is a per-file aggregate
    * over offset-0 blocks (one row per file, broadcast anti-joined
    * back) — the scan stays splittable, no corpus-wide shuffle.
    * Type-mismatched fields null out and count as bad only when
    * EVERY field fails — pass required-field predicates downstream to
    * [[graft.streaming.Streams.qualityGate]] for stricter gates. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): (DataFrame, DataFrame) = {
    val lines0 = spark.read.text(path)
    val lines =
      if (!header) lines0
      else {
        val headerLine = schema.fieldNames.mkString(sep)
        // File-scan partitioning is deterministic for a fixed file set,
        // so the monotonic ids agree between the two references to
        // `tagged`; within a partition ids follow read order, so the
        // min id among a file's offset-0-block rows IS its first line.
        val tagged = lines0.select(col("value"),
          col("_metadata.file_path").as("__f"),
          col("_metadata.file_block_start").as("__b"),
          monotonically_increasing_id().as("__i"))
        val headers = tagged
          .filter(col("__b") === 0 && col("value") === headerLine)
          .groupBy(col("__f")).agg(min(col("__i")).as("__hi"))
        tagged.join(broadcast(headers), Seq("__f"), "left")
          .filter(col("__hi").isNull || col("__i") =!= col("__hi"))
          .select(col("value"))
      }
    split(lines,
      from_csv(col("value"), schema, Map("sep" -> sep)), schema)
  }
}
