package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** The storage-layout contract: day-partitioned writes prune at planning
  * time and don't explode into per-task small files. */
class PartitionedSpec extends SparkSuite {

  private def events = {
    import spark.implicits._
    (0 until 3000).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${1 + i % 5}%02d 10:${i % 60}%02d:00"), i * 1.5)
    }.toDF("event_id", "ts", "value")
  }

  test("writeByDay: partition pruning reaches the scan; values round-trip") {
    val path = Files.createTempDirectory("part-out").toString
    Partitioned.writeByDay(events.repartition(16), "ts", path)

    val read = Partitioned.readDays(spark, path)
    assert(read.count() == 3000)

    val pruned = read.filter(col("dt") === "2024-01-03")
    // the dt predicate must land in the scan's PartitionFilters (pruned at
    // planning time), NOT in PushedFilters/post-scan Filter over all days
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pf = scan.metadata("PartitionFilters")
    assert(pf.contains("dt"), pf)
    assert(!scan.metadata("PushedFilters").contains("dt"), scan.metadata)
    assert(pruned.count() == 600)
  }

  test("upsertDays rewrites only the touched day; compactDay merges its files") {
    import spark.implicits._
    val path = Files.createTempDirectory("upsert-out").toString
    Partitioned.writeByDay(events, "ts", path)
    val before = Partitioned.readDays(spark, path)
    assert(before.count() == 3000)
    val untouchedFiles = before.inputFiles.filterNot(_.contains("dt=2024-01-02")).sorted

    // day 2 re-derived with corrected values → only its directory changes
    val day2 = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-02")
      .withColumn("value", col("value") * 2)
    Partitioned.upsertDays(day2, "ts", path)
    val after = Partitioned.readDays(spark, path)
    assert(after.count() == 3000) // other days intact, day 2 replaced not appended
    assert(after.inputFiles.filterNot(_.contains("dt=2024-01-02")).sorted
      .sameElements(untouchedFiles)) // same physical files, byte-identical dirs
    val day2Sum = after.filter(col("dt") === "2024-01-02")
      .agg(org.apache.spark.sql.functions.sum("value")).head.getDouble(0)
    val origSum = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-02")
      .agg(org.apache.spark.sql.functions.sum("value")).head.getDouble(0)
    assert(math.abs(day2Sum - origSum * 2) < 1e-6)

    // fragment day 3 into many files, then compact to one
    val day3 = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-03")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Partitioned.upsertDays(day3, "ts", path, filesPerDay = 8)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    Partitioned.compactDay(spark, path, "2024-01-03")
    val compacted = Partitioned.readDays(spark, path)
    assert(compacted.inputFiles.count(_.contains("dt=2024-01-03")) == 1)
    assert(compacted.count() == 3000) // content preserved through compaction
  }

  test("writeByDay: one file per day by default, filesPerDay fans out") {
    val p1 = Files.createTempDirectory("part-one").toString
    Partitioned.writeByDay(events.repartition(16), "ts", p1)
    val filesPerDay1 = Partitioned.readDays(spark, p1).inputFiles
      .groupBy(f => f.split("/").find(_.startsWith("dt=")).get)
    assert(filesPerDay1.size == 5)
    assert(filesPerDay1.values.forall(_.length == 1)) // no small-file spray

    // fan-out is bounded by filesPerDay. AQE's partition coalescing merges
    // salts of a TINY load back into one task (desirable at scale: small
    // days self-heal) — disable it here to observe the mechanism.
    val p4 = Files.createTempDirectory("part-four").toString
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      Partitioned.writeByDay(events.repartition(16), "ts", p4, filesPerDay = 4)
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val filesPerDay4 = Partitioned.readDays(spark, p4).inputFiles
      .groupBy(f => f.split("/").find(_.startsWith("dt=")).get)
    assert(filesPerDay4.values.forall(fs => fs.length >= 1 && fs.length <= 4))
    assert(filesPerDay4.values.map(_.length).sum > 5) // genuinely fanned out
  }

  test("writeZOrdered tightens per-file bounding boxes on both dimensions") {
    import spark.implicits._
    // Two independent uniform dims; a-sorted layout leaves b unclustered.
    val df = (0 until 4096).map { i =>
      val a = (i * 2654435761L) % 1024
      val b = (i * 40503L) % 1024
      (a, b)
    }.toDF("a", "b")
    // Files a point-query on `dim` must scan = files whose min/max range
    // covers the value (what parquet row-group/file skipping consults).
    def filesToScan(path: String, dim: String, v: Long): Long =
      spark.read.parquet(path).withColumn("f", input_file_name())
        .groupBy("f").agg(min(dim).as("lo"), max(dim).as("hi"))
        .filter(col("lo") <= v && col("hi") >= v).count()
    val zPath = Files.createTempDirectory("zord").toString
    val aPath = Files.createTempDirectory("asort").toString
    Partitioned.writeZOrdered(df, "a", "b", zPath, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(aPath)
    assert(spark.read.parquet(zPath).inputFiles.length == 16)
    // a-sorted layout: every file spans the full b range — a b-filter
    // scans ALL files. Z-order bounds BOTH dims per file: a b-filter
    // skips most files, while an a-filter still skips most too.
    assert(filesToScan(aPath, "b", 512L) == 16L)
    assert(filesToScan(zPath, "b", 512L) <= 8L)
    assert(filesToScan(zPath, "a", 512L) <= 8L)
    // layout changes must not change content
    assert(spark.read.parquet(zPath).as[(Long, Long)].collect().sorted.toSeq ==
      df.as[(Long, Long)].collect().sorted.toSeq)
  }

  test("writeShuffled: deterministic read sequence, salt re-permutes, decorrelated") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    // the contract is the CONCATENATED filename-order sequence (shard
    // boundaries are sampled and may shift with input layout)
    def sequence(path: String, input: org.apache.spark.sql.DataFrame,
        salt: String): Seq[Long] = {
      Partitioned.writeShuffled(input, "id", salt, path, numFiles = 4)
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .flatMap(f => spark.read.parquet(f.getPath)
          .collect().map(_.getLong(0))).toSeq
    }
    val dir = Files.createTempDirectory("shuf").toString
    val a = sequence(s"$dir/a", df, "epoch1")
    // identical sequence on a rerun, even from a different partitioning
    val b = sequence(s"$dir/b", df.repartition(13), "epoch1")
    assert(a == b)
    // content preserved; order decorrelated from id (not the 0..n prefix)
    assert(a.sorted == (0L until 2000L))
    assert(a.take(500) != (0L until 500L).toSeq)
    // a different salt is a genuinely different permutation
    val c = sequence(s"$dir/c", df, "epoch2")
    assert(a != c && a.sorted == c.sorted)
  }

  test("jsonl/csv dead-letter readers split malformed lines, never drop or fail") {
    import graft.sources.TextFiles
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("textfiles").toString

    Files.write(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      java.util.Arrays.asList(
        """{"id": 1, "name": "alice"}""",
        """not json at all""",
        """{"unrelated": true}""", // valid JSON, zero declared fields
        """{"id": 3}"""))          // partial rows are good rows
    val (jg, jb) = TextFiles.readJsonl(spark, s"$dir/d.jsonl", schema)
    assert(jg.collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .toSet == Set((1L, Some("alice")), (3L, None)))
    assert(jb.collect().map(_.getString(0)).toSet
      == Set("not json at all", """{"unrelated": true}"""))

    Files.write(java.nio.file.Paths.get(s"$dir/d.csv"),
      java.util.Arrays.asList(
        "id,name",       // header: first line of the file, dropped
        "1,alice",
        ",",             // every field null -> bad
        "x,partial",     // type-mismatched id nulls out; row is good
        "3,carol"))
    val (cg, cb) = TextFiles.readCsv(spark, s"$dir/d.csv", schema)
    assert(cg.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
      .toSet == Set((Some(1L), "alice"), (None, "partial"), (Some(3L), "carol")))
    assert(cb.collect().map(_.getString(0)).toSet == Set(","))
    // conservation: every input line is in exactly one side
    assert(jg.count() + jb.count() == 4 && cg.count() + cb.count() == 4)
  }

  test("readCsv drops only each file's FIRST line as header, keeps header-identical data rows") {
    import graft.sources.TextFiles
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("csvheader").toString
    // line 3 is a DATA row that happens to equal the header text — a
    // corpus-wide literal filter would silently destroy it
    Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      java.util.Arrays.asList("id,name", "1,alice", "id,name", "2,bob"))
    // second file: no header at all (first line is data) — nothing dropped
    Files.write(java.nio.file.Paths.get(s"$dir/b.csv"),
      java.util.Arrays.asList("3,carol", "4,dan"))
    val (good, bad) = TextFiles.readCsv(spark, dir, schema)
    assert(bad.count() == 0)
    assert(good.collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("1", "alice"), ("id", "name"), ("2", "bob"),
             ("3", "carol"), ("4", "dan")))
  }

  test("mergePartitioned: untouched partition files BYTE-identical, " +
      "touched partitions merged, all-deleted partition dir dropped, " +
      "new partition created") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge-part").toString
    val base = Seq(
      (1L, "2024-01-01", 10L), (2L, "2024-01-01", 20L),
      (3L, "2024-01-02", 30L), (4L, "2024-01-02", 40L),
      (5L, "2024-01-03", 50L),
      (6L, "2024-01-04", 60L)).toDF("k", "dt", "v")
    base.repartition(col("dt")).write.mode("overwrite")
      .partitionBy("dt").parquet(dir)
    def fileBytes(day: String): Map[String, Seq[Byte]] = {
      val d = new java.io.File(s"$dir/dt=$day")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName ->
          Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val before01 = fileBytes("2024-01-01")
    val before04 = fileBytes("2024-01-04")
    assert(before01.nonEmpty && before04.nonEmpty)
    val changes = Seq(
      (3L, "2024-01-02", Some(31L), "upsert"),  // update in place
      (4L, "2024-01-02", None, "delete"),       // row delete
      (7L, "2024-01-02", Some(70L), "upsert"),  // insert, existing day
      (5L, "2024-01-03", None, "delete"),       // empties the whole day
      (8L, "2024-01-05", Some(80L), "upsert"))  // opens a NEW day
      .toDF("k", "dt", "v", "op")
    Partitioned.mergePartitioned(spark, dir, changes,
      Seq("k"), "dt", col("dt"))
    // days 01 and 04 were never touched: same file names, same bytes
    assert(fileBytes("2024-01-01") == before01)
    assert(fileBytes("2024-01-04") == before04)
    val out = spark.read.parquet(dir)
      .select(col("k"), col("dt").cast("string"), col("v"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "2024-01-01", 10L), (2L, "2024-01-01", 20L),
      (3L, "2024-01-02", 31L), (7L, "2024-01-02", 70L),
      (6L, "2024-01-04", 60L), (8L, "2024-01-05", 80L)))
    assert(!new java.io.File(s"$dir/dt=2024-01-03").exists(),
      "fully-deleted partition directory must be dropped")
  }
}
