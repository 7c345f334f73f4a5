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
}
