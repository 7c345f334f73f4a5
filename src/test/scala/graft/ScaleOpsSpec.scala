package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Bucketed

/** Scale-pattern operators: bucketed co-located joins (shuffle-free) and
  * salted skew handling — asserted on the physical plan and on result
  * equivalence with the naive forms. */
class ScaleOpsSpec extends SparkSuite {

  /** Drop catalog entry AND files: the in-memory catalog forgets tables
    * across sessions but their warehouse directories persist. */
  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    if (loc.exists) rm(loc)
  }

  test("bucketed join runs without a shuffle exchange") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "fact")
    val dims = (0L until 50L).map(k => (k, s"d$k")).toDF("k", "dim")
    dropTable("graft_bfacts")
    dropTable("graft_bdims")
    Bucketed.writeBucketed(facts, "graft_bfacts", "k", 8)
    Bucketed.writeBucketed(dims, "graft_bdims", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketed.colocatedJoin(spark, "graft_bfacts", "graft_bdims", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("scan contract: filters push down and projection prunes the read schema") {
    // the two properties that dominate 100 TB cost — a scan that reads all
    // columns for a 2-column projection, or filters post-scan, is wrong
    val t = Tables(spark, "/root/testdata/sf0.001")
    val df = t.lineitem.filter(org.apache.spark.sql.functions.col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PushedFilters").contains("l_quantity"), scan.metadata)
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema) // pruned
  }

  test("salted join equals the plain join on a skewed key") {
    import spark.implicits._
    // 90% of probe rows share one hot key
    val probe = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 999L, i)).toDF("k", "v")
    val build = Seq((999L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select("k", "v", "tag").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8)
      .select("k", "v", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size >= 1800) // the hot key dominates and is fully joined
  }

  test("salted two-phase count equals the direct groupBy count") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 5 == 0) "hot" else s"k${i % 97}", i))
      .toDF("k", "v")
    val direct = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", salts = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
