package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional name filter for local profiling (comma-separated).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Bench-only headroom measurements: no DuckDB oracle (xxhash64 is
    // Spark-only), so they live here — NOT in SparkEntry.queries, which
    // Verify's correctness gate enumerates.
    val extras: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      // Machine-drift calibration probe (round-12 item 5): a FIXED
      // synthetic workload touching no repo code paths and no input
      // data — scan + hash-aggregate + shuffle join + wide projection
      // over spark.range. Identical work in every artifact, so
      // bench_diff can divide per-query ratios by THIS entry's ratio
      // before flagging: same-jar drift on this host reads median
      // 1.06x / p90 1.31x (SURVEY §8.10), and without normalization
      // every round's tripwire drowns in it.
      "x00_calibration" ->
        ((s, _) => {
          import org.apache.spark.sql.functions._
          val n = 30000000L
          val df = s.range(n).select(col("id"),
            ((col("id") * 2654435761L) % 1000003L).as("k"),
            (col("id") % 977L).as("g"))
          val agg = df.groupBy(col("g"))
            .agg(sum(col("k")).as("sk"), count(lit(1)).as("cnt"))
          df.join(agg, "g")
            .select(col("id"), (col("k") + col("sk") % 7L).as("v1"),
              (col("k") * col("cnt")).as("v2"))
        }),
      // Production-path release family (round-12 item 4): the 8-stage
      // verdict chain materialized ONCE, all five consumers served from
      // parquet — vs q403/404/405/414/443, which each re-derive the
      // chain for oracle self-containment (the ~5x gate-vs-production
      // gap, now an artifact number).
      "x403_release_chain" ->
        ((s, dir) => queries.CurationGates.releaseChainOnce(s, dir)),
      // Production-path graph-ANN search (round-13 item 2): the index
      // (knnGraph + topLayer) materializes ONCE per data dir on first
      // invocation; the reported min-of-2-passes figure is the pure
      // seed → 3 rounds → top-k search from the parquet index — vs the
      // q446-q454 gates, which re-derive the build + brute legs per
      // query for oracle self-containment.
      "x446_graph_chain" ->
        ((s, dir) => queries.VectorsGraph.graphChainSearch(s, dir)),
      "x27_minhash_xxh" ->
        ((s, dir) => queries.VectorsDedup.minhashLshPipeline(s, dir, graft.functions.Hash64.fast60)),
      // Production-hash char-shingle path: q134's cost is ~all md5 over
      // the ~7x-denser char-gram stream; fast60 is the same mixer family
      // with the strong hash swapped (the x27 contract).
      "x134_char_minhash_xxh" ->
        ((s, dir) => {
          import org.apache.spark.sql.functions._
          val sig = dedup.NearDup.minhashSignaturesChar(
            Tables(s, dir).documents.filter(length(col("text")) > 0),
            "doc_id", "text", hash = graft.functions.Hash64.fast60).persist()
          dedup.NearDup.lshCandidatePairs(sig, "doc_id", "sig")
            .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
            .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
            .withColumn("est_jaccard",
              dedup.NearDup.sigAgreement(col("s1.sig"), col("s2.sig")))
            .select(col("d1"), col("d2"), col("est_jaccard"))
        }),
      // Production-hash winnowing: q313's cost is ~all md5 over the
      // gram stream; fast60 swaps the strong hash for xxhash64 masked
      // into the same 60-bit domain (the x27 contract).
      "x313_winnow_xxh" ->
        ((s, dir) => text.Winnow.matchPairs(
          Tables(s, dir).documents, "doc_id", "text",
          hash = graft.functions.Hash64.fast60)),
      "x55_decontam_hashed" ->
        ((s, dir) => {
          val docs = Tables(s, dir).documents
          text.Decontaminate.overlap(
            docs.filter(org.apache.spark.sql.functions.col("doc_id") % 11 =!= 0),
            docs.filter(org.apache.spark.sql.functions.col("doc_id") % 11 === 0),
            "doc_id", "text", hashGrams = true)
        }),
      // Chain-once contract: materialize the minhash→LSH→CC table ONCE,
      // then serve all four consumers (clusters, report, reps, flow
      // matrix) from parquet. Compare against q37+q72+q90+q107, which
      // re-derive the chain per query (the oracle-self-containment
      // price). Timed region includes the write and every consumer.
      // Production-path encode: q111 re-trains its merges per run (the
      // oracle-self-containment price, ~80% of its bench time). Here the
      // merge table is trained ONCE — on the first (untimed warmup)
      // invocation, exactly the train-on-a-sample contract — and the
      // timed region is the pure zero-shuffle replace-chain encode.
      "x111_bpe_encode_only" -> {
        var trained: Seq[(String, String)] = null
        (s: org.apache.spark.sql.SparkSession, dir: String) => {
          val docs = Tables(s, dir).documents
          if (trained == null)
            trained = text.Bpe.trainMerges(docs, "doc_id", "text", 16)
              .map(m => (m._2, m._3))
          text.Bpe.encode(docs, "doc_id", "text", trained)
        }
      },
      "x37_cluster_table" -> {
        // one temp dir per process, reused across passes (per-run unique
        // against concurrent benches, bounded on disk across passes)
        lazy val x37Dir = java.nio.file.Files
          .createTempDirectory("graft_cluster_table").toString
        (s: org.apache.spark.sql.SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val tableDir = x37Dir
          val pairs = queries.VectorsDedup
            .minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
            .filter(col("est_jaccard") >= 0.5)
          dedup.NearDup.writeClusterTable(pairs, tableDir)
          val cl = dedup.NearDup.readClusters(s, tableDir)
          val ps = dedup.NearDup.readClusterPairs(s, tableDir)
          dedup.NearDup.dedupReport(cl).count()
          val docs = Tables(s, dir).documents
          dedup.NearDup.clusterRepresentatives(cl,
            docs.select(col("doc_id"),
              size(text.TextAnalysis.tokens(col("text"))).cast("long")
                .as("n_tokens")),
            "doc_id", "n_tokens").count()
          dedup.NearDup.dupFlowMatrix(ps, docs, "doc_id", "source").count()
          cl
        }
      })
    // Untimed warmup: run EVERY query once at the tiny SF so each plan's
    // Janino/JIT compilation (the dominant 4-6 s first-evaluation noise,
    // keyed by plan structure, not data paths) is paid before timing —
    // round 2's numbers mixed compile cost into whichever query ran a
    // plan family first.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // Full materialization evaluates EVERY output column via the noop
    // sink; count() lets Catalyst prune computed columns, silently
    // under-pricing projection-heavy queries (found round 8: q112's
    // dot-product never ran under count()). Round 9 flips the DEFAULT to
    // full — the honest price is the baseline; SPARK_GRAFT_MATERIALIZE=
    // count keeps the legacy mode for r8-continuity comparisons. The
    // mode is stamped into the JSON artifact so two artifacts can never
    // be compared silently across modes (bench_diff refuses mixed modes).
    // Validate strictly: an unrecognized value ("Count", "off", a typo)
    // silently benching the WRONG mode wastes a full 500 s pass — fail
    // fast instead (round-9 ADVICE).
    val fullMat = sys.env.get("SPARK_GRAFT_MATERIALIZE") match {
      case None | Some("full") => true
      case Some("count")       => false
      case Some(other) => sys.error(
        s"SPARK_GRAFT_MATERIALIZE must be 'full' or 'count', got '$other'")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      if (fullMat) df.write.format("noop").mode("overwrite").save()
      else { df.count(); () }

    (SparkEntry.queries.toSeq ++ extras)
      .filter { case (n, _) => only.forall(_.contains(n)) } // warm only what we time
      .foreach { case (_, fn) =>
        try { run(fn(spark, warmDir)) } catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    // A failed query records a negative sentinel, never a fast time —
    // total includes its wall clock, and the error text is reported.
    // Each query runs SPARK_GRAFT_PASSES (default 2) timed passes and
    // reports the MIN: this host shows up-to-20× cross-process contention
    // noise on single runs (worst on late entries), and the minimum of two
    // passes is the cheapest estimator that survives it. Sub-runs compare
    // within one bench invocation only.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val results = (SparkEntry.queries.toSeq.sortBy(_._1) ++ extras)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to passes).iterator.takeWhile(_ => err.isEmpty).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)) }
        catch { case e: Throwable =>
          err = Some(e.toString.linesIterator.next().take(200)) }
        // Operators that persist internal frames (q24/q27/q34) would
        // otherwise pin them for the rest of the run, skewing later queries.
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.toSeq
      (name, times.min, err)
    }
    val qs = results.map { case (k, v, err) =>
      s"${jstr(k)}:" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val mode = if (fullMat) "full" else "count"
    println(s"""{"metric":"total","value":$total,"unit":"sec","materialize":"$mode","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
