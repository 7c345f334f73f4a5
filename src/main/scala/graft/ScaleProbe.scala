package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe (dev tool, not part of the library surface): times the
  * heaviest operator families at 1x and Nx corpus multiples to check the
  * growth exponent empirically — near-linear growth is the evidence that
  * the keyed-shuffle plans hold as data scales. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, "/root/testdata/sf0.1")

    def replicate(df: DataFrame, idCol: String, m: Int): DataFrame =
      (0 until m).map(i => df.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_ unionAll _)

    // Optional family filter (comma-separated name prefixes) so one slow
    // family can be probed solo — e.g. SPARK_GRAFT_PROBE=connected.
    val only = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(",").map(_.trim).toSet)
    def time(name: String)(f: => Long): Unit =
      if (only.forall(_.exists(name.startsWith))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name rows=$n took ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }

    for (m <- Seq(1, mult)) {
      val docs = replicate(t.documents, "doc_id", m).persist()
      docs.count()
      time(s"minhash_lsh_x$m") {
        val sig = dedup.NearDup.minhashSignatures(docs, "doc_id", "text",
          hash = functions.Hash64.fast60).persist()
        val n = dedup.NearDup.lshCandidatePairs(sig, "doc_id", "sig").count()
        sig.unpersist(); n
      }
      time(s"simhash_x$m") {
        val sigs = dedup.NearDup.simhash(docs, "doc_id", "text",
          hash = functions.Hash64.fast60)
        dedup.NearDup.simhashPairs(sigs, "doc_id", maxHamming = 8).count()
      }
      docs.unpersist()

      val emb = replicate(
        t.embeddings.select(col("vec_id").as("id"),
          similarity.Similarity.toDouble(col("embedding")).as("ev")), "id", m).persist()
      emb.count()
      val queries = t.embeddings.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), similarity.Similarity.toDouble(col("embedding")).as("qv"))
      time(s"brute_topk_x$m") {
        similarity.Similarity.bruteForceTopK(emb, queries, 5).count()
      }
      val cents = similarity.IVF.collectCentroids(
        emb.filter(col("id") < 16).select(col("id").as("cid"), col("ev").as("cv")),
        "cid", "cv")
      time(s"ivf_topk_x$m") {
        similarity.IVF.topK(emb, queries, cents, nProbe = 4, k = 5).count()
      }
      emb.unpersist()

      // connected components over a synthetic chain+clique edge set that
      // grows with m (tests the O(log diameter) loop, not the pipeline)
      import spark.implicits._
      val nNodes = 20000 * m
      val edges = spark.range(1, nNodes)
        .select((col("id") - 1).as("d1"), col("id").as("d2")) // one long chain
      time(s"connected_components_x$m") {
        dedup.NearDup.connectedComponents(edges.toDF()).count()
      }

      val docs2 = replicate(t.documents, "doc_id", m).persist()
      docs2.count()
      time(s"decontaminate_x$m") {
        text.Decontaminate.overlap(
          docs2.filter(col("doc_id") % 11 =!= 0),
          docs2.filter(col("doc_id") % 11 === 0), "doc_id", "text").count()
      }
      time(s"bm25_x$m") {
        text.Retrieval.bm25(docs2, "doc_id", "text",
          Seq("hash", "join", "spark", "vector")).count()
      }
      // line dedup: replicas make every line a dup — worst-case window
      // partitions (multiplicity m) while the zero-shuffle chunker is the
      // scan-bound control
      time(s"line_dedup_x$m") {
        text.Segments.lineDedupDocs(docs2, "doc_id", "text", 12).count()
      }
      time(s"chunk_stride_x$m") {
        text.Segments.chunkWithStride(docs2, "doc_id", "text", 32, 16).count()
      }
      // count-only token scan: regex-split HOF vs the native byte-scan
      // expression (TokenCount) — the headroom measurement behind
      // TextAnalysis.tokenCount's switch
      time(s"tokcount_hof_x$m") {
        docs2.agg(sum(org.apache.spark.sql.functions.size(
          text.TextAnalysis.tokens(col("text"))).cast("long")))
          .collect().head.getLong(0)
      }
      time(s"tokcount_native_x$m") {
        docs2.agg(sum(graft.functions.TokenCount.tokenCount(col("text"))
          .cast("long"))).collect().head.getLong(0)
      }
      docs2.unpersist()

      // per-key cap under worst-case skew: ONE key owning every row —
      // the window form sorts it all in a single task; the bounded-buffer
      // form stays scan-bound
      val skewed = spark.range(0, 500000L * m)
        .select(col("id"), lit("k0").as("key")).persist()
      skewed.count()
      time(s"cap_window_x$m") {
        ops.Sampling.capPerKey(skewed, col("key"), col("id"), 100, "s").count()
      }
      time(s"cap_topk_x$m") {
        ops.Sampling.capPerKeyIds(skewed, "key", "id", 100, "s").count()
      }
      skewed.unpersist()

      // span runs: replicas make EVERY gram df >= 2 — worst case (all
      // positions duplicated, maximal run lengths, the (h, doc) join at
      // its largest); persist-internal, so clearCache after
      val docs3 = replicate(t.documents, "doc_id", m).persist()
      docs3.count()
      time(s"span_runs_x$m") {
        val n = text.Spans.duplicatedSpanRuns(docs3, "doc_id", "text", w = 7).count()
        spark.catalog.clearCache(); n
      }
      docs3.unpersist()

      // semantic dedup: replicas are exact copies (cosine 1 in every
      // pair), so every dup group has m members — m² pair growth inside
      // cells is the stress; centroid count scales with the corpus (the
      // documented sizing rule: cells bound the self-join, so C must
      // grow with n — 16 cells at 1x, 16·m at m×)
      val emb2 = replicate(
        t.embeddings.select(col("vec_id").as("id"),
          similarity.Similarity.toDouble(col("embedding")).as("ev")), "id", m).persist()
      emb2.count()
      val cents2 = similarity.IVF.collectCentroids(
        emb2.orderBy(col("id")).limit(16 * m)
          .select(col("id").as("cid"), col("ev").as("cv")), "cid", "cv")
      time(s"semantic_dedup_x$m") {
        val n = similarity.Similarity.semanticDedup(emb2, cents2, 0.999).count()
        spark.catalog.clearCache(); n
      }
      emb2.unpersist()

      // streaming near-dup step: a FIXED 1x batch against a history that
      // grows m× — the per-epoch cost curve a long-running stream sees
      val histSigs = replicate(
        dedup.NearDup.minhashSignatures(t.documents, "doc_id", "text",
          hash = functions.Hash64.fast60), "doc_id", m).persist()
      histSigs.count()
      val batchSigs = dedup.NearDup.minhashSignatures(
        t.documents.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 900000000L),
        "doc_id", "text", hash = functions.Hash64.fast60)
      time(s"neardup_increment_x$m") {
        dedup.NearDup.nearDupIncrement(batchSigs, histSigs, "doc_id").count()
      }
      histSigs.unpersist()

      val ev = replicate(t.events.select("event_id", "user_id", "event_type", "ts"),
        "event_id", m).persist()
      ev.count()
      time(s"funnel_x$m") {
        ops.Journey.funnel(ev, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase")).count()
      }
      time(s"pagerank_x$m") {
        // purchase graph replicated via the orders side: reuse events as a
        // bipartite user→type graph scaled by m (edge count grows with m)
        val e = ev.select(col("user_id").as("src"),
          (col("event_id") % 1000 + 1000000L).as("dst"))
        ops.PageRank.pageRank(e, "src", "dst").count()
      }
      ev.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
