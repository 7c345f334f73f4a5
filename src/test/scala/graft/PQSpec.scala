package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.similarity.{IVF, PQ, Similarity, TopK}

/** Product quantization: encode determinism, ADC retrieval quality,
  * L2 Lloyd training, and the plan shapes that must survive 100 TB. */
class PQSpec extends SparkSuite {

  private def base = Tables(spark, "/root/testdata/sf0.01")
    .embeddings.select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("ev"))

  private def cb = PQ.sliceCodebook(
    IVF.collectCentroids(
      base.filter(col("id") < 8).select(col("id").as("cid"), col("ev").as("cv")),
      "cid", "cv"), m = 8)

  private def queries = base.filter(col("id") < 3)
    .select(col("id").as("qid"), col("ev").as("qv"))

  /** Exact squared-L2 top-k ground truth (same metric ADC approximates). */
  private def l2TopK(k: Int): Set[(Long, Long)] = {
    val scored = base.crossJoin(broadcast(queries))
      .withColumn("negd", -(DotProduct.dot(col("ev"), col("ev"))
        - lit(2.0) * DotProduct.dot(col("ev"), col("qv"))
        + DotProduct.dot(col("qv"), col("qv"))))
    TopK.perGroup(scored, Seq("qid"), "id", "negd", k)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("codebook vectors encode to their own cids; self-ADC is exactly zero") {
    val enc = PQ.encode(base.filter(col("id") < 8), cb)
      .select(col("id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (i <- 0L until 8L)
      assert(enc(i) == Seq.fill(8)(i), s"vector $i should be its own code word")
    // query 0 retrieves itself at rank 1 with adc 0 (x=c -> every
    // subspace distance is IEEE-exact zero)
    val self = PQ.adcTopK(PQ.encode(base, cb), queries, cb, k = 1)
      .filter(col("qid") === 0).collect().head
    assert(self.getAs[Long]("id") == 0L && self.getAs[Long]("adc") == 0L)
  }

  test("ADC recall@10 against exact-L2 ground truth; training tightens reconstruction") {
    val truth = l2TopK(10)
    val encInit = PQ.encode(base, cb)
    val gotInit = PQ.adcTopK(encInit, queries, cb, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallInit = (gotInit & truth).size.toDouble / truth.size

    // Mean reconstruction error = mean self-ADC of the corpus against its
    // own code — Lloyd in the SAME metric must not increase it.
    def mse(b: DataFrame, c: PQ.Codebook): Double = {
      val enc = PQ.encode(b, c)
      val adcSelf = PQ.adcTopK(enc, b.select(col("id").as("qid"),
        col("ev").as("qv")), c, k = 1)
      // rank-1 adc <= self-code adc, itself a valid reconstruction bound
      adcSelf.agg(avg(col("adc"))).head.getDouble(0)
    }
    val trained = PQ.train(base, cb, iters = 2)
    val gotTrained = PQ.adcTopK(PQ.encode(base, trained), queries, trained, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallTrained = (gotTrained & truth).size.toDouble / truth.size

    val (e0, e1) = (mse(base.limit(200), cb), mse(base.limit(200), trained))
    info(f"PQ ADC recall@10: init-codebook $recallInit%.2f, 2-iter-trained " +
      f"$recallTrained%.2f; mean min-ADC ${e0}%.0f -> ${e1}%.0f")
    assert(recallInit >= 0.3, f"init recall $recallInit%.2f below floor")
    assert(recallTrained >= recallInit - 0.1,
      "training should not collapse retrieval quality")
    assert(e1 <= e0, "L2 Lloyd must not increase quantization error")
  }

  test("plan shapes: encode never shuffles; ADC top-k is two-phase, not a window") {
    val encPlan = PQ.encode(base, cb).queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange") && !encPlan.contains("Join"), encPlan)
    val adcPlan = PQ.adcTopK(PQ.encode(base, cb), queries, cb, k = 5)
      .queryExecution.executedPlan.toString
    assert(!adcPlan.contains("Window"), adcPlan)
    assert(adcPlan.contains("partial_topkbyscore"), adcPlan)
    assert(adcPlan.contains("BroadcastExchange"), adcPlan) // queries side only
  }

  test("residual IVF-PQ beats raw-vector PQ recall@10 at equal bytes") {
    val truth = l2TopK(10)
    // raw path: the existing trained curve (m=8 subspaces, k=8 codes)
    val trainedRaw = PQ.train(base, cb, iters = 2)
    val rawGot = PQ.adcTopK(PQ.encode(base, trainedRaw), queries, trainedRaw, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = (rawGot & truth).size.toDouble / truth.size
    // residual path at the SAME code bytes: 64 coarse cells, codebook
    // sliced+trained on residuals, nProbe = all cells so the comparison
    // isolates the encoding benefit from pruning loss. The seed must
    // avoid the coarse members — their residuals are zero vectors.
    val coarse = IVF.collectCentroids(
      base.filter(col("id") < 64).select(col("id").as("cid"), col("ev").as("cv")),
      "cid", "cv")
    val resBase = PQ.residuals(base, coarse)
    val cbRes = PQ.train(resBase, PQ.sliceCodebook(
      IVF.collectCentroids(
        resBase.filter(col("id") >= 100 && col("id") < 108)
          .select((col("id") - 100).as("cid"), col("ev").as("cv")),
        "cid", "cv"), m = 8), iters = 2)
    val resGot = PQ.ivfResidualAdcTopK(base, queries, coarse, cbRes,
        nProbe = 64, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val resRecall = (resGot & truth).size.toDouble / truth.size
    info(f"recall@10 at m=8,k=8: raw $rawRecall%.2f, residual $resRecall%.2f")
    assert(resRecall >= rawRecall + 0.1,
      f"residual $resRecall%.2f not materially above raw $rawRecall%.2f")
  }

  test("recall/bytes curve at REALISTIC codebook sizes (sf0.1): " +
      "residual IVF-PQ m=8 reaches recall@10 >= 0.8 at a measured point") {
    val b = Tables(spark, "/root/testdata/sf0.1")
      .embeddings.select(col("vec_id").as("id"),
        Similarity.toDouble(col("embedding")).as("ev")).persist()
    val qs = b.filter(col("id") < 3)
      .select(col("id").as("qid"), col("ev").as("qv"))
    val scored = b.crossJoin(broadcast(qs))
      .withColumn("negd", -(DotProduct.dot(col("ev"), col("ev"))
        - lit(2.0) * DotProduct.dot(col("ev"), col("qv"))
        + DotProduct.dot(col("qv"), col("qv"))))
    val truth = TopK.perGroup(scored, Seq("qid"), "id", "negd", 10)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = IVF.collectCentroids(
      b.filter(col("id") < 64).select(col("id").as("cid"), col("ev").as("cv")),
      "cid", "cv")
    val resBase = PQ.residuals(b, coarse).persist()
    resBase.count()
    // curve: k = 8 (3 bits/subspace, the honest-tiny round-6 point)
    // vs k = 64 (6 bits — the realistic operating point; 6 bytes/vector
    // against 512 raw). Seeds skip ids < 100: coarse members have
    // all-zero residuals.
    def recallOf(got: Set[(Long, Long)]): Double =
      (got & truth).size.toDouble / truth.size
    val curve = Seq(8, 64).map { k =>
      val seed = IVF.collectCentroids(
        resBase.filter(col("id") >= 100 && col("id") < 100 + k)
          .select((col("id") - 100).as("cid"), col("ev").as("cv")),
        "cid", "cv")
      val cbK = PQ.train(resBase, PQ.sliceCodebook(seed, m = 8), iters = 2)
      val pure = recallOf(PQ.ivfResidualAdcTopK(b, qs, coarse, cbK,
          nProbe = 64, k = 10)
        .select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
      // the production operating point: ADC shortlist T=50, exact
      // re-rank to 10 (corpus never shuffles — shortlist broadcasts)
      val shortlist = PQ.ivfResidualAdcTopK(b, qs, coarse, cbK,
        nProbe = 64, k = 50)
      val reranked = recallOf(PQ.rerankTopK(shortlist, b, qs, k = 10)
        .select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
      val bits = 8 * (32 - Integer.numberOfLeadingZeros(k - 1))
      info(f"residual IVF-PQ m=8 k=$k%3d ($bits%2d bits/vec vs 4096 raw): " +
        f"pure-ADC recall@10 = $pure%.2f, +rerank(T=50) = $reranked%.2f")
      k -> ((pure, reranked))
    }.toMap
    b.unpersist(); resBase.unpersist()
    assert(curve(64)._2 >= 0.8,
      f"k=64+rerank recall ${curve(64)._2}%.2f below the 0.8 operating point")
    assert(curve(64)._1 >= curve(8)._1,
      "more codebook bits must not lose pure-ADC recall")
  }

  test("ivfAdcTopK prunes to probed cells and keeps self-retrieval") {
    val coarse = IVF.collectCentroids(
      base.filter(col("id") < 16).select(col("id").as("cid"), col("ev").as("cv")),
      "cid", "cv")
    val out = PQ.ivfAdcTopK(base, queries, coarse, cb, nProbe = 4, k = 5)
    val got = out.collect()
    for (q <- 0L until 3L) {
      val self = got.find(r => r.getAs[Long]("qid") == q && r.getAs[Long]("id") == q)
      assert(self.exists(_.getAs[Long]("rn") == 1L), s"self-retrieval failed for qid=$q")
    }
    assert(got.groupBy(r => r.getAs[Long]("qid")).forall(_._2.size <= 5))
  }
}
