package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Product quantization (PQ) — the vector-compression half of the
  * standard 100 TB ANN architecture (IVF for pruning + PQ for memory):
  * split each dim-d vector into `m` subvectors, quantize each against its
  * own k-entry sub-codebook, and keep only the m code ids (m bytes-ish
  * per vector instead of 8·d). Queries score compressed codes by ADC
  * (asymmetric distance computation): one small lookup table per query,
  * then each candidate costs m table reads — memory-bandwidth-bound,
  * which is the whole point.
  *
  * Spark shape:
  *  - The codebook is MODEL-scale (m·k sub-centroids), baked into the
  *    plan as literals — encoding is a pure codegen'd scan-projection,
  *    NO shuffle, exactly like [[IVF.cellExpr]].
  *  - ADC LUTs are computed on the (tiny) query frame and broadcast;
  *    scoring is a static unrolled sum of m `element_at`s — no
  *    higher-order function in the hot path (interpreted HOFs would
  *    re-enter per element), no UDF.
  *  - Top-k is [[TopK.perGroup]] two-phase partial aggregation.
  *
  * Distances are squared-L2 per subspace, QUANTIZED to integer
  * micro-units (`floor(d·10⁶)`) before the per-subspace sum, so ADC
  * scores are exact integers — order-independent, bit-reproducible, and
  * DuckDB-oracle-able (the q58 k-means lesson applied to scoring; the
  * 1e-6 quantum is noise at ADC's own approximation level).
  *
  * Codebook provenance mirrors [[IVF]]: any (cid, vector) frame sliced by
  * [[sliceCodebook]] works as the deterministic/oracle path; [[train]]
  * runs per-subspace Lloyd refinement on top (driver-looped, model-scale
  * like `IVF.collectCentroids` — documented contract).
  */
object PQ {

  /** Codebook: subspace-major; `cb(s)` lists (cid, sub-centroid) for
    * subspace s, cids EXACTLY 0..k−1 (ADC indexes LUT arrays by cid). */
  type Codebook = Seq[Seq[(Long, Seq[Double])]]

  /** Slice full-dim centroids into the m per-subspace codebooks.
    * Centroid ids must be 0..k−1 (e.g. re-key any centroid frame by
    * `row_number() − 1` before collecting). */
  def sliceCodebook(cents: Seq[(Long, Seq[Double])], m: Int): Codebook = {
    val dim = cents.head._2.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(cents.map(_._1).sorted == (0L until cents.size).toSeq,
      "codebook centroid ids must be exactly 0..k-1")
    val sub = dim / m
    (0 until m).map(s => cents.sortBy(_._1)
      .map { case (cid, v) => (cid, v.slice(s * sub, (s + 1) * sub)) })
  }

  /** Per-subspace Lloyd refinement of a sliced codebook: `iters` ×
    * [[KMeans.lloydStep]] on each subspace's sliced corpus, assigning by
    * L2 argmin (the metric ADC scores with — NOT the default spherical
    * assignment). Driver loops m·iters model-scale collects (the
    * [[KMeans]] contract); cells that empty out keep their previous
    * centroid so cids stay 0..k−1. */
  def train(base: DataFrame, cb: Codebook, vecCol: String = "ev",
      iters: Int = 2): Codebook = {
    val sub = cb.head.head._2.size
    val l2Assign = (df: DataFrame, cents: Seq[(Long, Seq[Double])],
        vc: String) => df.withColumn("cell", codeExpr(col(vc), 0, sub, cents))
    cb.zipWithIndex.map { case (cents0, s) =>
      val sliced = base.select(
        slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      (1 to iters).foldLeft(cents0) { (cents, _) =>
        val next = IVF.collectCentroids(
          KMeans.lloydStep(sliced, cents, vecCol, assign = l2Assign)
            .select(col("cell").as("cid"), col("centroid").as("cv")),
          "cid", "cv").toMap
        cents.map { case (cid, cv) => (cid, next.getOrElse(cid, cv)) }
      }
    }
  }

  /** Integer-quantized squared L2 between a sub-vector column and one
    * literal sub-centroid: `floor(10⁶ · (s·s − 2·s·c + c·c))`, every dot
    * the same left-fold [[DotProduct]] the oracle mirrors. */
  private[similarity] def qdistToLit(sv: Column, cv: Seq[Double]): Column = {
    val litArr = array(cv.map(lit): _*)
    floor((DotProduct.dot(sv, sv)
      - lit(2.0) * DotProduct.dot(sv, litArr)
      + DotProduct.dot(litArr, litArr)) * lit(1e6))
  }

  /** The subspace-s code: argmin quantized distance, ties to lowest cid —
    * the [[IVF.cellExpr]] struct-max trick. */
  private def codeExpr(ev: Column, s: Int, sub: Int,
      cents: Seq[(Long, Seq[Double])]): Column = {
    val sv = slice(ev, s * sub + 1, sub)
    -array_max(array(cents.map { case (cid, cv) =>
      struct((-qdistToLit(sv, cv)).as("nd"), lit(-cid).as("nc"))
    }: _*)).getField("nc")
  }

  /** Corpus with its m-entry code array appended — one scan-projection,
    * no shuffle. @return input columns + `code: array<bigint>` */
  def encode(base: DataFrame, cb: Codebook, vecCol: String = "ev"): DataFrame = {
    val sub = cb.head.head._2.size
    base.withColumn("code",
      array(cb.indices.map(s => codeExpr(col(vecCol), s, sub, cb(s))): _*))
  }

  /** Per-query ADC lookup table: quantized distances in (subspace-major,
    * cid) order, so LUT index = s·k + code_s. */
  private def lutExpr(qv: Column, cb: Codebook): Column = {
    val sub = cb.head.head._2.size
    array((for {
      s <- cb.indices
      (_, cv) <- cb(s) // sliceCodebook guarantees cid order 0..k-1
    } yield qdistToLit(slice(qv, s * sub + 1, sub), cv)): _*)
  }

  /** ADC score: static unrolled Σ_s lut[s·k + code_s] — m integer adds
    * per candidate, fully codegen'd. */
  private def adcExpr(code: Column, lut: Column, m: Int, k: Int): Column =
    (0 until m).map(s => element_at(lut,
      (lit(s * k + 1) + element_at(code, s + 1)).cast("int")))
      .reduce(_ + _)

  /** ADC top-k over the FULL code table (PQ's brute-force-over-compressed
    * mode; compose with [[IVF]] cells to prune — [[ivfAdcTopK]]).
    * @param encoded [[encode]] output carrying `idCol` + `code`
    * @param queries (qid, qv) — broadcast-scale by contract
    * @return (qid, id, adc, rn): rank by adc ASC, ties to lowest id */
  def adcTopK(encoded: DataFrame, queries: DataFrame, cb: Codebook,
      k: Int, idCol: String = "id"): DataFrame = {
    val kc = cb.head.size
    val q = queries.select(col("qid"), lutExpr(col("qv"), cb).as("__lut"))
    val scored = encoded.crossJoin(broadcast(q))
      .withColumn("__nadc",
        -adcExpr(col("code"), col("__lut"), cb.size, kc).cast("double"))
    TopK.perGroup(scored, Seq("qid"), idCol, "__nadc", k)
      .select(col("qid"), col(idCol),
        (-col("__nadc")).cast("long").as("adc"), col("rn"))
  }

  /** Element-wise `v − coarse[cell]`: the IVF-PQ RESIDUAL (the FAISS
    * layout — PQ bits quantize what remains after coarse quantization,
    * a far smaller-radius distribution than the raw corpus, which is
    * where the recall at equal bytes comes from). Literal map lookup on
    * the cell id; the zip_with lambda touches only its lambda vars. */
  private def residualExpr(v: Column, cell: Column,
      coarse: Seq[(Long, Seq[Double])]): Column = {
    val centMap = map(coarse.flatMap { case (cid, cv) =>
      Seq(lit(cid), array(cv.map(lit): _*)) }: _*)
    zip_with(v, element_at(centMap, cell), (a, b) => a - b)
  }

  /** Corpus with `vecCol` replaced by its coarse residual (cell rides
    * along) — the frame residual codebooks are sliced/trained on and
    * [[ivfResidualAdcTopK]] encodes. Scan-projection, no shuffle; the
    * residual lands in its own projection so the m·k code expressions
    * downstream slice an attribute, not the zip_with subtree. */
  def residuals(base: DataFrame, coarse: Seq[(Long, Seq[Double])],
      vecCol: String = "ev"): DataFrame =
    IVF.assign(base, coarse, vecCol)
      .withColumn(vecCol, residualExpr(col(vecCol), col("cell"), coarse))

  /** IVF-PQ with residual encoding: prune to nProbe coarse cells, then
    * ADC-score residual codes against a PER-(query, cell) LUT — the
    * query's residual differs in every probed cell, so the LUT moves
    * inside the probe explode (nProbe LUTs per query; queries are
    * broadcast-scale by contract, so the extra m·k work is on the tiny
    * side of the join). `cb` must be sliced/trained on [[residuals]]
    * output — a raw-vector codebook scores garbage here. */
  def ivfResidualAdcTopK(base: DataFrame, queries: DataFrame,
      coarse: Seq[(Long, Seq[Double])], cb: Codebook,
      nProbe: Int, k: Int, vecCol: String = "ev",
      idCol: String = "id"): DataFrame = {
    val kc = cb.head.size
    val enc = encode(residuals(base, coarse, vecCol), cb, vecCol)
    val probes = queries
      .select(col("qid"), col("qv"),
        explode(IVF.probeExpr(col("qv"), coarse, nProbe)).as("cell"))
      .withColumn("__qres", residualExpr(col("qv"), col("cell"), coarse))
      .select(col("qid"), col("cell"), lutExpr(col("__qres"), cb).as("__lut"))
    val scored = enc.join(broadcast(probes), Seq("cell"))
      .withColumn("__nadc",
        -adcExpr(col("code"), col("__lut"), cb.size, kc).cast("double"))
    TopK.perGroup(scored, Seq("qid"), idCol, "__nadc", k)
      .select(col("qid"), col(idCol),
        (-col("__nadc")).cast("long").as("adc"), col("rn"))
  }

  /** Exact squared-L2 RE-RANK of an ADC shortlist — the refinement
    * stage every production PQ deployment runs (FAISS IVFPQR shape):
    * ADC compression errors wash out of the FINAL ranking by rescoring
    * the top-T compressed candidates against their raw vectors, so the
    * operating point becomes (codebook bits, T) instead of codebook
    * bits alone — recall@10 ≥ 0.8 at T = 50 where pure ADC at the same
    * bytes sits near 0.6 (PQSpec's measured curve).
    *
    * Scale shape: the shortlist is |queries|·T rows (query-bounded →
    * BROADCAST side), so the raw-vector fetch is a broadcast-hash join
    * ON THE SCAN of `base` — the corpus never shuffles, and only
    * shortlisted rows' vectors leave the scan. One [[TopK.perGroup]]
    * two-phase tail.
    *
    * @param shortlist (qid, idCol) candidate pairs (e.g.
    *                  [[ivfResidualAdcTopK]] at k = T)
    * @return (qid, id, d2_micro, rn) — exact integer-micro squared L2,
    *         rank 1..k, ties to lowest id */
  def rerankTopK(shortlist: DataFrame, base: DataFrame, queries: DataFrame,
      k: Int, vecCol: String = "ev", idCol: String = "id"): DataFrame = {
    val cand = base.select(col(idCol), col(vecCol))
      .join(broadcast(shortlist.select(col("qid"), col(idCol))), Seq(idCol))
      .join(broadcast(queries.select(col("qid"), col("qv"))), Seq("qid"))
    val d2 = floor((DotProduct.dot(col(vecCol), col(vecCol))
      - lit(2.0) * DotProduct.dot(col(vecCol), col("qv"))
      + DotProduct.dot(col("qv"), col("qv"))) * lit(1e6))
    val scored = cand.withColumn("__nd2", -d2.cast("double"))
    TopK.perGroup(scored, Seq("qid"), idCol, "__nd2", k)
      .select(col("qid"), col(idCol),
        (-col("__nd2")).cast("long").as("d2_micro"), col("rn"))
  }

  /** IVF-PQ: prune to the query's nProbe nearest coarse cells, ADC-score
    * only those — the standard billion-scale layout (coarse centroids ×
    * sub-codebooks are independent models). */
  def ivfAdcTopK(base: DataFrame, queries: DataFrame,
      coarse: Seq[(Long, Seq[Double])], cb: Codebook,
      nProbe: Int, k: Int, vecCol: String = "ev",
      idCol: String = "id"): DataFrame = {
    val kc = cb.head.size
    val enc = encode(IVF.assign(base, coarse, vecCol), cb, vecCol)
    val probes = queries
      .select(col("qid"), lutExpr(col("qv"), cb).as("__lut"),
        explode(IVF.probeExpr(col("qv"), coarse, nProbe)).as("cell"))
    val scored = enc.join(broadcast(probes), Seq("cell"))
      .withColumn("__nadc",
        -adcExpr(col("code"), col("__lut"), cb.size, kc).cast("double"))
    TopK.perGroup(scored, Seq("qid"), idCol, "__nadc", k)
      .select(col("qid"), col(idCol),
        (-col("__nadc")).cast("long").as("adc"), col("rn"))
  }
}
