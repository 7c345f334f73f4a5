package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.NearDup
import graft.functions.Hash64
import Text.toksSql

/** The document NEAR-DUP pair/cluster family: MinHash+LSH (word and
  * char shingles, unicode-canonicalized and multilingual variants),
  * SimHash banding, connected-components cluster resolution with
  * representative picks, dedup reports/sweeps/lift, cluster-keyed
  * splits and the split-leakage audit, the LSH parameter planner, and
  * b-bit minwise estimation. Split from [[Vectors]] (round 10) purely
  * mechanically -- query names, semantics, and oracles unchanged;
  * [[Vectors]] keeps the embedding-similarity/ANN/multimodal families.
  */
object VectorsDedup extends QueryModule {

  /** q27's full pipeline with a pluggable base hash: [[Hash64.hash60]] for
    * the oracle run, [[Hash64.fast60]] for the production/bench headroom
    * path (same mixer family, same plan shape — only the per-shingle
    * strong hash differs).
    *
    * CACHING CONTRACT: the signature frame is `persist()`ed (it feeds the
    * banding arm and both verify-join arms — static exchange reuse cannot
    * unify them) and stays pinned after the result materializes; call
    * `spark.catalog.clearCache()` (or unpersist selectively) between
    * invocations in a long-lived session, as Bench/Verify do. */
  def minhashLshPipeline(s: SparkSession, dir: String,
      hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val sig = NearDup.minhashSignatures(
      Tables(s, dir).documents, "doc_id", "text", hash = hash).persist()
    NearDup.lshCandidatePairs(sig, "doc_id", "sig")
      .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("s1.sig"), col("s2.sig"), (x, y) => x === y),
          b => b)).cast("double") / lit(16.0))
      .select(col("d1"), col("d2"), col("est_jaccard"))
  }

  /** q28's radius; bands = radius + 1 (pigeonhole guarantee). */
  private val simhashRadius = 8

  /** q135's split config: salt + fractions shared by the Spark plan and
    * the generated oracle CASE so the engines cannot drift. */
  private val clusterSplitSalt = "csplit6"
  private val clusterSplitFracs =
    Seq("train" -> 0.9, "validation" -> 0.05, "test" -> 0.05)

  /** DuckDB VALUES list mirroring [[NearDup.bandLayout]] for q28's band
    * count — generated from the same Scala layout so engines can't drift. */
  private val simhashBandsSql: String =
    NearDup.bandLayout(simhashRadius + 1).zipWithIndex
      .map { case ((off, w), b) => s"($b, $off, ${(1L << w) - 1})" }
      .mkString("(VALUES ", ", ", ") AS b(band, boff, bmask)")

  /** 16 mixer min aggregates over the strong shingle hash `h`, as a
    * DuckDB list literal (mirrors [[NearDup.minhashSignatures]]). */
  private val minhashSigList: String =
    (0 until 16).map(i => s"min(${Hash64.duckMixedSql(i, "h")})")
      .mkString("[", ", ", "]")

  /** The q27 MinHash+LSH pipeline as a reusable CTE chain ending in
    * `est (d1, d2, est_jaccard)` — shared by the q27 oracle and q37's
    * recursive-closure oracle. */
  private val minhashCtes: String =
    s"""toks AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(${NearDup.duckShinglesSql(3)})) AS sh
      |  FROM toks
      |), hs AS (
      |  SELECT doc_id, ${Hash64.duckSql("sh")} AS h FROM sh
      |), sig AS (
      |  SELECT doc_id, $minhashSigList AS sig FROM hs GROUP BY 1
      |), banded AS (
      |  SELECT doc_id, b.band AS band, sig[b.band*4+1 : b.band*4+4] AS band_key
      |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b
      |), mpairs AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |), est AS (
      |  SELECT d1, d2,
      |         CAST(len(list_filter(list_zip(s1.sig, s2.sig), p -> p[1] = p[2])) AS DOUBLE) / 16.0
      |           AS est_jaccard
      |  FROM mpairs
      |  JOIN sig s1 ON d1 = s1.doc_id
      |  JOIN sig s2 ON d2 = s2.doc_id
      |)""".stripMargin

  /** [[minhashCtes]] with character 5-gram shingles over lowercased,
    * whitespace-folded text (mirrors [[NearDup.charShingles]]). */
  private val charMinhashCtes: String = charMinhashCtesFrom(
    s"""SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
      |  FROM documents WHERE length(text) > 0""".stripMargin)

  /** [[charMinhashCtes]] over an arbitrary `(doc_id, t)` source —
    * q312 swaps in the normalize_text-canonicalized corpus + planted
    * variants; the shingle/sig/band/est chain is shared verbatim. */
  private def charMinhashCtesFrom(t0Sql: String): String =
    s"""t0 AS (
      |  $t0Sql
      |), sh AS (
      |  SELECT doc_id,
      |         unnest(list_distinct(${NearDup.duckCharShinglesSql("t", 5)})) AS sh
      |  FROM t0
      |), hs AS (
      |  SELECT doc_id, ${Hash64.duckSql("sh")} AS h FROM sh
      |), sig AS (
      |  SELECT doc_id, $minhashSigList AS sig FROM hs GROUP BY 1
      |), banded AS (
      |  SELECT doc_id, b.band AS band, sig[b.band*4+1 : b.band*4+4] AS band_key
      |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b
      |), mpairs AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |), est AS (
      |  SELECT d1, d2,
      |         CAST(len(list_filter(list_zip(s1.sig, s2.sig), p -> p[1] = p[2])) AS DOUBLE) / 16.0
      |           AS est_jaccard
      |  FROM mpairs
      |  JOIN sig s1 ON d1 = s1.doc_id
      |  JOIN sig s2 ON d2 = s2.doc_id
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash+LSH near-dup: one explode of distinct shingles → 16 seeded
    // min-hash aggregates (single shuffle) → 4×4 banding → bucket-join
    // candidates → signature-agreement estimate. The signature frame is
    // used three times (banding + two verify joins) → persist.
    "q27_minhash_lsh" -> (minhashLshPipeline(_, _, graft.functions.Hash64.hash60)),

    // q27's pipeline with CHARACTER 5-gram shingles: the dedup unit for
    // space-free scripts where word tokenization sees nothing. Same
    // signature/banding/agreement machinery — only the unit differs.
    "q134_char_minhash" -> ((s, dir) => {
      val sig = NearDup.minhashSignaturesChar(
        Tables(s, dir).documents.filter(length(col("text")) > 0),
        "doc_id", "text").persist()
      NearDup.lshCandidatePairs(sig, "doc_id", "sig")
        .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("est_jaccard",
          NearDup.sigAgreement(col("s1.sig"), col("s2.sig")))
        .select(col("d1"), col("d2"), col("est_jaccard"))
    }),

    // q134 with the Unicode canonicalization stage composed in front of
    // the shingler (normalize_text: NFC + width fold + simple lower) —
    // over the corpus PLUS the q307 planted variants: the four
    // byte-distinct renderings produce IDENTICAL signatures, so all six
    // planted pairs surface at est_jaccard 1.0, while the ASCII corpus
    // (where canonicalization is an identity) yields exactly q134's
    // pairs. The end-to-end gate for normalize->shingle->minhash->LSH.
    "q312_unicode_char_minhash" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"))
        .unionByName(TextDedup.unicodePlanted.toDF("doc_id", "text"))
        .filter(length(col("text")) > 0)
      val sig = NearDup.minhashSignaturesChar(docs, "doc_id", "text",
        unicodeNormalize = true).persist()
      NearDup.lshCandidatePairs(sig, "doc_id", "sig")
        .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("est_jaccard",
          NearDup.sigAgreement(col("s1.sig"), col("s2.sig")))
        .select(col("d1"), col("d2"), col("est_jaccard"))
    }),

    // q312's pipeline over the NON-ASCII slice (round-7 verdict item 2):
    // char-level shingles see every script, so the planted Cyrillic and
    // CJK near-dup pairs must surface from LSH banding — the gated
    // multilingual dedup route the ASCII word tokenizer cannot offer.
    "q354_multilingual_minhash" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"))
        .unionByName(TextDedup.multilingualPlanted.toDF("doc_id", "text"))
        .filter(length(col("text")) > 0)
      val sig = NearDup.minhashSignaturesChar(docs, "doc_id", "text",
        unicodeNormalize = true).persist()
      NearDup.lshCandidatePairs(sig, "doc_id", "sig")
        .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("est_jaccard",
          NearDup.sigAgreement(col("s1.sig"), col("s2.sig")))
        .select(col("d1"), col("d2"), col("est_jaccard"))
    }),

    // LSH parameter planner: the (bands, rows) design table behind the
    // q27 banding choice — collision S-curves P = 1-(1-J^r)^b for every
    // factorization of the signature, integer-exponent powers as
    // explicit multiplication folds (pow() rounding is not cross-engine
    // specified). Reads no data; makes the banding choice inspectable.
    "q369_lsh_planner" -> ((s, _) => NearDup.lshPlanner(s)),

    // Per-source dedup LIFT: what q37's cluster resolution actually
    // saves, by source — docs dropped (keep = false) and chars freed,
    // integer-micro drop rate; the number a mixing/budget decision
    // (q66/q129) consumes. One join of clusters to doc metadata.
    "q370_dedup_lift" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      val clusters = NearDup.connectedComponents(pairs)
      Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars"))
        .join(clusters.select(col("node").as("doc_id"), col("keep")),
          Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep") === false, 1L).otherwise(0L))
            .as("n_dropped"),
          sum(when(col("keep") === false, col("n_chars")).otherwise(0L))
            .as("chars_dropped"))
        .withColumn("drop_micro",
          expr("n_dropped * 1000000 div n_docs"))
    }),

    // Cluster-chaining audit over q37's dedup clusters: per cluster,
    // member count vs verified-pair EDGE count and the integer-micro
    // edge density — transitive closure can chain A-B-C where A-C never
    // verified; density << 1 on big clusters is that warning. Composes
    // the already-verified pair set; no new pair computation.
    "q371_cluster_density" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5).persist()
      val clusters = NearDup.connectedComponents(pairs)
      val members = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
      val edges = pairs.join(
          clusters.select(col("node").as("d1"), col("cluster_id")), "d1")
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_edges"))
      members.join(edges, "cluster_id")
        .withColumn("density_micro",
          expr("CAST(n_edges * 2000000 div (n_members * (n_members - 1)) AS LONG)"))
    }),

    // Dedup clusters: minhash pairs (est >= 0.5) → connected components →
    // per-doc cluster id + keep-one flag. The step a training-data dedup
    // actually executes between "candidate pairs" and "drop duplicates".
    "q37_dedup_clusters" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      NearDup.connectedComponents(pairs)
        .select(col("node").as("doc_id"), col("cluster_id"), col("keep"))
    }),

    // Representative selection over q37's clusters: keep the LONGEST doc
    // per cluster (Dolma's pick), ties to the lower id — the quality-
    // aware alternative to connectedComponents' min-id `keep`.
    "q90_cluster_reps" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      val clusters = NearDup.connectedComponents(pairs)
      val docs = Tables(s, dir).documents.select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      NearDup.clusterRepresentatives(clusters, docs, "doc_id", "n_tokens")
    }),

    // Dedup report: the summary a pipeline logs after cluster resolution —
    // how many docs sat in dup clusters, how many clusters, how many rows
    // removal drops, and the biggest cluster (skew indicator for the
    // representative-pick stage). One aggregation over q37's output.
    "q72_dedup_report" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      NearDup.dedupReport(NearDup.connectedComponents(pairs))
    }),

    // Cross-source duplication-flow matrix: q27's near-dup pairs rolled
    // up by (source, source) — which sources copy from which, the
    // provenance view a mixing decision needs (intra-source dup is
    // boilerplate; cross-source dup is syndication). Pair orientation
    // canonicalized by source name so the matrix is triangular.
    "q107_dup_flow" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      NearDup.dupFlowMatrix(pairs, Tables(s, dir).documents,
        "doc_id", "source")
    }),

    // Split-contamination audit: near-dup pairs STRADDLING splits under
    // the naive per-doc hash split (same salt/fractions as q135) — the
    // leakage q135's cluster keying eliminates, quantified. The audit a
    // pipeline runs BEFORE trusting an inherited split.
    "q143_split_leak_pairs" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      val split = graft.ops.Sampling.assignSplit(
        Tables(s, dir).documents.select(col("doc_id")), col("doc_id"),
        clusterSplitSalt, clusterSplitFracs)
      pairs
        .join(split.select(col("doc_id").as("d1"), col("split").as("split1")), "d1")
        .join(split.select(col("doc_id").as("d2"), col("split").as("split2")), "d2")
        .filter(col("split1") =!= col("split2"))
        .select(col("d1"), col("d2"), col("split1"), col("split2"),
          col("est_jaccard"))
    }),

    // Cluster-aware split: q43's hash split keyed by the q37 cluster id
    // (singletons by their own id) so near-dups NEVER straddle
    // train/eval — the leakage guarantee a per-doc split silently
    // violates. One small-frame join; the split is scan-side.
    "q135_cluster_split" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
        .filter(col("est_jaccard") >= 0.5)
      NearDup.clusterSplit(Tables(s, dir).documents, pairs, "doc_id",
        clusterSplitSalt, clusterSplitFracs)
    }),

    // SimHash near-dup: 60-bit signature, pigeonhole banding (9 bands for
    // radius 8 — every pair within the advertised hamming radius is
    // guaranteed a candidate; round 2's fixed 4x15 banding only guaranteed
    // radius 3 while advertising 16).
    "q28_simhash" -> ((s, dir) => {
      val sigs = NearDup.simhash(Tables(s, dir).documents, "doc_id", "text")
      NearDup.simhashPairs(sigs, "doc_id", maxHamming = simhashRadius)
    }),

    // 1-bit minwise estimation next to the full estimator: signatures
    // 60x smaller, Jaccard from parity agreement with the b=1
    // correction — both estimates per pair, so the storage trade is
    // measured, not assumed.
    "q296_bbit_minhash" -> ((s, dir) =>
      NearDup.bbitMinhashPairs(Tables(s, dir).documents,
        "doc_id", "text")),

    // Dedup-policy threshold sweep: how many near-dup pairs and victim
    // docs would each Jaccard cutoff remove — the q27 pipeline read as
    // a policy table instead of one fixed threshold.
    "q266_dedup_sweep" -> ((s, dir) => {
      val pairs = minhashLshPipeline(s, dir, graft.functions.Hash64.hash60)
      pairs
        .withColumn("threshold",
          explode(array(Seq(50L, 60L, 70L, 80L, 90L).map(lit): _*)))
        .filter(col("est_jaccard") * 100 >= col("threshold"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("d2")).as("n_victims"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q107_dup_flow" ->
      s"""WITH $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |)
        |SELECT least(a.source, b.source) AS source_a,
        |       greatest(a.source, b.source) AS source_b,
        |       count(*) AS n_pairs
        |FROM fpairs
        |JOIN documents a ON fpairs.d1 = a.doc_id
        |JOIN documents b ON fpairs.d2 = b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q27_minhash_lsh" ->
      s"WITH $minhashCtes\nSELECT d1, d2, est_jaccard FROM est",

    "q266_dedup_sweep" ->
      s"""WITH $minhashCtes,
         |thr AS (SELECT unnest([50, 60, 70, 80, 90]) AS threshold)
         |SELECT CAST(threshold AS BIGINT) AS threshold,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(count(DISTINCT d2) AS BIGINT) AS n_victims
         |FROM est CROSS JOIN thr
         |WHERE est_jaccard * 100 >= threshold
         |GROUP BY 1""".stripMargin,

    "q134_char_minhash" ->
      s"WITH $charMinhashCtes\nSELECT d1, d2, est_jaccard FROM est",

    "q312_unicode_char_minhash" -> {
      val norm = graft.functions.NormalizeText.oracleSql("text")
      val t0 =
        s"""SELECT doc_id, regexp_replace($norm, '\\s+', ' ', 'g') AS t
           |  FROM (SELECT doc_id, text FROM documents
           |        UNION ALL
           |        SELECT * FROM (VALUES ${TextDedup.unicodePlantedValuesSql})
           |          v(doc_id, text))
           |  WHERE length(text) > 0""".stripMargin
      s"WITH ${charMinhashCtesFrom(t0)}\nSELECT d1, d2, est_jaccard FROM est"
    },

    "q354_multilingual_minhash" -> {
      val norm = graft.functions.NormalizeText.oracleSql("text")
      val t0 =
        s"""SELECT doc_id, regexp_replace($norm, '\\s+', ' ', 'g') AS t
           |  FROM (SELECT doc_id, text FROM documents
           |        UNION ALL
           |        SELECT * FROM (VALUES ${TextDedup.multilingualPlantedValuesSql})
           |          v(doc_id, text))
           |  WHERE length(text) > 0""".stripMargin
      s"WITH ${charMinhashCtesFrom(t0)}\nSELECT d1, d2, est_jaccard FROM est"
    },

    "q369_lsh_planner" -> NearDup.lshPlannerOracleSql(),

    "q370_dedup_lift" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |), cl AS (
        |  SELECT node, (min(lab) = node) AS keep FROM reach GROUP BY node
        |)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN cl.keep = false THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_dropped,
        |       CAST(sum(CASE WHEN cl.keep = false
        |                THEN CAST(d.n_chars AS BIGINT) ELSE 0 END)
        |         AS BIGINT) AS chars_dropped,
        |       CAST(sum(CASE WHEN cl.keep = false THEN 1 ELSE 0 END)
        |         * 1000000 // count(*) AS BIGINT) AS drop_micro
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.node
        |GROUP BY 1""".stripMargin,

    "q371_cluster_density" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |), cl AS (
        |  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
        |), m AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        |  FROM cl GROUP BY 1 HAVING count(*) > 1
        |), e AS (
        |  SELECT cl.cluster_id, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM fpairs JOIN cl ON fpairs.d1 = cl.node GROUP BY 1
        |)
        |SELECT m.cluster_id, n_members, n_edges,
        |       CAST(n_edges * 2000000 // (n_members * (n_members - 1))
        |         AS BIGINT) AS density_micro
        |FROM m JOIN e USING (cluster_id)""".stripMargin,

    // Clusters = connected components over the minhash near-dup pairs —
    // DuckDB recomputes the same min-reachable-label fixpoint with a
    // recursive CTE that Spark reaches by iterative label propagation.
    "q37_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |)
        |SELECT node AS doc_id, min(lab) AS cluster_id,
        |       (min(lab) = node) AS keep
        |FROM reach GROUP BY node""".stripMargin,

    // q25's ranked-cosine oracle with the band filter before the rank.

    // Naive per-doc split CASE joined to both pair sides.
    "q143_split_leak_pairs" ->
      s"""WITH $minhashCtes, sp AS (
        |  SELECT doc_id,
        |         ${graft.ops.Sampling.splitCaseSql("doc_id",
             clusterSplitSalt, clusterSplitFracs)} AS split
        |  FROM documents
        |)
        |SELECT d1, d2, s1.split AS split1, s2.split AS split2, est_jaccard
        |FROM est
        |JOIN sp s1 ON d1 = s1.doc_id
        |JOIN sp s2 ON d2 = s2.doc_id
        |WHERE est_jaccard >= 0.5 AND s1.split <> s2.split""".stripMargin,

    // Same recursive-closure clusters as q37; docs outside every cluster
    // key the split CASE by their own id (the coalesce).
    "q135_cluster_split" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |), clusters AS (
        |  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
        |)
        |SELECT d.doc_id,
        |       coalesce(c.cluster_id, d.doc_id) AS cluster_key,
        |       ${graft.ops.Sampling.splitCaseSql(
             "coalesce(c.cluster_id, d.doc_id)", clusterSplitSalt,
             clusterSplitFracs)} AS split
        |FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node""".stripMargin,

    "q90_cluster_reps" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |), clusters AS (
        |  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
        |), scored AS (
        |  SELECT c.cluster_id, d.doc_id,
        |         CAST(len(list_filter(string_split_regex(lower(d.text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM clusters c JOIN documents d ON c.node = d.doc_id
        |)
        |SELECT cluster_id, doc_id, n_tokens,
        |       (row_number() OVER (PARTITION BY cluster_id
        |          ORDER BY n_tokens DESC, doc_id) = 1) AS rep
        |FROM scored""".stripMargin,

    "q72_dedup_report" ->
      s"""WITH RECURSIVE $minhashCtes, fpairs AS (
        |  SELECT d1, d2 FROM est WHERE est_jaccard >= 0.5
        |), sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM fpairs
        |  UNION
        |  SELECT d2 AS src, d1 AS dst FROM fpairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
        |), clusters AS (
        |  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
        |), szs AS (
        |  SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY 1
        |)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_docs_clustered,
        |       count(*) AS n_clusters,
        |       CAST(sum(sz) - count(*) AS BIGINT) AS n_removed,
        |       max(sz) AS max_cluster_size
        |FROM szs""".stripMargin,

    "q28_simhash" ->
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(toks) AS token
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), h AS (
        |  SELECT doc_id, ${Hash64.duckSql("token")} AS h FROM tok
        |), bitsum AS (
        |  SELECT doc_id, p.pos AS pos,
        |         sum(CASE WHEN (h >> p.pos) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(range(0, 60)) AS pos) p
        |  GROUP BY 1, 2
        |), sigs AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT)
        |           AS simhash
        |  FROM bitsum GROUP BY 1
        |), banded AS (
        |  SELECT doc_id, simhash, b.band AS band,
        |         (simhash >> b.boff) & b.bmask AS band_bits
        |  FROM sigs, $simhashBandsSql
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
        |)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= $simhashRadius""".stripMargin,

    "q296_bbit_minhash" ->
      s"""WITH $minhashCtes
         |SELECT est.d1, est.d2, est.est_jaccard,
         |       CAST(len(list_filter(list_zip(s1.sig, s2.sig),
         |         p -> p[1] % 2 = p[2] % 2)) AS BIGINT) AS bit_agree,
         |       2.0 * (CAST(len(list_filter(list_zip(s1.sig, s2.sig),
         |         p -> p[1] % 2 = p[2] % 2)) AS DOUBLE) / 16 - 0.5)
         |         AS est_jaccard_1bit
         |FROM est JOIN sig s1 ON est.d1 = s1.doc_id
         |         JOIN sig s2 ON est.d2 = s2.doc_id""".stripMargin,
  )
}
