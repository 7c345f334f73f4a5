package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact

/** The data-quality / audit / privacy / evaluation family over the
  * TPC-H-ish tables: column profiling and expectations, id-gap and
  * FK-orphan audits, Benford and FD checks, k-anonymity/l-diversity/
  * randomized-response/DP-histogram privacy, clustering and ranking
  * evaluation (ARI, B-cubed, rec-list audit), price index and
  * reconciliation, sketch quantiles, skyline and ABC classification.
  * Split from [[Relational]] (round 10) purely mechanically -- query
  * names, semantics, and oracles unchanged.
  */
object Audits extends QueryModule {

  /** q57/q71's audited column lists (shared with the oracle). */
  private val profileCols = Relational.profileCols

  /** q237's bipartite node offset (shared with [[Relational]]'s q63). */
  private val supplierNodeOffset = Relational.supplierNodeOffset

  /** q246's field model — the [[Relational]] definition, one source. */
  private val fsFields = Relational.fsFields

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Column profiling: per-column null/distinct/min/max quality stats in
    // one aggregation pass over the events stream's landing table.
    "q57_profile" -> ((s, dir) =>
      graft.ops.Profiling.profile(Tables(s, dir).events, profileCols)),

    // k-anonymity audit on (nation, market segment) as the released
    // quasi-identifier pair: every combination shared by fewer than 5
    // customers is a re-identification risk. The suppression transform
    // (Integrity.kAnonymize) is the enforcing sibling, spec-covered.
    "q122_k_anonymity" -> ((s, dir) =>
      graft.ops.Integrity.kAnonymityViolations(Tables(s, dir).customer,
        Seq("c_nationkey", "c_mktsegment"), k = 5)),

    // k-anonymity GENERALIZATION: q122's audit turned into the
    // enforcing transform — account-balance bands coarsen up a fixed
    // 2^g ladder until every (segment, band) group holds >= 5 rows,
    // residual small groups suppressed; fully relational level choice.
    "q376_k_generalize" -> ((s, dir) =>
      graft.ops.Privacy.generalizeToK(Tables(s, dir).customer,
        "c_custkey", "c_mktsegment",
        expr("CAST(round(c_acctbal * 100) AS LONG)"), k = 5L,
        base = 10000L)),

    // Randomized-response LDP release (Warner): per market segment, the
    // perturbed count of high-balance customers (truth prob 3/4 →
    // ε ≈ 1.1) plus the integer-exact debiased estimate — the RELEASE
    // sibling of q122's audit. One projection + one keyed aggregation.
    "q320_randomized_response" -> ((s, dir) =>
      graft.ops.Privacy.randomizedResponseCounts(
        Tables(s, dir).customer, Seq("c_mktsegment"),
        bit = (col("c_acctbal") > 0).cast("long"),
        id = col("c_custkey"), pNum = 3L, pDen = 4L, salt = "rr-v1")),

    // Central-DP histogram release: (source, lang) counts + truncated
    // geometric (discrete Laplace) noise, ε = ln 2, K = 16 — the
    // inverse CDF runs over exact integer cumulative weights inlined
    // as literals and a portable keyed-hash uniform, so both engines
    // draw the identical noise (no exp/ln at query time, the q369
    // libm lesson). The central-DP sibling of q320's local mechanism.
    "q395_dp_histogram" -> ((s, dir) =>
      graft.ops.Privacy.geometricNoisyCounts(
        Tables(s, dir).documents, Seq("source", "lang"),
        salt = "dp-v1")),

    // Clustering-depth audit: would a ship-date predicate skip files?
    // Per-file [min,max] key intervals -> endpoint-sweep depth
    // histogram (file-cardinality frames only). The ingestion-ordered
    // layout (orderkey chunks) overlaps deeply on the date key; the
    // month-partitioned layout reads 1 file per point by construction
    // — the number that decides whether to re-cluster before a 100 TB
    // scan.
    "q423_clustering_depth" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .withColumn("__day",
          expr("datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')")
            .cast("long"))
      def hist(file: org.apache.spark.sql.Column, label: String) =
        graft.ops.Layout.clusteringDepthHistogram(li, file, col("__day"))
          .withColumn("layout", lit(label))
      hist(expr("l_orderkey div 512"), "ingest")
        .unionByName(hist(
          expr("year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE))"),
          "bymonth"))
    }),

    // Z-order pruning effectiveness: q423's depth metric run over BOTH
    // dimensions of two layouts. Read depth against n_files: a point
    // predicate reads depth-of-point files of n_files total. The
    // partkey-partitioned layout is perfect on partkey (depth 1) and
    // unprunable on suppkey (depth = n_files); Morton tiles (zkey>>6 —
    // a real write layout, no global sort) pay a little on partkey to
    // make suppkey predicates skip about half the files. The
    // measurement that justifies q64's key on multi-predicate tables.
    "q442_zorder_pruning" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem.select(
        col("l_partkey"), col("l_suppkey"),
        graft.functions.Morton.morton(col("l_partkey"), col("l_suppkey"))
          .as("__z"))
      def hist(file: org.apache.spark.sql.Column, key: String,
          layout: String) =
        graft.ops.Layout.clusteringDepthHistogram(li, file, col(key))
          .withColumn("layout", lit(layout))
          .withColumn("dim", lit(key))
          .crossJoin(broadcast(li.agg(
            countDistinct(file).as("n_files"))))
      hist(expr("l_partkey div 8"), "l_partkey", "bypart")
        .unionByName(hist(expr("l_partkey div 8"), "l_suppkey", "bypart"))
        .unionByName(hist(expr("__z div 64"), "l_partkey", "zorder"))
        .unionByName(hist(expr("__z div 64"), "l_suppkey", "zorder"))
    }),

    // t-closeness audit — the third rung of the privacy-audit ladder
    // over the SAME quasi-identifier pair as q122 (k-anonymity) and
    // q232 (l-diversity): groups whose balance-band DISTRIBUTION
    // diverges from the table-wide mix (ordered EMD, exact integer
    // ledger) leak through the skewness attack the other two miss.
    "q415_t_closeness" -> ((s, dir) =>
      graft.ops.Integrity.tClosenessAudit(Tables(s, dir).customer,
        Seq("c_nationkey", "c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS LONG)"))),

    // Central-DP MEAN release by quantize-then-noise: per-source mean
    // document length with per-doc contribution clamped to 2000 chars,
    // the clamped sum floor-divided by the clamp BEFORE unit geometric
    // noise lands (sensitivity-1 statistic — no mod-clamp residue of
    // the true sum survives into the release), independent count draw,
    // one IEEE division of the released integers — the numeric sibling
    // of q395's histogram, same portable BigInt noise ladder.
    "q416_dp_mean" -> ((s, dir) =>
      graft.ops.Privacy.geometricNoisySumMean(Tables(s, dir).documents,
        Seq("source"), col("n_chars"), clampHi = 2000L,
        salt = "dpm-v1")),

    // DP top-k selection (report-noisy-max): the five biggest
    // (source, lang) cells by count + geometric noise — only noisy
    // scores and ranks ship, true counts stay unpublished; the
    // selection face of q395's full-histogram release.
    "q417_noisy_topk" -> ((s, dir) =>
      graft.ops.Privacy.noisyTopK(Tables(s, dir).documents,
        Seq("source", "lang"), k = 5, salt = "dpk-v1")),

    // Bloom-filter semi-join reduction: lineitem ⋉ urgent orders with
    // the fact scan pre-filtered by a 16 KB literal bitset (portable
    // hash family, codegen'd bit probes) — the confirm join removes
    // false positives, so the result is EXACTLY the semi join while the

    // Id-space continuity audit: per fixed-width key bucket, how many
    // ids inside the bucket's OBSERVED span are missing — the dropped-
    // event / partial-load detector for sequence-keyed feeds, here run
    // on the fulfilled-order stream (the landed subset whose holes are
    // the rows an export would silently lose). Pure bucketed
    // aggregation: bucket-local spans keyed by `id div width` scale
    // embarrassingly, where the islands-and-gaps row_number trick would
    // global-sort the key space.
    "q170_id_gaps" -> ((s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"))
        .withColumn("bucket", expr("k div 256"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("present"),
          min(col("k")).as("span_min"), max(col("k")).as("span_max"))
        .withColumn("span", col("span_max") - col("span_min") + 1)
        .withColumn("missing_in_span", col("span") - col("present"))
        .filter(col("missing_in_span") > 0)),

    // Referential-integrity audit over the star schema's declared FKs:
    // child keys aggregated to distinct-with-multiplicity BEFORE the
    // anti-join existence probe (shuffle the key directory, not the
    // fact table). TPC-H-consistent data ⇒ all four pass — the audit
    // proving that is the product.
    "q171_fk_orphans" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.ops.Integrity.fkAudit(Seq(
        ("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey",
          t.orders, "o_orderkey"),
        ("lineitem.l_partkey->part", t.lineitem, "l_partkey",
          t.part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", t.lineitem, "l_suppkey",
          t.supplier, "s_suppkey"),
        ("orders.o_custkey->customer", t.orders, "o_custkey",
          t.customer, "c_custkey")))
    }),

    // Benford first-digit audit on order totals (a metric spanning
    // magnitudes): observed digit fractions vs the literal Benford
    // expectation, integer counts + one fixed IEEE derivation sequence.
    "q172_benford" -> ((s, dir) =>
      graft.ops.Profiling.benfordAudit(Tables(s, dir).orders,
        Exact.cents(col("o_totalprice")))),

    // Join-explosion pre-flight: exact output cardinality of the
    // lineitem part-key self-join plus the keys that dominate it —
    // the "will this join multiply to 10^12" check, priced at two key
    // directories.
    "q211_join_explosion" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      graft.ops.Skew.joinExplosionReport(li, "l_partkey", li, "l_partkey",
        topK = 10)
    }),

    // Deterministic negative-edge sampling on the co-purchase graph:
    // hash-chosen non-neighbors per node via the dense-index recipe,
    // existing edges anti-joined out — the contrast set link-prediction
    // training needs, reproducible on every run.
    "q208_negative_samples" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"),
          col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
        .select(col("src"), col("dst"))
      graft.ops.LinkPredict.negativeSamples(edges, "src", "dst", k = 3)
    }),

    // Functional-dependency audit: part → supplier violations (TPC-H
    // parts ship from several suppliers by design — the audit lists
    // every such part with its supplier cardinality).
    "q219_fd_violations" -> ((s, dir) =>
      graft.ops.Integrity.fdViolations(Tables(s, dir).lineitem,
        Seq("l_partkey"), "l_suppkey")),

    // Market-basket association rules over order line items: pair
    // support/confidence/lift, fan-out bounded by basket size (never
    // corpus²), min-support prune before the stats join.
    "q185_basket_rules" -> ((s, dir) =>
      graft.ops.Basket.associationRules(Tables(s, dir).lineitem,
        "l_orderkey", "l_partkey", minSupport = 2L)),

    // Data-quality gate: row-level expectations in one pass, a verdict
    // row per check (the publish gate a pipeline runs before a table
    // goes live). value_in_range is INTENTIONALLY violated by design of
    // the corpus (values reach ~300) so both verdicts appear.
    "q71_expectations" -> ((s, dir) =>
      graft.ops.Profiling.expectations(Tables(s, dir).events, Seq(
        "value_non_negative" -> (col("value") >= 0),
        "value_in_range" -> (col("value") < 150),
        "event_type_in_domain" ->
          col("event_type").isin("signup", "view", "click", "purchase", "error"),
        "user_id_present" -> col("user_id").isNotNull))),

    // Customer value frontier: customers no one beats on BOTH order
    // count and total spend — the two-criteria shortlist q04's weighted
    // score can't give without baking in a trade-off rate. Dominance
    // scan over the distinct-(x,y) histogram, never a global row sort.
    "q221_skyline" -> ((s, dir) => {
      val per = Tables(s, dir).orders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Exact.cents(col("o_totalprice"))).as("spend_cents"))
      graft.ops.Pareto.skylineMax(per, "n_orders", "spend_cents")
    }),

    // Fellegi–Sunter probabilistic linkage: a perturbed customer slice
    // re-linked against the base by summed per-field log-odds weights
    // (phone rare → heavy, segment common → light), nation-blocked;
    // only pairs above threshold surface. The principled upgrade over
    // q70's single-similarity gate.
    "q246_fs_linkage" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      def prep(df: org.apache.spark.sql.DataFrame) = df.select(
        col("id"), col("blk"), col("name"), col("seg"), col("band"))
      val clean = prep(c.select(col("c_custkey").as("id"),
        col("c_nationkey").as("blk"), col("c_name").as("name"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal / 1000) AS LONG)").as("band")))
      val dirty = prep(c.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000L).as("id"),
          col("c_nationkey").as("blk"), col("c_name").as("name"),
          when(col("c_custkey") % 20 === 0, lit("NOSEG"))
            .otherwise(col("c_mktsegment")).as("seg"),
          expr("CAST(floor(c_acctbal / 1000) AS LONG)").as("band")))
      graft.ops.Linkage.fellegiSunter(dirty, clean, "id", "blk",
          fsFields, thresholdMicro = 8000000L)
        .filter(col("is_match"))
    }),

    // Kish effective sample size: what lineitem's quantity-weighted
    // rows are worth in unweighted terms, and the design-effect
    // variance price — the number every weighted estimate should carry.
    "q306_effective_n" -> ((s, dir) =>
      graft.ops.Sampling.effectiveSampleSize(
        Tables(s, dir).lineitem, col("l_quantity").cast("long"))),

    // Per-column entropy profile: key-ness/compressibility ranking
    // the bare NDV in q57's profile muddles — a 99/1 binary column and
    // a 50/50 one read the same NDV, very different entropy.
    "q282_column_entropy" -> ((s, dir) =>
      graft.ops.Profiling.columnEntropy(
        Tables(s, dir).orders.select(col("o_orderstatus"),
          col("o_orderpriority"), col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS LONG) div 1000000")
            .as("band")),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey", "band"))),

    // Adjusted Rand Index: did q104's label-prop communities recover
    // the nation segmentation on customer nodes? Chance-corrected,
    // computed from the label contingency — label-pair arithmetic,
    // never item pairs.
    "q280_ari" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + supplierNodeOffset).as("dst"))
      val labels = graft.ops.PageRank.labelPropagation(edges, "src", "dst")
        .filter(col("node") < supplierNodeOffset)
        .join(t.customer.select(col("c_custkey").as("node"),
          col("c_nationkey")), "node")
      graft.ops.Features.adjustedRandIndex(labels,
        col("community"), col("c_nationkey"))
    }),

    // B-cubed precision/recall of the SAME clustering q280 scores with
    // ARI: per-item averaging — a mega-cluster error costs exactly its
    // member share, the failure mode pair-counting metrics mute. One
    // contingency aggregation; per-cell terms exact integer micros.
    "q338_bcubed" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + supplierNodeOffset).as("dst"))
      val labels = graft.ops.PageRank.labelPropagation(edges, "src", "dst")
        .filter(col("node") < supplierNodeOffset)
        .join(t.customer.select(col("c_custkey").as("node"),
          col("c_nationkey")), "node")
      graft.ops.Eval.bCubed(labels, "community", "c_nationkey")
    }),

    // Laspeyres price index by ship-month: what the first month's
    // basket would cost later — mix-shift-proof inflation series a
    // raw average price muddles; integer milli-cent unit prices.
    "q274_price_index" -> ((s, dir) =>
      graft.ops.Rollups.priceIndex(
        Tables(s, dir).lineitem,
        periodCol = expr(
          "CAST(year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) AS LONG)"),
        itemCol = col("l_partkey"),
        qty = col("l_quantity").cast("long"),
        extCents = Exact.cents(col("l_extendedprice")))),

    // Header/detail reconciliation: does o_totalprice equal the sum of
    // its lines' extended prices — per-order cent diffs rolled into
    // relative-error ppm buckets; the "does the money add up" audit
    // q171's key-existence FK check can't make.
    "q275_reconciliation" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.ops.Integrity.aggConsistency(
        t.orders.select(col("o_orderkey"),
          Exact.cents(col("o_totalprice")).as("ht")),
        t.lineitem.select(col("l_orderkey").as("o_orderkey"),
          Exact.cents(col("l_extendedprice")).as("da")),
        Seq("o_orderkey"), col("ht"), col("da"))
    }),

    // Per-row surprisal triage: Σ bit-length information content over
    // (status, priority, price band) — the most unusual orders, read
    // natively off categoricals; q199's numeric Mahalanobis can't.
    "q265_row_surprisal" -> ((s, dir) =>
      graft.ops.Profiling.rowSurprisal(
        Tables(s, dir).orders.select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          expr("CAST(round(o_totalprice * 100) AS LONG) div 1000000")
            .as("band")),
        "o_orderkey", Seq("o_orderstatus", "o_orderpriority", "band"),
        k = 50)),

    // Volume-weighted price quantiles per return flag: the price under
    // which half the QUANTITY trades — what q40's row-count quantiles
    // misstate whenever weight correlates with value.
    // GLOBAL exact quantiles via iterative histogram bisection: the
    // whole-column selection q40's per-group window cannot scale to —
    // no sort, no data shuffle, ≤3 counting scans for cents-scale
    // ranges; same rank-⌈num·n/den⌉ semantics, so the oracle is the
    // plain window recomputation.
    "q327_global_quantiles" -> ((s, dir) =>
      graft.ops.Quantiles.exactGlobalRatio(
        Tables(s, dir).lineitem, Exact.cents(col("l_extendedprice")),
        ps = Seq((1, 2), (9, 10), (99, 100)))),

    // Log-bucket quantile SKETCH on q327's exact metric: bounded-state
    // one-pass histogram (≤ 64·2^6 + 1 integer-shift buckets, trivially
    // mergeable) answering the same ranks with honest value bounds
    // [est_lo, est_hi], relative error ≤ 2^-6 by construction — the
    // 100 TB single-scan form beside the ≤3-scan exact bisection.
    "q367_logbucket_quantiles" -> ((s, dir) =>
      graft.ops.Quantiles.logBucketQuantiles(
        Tables(s, dir).lineitem, Exact.cents(col("l_extendedprice")),
        ps = Seq((1, 2), (9, 10), (99, 100)))),

    // q367's sketch, KEYED — "p50/p90/p99 per return flag": the shape
    // the bounded-state sketch exists for at 100 TB (per-key state ≤
    // 64·2^j + 2 buckets, per-group windows over bucket histograms,
    // never a row sort).
    "q386_logbucket_by" -> ((s, dir) =>
      graft.ops.Quantiles.logBucketQuantilesBy(
        Tables(s, dir).lineitem
          .withColumn("__v0", Exact.cents(col("l_extendedprice"))),
        Seq("l_returnflag"), col("__v0"),
        ps = Seq((1, 2), (9, 10), (99, 100)))),

    "q258_weighted_quantiles" -> ((s, dir) =>
      graft.ops.Quantiles.weightedQuantiles(
        Tables(s, dir).lineitem.select(col("l_returnflag"),
          Exact.cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w")),
        Seq("l_returnflag"), col("v"), col("w"),
        ps = Seq((1, 4), (1, 2), (9, 10)))),

    // Recommendation-list audit over q239's neighborhoods: catalog
    // coverage + intra-list similarity — the two degenerate-recommender
    // detectors (popularity collapse, near-duplicate lists).
    "q254_rec_audit" -> ((s, dir) =>
      graft.ops.Basket.recListAudit(
        Tables(s, dir).lineitem.select(col("l_orderkey"),
          col("l_partkey")),
        "l_orderkey", "l_partkey", k = 5)),

    // Item-item cosine neighborhoods over order baskets: top-5 "also
    // bought" parts per part — the normalized neighbor weight q185's
    // lift distorts toward rare coincidences; co-occurrence only
    // through shared orders (basket-size-bounded fan-out).
    "q239_item_item" -> ((s, dir) =>
      graft.ops.Basket.itemCosineTopK(
        Tables(s, dir).lineitem.select(col("l_orderkey"),
          col("l_partkey")),
        "l_orderkey", "l_partkey", k = 5)),

    // Incremental PageRank: refine the stored 3-iteration ranks with
    // ONE sweep after adding reversed urgent-order edges — the graph
    // face of the q89 incremental-maintenance contract; the refinement
    // costs one iteration no matter how many built the base.
    "q237_incr_pagerank" -> ((s, dir) => {
      val t = Tables(s, dir)
      val joined = t.orders.join(t.lineitem,
        col("o_orderkey") === col("l_orderkey"))
      val edges = joined.select(col("o_custkey").as("src"),
        (col("l_suppkey") + supplierNodeOffset).as("dst"))
      val delta = joined.filter(col("o_orderpriority") === "1-URGENT")
        .select((col("l_suppkey") + supplierNodeOffset).as("src"),
          col("o_custkey").as("dst"))
      graft.ops.PageRank.incrementalPageRank(edges, delta, "src", "dst")
    }),

    // l-diversity audit on top of q122's k-anonymity: quasi-identifier
    // groups whose "balance band" sensitive value is near-homogeneous —
    // the homogeneity attack k-anonymity alone cannot see.
    "q232_l_diversity" -> ((s, dir) =>
      graft.ops.Integrity.lDiversityViolations(
        Tables(s, dir).customer
          .withColumn("bal_band",
            expr("CAST(floor(c_acctbal / 1000) AS LONG)")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 5L)),

    // ABC classification of parts by revenue: A = head carrying 80 % of
    // total, B = next 15 %, C = tail — q201's Gini says "concentrated",
    // this says WHICH parts are the concentration. Integer
    // cross-multiplied class tests over the distinct-revenue histogram.
    "q225_abc_class" -> ((s, dir) => {
      val rev = Tables(s, dir).lineitem.groupBy(col("l_partkey"))
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("rev_cents"))
      graft.ops.Quantiles.abcClassify(rev, "l_partkey", "rev_cents")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q57_profile" ->
      graft.ops.Profiling.profileOracleSql("events", profileCols),

    "q395_dp_histogram" -> graft.ops.Privacy.geometricNoisyCountsOracleSql(
      "documents", Seq("source", "lang"), salt = "dp-v1"),

    "q423_clustering_depth" -> {
      def one(fileSql: String, label: String) =
        s"""SELECT *, '$label' AS layout FROM (
           |${graft.ops.Layout.clusteringDepthOracleSql(
              s"""SELECT $fileSql AS f,
                 |       datediff('day', DATE '1992-01-01',
                 |         CAST(l_shipdate AS DATE)) AS k
                 |FROM lineitem""".stripMargin)}
           |)""".stripMargin
      one("l_orderkey // 512", "ingest") + "\nUNION ALL\n" +
        one("year(CAST(l_shipdate AS DATE)) * 12 + " +
          "month(CAST(l_shipdate AS DATE))", "bymonth")
    },

    "q442_zorder_pruning" -> {
      val z = graft.functions.Morton.duckSql("l_partkey", "l_suppkey")
      def one(fileSql: String, key: String, layout: String) =
        s"""SELECT *, '$layout' AS layout, '$key' AS dim,
           |       (SELECT CAST(count(DISTINCT $fileSql) AS BIGINT)
           |        FROM lineitem) AS n_files
           |FROM (
           |${graft.ops.Layout.clusteringDepthOracleSql(
              s"SELECT $fileSql AS f, $key AS k FROM lineitem")}
           |)""".stripMargin
      Seq(
        one("l_partkey // 8", "l_partkey", "bypart"),
        one("l_partkey // 8", "l_suppkey", "bypart"),
        one(s"($z) // 64", "l_partkey", "zorder"),
        one(s"($z) // 64", "l_suppkey", "zorder"))
        .mkString("\nUNION ALL\n")
    },

    "q415_t_closeness" -> graft.ops.Integrity.tClosenessOracleSql(
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
        |FROM customer""".stripMargin,
      Seq("c_nationkey", "c_mktsegment")),

    "q416_dp_mean" -> graft.ops.Privacy.geometricNoisySumMeanOracleSql(
      "documents", Seq("source"), "n_chars", clampHi = 2000L,
      salt = "dpm-v1"),

    "q417_noisy_topk" -> graft.ops.Privacy.noisyTopKOracleSql(
      "documents", Seq("source", "lang"), k = 5, salt = "dpk-v1"),

    "q376_k_generalize" -> graft.ops.Privacy.generalizeToKOracleSql(
      """SELECT c_custkey, c_mktsegment,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |FROM customer""".stripMargin,
      "c_custkey", "c_mktsegment", k = 5L, base = 10000L),

    "q122_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_n
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(*) < 5""".stripMargin,

    "q386_logbucket_by" -> graft.ops.Quantiles.logBucketByOracleSql(
      """SELECT l_returnflag,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |FROM lineitem""".stripMargin,
      Seq("l_returnflag"), ps = Seq((1, 2), (9, 10), (99, 100))),

    "q367_logbucket_quantiles" -> graft.ops.Quantiles.logBucketOracleSql(
      "SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem",
      ps = Seq((1, 2), (9, 10), (99, 100))),

    "q327_global_quantiles" ->
      """WITH r AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
        |s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM r)
        |SELECT nn.n,
        |       (SELECT v FROM s WHERE rn = (1 * nn.n + 1) // 2) AS p50,
        |       (SELECT v FROM s WHERE rn = (9 * nn.n + 9) // 10) AS p90,
        |       (SELECT v FROM s WHERE rn = (99 * nn.n + 99) // 100) AS p99
        |FROM nn""".stripMargin,

    "q320_randomized_response" ->
      graft.ops.Privacy.randomizedResponseOracleSql("customer",
        Seq("c_mktsegment"), bitSql = "CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END",
        idSql = "c_custkey", pNum = 3L, pDen = 4L, salt = "rr-v1"),

    // The bloom prefilter is an implementation detail; the CONTRACT is

    "q170_id_gaps" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderkey // 256 AS bucket FROM orders
        |  WHERE o_orderstatus = 'F'
        |), g AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS present,
        |         CAST(min(k) AS BIGINT) AS span_min,
        |         CAST(max(k) AS BIGINT) AS span_max
        |  FROM b GROUP BY 1
        |)
        |SELECT bucket, present, span_min, span_max,
        |       span_max - span_min + 1 AS span,
        |       span_max - span_min + 1 - present AS missing_in_span
        |FROM g
        |WHERE span_max - span_min + 1 - present > 0""".stripMargin,

    "q171_fk_orphans" -> graft.ops.Integrity.fkAuditOracleSql(Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"))),

    "q172_benford" -> graft.ops.Profiling.benfordOracleSql(
      "orders", "CAST(round(o_totalprice * 100) AS BIGINT)"),

    "q185_basket_rules" -> graft.ops.Basket.associationRulesOracleSql(
      "lineitem", "l_orderkey", "l_partkey", minSupport = 2L),

    "q211_join_explosion" -> graft.ops.Skew.joinExplosionOracleSql(
      "lineitem", "l_partkey", "lineitem", "l_partkey", topK = 10),

    "q208_negative_samples" -> graft.ops.LinkPredict
      .negativeSamplesOracleSql(
        """SELECT a.l_partkey AS src, b.l_partkey AS dst
          |FROM lineitem a
          |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          |              AND a.l_partkey < b.l_partkey
          |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin, k = 3),

    "q219_fd_violations" -> graft.ops.Integrity.fdViolationsOracleSql(
      "lineitem", Seq("l_partkey"), "l_suppkey"),

    "q71_expectations" ->
      graft.ops.Profiling.expectationsOracleSql("events", Seq(
        "value_non_negative" -> "value >= 0",
        "value_in_range" -> "value < 150",
        "event_type_in_domain" ->
          "event_type IN ('signup', 'view', 'click', 'purchase', 'error')",
        "user_id_present" -> "user_id IS NOT NULL")),

    "q221_skyline" -> graft.ops.Pareto.skylineMaxOracleSql(
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |         AS BIGINT) AS spend_cents
        |FROM orders GROUP BY 1""".stripMargin,
      "n_orders", "spend_cents"),

    "q246_fs_linkage" -> {
      val aSql =
        """SELECT c_custkey + 1000000 AS id, c_nationkey AS blk,
          |       c_name AS name,
          |       CASE WHEN c_custkey % 20 = 0 THEN 'NOSEG'
          |            ELSE c_mktsegment END AS seg,
          |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
          |FROM customer WHERE c_custkey % 10 = 0""".stripMargin
      val bSql =
        """SELECT c_custkey AS id, c_nationkey AS blk, c_name AS name,
          |       c_mktsegment AS seg,
          |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
          |FROM customer""".stripMargin
      s"""SELECT * FROM (
         |${graft.ops.Linkage.fellegiSunterOracleSql(aSql, bSql, "id",
              fsFields, 8000000L)}
         |) WHERE is_match""".stripMargin
    },

    "q239_item_item" -> graft.ops.Basket.itemCosineOracleSql(
      "SELECT l_orderkey AS b, l_partkey AS i FROM lineitem", k = 5),

    "q306_effective_n" -> graft.ops.Sampling.effectiveSampleSizeOracleSql(
      "SELECT CAST(l_quantity AS BIGINT) AS w FROM lineitem"),

    "q282_column_entropy" -> graft.ops.Profiling.columnEntropyOracleSql(
      """(SELECT o_orderstatus, o_orderpriority, o_custkey,
        |        CAST(round(o_totalprice * 100) AS BIGINT) // 1000000
        |          AS band
        | FROM orders)""".stripMargin,
      Seq("o_orderstatus", "o_orderpriority", "o_custkey", "band")),

    "q280_ari" -> graft.ops.Features.ariOracleSql(
      s"""WITH lp AS (${graft.ops.PageRank.labelPropagationOracleSql(
           s"""SELECT o_custkey AS src, l_suppkey + $supplierNodeOffset AS dst
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin)})
         |SELECT lp.community AS a, c_nationkey AS b
         |FROM lp JOIN customer ON lp.node = c_custkey
         |WHERE lp.node < $supplierNodeOffset""".stripMargin),

    "q338_bcubed" -> graft.ops.Eval.bCubedOracleSql(
      s"""WITH lp AS (${graft.ops.PageRank.labelPropagationOracleSql(
           s"""SELECT o_custkey AS src, l_suppkey + $supplierNodeOffset AS dst
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin)})
         |SELECT lp.community AS c, c_nationkey AS g
         |FROM lp JOIN customer ON lp.node = c_custkey
         |WHERE lp.node < $supplierNodeOffset""".stripMargin),

    "q274_price_index" -> graft.ops.Rollups.priceIndexOracleSql(
      """SELECT year(CAST(l_shipdate AS DATE)) * 12
        |         + month(CAST(l_shipdate AS DATE)) AS p,
        |       l_partkey AS i, CAST(l_quantity AS BIGINT) AS q,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS e
        |FROM lineitem""".stripMargin),

    "q275_reconciliation" -> graft.ops.Integrity.aggConsistencyOracleSql(
      """SELECT o_orderkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS ht
        |FROM orders""".stripMargin,
      """SELECT l_orderkey AS o_orderkey,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS da
        |FROM lineitem""".stripMargin,
      Seq("o_orderkey")),

    "q265_row_surprisal" -> graft.ops.Profiling.rowSurprisalOracleSql(
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |       CAST(round(o_totalprice * 100) AS BIGINT) // 1000000
        |         AS band
        |FROM orders""".stripMargin,
      "o_orderkey", Seq("o_orderstatus", "o_orderpriority", "band"),
      k = 50),

    "q258_weighted_quantiles" ->
      graft.ops.Quantiles.weightedQuantilesOracleSql(
        """SELECT l_returnflag,
          |       CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
          |       CAST(l_quantity AS BIGINT) AS w
          |FROM lineitem""".stripMargin,
        Seq("l_returnflag"), ps = Seq((1, 4), (1, 2), (9, 10))),

    "q254_rec_audit" -> graft.ops.Basket.recListAuditOracleSql(
      "SELECT l_orderkey AS b, l_partkey AS i FROM lineitem", k = 5),

    "q237_incr_pagerank" ->
      graft.ops.PageRank.incrementalPageRankOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + $supplierNodeOffset AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        s"""SELECT l_suppkey + $supplierNodeOffset AS src, o_custkey AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE o_orderpriority = '1-URGENT'""".stripMargin),

    "q232_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS group_n,
        |       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |         AS BIGINT) AS n_sensitive
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 5
        |""".stripMargin,

    "q225_abc_class" -> graft.ops.Quantiles.abcClassifyOracleSql(
      """SELECT l_partkey,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS rev_cents
        |FROM lineitem GROUP BY 1""".stripMargin,
      "l_partkey", "rev_cents"),
  )
}
