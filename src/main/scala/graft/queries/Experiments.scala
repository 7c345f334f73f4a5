package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Experimentation, evaluation, and user-journey family over the
  * events table: A/B testing (proportion/chi-square/CUPED/power,
  * diff-in-diff, event study, CEM), ranking/classifier eval (ROC, PR,
  * nDCG, MRR, MAP, lift/Qini), causal attribution (position rules +
  * Markov removal effect), and lifecycle analytics (funnels,
  * retention, sessionization, RFM, survival, growth accounting).
  * Split from [[Analytics]] (round 8) purely mechanically — query
  * names, semantics, and oracles unchanged.
  */
object Experiments extends QueryModule {

  /** q398: the versioned customer dimension with a planted RESTATEMENT
    * layer — v0 at valid_from 0, v1 at 1500 (+100 cents, recorded at tx
    * 2000), and for every third customer a CORRECTION of v1 (+101,
    * recorded later at tx 4000). A report as-known-at 3000 must use the
    * uncorrected v1; re-running as-known-at 5000 retroactively changes
    * those rows — the bitemporal contract, spec-asserted. */
  private def custVersions(t: Tables): DataFrame = {
    val base = t.customer.select(col("c_custkey").as("custkey"),
      Exact.cents(col("c_acctbal")).as("bal0"))
    base.select(col("custkey"), lit(0L).as("valid_from"),
        lit(0L).as("tx_from"), col("bal0").as("bal"))
      .unionAll(base.select(col("custkey"), lit(1500L).as("valid_from"),
        lit(2000L).as("tx_from"), (col("bal0") + 100L).as("bal")))
      .unionAll(base.filter(col("custkey") % 3 === 0)
        .select(col("custkey"), lit(1500L).as("valid_from"),
          lit(4000L).as("tx_from"), (col("bal0") + 101L).as("bal")))
  }

  private[queries] val custVersionsSql =
    """(WITH cb AS (
      |   SELECT c_custkey AS custkey,
      |          CAST(round(c_acctbal * 100) AS BIGINT) AS bal0
      |   FROM customer)
      | SELECT custkey, 0 AS valid_from, 0 AS tx_from, bal0 AS bal FROM cb
      | UNION ALL
      | SELECT custkey, 1500, 2000, bal0 + 100 FROM cb
      | UNION ALL
      | SELECT custkey, 1500, 4000, bal0 + 101 FROM cb
      | WHERE custkey % 3 = 0)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bitemporal as-of: orders enriched with the customer-dimension
    // version valid at fact time AS KNOWN AT tx 3000 — the planted
    // tx-4000 restatement must be invisible (valid-time axis = the q38
    // union-window plan; transaction axis = a scan filter + one keyed
    // max_by, never a 2D range join).
    "q398_bitemporal" -> ((s, dir) => {
      val t = Tables(s, dir)
      val facts = t.orders.select(col("o_orderkey"),
        col("o_custkey").as("custkey"),
        (col("o_orderkey") % 3000).as("ts"))
      graft.ops.AsOf.bitemporalJoin(facts, custVersions(t),
        Seq("custkey"), "ts", "valid_from", "tx_from", Seq("bal"),
        asKnownAt = 3000L)
    }),

    // Label-noise audit (the Cleanlab move): 3-fold cross-validated NB
    // self-classification flags suspect labels. The corpus lang/source
    // labels are text-independent by construction, so the gate plants
    // a learnable signal (a source token appended to every text) and
    // flips %17 labels — the audit must be ABLE to see them
    // (EvalSpec asserts the flipped slice disagrees en masse).
    "q399_label_noise" -> ((s, dir) => {
      val labeled = Tables(s, dir).documents.select(col("doc_id"),
        concat(col("text"),
          repeat(concat(lit(" srctok"), col("source")), 16)).as("text"),
        when(col("doc_id") % 17 === 0,
          when(col("source") === "src0", "src1").otherwise("src0"))
          .otherwise(col("source")).as("label"))
      graft.text.NaiveBayes.labelNoiseAudit(labeled, "doc_id", "label",
        "text")
    }),

    // Batch sessionization: 30-min inactivity gap splits per-user
    // streams into sessions (lag flag + running flag-sum, one keyed
    // shuffle), one row per session with span stats in exact integer
    // seconds.
    "q184_sessionize" -> ((s, dir) =>
      graft.ops.Journey.sessionize(Tables(s, dir).events,
        "user_id", "ts", "event_id", gapSeconds = 1800L)),


    // RFM segmentation: per-purchaser recency/frequency/monetary quintile
    // scores via the q84 histogram-cut machinery (value-cardinality-
    // bounded cut derivation + broadcast bin expressions) — NOT a global
    // ntile window, which would funnel every user through one sorted
    // partition at scale.
    "q186_rfm" -> ((s, dir) => {
      val qs = Seq((1, 5), (2, 5), (3, 5), (4, 5))
      val p = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("m"),
          Exact.cents(col("value")).as("cents"))
        .groupBy(col("user_id"))
        .agg(max(col("m")).as("last_m"), count(lit(1)).as("freq"),
          sum(col("cents")).as("monetary_cents"))
        .persist() // read 4× below (3 cut derivations + the binned base)
      val rCuts = Quantiles.histogramCuts(p, col("last_m"), qs)
      val fCuts = Quantiles.histogramCuts(p, col("freq"), qs)
      val mCuts = Quantiles.histogramCuts(p, col("monetary_cents"), qs)
      val binned = Quantiles.binByCuts(
        Quantiles.binByCuts(
          Quantiles.binByCuts(p, col("last_m"), rCuts, "r0"),
          col("freq"), fCuts, "f0"),
        col("monetary_cents"), mCuts, "m0")
      binned.select(col("user_id"), col("last_m"), col("freq"),
        col("monetary_cents"),
        (col("r0") + 1).as("r"), (col("f0") + 1).as("f"),
        (col("m0") + 1).as("m"),
        ((col("r0") + 1) * 100 + (col("f0") + 1) * 10 + col("m0") + 1)
          .as("rfm_code"))
    }),


    // A/B readout: deterministic unit split (user_id parity — the
    // hash-bucket arm assignment real frameworks use), two-sample pooled
    // proportion z per event type, two-sided 5% verdict.
    "q194_ab_test" -> ((s, dir) =>
      graft.ops.ABTest.proportionTest(Tables(s, dir).events,
        Seq("event_type"), pmod(col("user_id"), lit(2)) === 1,
        col("value") > 150)),


    // Observed-lifetime survival curve: engagement decay over whole-day
    // first-to-last spans; descending cumulative over the calendar-
    // bounded lifetime histogram.
    "q200_survival" -> ((s, dir) =>
      graft.ops.Journey.lifetimeSurvival(Tables(s, dir).events,
        "user_id", "ts")),


    // DAU / trailing-WAU stickiness: rolling distinct is not window-
    // expressible, so each (user, day) contributes itself to its 7
    // trailing report days (fixed fan-out) before one distinct+count.
    "q203_stickiness" -> ((s, dir) =>
      graft.ops.Journey.stickiness(Tables(s, dir).events,
        "user_id", "ts")),


    // Chi-square independence: is event_type related to the user's
    // parity cohort — contingency margins re-derived and broadcast,
    // per-cell terms trunc'd to portable integers before the sum.
    "q204_chi_square" -> ((s, dir) =>
      graft.ops.ABTest.chiSquareIndependence(
        Tables(s, dir).events
          .withColumn("cohort", pmod(col("user_id"), lit(3))),
        "event_type", "cohort")),


    // Benjamini–Hochberg FDR selection: which of the 20 sources'
    // short-doc rates really differ from the rest — m one-vs-rest 2x2
    // chi-squares (quantized, the q204 device), ranked against a
    // plan-minted critical ladder; the step-up rule runs integer-exact
    // at query time. The multiple-testing closure of the q204/q194
    // single-test family.
    "q421_fdr_bh" -> ((s, dir) =>
      graft.ops.ABTest.bhSelect(Tables(s, dir).documents,
        "source", (col("n_chars") < 300).cast("long"), m = 20)),

    // A-then-B-within-T: purchases within one hour of a click, per
    // user — the time-constrained funnel step; user-keyed join with the
    // range as a join predicate, fan-out activity-bounded.
    "q213_within_window" -> ((s, dir) =>
      graft.ops.Journey.withinWindowConversion(Tables(s, dir).events,
        "user_id", "event_type", "ts", "event_id",
        triggerType = "click", outcomeType = "purchase",
        windowSeconds = 3600L)),


    // Precision/recall/F1 at every distinct threshold: descending
    // cumulatives over the same score histogram AUC uses — the
    // operating-point picker, no global sort.
    "q207_pr_curve" -> ((s, dir) =>
      graft.ops.Eval.prCurve(Tables(s, dir).events,
        Exact.cents(col("value")),
        (col("event_type") === "purchase").cast("long"))),


    // ROC AUC without a global score sort: Mann-Whitney over the score
    // histogram (cardinality-bounded cumulative), exact integer
    // numerator, one final division.
    "q205_roc_auc" -> ((s, dir) =>
      graft.ops.Eval.rocAuc(Tables(s, dir).events,
        Exact.cents(col("value")),
        (col("event_type") === "purchase").cast("long"))),


    // Ordered funnel (first-touch): view → click → purchase, each stage
    // gated on the previous stage's conversion time. Keyed joins over
    // monotonically-shrinking survivor sets — no window over the raw log.
    "q60_funnel" -> ((s, dir) =>
      graft.ops.Journey.funnel(Tables(s, dir).events, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))),


    // Retention cohorts: signup-week cohort × whole weeks since, distinct
    // active users. Two keyed aggregations.
    "q61_retention" -> ((s, dir) =>
      graft.ops.Journey.retention(Tables(s, dir).events, "user_id",
        "event_type", "ts", anchorType = "signup")),


    // nDCG@10 per user: graded-relevance ranking quality of the
    // value-ordered event list (relevance = event_id mod 4 as the
    // synthetic grade) — integer bit-length discount, so the whole
    // rank-discount-sum chain hash-matches the oracle.
    "q220_ndcg" -> ((s, dir) =>
      Eval.ndcgAtK(
        Tables(s, dir).events.select(col("user_id"), col("event_id"),
          pmod(col("event_id"), lit(4L)).as("rel"),
          Exact.cents(col("value")).as("score")),
        "user_id", col("event_id"), col("rel"), col("score"), k = 10)),


    // MAP@10 per user on the same value-ordered list, binary relevance
    // (event_id % 3 = 0): AP integrates precision at every relevant
    // rank — the packing-reward metric nDCG's graded discount and
    // MRR's first-hit both miss; integer-micro staircase terms.
    "q350_average_precision" -> ((s, dir) =>
      Eval.averagePrecisionAtK(
        Tables(s, dir).events.select(col("user_id"), col("event_id"),
          (pmod(col("event_id"), lit(3L)) === 0L).cast("long").as("rel"),
          Exact.cents(col("value")).as("score")),
        "user_id", col("event_id"), col("rel"), col("score"), k = 10)),


    // Leave-one-out target encoding of event_type against the value
    // target — the high-cardinality categorical encoding with the
    // self-label leak subtracted out; exact integer (Σ−y)/(n−1).
    "q223_target_encode" -> ((s, dir) =>
      Features.targetEncodeLoo(
        Tables(s, dir).events.select(col("event_id"), col("event_type"),
          Exact.cents(col("value")).as("y")),
        "event_type", "event_id", col("y"))),


    // Multi-touch attribution: purchase credit split over the user's
    // preceding 2h touches under first/last/linear AT ONCE — integer
    // micros per conversion, user-keyed join, two fused windows.
    "q226_attribution" -> ((s, dir) =>
      Journey.attribution(Tables(s, dir).events, "user_id", "event_type",
        "ts", "event_id", conversionType = "purchase",
        windowSeconds = 7200L)),


    // Markov removal-effect attribution: the data-driven fourth model
    // next to q226's heuristic trio — absorption probability of
    // conversion from START, re-computed with each channel redirected
    // to NULL; integer-micro Jacobi sweeps over the bounded transition
    // matrix (collected under the IVF-centroid contract), every sweep
    // replayed by the oracle.
    "q339_markov_attribution" -> ((s, dir) =>
      Journey.markovAttribution(Tables(s, dir).events, "user_id",
        "event_type", "ts", "event_id", conversionType = "purchase",
        channels = Seq("click", "error", "signup", "view"))),


    // Coarsened Exact Matching ATT on q228's cohort: cells by
    // (event_type, 6h band), both-arm cells only, controls reweighted
    // to the treated composition — confounding by the binned
    // covariates removed exactly, one aggregation, no model.
    "q347_cem" -> ((s, dir) =>
      graft.ops.Causal.cemAtt(
        Tables(s, dir).events
          .withColumn("hband",
            expr("(unix_micros(CAST(ts AS TIMESTAMP)) div 1000000" +
              " div 3600) % 24 div 6")),
        Seq("event_type", "hband"),
        col("user_id") % 2 === 1,
        Exact.cents(col("value")))),


    // Difference-in-differences: odd-uid "treated" cohort vs even,
    // before/after the mid-month boundary — four exact integer cells,
    // three fixed subtractions; the non-randomized sibling of q194.
    "q228_did" -> ((s, dir) =>
      Causal.diffInDiff(Tables(s, dir).events,
        treated = pmod(col("user_id"), lit(2L)) === 1L,
        post = col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"),
        y = Exact.cents(col("value")))),


    // Decile lift & cumulative gains of the value score against the
    // purchase outcome — the targeting table ROC AUC (q205) folds away;
    // tiles from the score histogram, never a global row sort.
    "q229_lift_gains" -> ((s, dir) =>
      Eval.liftTable(Tables(s, dir).events,
        Exact.cents(col("value")),
        (col("event_type") === "purchase").cast("long"))),


    // Standardized-mean-difference balance audit: are the pre/post
    // slices comparable on (value, k) — the |SMD|<0.1 covariate-
    // balance diagnostic propensity matching lives by.
    "q303_smd_audit" -> ((s, dir) => {
      val ev = Analytics.eventsEnriched(Tables(s, dir))
        .select(col("ts"), col("value_cents"), col("k"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.ops.Profiling.smdAudit(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        Seq("value_cents", "k"))
    }),


    // Per-user consumption diversity: entropy of each user's type mix
    // via the integer identity — explorers vs single-feature power
    // users, which a bare type count misses.
    "q298_user_diversity" -> ((s, dir) =>
      Journey.userDiversity(Tables(s, dir).events, "user_id",
        "event_type")),


    // Activation lag: days from first event to the 3rd purchase,
    // p50/p90 over the lag histogram — the activation metric growth
    // teams steer by.
    "q299_activation" -> ((s, dir) =>
      Journey.activationLag(Tables(s, dir).events, "user_id",
        "event_type", "ts", "event_id", milestoneType = "purchase",
        k = 3)),


    // Ratio-metric A/B with delta-method variance: purchases-per-event
    // tested at the USER randomization unit — the correct inference
    // naive per-row tests get wrong.
    "q300_ratio_metric" -> ((s, dir) =>
      ABTest.ratioMetricTest(Tables(s, dir).events, "user_id",
        armB = pmod(col("user_id"), lit(2L)) === 1L,
        x = (col("event_type") === "purchase").cast("long"),
        y = lit(1L))),


    // Power analysis from live base rates: required n per arm for a
    // 10% relative MDE at α=.05 / 80% power — "how long must this
    // experiment run", the planning step before q194.
    "q291_power" -> ((s, dir) =>
      ABTest.requiredSampleSize(Tables(s, dir).events, "event_type",
        success = (col("value") >= 150.0).cast("long"))),


    // Empirical-Bayes shrunk purchase rates per user: α=20 pseudo-
    // observations of the global rate — smoothed-CTR/Bayesian target
    // encoding, exact rational (no float prior); q223's companion.
    "q289_shrunk_rates" -> ((s, dir) =>
      Features.shrunkRates(Tables(s, dir).events, "user_id",
        success = (col("event_type") === "purchase").cast("long"))),


    // Strict-order time-boxed funnel: view → click within 2h → purchase
    // within 2h of that click — sequencing+deadline semantics q60's
    // unordered membership funnel can't express.
    "q286_funnel3" -> ((s, dir) =>
      Journey.funnelSteps3(Tables(s, dir).events, "user_id",
        "event_type", "ts", s1 = "view", s2 = "click", s3 = "purchase",
        windowSeconds = 7200L)),


    // Restricted mean survival time: expected observed lifetime
    // truncated at 14 days — the area under q200's curve as one exact
    // number, E[min(L, H)], no curve materialization.
    "q287_rmst" -> ((s, dir) =>
      Journey.rmst(Tables(s, dir).events, "user_id", "ts",
        horizonDays = 14L)),


    // Mix-shift decomposition: how much of the purchase-rate move
    // across the boundary is segments changing rates vs the mix
    // shifting between segments — "why did the number move".
    "q284_mix_decomposition" -> ((s, dir) =>
      Causal.mixDecomposition(
        Tables(s, dir).events
          .withColumn("cohort", pmod(col("user_id"), lit(5L))),
        "cohort",
        inPeriodB = col("ts") >=
          lit("2024-01-16 00:00:00").cast("timestamp"),
        success = col("event_type") === "purchase")),


    // Qini uplift curve: incremental conversions from targeting the
    // top value tiles, treated vs control — response ranking (q229)
    // is not uplift ranking; this is the uplift answer.
    "q285_qini" -> ((s, dir) =>
      Eval.qiniCurve(Tables(s, dir).events,
        score = Exact.cents(col("value")),
        treated = pmod(col("user_id"), lit(2L)) === 1L,
        label = (col("event_type") === "purchase").cast("long"))),


    // Two-feature OLS via the normal equations: value against
    // (hour-of-day, k) — nine exact sums, Cramer readout; the
    // multivariate step q216's single-feature fit can't take.
    "q278_ols2" -> ((s, dir) =>
      Features.ols2(Analytics.eventsEnriched(Tables(s, dir)),
        y = col("value_cents"),
        x1 = expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600 % 24"),
        x2 = col("k"))),


    // Exact Spearman per event type via the doubled-rank device
    // (tie-averaged ranks ×2 are integers): the monotone-association
    // answer where q85's Pearson only sees lines.
    "q279_spearman" -> ((s, dir) =>
      Features.spearman(Analytics.eventsEnriched(Tables(s, dir)),
        Seq("event_type"), x = col("value_cents"), y = col("k"))),

    // Kendall τ-b per event type over (value decile, k): the
    // pair-concordance companion to q279's Spearman — C/D masses from
    // the joint decile×k histogram cell join (bounded cells, never a
    // row pair join), tie masses from the marginals, DECIMAL(38,0)
    // products. Deciles via the q84 integer histogram cuts.
    "q378_kendall_tau" -> ((s, dir) => {
      val ev = Analytics.eventsEnriched(Tables(s, dir))
        .select(col("event_type"), col("value_cents"), col("k"))
      val binned = Quantiles.binByCuts(ev, col("value_cents"),
        Quantiles.histogramCuts(ev, col("value_cents"),
          (1 to 9).map(i => (i, 10))))
      Features.kendallTauB(binned, Seq("event_type"),
        x = col("bin"), y = col("k"))
    }),


    // Event study: weekly treated-vs-control gap normalized to the
    // week −1 gap — flat pre-period bars are the parallel-trends check
    // q228's single DiD number silently assumes.
    "q277_event_study" -> ((s, dir) =>
      Causal.eventStudy(Tables(s, dir).events,
        treated = pmod(col("user_id"), lit(2L)) === 1L,
        relPeriod = expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 86400 div 7 - 2820"),
        y = Exact.cents(col("value")))),


    // Growth accounting: weekly actives split into new / retained /
    // resurrected, churn attributed to the week after — the four
    // numbers that explain every WAU move, where q61 only shows decay.
    "q273_growth" -> ((s, dir) =>
      Journey.growthAccounting(Tables(s, dir).events, "user_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
          + " div 86400 div 7"))),


    // Paired pre/post comparison: each user their own control across
    // the mid-month boundary — between-user variance cancels, the
    // highest-power design when both sides are observed; micro-
    // quantized diffs, exact t readout.
    "q271_paired_diff" -> ((s, dir) =>
      Causal.pairedDiff(
        Tables(s, dir).events.withColumn("cents",
          Exact.cents(col("value"))),
        "user_id",
        post = col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"),
        y = col("cents"))),


    // MRR ingredients: per user, the rank of the first relevant item
    // under the value ordering, reciprocal in exact integer micros —
    // the "how deep does the user scroll" number q220's graded nDCG
    // hides; Σ rr_micro/n/1e6 is the corpus MRR, order-free.
    "q252_mrr" -> ((s, dir) =>
      Eval.mrr(
        Tables(s, dir).events.select(col("user_id"), col("event_id"),
          pmod(col("event_id"), lit(4L)).as("rel"),
          Exact.cents(col("value")).as("score")),
        "user_id", col("event_id"), col("rel"), col("score"))),


    // All-pairs windowed co-occurrence: for every ordered type pair,
    // how often b follows a within the hour on the same user — q213
    // generalized from one chosen pair, q173's Markov freed from
    // adjacency.
    "q253_cooccurrence" -> ((s, dir) =>
      Journey.cooccurrenceWindow(Tables(s, dir).events, "user_id",
        "event_type", "ts", windowSeconds = 3600L)),


    // CUPED variance reduction: value adjusted by a correlated
    // pre-metric before the arm comparison — same expectation, less
    // variance; per-row adjustments quantized to centi-units so every
    // cross-row sum is partition-order-free.
    "q244_cuped" -> ((s, dir) =>
      Causal.cuped(
        Tables(s, dir).events.withColumn("cents",
          Exact.cents(col("value"))),
        armB = pmod(col("user_id"), lit(2L)) === 1L,
        y = col("cents"),
        xPre = expr("cents div 2") + pmod(col("event_id"), lit(50L)))),


    // Time-to-convert: per-user first click → first purchase after it,
    // p50/p90 of the lag from the lag-value histogram — "what window
    // covers the median converter", q213's missing complement.
    "q243_conversion_lag" -> ((s, dir) =>
      Journey.conversionLag(Tables(s, dir).events, "user_id",
        "event_type", "ts", triggerType = "click",
        outcomeType = "purchase")),


    // Mutual-information feature ranking: which derived categorical
    // (hour-of-day, user cohort, value band) carries the most signal
    // about event_type — the bit-length-log MI device, exact longs,
    // ranking-faithful; q204 says "dependent", this says how much.
    "q238_mi_ranking" -> ((s, dir) =>
      Features.miRanking(Tables(s, dir).events, col("event_type"),
        Seq(
          "hour" -> expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600 % 24"),
          "cohort" -> pmod(col("user_id"), lit(10L)),
          "value_band" -> expr("CAST(floor(value / 50) AS LONG)")))),

    // Cochran-Mantel-Haenszel: the arm/outcome comparison of q194 with
    // event_type held fixed as the stratum — pooled EVIDENCE, not
    // pooled rows (Simpson-proof); cross-strata double sums fold in
    // sorted-array order so both engines add identically.
    "q363_cmh" -> ((s, dir) =>
      ABTest.cmhTest(Tables(s, dir).events, "event_type",
        pmod(col("user_id"), lit(2)) === 1, col("value") > 150)),

    // Mann-Whitney U over per-user purchase revenue (arm = user parity,
    // the q194 cohort device): the non-parametric two-arm readout
    // heavy-tailed metrics need — ranks from the value HISTOGRAM (q40's
    // device), doubled-integer rank sums, tie-corrected z.
    "q360_mann_whitney" -> ((s, dir) => {
      val users = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(Exact.cents(col("value"))).as("cents"))
      ABTest.mannWhitney(users,
        pmod(col("user_id"), lit(2)) === 1, col("cents"))
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "q399_label_noise" -> graft.text.NaiveBayes.labelNoiseAuditOracleSql(
      s"""SELECT doc_id,
         |       CASE WHEN doc_id % 17 = 0 THEN
         |         (CASE WHEN source = 'src0' THEN 'src1' ELSE 'src0' END)
         |       ELSE source END AS lab,
         |       ${Text.toksSql.replace("lower(text)",
              "lower(text || repeat(' srctok' || source, 16))")} AS toks
         |FROM documents""".stripMargin),

    "q398_bitemporal" ->
      s"""WITH dim AS (
        |  SELECT * FROM $custVersionsSql
        |), visible AS (
        |  SELECT custkey, valid_from,
        |         CAST(valid_from AS BIGINT) AS valid_from_used,
        |         CAST(max_tx AS BIGINT) AS tx_from_used,
        |         CAST(bal AS BIGINT) AS bal
        |  FROM (
        |    SELECT custkey, valid_from, bal, tx_from,
        |           max(tx_from) OVER (PARTITION BY custkey, valid_from)
        |             AS max_tx
        |    FROM dim WHERE tx_from <= 3000
        |  ) WHERE tx_from = max_tx
        |), facts AS (
        |  SELECT o_orderkey, o_custkey AS custkey,
        |         o_orderkey % 3000 AS ts
        |  FROM orders
        |)
        |SELECT f.o_orderkey, f.custkey, f.ts, v.bal,
        |       v.valid_from_used, v.tx_from_used
        |FROM facts f ASOF LEFT JOIN visible v
        |  ON f.custkey = v.custkey AND f.ts >= v.valid_from""".stripMargin,
    "q363_cmh" -> ABTest.cmhOracleSql(
      """SELECT event_type AS s, user_id % 2 = 1 AS b,
        |       value > 150 AS o
        |FROM events""".stripMargin),

    "q360_mann_whitney" -> ABTest.mannWhitneyOracleSql(
      s"""SELECT user_id % 2 = 1 AS b,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY user_id""".stripMargin),

    "q184_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS m FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(m) OVER w IS NULL
        |                 OR (m - lag(m) OVER w) // 1000000 > 1800
        |            THEN 1 ELSE 0 END AS nw
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY m, event_id)
        |), s AS (
        |  SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id
        |      ORDER BY m, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM f
        |)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts) AS first_ts, max(ts) AS last_ts,
        |       CAST((max(m) - min(m)) // 1000000 AS BIGINT) AS duration_sec
        |FROM s GROUP BY 1, 2""".stripMargin,


    "q186_rfm" -> {
      val qs = Seq((1, 5), (2, 5), (3, 5), (4, 5))
      def cuts(valCol: String) = {
        val sel = qs.map { case (num, den) =>
          s"min(CASE WHEN cum * $den >= n * $num THEN val END) AS c${num * 100 / den}"
        }.mkString(", ")
        s"""SELECT $sel FROM (
           |  SELECT val, CAST(sum(k) OVER (ORDER BY val) AS BIGINT) AS cum
           |  FROM (SELECT $valCol AS val, count(*) AS k FROM p
           |        WHERE $valCol IS NOT NULL GROUP BY 1)
           |), (SELECT CAST(count(*) AS BIGINT) AS n FROM p
           |    WHERE $valCol IS NOT NULL)""".stripMargin
      }
      def bin(valCol: String, pfx: String) = qs.map { case (num, den) =>
        s"(CASE WHEN $valCol > $pfx.c${num * 100 / den} THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH p AS (
         |  SELECT user_id, CAST(max(epoch_us(ts)) AS BIGINT) AS last_m,
         |         CAST(count(*) AS BIGINT) AS freq,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |           AS monetary_cents
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), rc AS (${cuts("last_m")}
         |), fc AS (${cuts("freq")}
         |), mc AS (${cuts("monetary_cents")})
         |SELECT user_id, last_m, freq, monetary_cents,
         |       CAST(${bin("last_m", "rc")} + 1 AS BIGINT) AS r,
         |       CAST(${bin("freq", "fc")} + 1 AS BIGINT) AS f,
         |       CAST(${bin("monetary_cents", "mc")} + 1 AS BIGINT) AS m,
         |       CAST((${bin("last_m", "rc")} + 1) * 100
         |            + (${bin("freq", "fc")} + 1) * 10
         |            + ${bin("monetary_cents", "mc")} + 1 AS BIGINT)
         |         AS rfm_code
         |FROM p, rc, fc, mc""".stripMargin
    },


    "q194_ab_test" -> graft.ops.ABTest.proportionTestOracleSql(
      "events", Seq("event_type"), "user_id % 2 = 1", "value > 150"),


    "q200_survival" -> graft.ops.Journey.lifetimeSurvivalOracleSql(
      "events", "user_id", "ts"),


    "q213_within_window" -> graft.ops.Journey.withinWindowOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      triggerType = "click", outcomeType = "purchase",
      windowSeconds = 3600L),


    "q207_pr_curve" -> graft.ops.Eval.prCurveOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS s,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin),


    "q205_roc_auc" -> graft.ops.Eval.rocAucOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS s,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin),


    "q203_stickiness" ->
      graft.ops.Journey.stickinessOracleSql("events", "user_id", "ts"),


    "q421_fdr_bh" -> graft.ops.ABTest.bhSelectOracleSql(
      """SELECT source,
        |       CASE WHEN n_chars < 300 THEN 1 ELSE 0 END AS f
        |FROM documents""".stripMargin,
      "source", m = 20),

    "q204_chi_square" -> graft.ops.ABTest.chiSquareOracleSql(
      "(SELECT event_type, user_id % 3 AS cohort FROM events)",
      "event_type", "cohort"),


    "q60_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY 1
        |)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, count(*) AS n_users FROM s0
        |UNION ALL
        |SELECT 1, 'click', count(*) FROM s1
        |UNION ALL
        |SELECT 2, 'purchase', count(*) FROM s2""".stripMargin,


    "q61_retention" ->
      """WITH a AS (
        |  SELECT user_id, min(ts) AS t_anchor FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |)
        |SELECT CAST(date_trunc('week', t_anchor) AS DATE) AS cohort_week,
        |       CAST(datediff('day', CAST(date_trunc('week', t_anchor) AS DATE),
        |                     CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
        |         AS week_offset,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN a USING (user_id)
        |WHERE e.ts >= t_anchor
        |GROUP BY 1, 2""".stripMargin,


    "q350_average_precision" -> Eval.apOracleSql(
      """SELECT user_id, event_id AS i,
        |       CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS r,
        |       CAST(round(value * 100) AS BIGINT) AS s
        |FROM events""".stripMargin,
      "user_id", k = 10),


    "q220_ndcg" -> Eval.ndcgOracleSql(
      """SELECT user_id, event_id AS i, event_id % 4 AS r,
        |       CAST(round(value * 100) AS BIGINT) AS s
        |FROM events""".stripMargin,
      "user_id", k = 10),


    "q223_target_encode" -> Features.targetEncodeLooOracleSql(
      """SELECT event_id, event_type,
        |       CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin,
      "event_type", "event_id"),


    "q226_attribution" -> Journey.attributionOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      conversionType = "purchase", windowSeconds = 7200L),


    "q347_cem" -> Causal.cemAttOracleSql(
      """SELECT event_type,
        |       (epoch_us(ts) // 1000000 // 3600) % 24 // 6 AS hband,
        |       user_id % 2 = 1 AS t,
        |       CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin,
      Seq("event_type", "hband")),


    "q339_markov_attribution" -> Journey.markovAttributionOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      conversionType = "purchase",
      channels = Seq("click", "error", "signup", "view")),


    "q228_did" -> Causal.diffInDiffOracleSql(
      """SELECT user_id % 2 = 1 AS t,
        |       ts >= TIMESTAMP '2024-01-16 00:00:00' AS p,
        |       CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin),


    "q229_lift_gains" -> Eval.liftTableOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS s,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin),


    "q303_smd_audit" -> graft.ops.Profiling.smdAuditOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS value_cents,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      """SELECT CAST(round(value * 100) AS BIGINT) AS value_cents,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      Seq("value_cents", "k")),


    "q298_user_diversity" -> Journey.userDiversityOracleSql(
      "events", "user_id", "event_type"),


    "q299_activation" -> Journey.activationLagOracleSql(
      "events", "user_id", "event_type", "ts", "event_id",
      milestoneType = "purchase", k = 3),


    "q300_ratio_metric" -> ABTest.ratioMetricOracleSql(
      """SELECT user_id AS u, user_id % 2 = 1 AS b,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
        |       1 AS y
        |FROM events""".stripMargin),


    "q291_power" -> ABTest.requiredSampleSizeOracleSql(
      """SELECT event_type,
        |       CASE WHEN value >= 150.0 THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin,
      "event_type"),


    "q289_shrunk_rates" -> Features.shrunkRatesOracleSql(
      """SELECT user_id,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin,
      "user_id"),


    "q286_funnel3" -> Journey.funnelSteps3OracleSql(
      "events", "user_id", "event_type", "ts",
      s1 = "view", s2 = "click", s3 = "purchase",
      windowSeconds = 7200L),


    "q287_rmst" -> Journey.rmstOracleSql("events", "user_id", "ts",
      horizonDays = 14L),


    "q284_mix_decomposition" -> Causal.mixDecompositionOracleSql(
      """SELECT user_id % 5 AS cohort,
        |       ts >= TIMESTAMP '2024-01-16 00:00:00' AS b,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin,
      "cohort"),


    "q285_qini" -> Eval.qiniOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS s,
        |       user_id % 2 = 1 AS t,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |FROM events""".stripMargin),


    "q278_ols2" -> Features.ols2OracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS y,
        |       epoch_us(ts) // 1000000 // 3600 % 24 AS a,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS b
        |FROM events""".stripMargin),


    "q279_spearman" -> Features.spearmanOracleSql(
      """SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
        |FROM events""".stripMargin,
      Seq("event_type")),

    // q84's integer-rational decile cuts feed x; the τ-b machinery is
    // shared with the Spark side through kendallTauBOracleSql.
    "q378_kendall_tau" -> {
      val cuts = (1 to 9).map(i =>
        s"min(CASE WHEN cum * 10 >= n * $i THEN val END) AS c${i * 10}")
        .mkString(",\n        |           ")
      val binSum = (1 to 9).map(i =>
        s"(CASE WHEN cents > c${i * 10} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      Features.kendallTauBOracleSql(
        s"""WITH c AS (
          |  SELECT event_type,
          |         CAST(round(value * 100) AS BIGINT) AS cents,
          |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
          |  FROM events
          |), h AS (
          |  SELECT cents AS val, count(*) AS kk FROM c
          |  WHERE cents IS NOT NULL GROUP BY 1
          |), m AS (
          |  SELECT val, CAST(sum(kk) OVER (ORDER BY val) AS BIGINT) AS cum
          |  FROM h
          |), t AS (SELECT CAST(sum(kk) AS BIGINT) AS n FROM h),
          |q AS (
          |  SELECT $cuts
          |  FROM m, t)
          |SELECT event_type,
          |       CAST(CASE WHEN cents IS NULL THEN NULL
          |                 ELSE $binSum END AS BIGINT) AS x,
          |       k AS y
          |FROM c, q""".stripMargin,
        Seq("event_type"))
    },


    "q277_event_study" -> Causal.eventStudyOracleSql(
      """SELECT user_id % 2 = 1 AS t,
        |       epoch_us(ts) // 1000000 // 86400 // 7 - 2820 AS w,
        |       CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin),


    "q273_growth" -> Journey.growthAccountingOracleSql(
      """SELECT user_id AS u,
        |       epoch_us(ts) // 1000000 // 86400 // 7 AS w
        |FROM events""".stripMargin),


    "q271_paired_diff" -> Causal.pairedDiffOracleSql(
      """SELECT user_id AS u,
        |       ts >= TIMESTAMP '2024-01-16 00:00:00' AS p,
        |       CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin),


    "q252_mrr" -> Eval.mrrOracleSql(
      """SELECT user_id, event_id AS i, event_id % 4 AS r,
        |       CAST(round(value * 100) AS BIGINT) AS s
        |FROM events""".stripMargin,
      "user_id"),


    "q253_cooccurrence" -> Journey.cooccurrenceOracleSql(
      "events", "user_id", "event_type", "ts", windowSeconds = 3600L),


    "q244_cuped" -> Causal.cupedOracleSql(
      """SELECT user_id % 2 = 1 AS b,
        |       CAST(round(value * 100) AS BIGINT) AS y,
        |       CAST(round(value * 100) AS BIGINT) // 2 + event_id % 50
        |         AS x
        |FROM events""".stripMargin),


    "q243_conversion_lag" -> Journey.conversionLagOracleSql(
      "events", "user_id", "event_type", "ts",
      triggerType = "click", outcomeType = "purchase"),


    "q238_mi_ranking" -> Features.miRankingOracleSql(
      "events", "event_type",
      Seq(
        "hour" -> "epoch_us(ts) // 1000000 // 3600 % 24",
        "cohort" -> "user_id % 10",
        "value_band" -> "CAST(floor(value / 50) AS BIGINT)")),
  )
}
