package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.NearDup
import graft.functions.Hash64
import graft.ops.Features
import graft.text.TextAnalysis

/** Corpus-curation family over the `documents` table: mixture planning
  * and sampling (domain mix, temperature, token budgets, DSIR),
  * packing/batching, URL/host curation, sharding, snapshot maintenance
  * (diff, golden records, field reconciliation) and corpus accounting.
  * Split from [[Text]] (round 7) purely mechanically — query names,
  * semantics, and oracles unchanged; shared DuckDB fragments stay in
  * [[Text]].
  */
object Curation extends QueryModule {

  /** q50's corpus config — oracle SQL derives from the same values. */
  private val corpusRates = Map("en" -> 0.8, "zh" -> 1.0)

  private val corpusDefaultRate = 0.5

  private[queries] val corpusSplits =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Planted ids must stay DISJOINT from real ids at ANY scale factor:
    * the shift is max(doc_id)+1 derived IN-PLAN (the sanctioned one-row
    * broadcast-stat idiom), not a constant a larger corpus could silently
    * collide with — and because the oracle replayed the same constant,
    * both engines would have agreed on the corrupted input (round-9
    * ADVICE). The oracle replays the same scalar subquery. Shared with
    * [[CurationGates]]' planted pipeline inputs. */
  private[queries] def plantShift(base: org.apache.spark.sql.DataFrame) =
    broadcast(base.agg((max(col("doc_id")) + lit(1L)).as("_shift")))

  /** The derived planted-id shift as a DuckDB scalar subquery. */
  private[queries] val plantShiftSql =
    "(SELECT max(doc_id) + 1 FROM documents)"

  /** q55/q56 config — shared by the Spark plan and the oracle SQL. */

  /** q129: mixture-planner weights — heavy sources that must cap. */
  private[queries] val budgetWeights =
    Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L)

  /** q66: half the corpus, with src0/src1 at 30% each (src0/src1 hold
    * only 5% of docs each, so their rate caps at 1 — both behaviors
    * exercised). q67: 512-token windows over 4 shards. */

  /** q66: half the corpus, with src0/src1 at 30% each (src0/src1 hold
    * only 5% of docs each, so their rate caps at 1 — both behaviors
    * exercised). q67: 512-token windows over 4 shards. */
  private val mixTargets = Map("src0" -> (3L, 10L), "src1" -> (3L, 10L))

  private val mixDefault = (4L, 180L)

  private val (mixTotalNum, mixTotalDen) = (1L, 2L)

  private val mixSalt = "mix"

  private val (packCapacity, packShards, packSalt) = (512, 4, "pack")

  /** q137: prefix-filter join threshold 3/5 — a rational so the accept
    * test stays pure-integer on both engines; 3-gram shingle units. */

  /** q150: extra-copy winner salt. */
  private val replSalt = "repl6"

  /** q139: DSIR target = the q129 budget-weighted "curated" sources;
    * 2¹² hashed-feature buckets. */

  /** q139: DSIR target = the q129 budget-weighted "curated" sources;
    * 2¹² hashed-feature buckets. */
  private val dsirTarget = Seq("src0", "src1", "src2")

  private val dsirBuckets = 4096

  /** q73: 7-gram spans (short enough that the sf-test docs overlap). */

  /** q117: snapshot v1 drops residue 3, v2 drops residue 7 (so both
    * added and removed keys exist), and v2 edits every 9th doc (so
    * `changed` is exercised alongside the untouched bulk). */
  private val (snapKeyMod, snapEditMod) = (13L, 9L)

  /** q112: 64-bucket hashed-feature linear quality model — English
    * stopwords weigh +3 (via their hash buckets), everything else −1,
    * so natural English scores above token salad. ONE weight vector,
    * built driver-side with the same hash both engines evaluate. */

  /** q113/q114: the corpus has no URL column, so the queries WRAP each
    * doc in a deterministic dirty URL on BOTH engines (the q91 recipe):
    * mixed-case scheme/host, rotating default/explicit ports, tracking
    * params, a fragment. 7 hosts; 2 blocklisted; cap 40 per host. */
  private val hostCapK = 40

  private val hostCapSalt = "hostcap"

  private val blockedHosts = Seq("www.site2.com", "www.site5.com")

  /** The synthesized dirty URL, Spark side (explicit string casts —
    * ANSI mode rejects implicit numeric-to-string concat). */

  /** The synthesized dirty URL, Spark side (explicit string casts —
    * ANSI mode rejects implicit numeric-to-string concat). */
  private def dirtyUrl: org.apache.spark.sql.Column = {
    val m3 = col("doc_id") % 3
    concat(
      when(m3 === 0, lit("HTTP://")).otherwise(lit("HTTPS://")),
      lit("WWW.Site"), (col("doc_id") % 7).cast("string"), lit(".COM"),
      when(m3 === 0, lit(":80")).when(m3 === 1, lit(":443"))
        .otherwise(lit(":8080")),
      lit("/Docs/"), col("source"), lit("/Page?utm_source=feed&id="),
      col("doc_id").cast("string"), lit("&ref=x&keep=1#sec"))
  }

  /** The identical dirty URL, DuckDB side. */

  /** The identical dirty URL, DuckDB side. */
  private val dirtyUrlSql =
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'HTTPS://' END || " +
    "'WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM' || " +
    "CASE doc_id % 3 WHEN 0 THEN ':80' WHEN 1 THEN ':443' ELSE ':8080' END || " +
    "'/Docs/' || source || '/Page?utm_source=feed&id=' || " +
    "CAST(doc_id AS VARCHAR) || '&ref=x&keep=1#sec'"

  /** q77: 32-token chunks every 16 (50% overlap); q80/q81: 12-token
    * "lines" (the span segmentation the single-line harness corpus
    * supports — see [[graft.text.Segments]]), ≥5-token minimum.
    * q78: top-50 vocabulary. */

  /** q77: 32-token chunks every 16 (50% overlap); q80/q81: 12-token
    * "lines" (the span segmentation the single-line harness corpus
    * supports — see [[graft.text.Segments]]), ≥5-token minimum.
    * q78: top-50 vocabulary. */
  private val (chunkSize, chunkStride) = (32, 16)

  /** q82: at most 15 docs per source (sf sources hold 25 each, so the
    * cap genuinely cuts). */
  private val (capK, capSalt) = (15, "cap")

  /** q93: weight-proportional sampling scale — n_chars/600, docs at
    * ≥600 chars always kept (sf max is 553, so the cap arm is data-false
    * but contract-true). */

  /** q93: weight-proportional sampling scale — n_chars/600, docs at
    * ≥600 chars always kept (sf max is 553, so the cap arm is data-false
    * but contract-true). */
  private val (wtMaxW, wtSalt) = (600L, "wt")

  /** q91: the corpus is markup-free, so the query WRAPS each text in this
    * deterministic dirty shell (tags, entities, a doomed script block) on
    * BOTH engines — the strip is then genuinely exercised on every row
    * rather than tested as an identity. */

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stable global ordinal assignment in (source, doc_id) order WITHOUT
    // a global sort: per-shard counts → bounded prefix-offset window →
    // broadcast offsets + keyed within-shard rank. Identical output to
    // the single-partition row_number the oracle spells.
    "q188_global_ordinals" -> ((s, dir) =>
      graft.ops.Ranking.globalOrdinals(
        Tables(s, dir).documents.select(col("doc_id"), col("source")),
        "source", Seq("doc_id"))),

    // Interval coalescing: overlapping per-user activity intervals
    // (event start + value-seconds duration) merged into maximal
    // islands — gaps-and-islands over intervals, two fused keyed
    // windows.
    "q214_interval_merge" -> ((s, dir) => {
      val iv = Tables(s, dir).events.select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("s"),
        // floor, not round: a 2-decimal value can sit exactly on .5,
        // where Spark rounds HALF_UP and DuckDB rounds half-even
        expr("CAST(floor(value) AS LONG)").as("__dur"))
        .withColumn("e", col("s") + col("__dur")).drop("__dur")
      graft.ops.RangeJoin.intervalMerge(iv, Seq("user_id"), "s", "e")
    }),

    // Availability ratio: covered seconds over observed span per user
    // from the q214 islands — the SLA uptime number q224's gap list
    // itemizes; exact integer micros.
    "q305_availability" -> ((s, dir) => {
      val iv = Tables(s, dir).events.select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("s"),
        expr("CAST(floor(value) AS LONG)").as("__dur"))
        .withColumn("e", col("s") + col("__dur")).drop("__dur")
      graft.ops.RangeJoin.availability(iv, Seq("user_id"), "s", "e")
    }),

    // Interval GAPS — q214's complement: the uncovered stretches
    // between a user's merged activity islands (blackout windows),
    // one per-key lead over the island-sized merged frame.
    "q224_interval_gaps" -> ((s, dir) => {
      val iv = Tables(s, dir).events.select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("s"),
        expr("CAST(floor(value) AS LONG)").as("__dur"))
        .withColumn("e", col("s") + col("__dur")).drop("__dur")
      graft.ops.RangeJoin.intervalGaps(iv, Seq("user_id"), "s", "e")
    }),

    // Rendezvous-hash shard stability: assign every document to 8 and
    // to 9 shards by highest-random-weight and measure the moved
    // fraction per old shard (~1/9 by construction, vs ~8/9 under
    // mod-n) — the stable-sharding contract incremental rebuilds need.
    "q230_rendezvous" -> ((s, dir) =>
      graft.ops.Sharding.rendezvousStability(
        Tables(s, dir).documents, "doc_id", nA = 8, nB = 9)),

    // Deterministic training-order layout: the epoch "shuffle" as a
    // hash, not an RNG state — every document's (shard, pos) is
    // recomputable from the salt alone (resume-safe, worker-sliceable);
    // per-shard local sorts, never a global sort (q188's offset trick
    // turns (shard, pos) into one ordinal when needed).
    "q418_shard_layout" -> ((s, dir) =>
      graft.ops.Sharding.shardLayout(Tables(s, dir).documents,
        "doc_id", col("n_chars"), nShards = 8, salt = "layout-v1")),

    // Curriculum layout — q418's staged sibling, the other order a
    // training loader chooses: shards stay hash-uniform, but within a
    // shard the schedule reads short documents first (length-bucket
    // curriculum, 500-char stages), hash-shuffled within each stage so
    // every stage is an unbiased sample of its band. Same salt-only
    // recompute contract; same per-shard local sorts.
    "q445_curriculum_layout" -> ((s, dir) =>
      graft.ops.Sharding.curriculumShardLayout(Tables(s, dir).documents,
        "doc_id", col("n_chars"), expr("n_chars div 500"),
        nShards = 8, salt = "layout-v1")),

    // Mixture-interleave audit: stride-scheduling keys interleave
    // sources proportionally by construction; per (key-block, source),
    // the exact integer deviation from the target share — the LOCAL
    // composition check a global rate table (q66) is blind to.
    "q419_interleave_audit" -> ((s, dir) =>
      graft.ops.Sharding.interleaveAudit(Tables(s, dir).documents,
        "source", "doc_id", nBlocks = 16, salt = "ilv-v1")),

    // q419 weighted by TOKEN mass (n_chars as the unit): the form a
    // token-budgeted trainer holds — a long-doc source drifts off
    // target under doc-count striding exactly when it matters; token-
    // midpoint keys bound every block's token deviation at one doc.
    "q441_interleave_tokens" -> ((s, dir) =>
      graft.ops.Sharding.interleaveTokensAudit(Tables(s, dir).documents,
        "source", "doc_id", col("n_chars"), nBlocks = 16,
        salt = "ilv-v1")),

    // Source ablation: the corpus mean-length WITHOUT each source,
    // from one aggregation pass — the leave-one-group-out
    // data-valuation cut ("which source drags the metric").
    "q270_source_ablation" -> ((s, dir) =>
      graft.text.Corpus.sourceAblation(Tables(s, dir).documents,
        "source", col("n_chars").cast("long"))),

    // Token share-shift: WHICH tokens moved between src0 and the rest
    // of the corpus and by how much — the per-token attribution q181's
    // one-number JS divergence points at; top-20 movers, integer micro
    // shares.
    "q264_token_shift" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      graft.text.Corpus.tokenShareShift(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "text")
    }),

    // URL path-hierarchy rollup over q113's dirty URLs: per (host,
    // path prefix, depth) counts — WHERE in each site the corpus sits,
    // the crawl-frontier view above q114's whole-host cap.
    "q257_path_rollup" -> ((s, dir) =>
      graft.text.Urls.pathRollup(
        Tables(s, dir).documents.select(dirtyUrl.as("url")), "url")),

    // Column-level reconciliation of a perturbed snapshot: per-field
    // mismatch rates among matched keys — WHICH columns drifted, the
    // answer q117's row-level changed verdict folds away. One scan,
    // every column's diff counted simultaneously.
    "q240_field_diff" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val v2 = docs.select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 7 === 0, lit("xx")).otherwise(col("lang"))
          .as("lang"),
        col("source"))
      graft.ops.Merge.fieldDiff(docs, v2, Seq("doc_id"),
        Seq("text", "lang", "source"))
    }),

    // Jump-consistent sharding (native codegen expression #6): O(ln n)
    // per key with rendezvous-grade stability — the q230 scale path at
    // big shard counts; 64→65 moves ~1/65 of docs. Oracle replays the
    // wrapping-multiply recurrence in a recursive CTE, bit-for-bit.
    "q236_jump_shards" -> ((s, dir) =>
      graft.ops.Sharding.jumpStability(
        Tables(s, dir).documents, "doc_id", nA = 64, nB = 65)),

    // Largest-remainder apportionment of a (prime) sampling budget
    // across sources by char mass — Σ seats EXACTLY the budget, the
    // integer-exact mixture planning q129's cap cascade refines.
    "q233_apportion" -> ((s, dir) =>
      graft.ops.Sampling.apportion(
        Tables(s, dir).documents.groupBy(col("source"))
          .agg(sum(col("n_chars")).as("w")),
        "source", "w", seats = 1000003L)),

    // Quantile mapping: src0's length distribution re-expressed in the
    // whole-corpus distribution's coordinates — the source-bias
    // correction; cuts from both sides via the bounded histogram
    // machinery, per-row CASE mapping.
    "q215_quantile_map" -> ((s, dir) => {
      val all = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars").cast("long").as("v"))
      val cur = Tables(s, dir).documents
        .filter(col("source") === "src0")
        .select(col("doc_id"), col("n_chars").cast("long").as("v"))
      graft.ops.Quantiles.quantileMap(all, cur, col("v"),
        (1 to 9).map(i => (i, 10)))
    }),

    // Per-source corpus datasheet: volume, language profile and exact-
    // duplication rate in one |sources|-row card — the dataset-card
    // summary a corpus release publishes.
    "q190_datasheet" -> ((s, dir) =>
      graft.text.Corpus.datasheet(Tables(s, dir).documents,
        "source", "doc_id", "text", "lang")),

    // Pairwise source vocabulary overlap: the redundancy map a mixture
    // planner reads before weighting sources; token-keyed self-join
    // with per-token fan-out bounded by |sources|.
    "q180_vocab_overlap" -> ((s, dir) =>
      graft.text.Corpus.vocabOverlap(Tables(s, dir).documents,
        "source", "text")),

    // Pairwise Jensen-Shannon divergence between source unigram
    // distributions over the fixed 4096-bucket hash space — exact
    // integer micro-probabilities + bit-length logs.
    "q181_js_divergence" -> ((s, dir) =>
      graft.text.Corpus.sourceDivergence(Tables(s, dir).documents,
        "source", "text", buckets = 4096)),

    // Golden-record survivorship over exact-dup clusters: per cluster
    // the field-wise modal source/lang + earliest member id — the
    // master-data collapse after identity resolution.
    "q183_golden_record" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      graft.ops.Merge.goldenRecords(docs, "fp",
        Seq("source", "lang", "doc_id"))
    }),

    // Exact-count replicate/downsample: src0 doubled (upsampling —
    // the step q141/q66 leave explicit), src1 identity, the rest cut
    // to exactly 40% — group totals hit targets EXACTLY, copies spread
    // evenly, extra-copy winners in deterministic salted-hash order.
    "q150_exact_replicate" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val targets = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("__n0"))
        .select(col("source"),
          when(col("source") === "src0", col("__n0") * 2)
            .when(col("source") === "src1", col("__n0"))
            .otherwise(expr("(2 * __n0) div 5")).as("alloc"))
      graft.ops.Sampling.replicateExact(docs, "source", "doc_id",
        targets, replSalt)
    }),

    // Temperature-scaled (alpha = 1/2) mixture allocation: per-source
    // budget ∝ floor(sqrt(n)) — the multilingual flattening q129's
    // caller-chosen weights can't derive. Same 60% budget as q129.
    "q141_temp_mixture" -> ((s, dir) => {
      val ps = Tables(s, dir).documents.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Sampling.temperatureAllocation(ps, "source", "n",
        budgetNum = 3L, budgetDen = 5L)
    }),

    // DSIR importance weights: hashed-unigram models of the curated
    // sources (target) vs the whole corpus (raw); integer bit-length
    // log-ratio per doc + the keep verdict. The classifier-free "steer
    // the crawl toward the reference" selector.
    "q139_dsir_weights" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      graft.text.Dsir.importanceWeights(docs, "doc_id", "text",
        target = docs.filter(col("source").isin(dsirTarget: _*)),
        raw = docs, buckets = dsirBuckets)
    }),

    // The flagship composition: sample → dedup → quality floor → split as
    // ONE declarative plan with a single shuffle, oracle-checked end to
    // end. Dups injected (doc_id%7, shifted ids) so the dedup stage has
    // real work; rates/threshold chosen to make every stage selective.
    "q50_corpus" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val withDupes = base.unionAll(
        base.filter(col("doc_id") % 7 === 0)
          .crossJoin(plantShift(base))
          .withColumn("doc_id", col("doc_id") + col("_shift"))
          .drop("_shift"))
      graft.text.Corpus.build(withDupes, "doc_id", "text", "lang",
        corpusRates, corpusDefaultRate, minQuality = 0.6, salt = "corp",
        splits = corpusSplits)
    }),

    // Vocabulary richness per source over 3-gram shingles: Chao1's
    // unseen-type estimate + Good-Turing unseen mass read off the
    // frequency spectrum's first two cells — "how many n-grams would a
    // bigger crawl add", the under-sampling signal the q290 Heaps
    // curve extrapolates toward but never states. One (group, unit)
    // count + one spectrum aggregation.
    "q326_vocab_richness" -> ((s, dir) =>
      graft.text.Corpus.vocabRichness(Tables(s, dir).documents,
        "source", "text",
        unit = t => graft.dedup.NearDup.shingles(
          TextAnalysis.tokens(t), 3))),

    // Greedy max-coverage source selection: pick the 6 sources whose
    // union covers the most distinct token trigrams — the (1 − 1/e)
    // budgeted-curation move the mixture family evaluates but never
    // chose. Deterministic (ties to smallest source), so the whole
    // selection sequence hash-matches the oracle's unrolled replay.
    "q336_coverage_select" -> ((s, dir) =>
      graft.ops.Coverage.greedySelect(
        Tables(s, dir).documents.select(col("source"),
          explode(NearDup.shingles(TextAnalysis.tokens(col("text")), 3))
            .as("unit")),
        "source", "unit", k = 6)),

    // Domain mixing: reweight sources toward a target composition with
    // runtime (count-dependent) rates in pure integer arithmetic.
    "q66_domain_mix" -> ((s, dir) =>
      graft.ops.Sampling.mixSample(Tables(s, dir).documents, col("doc_id"),
          "source", mixTargets, mixDefault, mixTotalNum, mixTotalDen,
          salt = mixSalt)
        .select(col("doc_id"), col("source"))),

    // GPT-style sequence packing: shard-local concatenate-and-chunk
    // window layout, one bounded window sort per shard.
    "q67_packing" -> ((s, dir) =>
      graft.ops.Packing.packIntoWindows(Tables(s, dir).documents,
        "doc_id", "text", capacity = packCapacity, shards = packShards,
        salt = packSalt)),

    // Packed-attention mask accounting over q67's layout: per window,
    // the causal pair count vs the document-masked pair count and the
    // leaked/wasted cross-doc share — the training-efficiency readout
    // a packed batch publishes. Same shard-keyed plan as q67.
    "q402_packed_mask" -> ((s, dir) =>
      graft.ops.Packing.packedMaskAccounting(Tables(s, dir).documents,
        "doc_id", "text", capacity = packCapacity, shards = packShards,
        salt = packSalt)),

    // Length-bucketed batching (the keep-docs-whole alternative to q67's
    // concat-and-chunk): power-of-2 length buckets, batches pad only to
    // their own max — per-batch padding accounting for inference and
    // finetuning layouts.
    "q158_length_batches" -> ((s, dir) =>
      graft.ops.Packing.lengthBucketedBatches(Tables(s, dir).documents,
        "doc_id", "text", batchSize = 32, shards = packShards,
        salt = packSalt)),

    // Per-target-host anchor-text profile over q126's synthetic crawl:
    // what OTHER pages call a host (the original web-ranking signal),
    // top-3 tokens by two-phase bounded rank.
    "q160_anchor_text" -> ((s, dir) => {
      val html = concat(
        lit("<p>"), col("text"),
        lit("</p><a href=\"https://www.site"),
        ((col("doc_id") + 1) % 7).cast("string"),
        lit(".com/p\">"), substring(col("text"), 1, 30),
        lit("</a><a href=\"http://www.site"),
        ((col("doc_id") + 3) % 7).cast("string"),
        lit(".com/q\">read more "), col("source"), lit("</a>"))
      val pairs = Tables(s, dir).documents
        .select(explode(graft.text.Urls.extractAnchors(html)).as("__pr"))
        .select(graft.text.Urls.host(col("__pr.href")).as("dst_host"),
          col("__pr.anchor"))
      graft.text.Urls.anchorProfile(pairs, "dst_host", "anchor", k = 3)
    }),

    // Sliding-window token chunking (training-sequence prep): 32-token
    // windows every 16, full coverage with a single ragged tail; pure
    // projection + generator, zero shuffles.
    "q77_chunks" -> ((s, dir) =>
      graft.text.Segments.chunkWithStride(Tables(s, dir).documents,
        "doc_id", "text", chunkSize, chunkStride)),

    // Per-source document cap: deterministic hash-order reservoir — the
    // absolute-volume bound corpus mixing applies before q66's rate
    // balancing. The two-phase bounded-buffer form (mega-key-safe; the
    // window form is capPerKey); same winners, same oracle.
    "q82_domain_cap" -> ((s, dir) =>
      graft.ops.Sampling.capPerKeyIds(Tables(s, dir).documents,
          "source", "doc_id", capK, salt = capSalt)
        .select(col("doc_id"), col("source"))),

    // Weight-proportional deterministic sampling: survival rate
    // n_chars/600 per doc — quality-weighted corpus thinning as a pure
    // integer scan predicate (no RNG, no shuffle).
    "q93_weighted_sample" -> ((s, dir) =>
      graft.ops.Sampling.weightedSample(Tables(s, dir).documents,
          col("doc_id"), col("n_chars"), wtMaxW, salt = wtSalt)
        .select(col("doc_id"), col("n_chars"))),

    // Canonical URL normalization: scheme/host lowercase, default-port
    // strip (non-default kept), utm_*/tracking-param removal with order
    // preserved, fragment drop, empty path -> '/'. Pure per-row
    // regexp/lambda expressions, zero shuffles.
    "q113_url_canonical" -> ((s, dir) => {
      val raw = dirtyUrl
      Tables(s, dir).documents.select(
        col("doc_id"),
        graft.text.Urls.canonical(raw).as("url"),
        graft.text.Urls.host(raw).as("host"))
    }),

    // Host-level curation: blocklist anti-join (broadcast, q46
    // machinery) then the mega-key-safe per-host cap (q82's two-phase
    // bounded-buffer form) over the canonical host.
    "q114_host_curation" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val hosts = Tables(s, dir).documents
        .select(col("doc_id"), graft.text.Urls.host(dirtyUrl).as("host"))
        .join(broadcast(blockedHosts.toDF("host")), Seq("host"), "left_anti")
      graft.ops.Sampling
        .capPerKeyIds(hosts, "host", "doc_id", hostCapK, hostCapSalt)
        .select(col("doc_id"), col("host"))
    }),

    // Host-level link graph: each doc is wrapped in markup carrying two
    // anchors — one clean-ish, one dirty (mixed case, default port,
    // tracking param) — aimed at (doc_id+1)%7 and (doc_id+3)%7. Extract
    // hrefs, normalize to hosts, aggregate weighted host→host edges:
    // the input PageRank/k-core run on at web scale. One shuffle.
    "q126_link_graph" -> ((s, dir) => {
      val html = concat(
        lit("<html><p>"), col("text"),
        lit("</p><a href=\"https://WWW.Site"),
        ((col("doc_id") + 1) % 7).cast("string"),
        lit(".COM/p/"), col("doc_id").cast("string"),
        lit("\">x</a><a href=\"HTTP://www.site"),
        ((col("doc_id") + 3) % 7).cast("string"),
        lit(".com:80/q?utm_source=z&id="), col("doc_id").cast("string"),
        lit("\">y</a></html>"))
      Tables(s, dir).documents
        .select(
          concat(lit("www.site"), (col("doc_id") % 7).cast("string"),
            lit(".com")).as("src_host"),
          explode(graft.text.Urls.extractLinks(html)).as("link"))
        .select(col("src_host"),
          graft.text.Urls.host(col("link")).as("dst_host"))
        .groupBy(col("src_host"), col("dst_host"))
        .agg(count(lit(1)).as("n_links"))
    }),

    // Bin-packing layout: per-shard first-fit-decreasing into
    // fixed-capacity bins — whole documents, q67's constants, bins
    // never overflow. One keyed shuffle of (id, n) pairs; the FFD fold
    // runs once per shard.
    "q115_bin_packing" -> ((s, dir) =>
      graft.ops.BinPack.packBinsFFD(Tables(s, dir).documents,
        "doc_id", "text", capacity = packCapacity, shards = packShards,
        salt = packSalt)),

    // Corpus snapshot diff (CDC derive): classify every doc across two
    // corpus versions as added/removed/changed/unchanged by comparing
    // scan-computed fingerprints — 16-byte digests ride the one
    // full-outer join, the text never leaves the scan.
    "q117_snapshot_diff" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val v1 = docs.filter(col("doc_id") % snapKeyMod =!= 3)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
      val v2 = docs.filter(col("doc_id") % snapKeyMod =!= 7)
        .select(col("doc_id"), TextAnalysis.fingerprint(
          when(col("doc_id") % snapEditMod === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
          .as("fp"))
      graft.ops.Merge.snapshotDiff(v1, v2, Seq("doc_id"), "fp")
    }),

    // Token-accounting mixture report: docs/token mass/corpus share per
    // source — the dashboard feeding q66's mixing rates. Scan-side
    // size(tokens), no explode; one shuffle + a group-cardinality window.
    "q97_token_accounting" -> ((s, dir) =>
      graft.text.Corpus.tokenAccounting(Tables(s, dir).documents,
        "source", "text")),

    // Water-filling token-budget allocation: 60% of the corpus budgeted
    // across sources with src0-2 weighted 10×. The heavy sources demand
    // ~2.5× their supply → capped round 1; their shortfall re-floods
    // the 17 light sources round 2. q97 measures, this PLANS, q66
    // executes.
    "q129_token_budget" -> ((s, dir) => {
      val ps = Tables(s, dir).documents
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy(col("source")).agg(sum(col("__nt")).as("avail"))
      graft.ops.Sampling.waterFillAllocation(ps, "source", "avail",
        budgetWeights, defaultWeight = 1L, budgetNum = 3L, budgetDen = 5L)
    }),

    // T5-style span corruption: aligned 3-token spans masked by a
    // reproducible keyed hash (1-in-5), emitted as (input with
    // <extra_id_N> sentinels, target with the hidden spans) — the
    // denoising-objective layout next to q361's causal blocks.
    "q365_span_corrupt" -> ((s, dir) =>
      graft.ops.Packing.spanCorrupt(Tables(s, dir).documents,
        "doc_id", "text")),

    // GPT-style pretraining block layout: the whole corpus as ONE
    // virtual token stream in doc_id order (<eod> after each doc), cut
    // into fixed 128-token blocks that CROSS document boundaries — the
    // layout a causal-LM batch reader actually consumes, q67's
    // per-shard windows globalized via range-shard offsets (never a
    // corpus-wide single-partition window).
    "q361_pretrain_blocks" -> ((s, dir) =>
      graft.ops.Packing.pretrainBlocks(Tables(s, dir).documents,
        "doc_id", "text", blockTokens = 128)),

    // Tokenizer application: every token to its q78-vocabulary rank
    // (OOV -> 0), long form (doc, pos, id). Corpus side never shuffles;
    // the vocab join broadcasts.
  )

  def oracleSql: Map[String, String] = Map(
    "q188_global_ordinals" ->
      """SELECT doc_id, source,
        |       CAST(row_number() OVER (ORDER BY source, doc_id) AS BIGINT)
        |         AS ordinal
        |FROM documents""".stripMargin,

    "q214_interval_merge" -> graft.ops.RangeJoin.intervalMergeOracleSql(
      """SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |       epoch_us(ts) // 1000000 + CAST(floor(value) AS BIGINT) AS e
        |FROM events""".stripMargin,
      Seq("user_id")),

    "q305_availability" -> graft.ops.RangeJoin.availabilityOracleSql(
      """SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |       epoch_us(ts) // 1000000 + CAST(floor(value) AS BIGINT) AS e
        |FROM events""".stripMargin,
      Seq("user_id")),

    "q224_interval_gaps" -> graft.ops.RangeJoin.intervalGapsOracleSql(
      """SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |       epoch_us(ts) // 1000000 + CAST(floor(value) AS BIGINT) AS e
        |FROM events""".stripMargin,
      Seq("user_id")),

    "q230_rendezvous" -> graft.ops.Sharding.rendezvousStabilityOracleSql(
      "SELECT doc_id FROM documents", "doc_id", nA = 8, nB = 9),

    "q418_shard_layout" -> graft.ops.Sharding.shardLayoutOracleSql(
      "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens FROM documents",
      "doc_id", nShards = 8, salt = "layout-v1"),

    "q445_curriculum_layout" ->
      graft.ops.Sharding.curriculumShardLayoutOracleSql(
        """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens,
          |       n_chars // 500 AS bucket FROM documents""".stripMargin,
        "doc_id", nShards = 8, salt = "layout-v1"),

    "q419_interleave_audit" -> graft.ops.Sharding.interleaveAuditOracleSql(
      "SELECT source, doc_id FROM documents", "source", "doc_id",
      nBlocks = 16, salt = "ilv-v1"),

    "q441_interleave_tokens" ->
      graft.ops.Sharding.interleaveTokensOracleSql(
        "SELECT source, doc_id, CAST(n_chars AS BIGINT) AS tok FROM documents",
        "source", "doc_id", nBlocks = 16, salt = "ilv-v1"),

    "q270_source_ablation" -> graft.text.Corpus.sourceAblationOracleSql(
      "SELECT source, CAST(n_chars AS BIGINT) AS m FROM documents",
      "source"),

    "q264_token_shift" -> graft.text.Corpus.tokenShareShiftOracleSql(
      s"SELECT ${Text.toksSql} AS toks FROM documents WHERE source = 'src0'",
      s"SELECT ${Text.toksSql} AS toks FROM documents WHERE source <> 'src0'"),

    "q257_path_rollup" -> graft.text.Urls.pathRollupOracleSql(
      "documents", s"($dirtyUrlSql)"),

    "q240_field_diff" -> graft.ops.Merge.fieldDiffOracleSql(
      "SELECT doc_id, text, lang, source FROM documents",
      """SELECT doc_id,
        |       CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
        |            ELSE text END AS text,
        |       CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
        |       source
        |FROM documents""".stripMargin,
      Seq("doc_id"), Seq("text", "lang", "source")),

    "q236_jump_shards" -> graft.ops.Sharding.jumpStabilityOracleSql(
      "SELECT doc_id FROM documents", "doc_id", nA = 64, nB = 65),

    "q233_apportion" -> graft.ops.Sampling.apportionOracleSql(
      """SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
        |FROM documents GROUP BY 1""".stripMargin,
      "source", seats = 1000003L),

    "q215_quantile_map" -> graft.ops.Quantiles.quantileMapOracleSql(
      "SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents",
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
        |WHERE source = 'src0'""".stripMargin,
      Seq("doc_id", "v"), (1 to 9).map(i => (i, 10))),

    "q190_datasheet" -> graft.text.Corpus.datasheetOracleSql(
      "documents", "source", "doc_id", "text", "lang"),

    "q180_vocab_overlap" -> graft.text.Corpus.vocabOverlapOracleSql(
      "documents", "source", Text.toksSql),

    "q181_js_divergence" -> graft.text.Corpus.sourceDivergenceOracleSql(
      "documents", "source", Text.toksSql, buckets = 4096),

    "q183_golden_record" -> graft.ops.Merge.goldenRecordsOracleSql(
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       source, lang, doc_id FROM documents""".stripMargin,
      "fp", Seq("source", "lang", "doc_id")),

    // Same integer recurrence: base copies alloc // n, the alloc % n
    // earliest docs in salted order get one more.
    "q150_exact_replicate" ->
      s"""WITH n AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY 1
        |), t AS (
        |  SELECT source, n,
        |         CASE WHEN source = 'src0' THEN n * 2
        |              WHEN source = 'src1' THEN n
        |              ELSE (2 * n) // 5 END AS alloc
        |  FROM n
        |), r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY ${graft.ops.Sampling.capPrioritySql("doc_id", replSalt)}, doc_id) AS rn
        |  FROM documents
        |), c AS (
        |  SELECT r.doc_id, r.source,
        |         (t.alloc // t.n) + CASE WHEN r.rn <= t.alloc % t.n THEN 1 ELSE 0 END AS k
        |  FROM r JOIN t USING (source)
        |)
        |SELECT doc_id, source, unnest(range(1, k + 1)) AS copy_idx
        |FROM c WHERE k >= 1""".stripMargin,

    "q141_temp_mixture" -> graft.ops.Sampling.temperatureOracleSql(
      "SELECT source, count(*) AS n FROM documents GROUP BY 1",
      budgetNum = 3L, budgetDen = 5L),

    "q139_dsir_weights" -> graft.text.Dsir.importanceOracleSql(
      docsSql = s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents",
      targetSql = s"""SELECT doc_id, ${Text.toksSql} AS toks FROM documents
                     | WHERE source IN (${dsirTarget.map(s => s"'$s'").mkString(", ")})""".stripMargin,
      rawSql = s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents",
      buckets = dsirBuckets),

    "q50_corpus" -> {
      val smp = graft.ops.Sampling.hashBucketSql("doc_id", "corp-smp")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + $plantShiftSql AS doc_id, text, lang
        |  FROM documents WHERE doc_id % 7 = 0
        |), sampled AS (
        |  SELECT * FROM all_docs
        |  WHERE $smp < ${graft.ops.Sampling.rateThresholdSql("lang", corpusRates, corpusDefaultRate)}
        |), deduped AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |    FROM sampled
        |  ) WHERE rn = 1
        |), scored AS (
        |  SELECT doc_id, lang,
        |         CAST(len(toks) AS INTEGER) AS n_tokens,
        |         least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
        |           + (1.0 - CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
        |                      / greatest(len(toks), 1)) * 0.3
        |           + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
        |                      / greatest(length(text), 1)) * 0.1 AS quality
        |  FROM (SELECT doc_id, text, lang, ${Text.toksSql} AS toks FROM deduped)
        |)
        |SELECT doc_id, lang, n_tokens, quality,
        |       ${graft.ops.Sampling.splitCaseSql("doc_id", "corp-spl", corpusSplits)} AS split
        |FROM scored WHERE quality >= 0.6""".stripMargin
    },

    "q66_domain_mix" ->
      s"""WITH counts AS (
        |  SELECT source, count(*) AS __n_s FROM documents GROUP BY 1
        |), tot AS (SELECT count(*) AS __n FROM documents)
        |SELECT doc_id, source
        |FROM documents JOIN counts USING (source), tot
        |WHERE ${graft.ops.Sampling.mixPredicateSql("doc_id", "source",
            mixTargets, mixDefault, mixTotalNum, mixTotalDen, mixSalt)}""".stripMargin,

    "q160_anchor_text" -> {
      val (hrefsSql, anchorsSql) = graft.text.Urls.extractAnchorsSql("html")
      s"""WITH pages AS (
        |  SELECT '<p>' || text || '</p><a href="https://www.site' ||
        |         CAST((doc_id + 1) % 7 AS VARCHAR) || '.com/p">' ||
        |         substr(text, 1, 30) ||
        |         '</a><a href="http://www.site' ||
        |         CAST((doc_id + 3) % 7 AS VARCHAR) ||
        |         '.com/q">read more ' || source || '</a>' AS html
        |  FROM documents
        |), an AS (
        |  SELECT unnest($hrefsSql) AS href,
        |         unnest($anchorsSql) AS anchor
        |  FROM pages
        |), tok AS (
        |  SELECT ${graft.text.Urls.hostSql("href")} AS dst_host,
        |         unnest(list_filter(
        |           string_split_regex(lower(anchor), '[^a-z0-9]+'),
        |           x -> x <> '')) AS token
        |  FROM an
        |), c AS (
        |  SELECT dst_host, token, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2
        |)
        |SELECT dst_host, token, c, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY dst_host
        |    ORDER BY c DESC, token) AS BIGINT) AS rank
        |  FROM c
        |) WHERE rank <= 3""".stripMargin
    },

    "q402_packed_mask" -> graft.ops.Packing.packedMaskAccountingOracleSql(
      "documents", "doc_id", Text.toksSql, capacity = packCapacity,
      shards = packShards, salt = packSalt),

    "q67_packing" ->
      s"""SELECT doc_id,
        |       ${graft.ops.Sampling.hashBucketSql("doc_id", packSalt, packShards)} AS shard,
        |       CAST(len(${Text.toksSql}) AS BIGINT) AS n_tokens,
        |       CAST(sum(CAST(len(${Text.toksSql}) AS BIGINT)) OVER w
        |         - CAST(len(${Text.toksSql}) AS BIGINT) AS BIGINT) AS start_off,
        |       CAST((sum(CAST(len(${Text.toksSql}) AS BIGINT)) OVER w
        |         - CAST(len(${Text.toksSql}) AS BIGINT)) // $packCapacity
        |         AS BIGINT) AS window
        |FROM documents
        |WINDOW w AS (
        |  PARTITION BY ${graft.ops.Sampling.hashBucketSql("doc_id", packSalt, packShards)}
        |  ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q158_length_batches" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |         ${graft.ops.Sampling.hashBucketSql("doc_id", packSalt, packShards)} AS shard,
        |         CAST(len(${Text.toksSql}) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, shard, n_tokens,
        |         length(bin(n_tokens)) AS bucket,
        |         row_number() OVER (PARTITION BY length(bin(n_tokens)), shard
        |           ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM base WHERE n_tokens >= 1
        |)
        |SELECT bucket, shard, CAST((rn - 1) // 32 AS BIGINT) AS batch,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS batch_tokens,
        |       max(n_tokens) AS batch_max,
        |       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding
        |FROM b GROUP BY 1, 2, 3""".stripMargin,

    "q77_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${Text.toksSql} AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |         list_filter(generate_series(0, len(toks) - 1, $chunkStride),
        |           st -> st = 0 OR st + ${chunkSize - chunkStride} < len(toks)) AS starts
        |  FROM t WHERE len(toks) > 0),
        |e AS (SELECT doc_id, toks, starts, unnest(starts) AS st FROM s)
        |SELECT doc_id,
        |       CAST(list_position(starts, st) - 1 AS BIGINT) AS chunk_idx,
        |       CAST(st AS BIGINT) AS start_off,
        |       CAST(len(list_slice(toks, st + 1, st + $chunkSize)) AS BIGINT) AS n_tokens,
        |       array_to_string(list_slice(toks, st + 1, st + $chunkSize), ' ') AS chunk_text
        |FROM e""".stripMargin,

    "q82_domain_cap" ->
      s"""WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY ${graft.ops.Sampling.capPrioritySql("doc_id", capSalt)}, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= $capK""".stripMargin,

    "q93_weighted_sample" ->
      s"""SELECT doc_id, n_chars FROM documents
        |WHERE ${graft.ops.Sampling.weightedSampleSql("doc_id", "n_chars", wtMaxW, wtSalt)}""".stripMargin,

    // The identical full-outer classification; presence via the side's
    // key (never fp-NULLness), digest equality via IS DISTINCT FROM.
    "q117_snapshot_diff" ->
      s"""WITH v1 AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % $snapKeyMod <> 3
        |), v2 AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(
        |           CASE WHEN doc_id % $snapEditMod = 0 THEN text || ' rev2'
        |                ELSE text END), '\\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % $snapKeyMod <> 7
        |)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |       CASE WHEN v1.doc_id IS NULL THEN 'added'
        |            WHEN v2.doc_id IS NULL THEN 'removed'
        |            WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       v1.fp AS fp_old, v2.fp AS fp_new
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin,

    "q113_url_canonical" ->
      s"""SELECT doc_id,
        |       ${graft.text.Urls.canonicalSql(s"($dirtyUrlSql)")} AS url,
        |       ${graft.text.Urls.hostSql(s"($dirtyUrlSql)")} AS host
        |FROM documents""".stripMargin,

    // The identical FFD fold replayed as a recursive CTE, one doc per
    // shard per round, carrying the bin-load list.
    "q115_bin_packing" -> graft.ops.BinPack.ffdOracleSql(
      s"""SELECT doc_id,
         |       ${graft.ops.Sampling.hashBucketSql("doc_id", packSalt, packShards)} AS shard,
         |       CAST(len(${Text.toksSql}) AS BIGINT) AS n
         |FROM documents
         |WHERE len(${Text.toksSql}) BETWEEN 1 AND $packCapacity""".stripMargin,
      packCapacity),

    "q114_host_curation" ->
      s"""WITH h AS (
        |  SELECT doc_id, ${graft.text.Urls.hostSql(s"($dirtyUrlSql)")} AS host
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, host FROM h
        |  WHERE host NOT IN ${Text.inList(blockedHosts)}
        |), r AS (
        |  SELECT doc_id, host,
        |         row_number() OVER (PARTITION BY host
        |           ORDER BY ${graft.ops.Sampling.capPrioritySql("doc_id", hostCapSalt)}, doc_id) AS rn
        |  FROM f)
        |SELECT doc_id, host FROM r WHERE rn <= $hostCapK""".stripMargin,

    "q126_link_graph" ->
      s"""WITH pages AS (
        |  SELECT 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS src_host,
        |         '<html><p>' || text ||
        |         '</p><a href="https://WWW.Site' || CAST((doc_id + 1) % 7 AS VARCHAR) ||
        |         '.COM/p/' || CAST(doc_id AS VARCHAR) ||
        |         '"><a href="HTTP://www.site' || CAST((doc_id + 3) % 7 AS VARCHAR) ||
        |         '.com:80/q?utm_source=z&id=' || CAST(doc_id AS VARCHAR) ||
        |         '">' AS html
        |  FROM documents
        |), links AS (
        |  SELECT src_host,
        |         unnest(${graft.text.Urls.extractLinksSql("html")}) AS link
        |  FROM pages
        |)
        |SELECT src_host, ${graft.text.Urls.hostSql("link")} AS dst_host,
        |       CAST(count(*) AS BIGINT) AS n_links
        |FROM links
        |GROUP BY 1, 2""".stripMargin,

    "q129_token_budget" ->
      graft.ops.Sampling.waterFillOracleSql(
        s"SELECT source, sum(len(${Text.toksSql})) AS avail FROM documents GROUP BY 1",
        budgetWeights, defaultWeight = 1L, budgetNum = 3L, budgetDen = 5L),

    "q326_vocab_richness" ->
      graft.text.Corpus.vocabRichnessOracleSql(
        s"(SELECT source, ${Text.toksSql} AS toks FROM documents)",
        "source", Text.shinglesSql(3)),

    "q336_coverage_select" ->
      graft.ops.Coverage.greedyOracleSql(
        s"""SELECT source AS s, unnest(${Text.shinglesSql(3)}) AS u
           |FROM (SELECT source, ${Text.toksSql} AS toks FROM documents)"""
          .stripMargin,
        "source", k = 6),

    "q97_token_accounting" ->
      s"""WITH t AS (SELECT source, len(${Text.toksSql}) AS nt FROM documents),
        |g AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(nt) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1
        |)
        |SELECT source, n_docs, n_tokens,
        |       CAST(n_docs AS DOUBLE)
        |         / CAST(CAST(sum(n_docs) OVER () AS BIGINT) AS DOUBLE)
        |         AS doc_share,
        |       CAST(n_tokens AS DOUBLE)
        |         / CAST(CAST(sum(n_tokens) OVER () AS BIGINT) AS DOUBLE)
        |         AS token_share
        |FROM g""".stripMargin,

    "q365_span_corrupt" -> graft.ops.Packing.spanCorruptOracleSql(
      s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents"),

    "q361_pretrain_blocks" -> graft.ops.Packing.pretrainBlocksOracleSql(
      s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents",
      blockTokens = 128),

    // q78's vocabulary chain feeding a positional token join;
    // list_zip(toks, range) is the q58 position idiom.
  )
}
