package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.NearDup
import graft.functions.Hash64
import graft.text.TextAnalysis

/** Training-data text pipeline: token/char statistics, quality scoring,
  * language ID, fingerprinting, exact dedup, blocked token-set Jaccard.
  * All operators over the `documents` table; every query oracle-checked.
  */
object Text extends QueryModule {

  /** Shared DuckDB tokenization fragment (mirrors TextAnalysis.tokens). */
  private[queries] val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** q310: deflate-parity corpus — fixed strings spanning the signal's
    * regimes (empty, tiny, highly repetitive, natural prose, pseudo-
    * random base36, multi-byte UTF-8). Their raw-deflate lengths are
    * computed at ORACLE-GENERATION time by [[independentDeflateLen]]
    * (a separate Deflater drain, 64-byte buffer — different chunking
    * than the expression's 8 KiB reuse path) and embedded as VALUES:
    * the q112 precomputed-literal pattern, applied to the one native
    * expression DuckDB cannot recompute. */
  private val deflateParity: Seq[(Long, String)] = Seq(
    1L -> "",
    2L -> "a",
    3L -> "ab" * 500,
    4L -> ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet field until the evening settles"),
    5L -> Iterator.iterate(0x9E3779B9L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .take(400).map(x => java.lang.Long.toString(math.abs(x % 36), 36))
      .mkString,
    6L -> "café résumé — 中文テキスト mixed multi-byte content",
    7L -> "x" * 10000)

  /** Independent raw-deflate length (see [[deflateParity]]): same
    * settings as the native expression (default level, nowrap), naive
    * tiny-buffer drain. */
  private def independentDeflateLen(s: String): Int = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](64)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  /** q307: planted Unicode variants of ONE logical document — NFC title
    * case, NFD lowercase, fullwidth-ASCII + ideographic space, NFD
    * uppercase — plus one genuinely distinct control. Byte-distinct in
    * every pair, yet all four normalize to the same string; only the
    * normalize_text stage makes them dedup together (the raw fingerprint
    * of q22 treats all five as unique). Shared verbatim with the
    * oracle's VALUES literals. */
  private[graft] val unicodePlanted: Seq[(Long, String)] = Seq(
    9000001L -> "Café Touché — Déjà Vu Résumé Notes",
    9000002L -> "café touché — déjà vu résumé notes",
    9000003L -> "café touché　— déjà vu résumé　ｎｏｔｅｓ",
    9000004L -> "CAFÉ TOUCHÉ — DÉJÀ VU RÉSUMÉ NOTES",
    9000005L -> "a genuinely distinct planted document")

  /** q50's corpus config — oracle SQL derives from the same values. */
  private val corpusRates = Map("en" -> 0.8, "zh" -> 1.0)
  private val corpusDefaultRate = 0.5
  private val corpusSplits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q55/q56 config — shared by the Spark plan and the oracle SQL. */
  private val decontamW = 13
  private[queries] val bm25Terms = Seq("hash", "join", "spark", "vector")

  /** q129: mixture-planner weights — heavy sources that must cap. */
  private val budgetWeights =
    Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L)

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
  private val (prefixNum, prefixDen) = (3, 5)
  private val prefixW = 3

  /** q147: a DELIBERATELY small vocabulary — the corpus has ~31 token
    * types, so top-16 leaves a real OOV tail to measure. */
  private val oovVocabN = 16

  /** q150: extra-copy winner salt. */
  private val replSalt = "repl6"

  /** q139: DSIR target = the q129 budget-weighted "curated" sources;
    * 2¹² hashed-feature buckets. */
  private val dsirTarget = Seq("src0", "src1", "src2")
  private val dsirBuckets = 4096

  /** q73: 7-gram spans (short enough that the sf-test docs overlap). */
  private val spanW = 7

  /** q109: remove runs of ≥ 5 consecutive duplicated 7-grams (= verbatim
    * spans of ≥ 11 tokens); shorter scattered dup mass survives. The sf
    * corpora hold ~45 docs with ≥ 5-gram runs, so both arms fire. */
  private val spanRemovalMinRun = 5

  /** q110/q111: 16 BPE merges (the verdict's ≥16 bar); both the trained
    * merge table and the encode replay derive from the same constant. */
  private val bpeNMerges = 16

  /** q116: LM trained on doc_id % 11 ≠ 0 (x55's held-in split — the
    * held-out tenth plus junk docs pay unseen-bigram cost); bigrams
    * seen once are pruned, exercising the model-size lever. */
  private val (lmHoldMod, lmMinCount) = (11L, 2L)

  /** q117: snapshot v1 drops residue 3, v2 drops residue 7 (so both
    * added and removed keys exist), and v2 edits every 9th doc (so
    * `changed` is exercised alongside the untouched bulk). */
  private val (snapKeyMod, snapEditMod) = (13L, 9L)

  /** q112: 64-bucket hashed-feature linear quality model — English
    * stopwords weigh +3 (via their hash buckets), everything else −1,
    * so natural English scores above token salad. ONE weight vector,
    * built driver-side with the same hash both engines evaluate. */
  private val (qmD, qmSalt) = (64, "qm")
  private val qmWeights = graft.text.QualityModel.weightsFrom(qmD, qmSalt,
    TextAnalysis.stopEn.map(_ -> 3L).toMap, default = -1L)

  /** q113/q114: the corpus has no URL column, so the queries WRAP each
    * doc in a deterministic dirty URL on BOTH engines (the q91 recipe):
    * mixed-case scheme/host, rotating default/explicit ports, tracking
    * params, a fragment. 7 hosts; 2 blocklisted; cap 40 per host. */
  private val hostCapK = 40
  private val hostCapSalt = "hostcap"
  private val blockedHosts = Seq("www.site2.com", "www.site5.com")

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
  private val (chunkSize, chunkStride) = (32, 16)
  private val (linePer, lineMinTokens) = (12, 5)
  private val vocabTopN = 50

  /** q99: 16-token language-ID segments. q101: the split being audited. */
  private val segPer = 16
  private val leakSalt = "spl-leak"
  private val leakSplits =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** q82: at most 15 docs per source (sf sources hold 25 each, so the
    * cap genuinely cuts). */
  private val (capK, capSalt) = (15, "cap")

  /** q93: weight-proportional sampling scale — n_chars/600, docs at
    * ≥600 chars always kept (sf max is 553, so the cap arm is data-false
    * but contract-true). */
  private val (wtMaxW, wtSalt) = (600L, "wt")

  /** q91: the corpus is markup-free, so the query WRAPS each text in this
    * deterministic dirty shell (tags, entities, a doomed script block) on
    * BOTH engines — the strip is then genuinely exercised on every row
    * rather than tested as an identity. */
  private val markupPrefix = "<p class=\"x\">"
  private val markupSuffix = " <br/>tail &amp; &lt;b&gt; <script>no()</script>"

  /** DuckDB w-shingle fragment — the shared generator in [[NearDup]]. */
  private def shinglesSql(w: Int): String = NearDup.duckShinglesSql(w)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + char stats (whitespace/regex tokenizer).
    "q19_text_stats" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        TextAnalysis.avgTokenLen(toks).as("avg_token_len"))
    }),

    // Quality scoring: length/stopword/punctuation components.
    "q20_quality_score" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val stopRatio = TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn)
        .cast("double") / greatest(size(toks), lit(1))
      val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
      val punct = TextAnalysis.punctRatio(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        stopRatio.as("stop_ratio"),
        punct.as("punct_ratio"),
        lenScore.as("len_score"),
        (lenScore * lit(0.6) + (lit(1.0) - stopRatio) * lit(0.3) +
          (lit(1.0) - punct) * lit(0.1)).as("quality"))
    }),

    // Character-distribution entropy per doc: gibberish / encoded-blob
    // detector in exact bit-length-log integers (single-agg identity
    // h_q = n*blog(n) - sum k*blog(k); codegen substring over exploded
    // positions, never a per-doc char array).
    "q176_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(Tables(s, dir).documents, "doc_id", "text")),

    // Zipf decay slope per source over top-64 token ranks: corpus-health
    // scalar (natural language vs template spam), bit-length log-log
    // least squares on exact integer sums; q152's two-phase bounded rank.
    "q177_zipf" -> ((s, dir) =>
      graft.text.Spans.zipfSlope(Tables(s, dir).documents, "source",
        "text", topR = 64)),

    // Flesch-Kincaid readability: words/sentences/vowel-group syllables
    // as integer run counts (collapse-minus-delete identity), grade in
    // one fixed IEEE sequence.
    "q178_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables(s, dir).documents, "doc_id", "text")),

    // Middle-out truncation to a 64-token budget (keep 32 head + 16
    // tail): the context-window-fitting transform, pure per-row array
    // expression with kept/dropped accounting.
    "q179_truncate" -> ((s, dir) =>
      graft.text.Segments.truncateMiddleOut(Tables(s, dir).documents,
        "doc_id", "text", maxTokens = 64, headTokens = 32, tailTokens = 16)),

    // Language ID: stopword-hit argmax heuristic.
    "q21_lang_id" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn).as("en_hits"),
        TextAnalysis.stopwordHits(toks, TextAnalysis.stopEs).as("es_hits"),
        TextAnalysis.langId(toks).as("predicted_lang"))
    }),

    // Whitespace-normalized md5 document fingerprint.
    "q22_fingerprint" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Unicode-canonicalized dedup: normalize_text (native NFC +
    // width-fold + simple lower, expression #8) composed BEFORE the
    // fingerprint — the planted NFD / fullwidth / case variants of one
    // document (byte-distinct in every pair) collapse into a single
    // fingerprint group; q22's raw fingerprint sees five unique docs.
    "q307_unicode_dedup" -> ((s, dir) => {
      import s.implicits._
      val all = Tables(s, dir).documents
        .select(col("doc_id"), col("text"))
        .unionByName(unicodePlanted.toDF("doc_id", "text"))
      all
        .select(col("doc_id"),
          TextAnalysis.normalizedFingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_id"))
        .filter(col("n_docs") > 1)
    }),

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

    // Shared-line plagiarism pairs over the q70 dirty-union corpus:
    // doc pairs sharing >= 2 verbatim 12-token lines — passage-level
    // attribution where q24's token Jaccard only matches vocabulary.
    "q301_shared_lines" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionAll(dirty)
      graft.text.Segments.sharedLinePairs(all, "doc_id", "text",
        per = linePer, minShared = 2L)
    }),

    // Heaps vocabulary-growth curve: distinct vocab at doc-prefix
    // checkpoints via the first-occurrence identity — one pass, not
    // one scan per checkpoint; sizes the tokenizer budget.
    "q290_heaps" -> ((s, dir) =>
      graft.text.Corpus.heapsCurve(Tables(s, dir).documents,
        "doc_id", "text",
        checkpoints = Seq(50L, 100L, 200L, 500L, 1000L, 5000L))),

    // Duplicate propensity by length band: exact-dup rate (first-wins
    // fingerprint, the q23 convention) per 50-char band — "do short
    // docs duplicate more", the mix question a flat dup rate hides.
    "q292_dup_by_length" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.text.TextAnalysis.fingerprint(col("text")))
        .orderBy(col("doc_id"))
      docs
        .withColumn("__dup", (row_number().over(w) > 1).cast("long"))
        .withColumn("band", expr("CAST(n_chars AS LONG) div 50"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__dup")).as("n_dup"))
        .withColumn("dup_rate",
          col("n_dup").cast("double") / col("n_docs"))
    }),

    // Cohen's kappa: chance-corrected lang-ID agreement — the honest
    // one-number summary of q249's confusion matrix (raw accuracy
    // flatters the majority class).
    "q283_kappa" -> ((s, dir) =>
      graft.ops.Profiling.cohensKappa(
        Tables(s, dir).documents,
        col("lang"),
        graft.text.TextAnalysis.langId(
          graft.text.TextAnalysis.tokens(col("text"))))),

    // q166's SN candidates verified by native Jaro-Winkler (codegen
    // expression #7, bit-matching DuckDB's builtin): the name-style
    // linkage rule — transpositions near-free, prefixes boosted.
    "q281_sn_jw" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionAll(dirty)
      val key = concat_ws(" ", slice(sort_array(array_distinct(
        graft.text.TextAnalysis.tokens(col("text")))), 1, 3))
      NearDup.sortedNeighborhoodJwPairs(all, "doc_id",
        substring(col("text"), 1, 80), key, window = 10, minJw = 0.8)
    }),

    // Source ablation: the corpus mean-length WITHOUT each source,
    // from one aggregation pass — the leave-one-group-out
    // data-valuation cut ("which source drags the metric").
    "q270_source_ablation" -> ((s, dir) =>
      graft.text.Corpus.sourceAblation(Tables(s, dir).documents,
        "source", col("n_chars").cast("long"))),

    // Rocchio PRF expansion: what the q56 query "meant but didn't
    // say" — top tokens of the top-3 BM25 docs by tf·N/df, query
    // terms excluded.
    "q272_rocchio" -> ((s, dir) =>
      graft.text.Retrieval.rocchioExpansion(Tables(s, dir).documents,
        "doc_id", "text", bm25Terms)),

    // Best-passage extraction: per doc, the 10-token span with the
    // most query-term hits (anchored at hit positions — bounded by
    // hits, not length); the span picker between q56's ranking and
    // q209's every-hit KWIC.
    "q267_best_passage" -> ((s, dir) =>
      graft.text.Retrieval.bestPassage(Tables(s, dir).documents,
        "doc_id", "text", terms = Seq("spark", "data", "join"),
        window = 10)),

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

    // Language confusion matrix: declared lang vs q21's detected lang,
    // with margins and diagonal precision/recall — WHICH languages
    // bleed into which, the sliced view behind the lang-ID accuracy.
    "q249_lang_confusion" -> ((s, dir) =>
      graft.ops.Eval.confusionMatrix(
        Tables(s, dir).documents,
        actual = col("lang"),
        predicted = graft.text.TextAnalysis.langId(
          graft.text.TextAnalysis.tokens(col("text"))))),

    // Boilerplate REMOVAL over q127's injected template corpus: the
    // transform the report only points at — nav-bar lines dropped from
    // EVERY doc (no first-occurrence survivor), payload reassembled.
    "q250_deboilerplate" -> ((s, dir) => {
      val corpus = Tables(s, dir).documents
        .withColumn("text", concat(
          lit("welcome to "), col("source"),
          lit(" home news about products downloads support faq contact legal "),
          col("text")))
      graft.text.Segments.removeBoilerplate(corpus, "doc_id", "text",
        "source", per = linePer, minFrac = 0.5)
    }),

    // RAKE keyphrases: top multi-word phrases from stopword-free token
    // runs, word deg/freq scoring in integer micros — the phrase-level
    // keyword surface q102's TF-IDF unigrams can't produce.
    "q245_rake" -> ((s, dir) =>
      graft.text.Retrieval.rakeKeyphrases(Tables(s, dir).documents,
        "doc_id", "text", graft.text.TextAnalysis.stopEn)),

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

    // KWIC snippets around the first "spark" occurrence: the result-
    // page context view next to the q56 BM25 score; pure per-row array
    // expressions.
    "q209_kwic" -> ((s, dir) =>
      graft.text.Retrieval.kwicSnippets(Tables(s, dir).documents,
        "doc_id", "text", term = "spark", window = 3)),

    // Bigram-LM next-token top-1 accuracy: the cheapest LM eval —
    // weighted hits of each left-context's modal successor.
    "q210_next_token_acc" -> ((s, dir) =>
      graft.text.LangModel.nextTokenAccuracy(
        Tables(s, dir).documents, "text")),

    // Calibration curve + per-bin ECE of the q20 quality score against
    // an English-language outcome: equal-width probability bins (the
    // reliability-diagram convention), confidence mass and ECE terms as
    // exact integer micros. The q20 doubles are bit-identical
    // cross-engine, so trunc(q*1e6) is a portable integer score.
    "q206_calibration" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val stopRatio = TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn)
        .cast("double") / greatest(size(toks), lit(1))
      val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
      val punct = TextAnalysis.punctRatio(col("text"))
      val quality = lenScore * lit(0.6) + (lit(1.0) - stopRatio) * lit(0.3) +
        (lit(1.0) - punct) * lit(0.1)
      val scored = Tables(s, dir).documents.select(
        (quality * lit(1000000.0)).cast("long").as("p"),
        (col("lang") === "en").cast("long").as("y"))
      graft.ops.Eval.calibrationCurve(scored, col("p"), col("y"))
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

    // Exact dedup: hash-groupBy over content fingerprint. Duplicates are
    // injected (10% resample) since the corpus has none — the query must
    // collapse them back to one group per distinct text.
    "q23_dedup_docs" -> ((s, dir) => {
      val base = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val withDupes = base.unionAll(base.filter(col("doc_id") % 10 === 0))
      withDupes
        .withColumn("fp", md5(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
    }),

    // Blocked token-set Jaccard near-dup pairs (the LSH verify stage,
    // standalone): keyed shuffles only, with a document-frequency cut —
    // tokens in >80% of documents are dropped before the self-join
    // (stopword-grade tokens otherwise fan out O(df²) per token). The
    // fraction scales with the corpus, so semantics are SF-invariant.
    "q24_token_jaccard" -> ((s, dir) =>
      NearDup.tokenJaccardPairs(Tables(s, dir).documents,
        "doc_id", "text", "source", minJaccard = 0.9, maxDfFrac = 0.8)),

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

    // Decontamination REMOVAL: the q55 report's enforcing transform —
    // the train split (doc_id % 11 != 0) minus every doc sharing a
    // 13-gram with the held-out bench split. One anti-join on the
    // report's plan; what actually ships to training.
    "q148_decontam_removal" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      graft.text.Decontaminate.removeContaminated(
          docs.filter(col("doc_id") % 11 =!= 0),
          docs.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", w = decontamW)
        .select(col("doc_id"), col("source"))
    }),

    // Per-doc curation DECISION RECORD: one pass assigning each doc its
    // first-failing gate — encoding (q125 signals) → language (q21
    // heuristic) → quality (q140's per-source p25 length cut) →
    // exact-duplicate (q23 fingerprint first-wins) → kept. The audit
    // table a production pipeline logs so every drop is explainable;
    // plan = one fingerprint window + a broadcast cut join, scan-side
    // CASE otherwise.
    "q149_curation_record" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val moji = graft.text.Scrub.countMojibake(col("text"))
      val ascii = graft.text.Scrub.asciiFraction(col("text"))
      val lang = TextAnalysis.langId(TextAnalysis.tokens(col("text")))
      val cuts = graft.ops.Quantiles.exact(docs, Seq(col("source")),
          col("n_chars"), Seq(0.25))
        .withColumnRenamed("p25", "cut")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TextAnalysis.fingerprint(col("text")))
        .orderBy(col("doc_id"))
      docs
        .withColumn("__rn", row_number().over(w))
        .join(broadcast(cuts), "source")
        .select(col("doc_id"), col("source"),
          when(moji > 0 || ascii < 0.9, "encoding")
            .when(lang =!= "en", "language")
            .when(col("n_chars") < col("cut"), "quality")
            .when(col("__rn") > 1, "duplicate")
            .otherwise("kept").as("verdict"))
    }),

    // Per-source tokenizer fertility: aggregate pre-tokens per
    // whitespace token BY SOURCE — q131 measures the inflation per doc;
    // mixture-level token budgeting (q129/q141) needs it per source.
    // Integer sums, one final division.
    "q146_fertility" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("__ws"),
          TextAnalysis.preTokenCount(col("text")).as("__pre"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__ws")).as("ws_tokens"),
          sum(col("__pre")).as("pre_tokens"))
        .withColumn("fertility",
          when(col("ws_tokens") > 0,
            col("pre_tokens").cast("double") /
              col("ws_tokens").cast("double")))),

    // Per-source OOV rate against the q78-style frequency vocabulary
    // (top-16 here, small enough that the tail is genuinely OOV): which
    // sources will inflate a fixed tokenizer's unknown-token mass. One
    // corpus scan + a broadcast vocab join.
    "q147_oov_rate" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val vocab = graft.text.Spans.vocabulary(docs, "doc_id", "text",
          oovVocabN)
        .select(col("token"), lit(1L).as("__in"))
      docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_micro",
          floor(col("n_oov").cast("double") * 1000000.0 /
            col("n_tokens").cast("double")).cast("long"))
    }),

    // Corpus novelty: fraction of each doc's 7-gram positions whose
    // shingle FIRST appears in that doc (doc_id = ingestion order) —
    // the directional signal q73's symmetric dup_frac can't give:
    // originals stay novel, later copies pay.
    "q142_novelty" -> ((s, dir) =>
      graft.text.Spans.noveltyProfile(Tables(s, dir).documents,
        "doc_id", "text", w = spanW)),

    // Per-source n-gram diversity: distinct-trigram ratio + top-10-gram
    // concentration — the CROSS-document mode-collapse signal per-doc
    // repetition (q54) can't see: a generator that never repeats inside
    // a doc but reuses phrasings across docs lights up only here.
    "q152_ngram_diversity" -> ((s, dir) =>
      graft.text.Spans.ngramDiversity(Tables(s, dir).documents,
        "source", "text")),

    // Per-source ADAPTIVE quality gate (CCNet's per-language percentile
    // pattern): each source keeps docs at/above its OWN 25th-percentile
    // length — a global cut would gut short-form sources and pass
    // everything in long-form ones. Exact integer rank cut, broadcast
    // back, scan-side filter.
    "q140_adaptive_gate" -> ((s, dir) =>
      graft.ops.Quantiles.percentileGate(
          Tables(s, dir).documents.select(col("doc_id"), col("source"),
            col("n_chars")),
          "source", col("n_chars"), 0.25)
        .select(col("doc_id"), col("source"), col("n_chars"), col("cut"))),

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

    // Content-defined chunking dedup profile: rolling-window boundaries
    // (hash of trailing 8 chars ≡ 0 mod 64) make chunk identity survive
    // prefix edits — the shift-resilient dedup signal whole-doc
    // fingerprints (q23) and positionless gram fractions (q73) miss.
    "q154_cdc_chunks" -> ((s, dir) =>
      graft.text.Cdc.chunkDedupProfile(Tables(s, dir).documents,
        "doc_id", "text")),

    // Trained multinomial Naive Bayes (hashed features, Dsir's model
    // shape): per-class token-count tables learned from the labeled
    // corpus, every doc classified by integer bit-length surprisal —
    // the learned step up from q21's fixed heuristic langid. NOTE: the
    // synthetic corpus draws every doc's text from ONE shared vocabulary
    // regardless of its lang label, so the learned verdict here is
    // (correctly) the majority class for all docs — separable classes
    // are exercised by the TextOpsSpec planted-vocab case.
    "q155_naive_bayes" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      graft.text.NaiveBayes
        .trainAndClassify(d, "lang", "text", d, "doc_id")
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("correct", col("pred_label") === col("lang"))
    }),

    // Prefix-filter (AllPairs/PPJoin) similarity join: EVERY pair with
    // 3-gram shingle Jaccard ≥ 0.6, no blocking key, no df-cut, no LSH
    // false negatives — the completeness-guaranteed exact join.
    // Candidates collide only on each doc's rarest (1-t)-fraction
    // shingles in global df order, pruned by length + position filters.
    "q137_prefix_join" -> ((s, dir) =>
      NearDup.prefixFilterJaccardPairs(Tables(s, dir).documents,
        "doc_id", "text", num = prefixNum, den = prefixDen, w = prefixW)),

    // Encoding-corruption report, exercised on injected damage: every
    // 17th document gets the classic UTF-8-as-Latin-1 artifact ('a' →
    // 'Ã¡'), and the three signals (mojibake marks, C0 controls, ASCII
    // fraction) flag exactly those. The cleaning sibling
    // (Scrub.stripControl) is spec-covered.
    "q125_encoding_report" -> ((s, dir) => {
      val corpus = Tables(s, dir).documents
        .withColumn("text",
          when(col("doc_id") % 17 === 0,
            regexp_replace(col("text"), "a", "Ã¡"))
            .otherwise(col("text")))
      corpus.select(col("doc_id"),
          graft.text.Scrub.countMojibake(col("text")).as("n_moji"),
          graft.text.Scrub.countControl(col("text")).as("n_ctrl"),
          graft.text.Scrub.asciiFraction(col("text")).as("ascii_frac"))
        .withColumn("corrupt",
          (col("n_moji") > 0 || col("ascii_frac") < 0.9).cast("long"))
    }),

    // Asymmetric containment, exercised on its distinctive case: 240-char
    // snippet docs injected from every 13th document. Snippet→parent
    // containment ≈ 1 while the pair's Jaccard is far below any dedup
    // threshold — q24 structurally cannot see these.
    "q120_containment" -> ((s, dir) => {
      val base = Tables(s, dir).documents.select("doc_id", "text", "source")
      val snippets = base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          substring(col("text"), 1, 240).as("text"), col("source"))
      NearDup.tokenContainmentPairs(base.unionAll(snippets),
        "doc_id", "text", "source", minContainment = 0.9, maxDfFrac = 0.8)
    }),

    // The flagship composition: sample → dedup → quality floor → split as
    // ONE declarative plan with a single shuffle, oracle-checked end to
    // end. Dups injected (doc_id%7, shifted ids) so the dedup stage has
    // real work; rates/threshold chosen to make every stage selective.
    "q50_corpus" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val withDupes = base.unionAll(
        base.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 500000))
      graft.text.Corpus.build(withDupes, "doc_id", "text", "lang",
        corpusRates, corpusDefaultRate, minQuality = 0.6, salt = "corp",
        splits = corpusSplits)
    }),

    // Repetition signals (Gopher/C4-style quality filters): fraction of
    // tokens that are repeats, share of the most frequent token, and share
    // of the most frequent 2-gram. High values mark boilerplate/spam for
    // exclusion. One explode + two keyed aggregations per signal family.
    "q54_repetition" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val toks = docs.select(col("doc_id"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      val tokStats = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_tok"))
      val grams = docs
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          explode(NearDup.shingles(col("__toks"), 2)).as("g"))
      val gramStats = grams.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_gram"))
      tokStats.join(gramStats, Seq("doc_id"))
        .select(col("doc_id"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_tok_frac"),
          (col("top_tok").cast("double") / col("n_tokens")).as("top_tok_frac"),
          (col("top_gram").cast("double") / col("n_grams")).as("top_2gram_frac"))
    }),

    // PII scrub: plant synthetic emails/IPs/phones deterministically (the
    // corpus has none), count on the original text, redact, emit the
    // scrubbed text's fingerprint so the oracle proves byte-exact redaction.
    "q53_pii_scrub" -> ((s, dir) => {
      val planted = Tables(s, dir).documents.withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
          .when(col("doc_id") % 5 === 1,
            concat(lit("from 10.0."), (col("doc_id") % 200).cast("string"), lit(".7 "), col("text")))
          .when(col("doc_id") % 5 === 2,
            concat(col("text"), lit(" call +1 555 01"), (col("doc_id") % 90 + 10).cast("string"), lit(" 0199")))
          .otherwise(col("text")))
      planted.select(
        col("doc_id"),
        graft.text.Scrub.countEmails(col("text")).as("n_emails"),
        graft.text.Scrub.countIps(col("text")).as("n_ips"),
        graft.text.Scrub.countPhones(col("text")).as("n_phones"),
        md5(graft.text.Scrub.scrub(col("text"))).as("scrubbed_fp"))
    }),

    // n-gram (3-shingle) Jaccard: word-order-sensitive near-dup — the
    // exact counterpart of q27's MinHash estimate, same keyed-shuffle plan
    // as q24 with shingles as the join unit. No df-cut: 3-grams are
    // self-discriminating (max df 25 of 5000 docs in this corpus), so the
    // cut would add a shuffle + a second shingle evaluation to remove
    // nothing; the maxDfFrac guard remains available for corpora with
    // boilerplate n-grams.
    "q34_ngram_jaccard" -> ((s, dir) =>
      NearDup.ngramJaccardPairs(Tables(s, dir).documents,
        "doc_id", "text", "source", minJaccard = 0.8)),

    // Benchmark decontamination: flag training docs sharing any 13-token
    // shingle with the held-out benchmark slice (doc_id % 11 — the corpus
    // carries injected near-dups, so matches are true leaks). One keyed
    // join; AQE broadcasts the benchmark side on its own.
    "q55_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      graft.text.Decontaminate.overlap(
        docs.filter(col("doc_id") % 11 =!= 0),
        docs.filter(col("doc_id") % 11 === 0),
        "doc_id", "text", w = decontamW)
    }),

    // BM25-family ranked retrieval for a literal term list (log-free RSJ
    // idf for cross-engine bit parity — see graft.text.Retrieval).
    "q56_bm25" -> ((s, dir) =>
      graft.text.Retrieval.bm25(
        Tables(s, dir).documents, "doc_id", "text", bm25Terms)),

    // Inverted index build: token → (df, sorted posting list). One keyed
    // shuffle; postings sort deterministically so the index (and its
    // oracle) is byte-stable. The distributed half of retrieval-index
    // construction — q56 scores, this one serves. Postings are emitted
    // as a comma-joined string (sorted numerically FIRST, then cast)
    // because the verification comparator cannot sort array columns.
    "q59_inverted_index" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), explode(array_distinct(
          TextAnalysis.tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          array_join(transform(sort_array(collect_list(col("doc_id"))),
            d => d.cast("string")), ",").as("postings"))
        .filter(col("df") >= 2)),

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

    // Length-bucketed batching (the keep-docs-whole alternative to q67's
    // concat-and-chunk): power-of-2 length buckets, batches pad only to
    // their own max — per-batch padding accounting for inference and
    // finetuning layouts.
    "q158_length_batches" -> ((s, dir) =>
      graft.ops.Packing.lengthBucketedBatches(Tables(s, dir).documents,
        "doc_id", "text", batchSize = 32, shards = packShards,
        salt = packSalt)),

    // Record linkage: a deterministically-dirtied slice (first token
    // dropped, shifted ids) matched back to the canonical corpus by
    // blocked 3-shingle Jaccard — entity resolution across two tables
    // (token sets are too loose over this small vocabulary; shingles
    // keep the match one-to-few).
    "q70_record_link" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"),
          col("source"))
      NearDup.tokenLinkPairs(dirty, docs, "doc_id", "text", "source",
        minJaccard = 0.7, w = 3)
    }),

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

    // Sorted-neighborhood blocking over the same dirty slice q70 links
    // by shingle overlap: records sort by a fabricated key (first three
    // distinct tokens, sorted — robust to q70's dropped-head-token
    // dirt), candidates are the ≤9 neighbors in key order per bucket —
    // O(n·window) pairs however skewed any blocking value is.
    "q162_sorted_neighborhood" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionAll(dirty)
      val key = concat_ws(" ", slice(sort_array(array_distinct(
        graft.text.TextAnalysis.tokens(col("text")))), 1, 3))
      NearDup.sortedNeighborhoodPairs(all, "doc_id", "text", key,
        window = 10, minJaccardNum = 7, minJaccardDen = 10)
    }),

    // q162's SN candidates verified by EDIT DISTANCE on the 80-char
    // prefix — the character-level rule token sets can't see; Spark
    // runs the thresholded O(len·maxDist) form, the oracle the full
    // matrix (identical accepted distances).
    "q166_sn_edit_distance" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionAll(dirty)
      val key = concat_ws(" ", slice(sort_array(array_distinct(
        graft.text.TextAnalysis.tokens(col("text")))), 1, 3))
      NearDup.sortedNeighborhoodEditPairs(all, "doc_id",
        substring(col("text"), 1, 80), key, window = 10, maxDist = 25)
    }),

    // Duplicated-span profile: fraction of each doc's 7-gram positions
    // whose shingle appears in >= 2 documents — the partial-copy signal
    // document-level dedup misses. Hashed grams (portable) on the wire.
    "q73_dup_spans" -> ((s, dir) =>
      graft.text.Spans.duplicatedSpans(Tables(s, dir).documents,
        "doc_id", "text", w = spanW, minDf = 2)),

    // Corpus-relative token rarity: log-free unigram-LM quality proxy,
    // integer-exact df sums, one final division.
    "q74_token_rarity" -> ((s, dir) =>
      graft.text.Spans.tokenRarity(Tables(s, dir).documents,
        "doc_id", "text")),

    // Sliding-window token chunking (training-sequence prep): 32-token
    // windows every 16, full coverage with a single ragged tail; pure
    // projection + generator, zero shuffles.
    "q77_chunks" -> ((s, dir) =>
      graft.text.Segments.chunkWithStride(Tables(s, dir).documents,
        "doc_id", "text", chunkSize, chunkStride)),

    // Exact vocabulary: top-50 tokens by corpus frequency with document
    // frequency (deterministic tie-break) via TakeOrderedAndProject —
    // distributed top-k, no single-partition global sort.
    "q78_vocab" -> ((s, dir) =>
      graft.text.Spans.vocabulary(Tables(s, dir).documents,
        "doc_id", "text", vocabTopN)),

    // C4-style line-level quality filter with per-document reassembly
    // (lines = 12-token spans; keep: >= 5 tokens and an English-stopword
    // hit). Zero shuffles.
    "q80_line_filter" -> ((s, dir) =>
      graft.text.Segments.lineFilterDocs(Tables(s, dir).documents,
        "doc_id", "text", linePer, lineMinTokens)),

    // Corpus-wide first-occurrence line dedup (CCNet/Dolma paragraph
    // dedup) with ordered reassembly; first-wins window over the hashed
    // line, partition bounded by duplicate multiplicity.
    "q81_line_dedup" -> ((s, dir) =>
      graft.text.Segments.lineDedupDocs(Tables(s, dir).documents,
        "doc_id", "text", linePer)),

    // WITHIN-doc line dedup (self-repetition removal), exercised on an
    // injected self-repetitive corpus: each doc truncated to a whole
    // number of lines then self-concatenated, so every second line is a
    // repeat. Zero shuffles — first-occurrence is a pure array
    // expression; q81 is the corpus-wide (shuffling) sibling.
    "q136_selfrep_dedup" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val whole = size(toks) - pmod(size(toks), lit(linePer))
      val head = slice(toks, lit(1), whole)
      val selfRep = Tables(s, dir).documents.select(col("doc_id"),
        array_join(concat(head, head), " ").as("text"))
      graft.text.Segments.lineDedupWithinDoc(selfRep, "doc_id", "text",
        linePer)
    }),

    // Per-source document cap: deterministic hash-order reservoir — the
    // absolute-volume bound corpus mixing applies before q66's rate
    // balancing. The two-phase bounded-buffer form (mega-key-safe; the
    // window form is capPerKey); same winners, same oracle.
    "q82_domain_cap" -> ((s, dir) =>
      graft.ops.Sampling.capPerKeyIds(Tables(s, dir).documents,
          "source", "doc_id", capK, salt = capSalt)
        .select(col("doc_id"), col("source"))),

    // Corpus bigram counts, top-20 (the BPE-training inner loop: rank 1
    // is the next merge). Zero-shuffle pair construction, one counted
    // aggregation, TakeOrdered top-N.
    "q92_bigrams" -> ((s, dir) =>
      graft.text.Spans.topBigrams(Tables(s, dir).documents,
        "doc_id", "text", topN = 20)),

    // Weight-proportional deterministic sampling: survival rate
    // n_chars/600 per doc — quality-weighted corpus thinning as a pure
    // integer scan predicate (no RNG, no shuffle).
    "q93_weighted_sample" -> ((s, dir) =>
      graft.ops.Sampling.weightedSample(Tables(s, dir).documents,
          col("doc_id"), col("n_chars"), wtMaxW, salt = wtSalt)
        .select(col("doc_id"), col("n_chars"))),

    // Per-source min-max feature scaling: exact integer min/max, one
    // final double division; constant groups pin to 0.5.
    "q94_minmax_norm" -> ((s, dir) =>
      graft.ops.Profiling.minMaxNormalize(
        Tables(s, dir).documents
          .select(col("doc_id"), col("source"), col("n_chars")),
        "source", col("n_chars"), "norm")),

    // q94's outlier-immune sibling: rank-position scaling — one extreme
    // doc can't compress its source's whole range; output uniform by
    // construction.
    "q167_rank_normalize" -> ((s, dir) =>
      graft.ops.Profiling.percentRankNormalize(
        Tables(s, dir).documents
          .select(col("doc_id"), col("source"), col("n_chars")),
        "source", col("n_chars"), col("doc_id"), "norm")),

    // Markup strip (C4 web-boilerplate stage): tags out, entities
    // decoded in the safe order, whitespace collapsed. Zero shuffles,
    // codegen'd regex chain.
    "q91_markup_strip" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          graft.text.Scrub.stripMarkup(
            concat(lit(markupPrefix), col("text"), lit(markupSuffix)))
            .as("clean"))
        .withColumn("n_chars_clean", length(col("clean")).cast("long"))),

    // Duplicated-span EXTENT: longest run of consecutive duplicated
    // 7-gram positions per doc — q73 measures how much is duplicated,
    // this how contiguous (the exact-substring-dedup signal). Islands
    // over (doc, pos) after a composite-key join-back of positions to
    // document frequencies.
    "q95_dup_span_runs" -> ((s, dir) =>
      graft.text.Spans.duplicatedSpanRuns(Tables(s, dir).documents,
        "doc_id", "text", w = spanW, minDf = 2)),

    // Exact-substring dedup REMOVAL: rewrite each doc dropping its
    // ≥5-gram duplicated-span runs (verbatim ≥11-token spans), keeping
    // scattered dup mass — the transform q95 only reports. Same island
    // machinery folded to per-doc intervals + one join back to tokens.
    "q109_span_removal" -> ((s, dir) =>
      graft.text.Spans.removeDuplicatedSpans(Tables(s, dir).documents,
        "doc_id", "text", w = spanW, minDf = 2,
        minRunGrams = spanRemovalMinRun)),

    // BPE training: 16 merges, each round = pair count + 1-row argmax +
    // per-row greedy replace; deterministic (freq desc, pair asc)
    // tie-breaks. q92 is one step of this loop.
    "q110_bpe_train" -> ((s, dir) =>
      graft.text.Bpe.train(Tables(s, dir).documents,
        "doc_id", "text", nMerges = bpeNMerges)),

    // BPE encode: replay the trained merges in rank order over the
    // corpus (Sennrich semantics) — the trained-tokenizer symbol stream
    // that replaces q78's whole-token vocab for downstream packing.
    "q111_bpe_encode" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val merges = graft.text.Bpe
        .trainMerges(docs, "doc_id", "text", bpeNMerges)
        .map(m => (m._2, m._3))
      graft.text.Bpe.encode(docs, "doc_id", "text", merges)
    }),

    // CHAR-LEVEL BPE train: the same merge recurrence seeded with
    // single-character symbols + '_' end-of-word markers (Sennrich's
    // actual setup — real tokenizers are char/byte-level; q110's
    // word-granularity run produces no subword merges). new_sym makes
    // the learned subword visible (space-join stripped).
    "q308_bpe_char_train" -> ((s, dir) =>
      graft.text.Bpe.train(Tables(s, dir).documents, "doc_id", "text",
          nMerges = bpeNMerges, seed = graft.text.Bpe.charSymbols)
        .withColumn("new_sym",
          replace(concat(col("left_sym"), lit(" "), col("right_sym")),
            lit(" "), lit("")))),

    // Char-level BPE encode: replay the char merges over the corpus —
    // the real subword symbol stream (zero-shuffle replace chain);
    // subword strips the representation's space joins.
    "q309_bpe_char_encode" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val merges = graft.text.Bpe
        .trainMerges(docs, "doc_id", "text", bpeNMerges,
          graft.text.Bpe.charSymbols)
        .map(m => (m._2, m._3))
      graft.text.Bpe.encode(docs, "doc_id", "text", merges,
          graft.text.Bpe.charSymbols)
        .withColumn("subword", replace(col("symbol"), lit(" "), lit("")))
    }),

    // Hashed-feature linear quality classifier (fastText-style
    // inference): bucket-count vector x literal quantized weights via
    // the native DotProduct — the learned-filter seam between q20's
    // heuristics and a model server. Zero shuffles.
    "q112_quality_classifier" -> ((s, dir) =>
      graft.text.QualityModel.score(Tables(s, dir).documents,
        "doc_id", "text", qmWeights, qmD, qmSalt)),

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

    // Boilerplate-line report, exercised on injected template text:
    // every doc gets a source-specific 12-token header — aligned at
    // line-grid position 0, so it is a LINE in every doc of its source
    // (df = n_docs) while natural dup lines stay ≤ 8%. minFrac 0.5
    // flags exactly the 20 headers.
    "q127_boilerplate" -> ((s, dir) => {
      val corpus = Tables(s, dir).documents
        .withColumn("text", concat(
          lit("welcome to "), col("source"),
          lit(" home news about products downloads support faq contact legal "),
          col("text")))
      graft.text.Segments.boilerplateLines(corpus, "doc_id", "text",
        "source", per = linePer, minFrac = 0.5)
    }),

    // Bin-packing layout: per-shard first-fit-decreasing into
    // fixed-capacity bins — whole documents, q67's constants, bins
    // never overflow. One keyed shuffle of (id, n) pairs; the FFD fold
    // runs once per shard.
    "q115_bin_packing" -> ((s, dir) =>
      graft.ops.BinPack.packBinsFFD(Tables(s, dir).documents,
        "doc_id", "text", capacity = packCapacity, shards = packShards,
        salt = packSalt)),

    // Bigram LM quality score (CCNet-style perplexity filter): train
    // Laplace-smoothed bigram counts on the held-in split, score EVERY
    // doc by mean model bits per bigram — integer bit-length
    // quantization keeps the learned score oracle-exact.
    "q116_lm_quality" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val (bi, uni, voc) = graft.text.LangModel.train(
        docs.filter(col("doc_id") % lmHoldMod =!= 0), "text", lmMinCount)
      graft.text.LangModel.score(docs, "doc_id", "text", bi, uni, voc)
    }),

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

    // Compression-ratio quality signal (native deflate_len expression):
    // raw/compressed byte ratio in micro-units + the Gopher-style
    // repetition flag. NO DuckDB oracle exists for deflate — rows-only
    // driver check; semantics are pinned by TextOpsSpec invariants.
    "q118_compress_ratio" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        octet_length(col("text")).as("raw_bytes"),
        graft.functions.DeflateLen.deflateLen(col("text"))
          .as("deflate_bytes"))
      .withColumn("ratio_micro",
        floor(col("raw_bytes").cast("double") * 1000000.0 /
          col("deflate_bytes")).cast("long"))
      .withColumn("repetitive", col("ratio_micro") >= 4000000L)),

    // Deflate-length PARITY: the native deflate_len expression over the
    // fixed parity corpus vs lengths precomputed by an independent
    // Deflater drain at oracle-generation time — the oracle gate for
    // the kernel q118 applies corpus-wide (DuckDB has no deflate, so
    // q118 itself stays rows-only by design).
    "q310_deflate_parity" -> ((s, dir) => {
      import s.implicits._
      deflateParity.toDF("id", "text").select(
        col("id"),
        octet_length(col("text")).as("raw_bytes"),
        graft.functions.DeflateLen.deflateLen(col("text"))
          .as("deflate_bytes"))
    }),

    // Bigram coherence: corpus-frequency-weighted mean of each doc's
    // adjacent pairs — the word-order quality proxy q74's unigram
    // rarity can't see. Integer-exact sums, one final division.
    "q96_bigram_coherence" -> ((s, dir) =>
      graft.text.Spans.bigramCoherence(Tables(s, dir).documents,
        "doc_id", "text")),

    // Token-accounting mixture report: docs/token mass/corpus share per
    // source — the dashboard feeding q66's mixing rates. Scan-side
    // size(tokens), no explode; one shuffle + a group-cardinality window.
    "q97_token_accounting" -> ((s, dir) =>
      graft.text.Corpus.tokenAccounting(Tables(s, dir).documents,
        "source", "text")),

    // Profile-drift monitor, exercised on an injected bad batch: lang
    // nulled on every 5th doc (null-rate drift), src0 renamed (min
    // extreme moves). doc_id and n_chars are untouched controls —
    // their rows must report drift 0.
    "q133_profile_drift" -> ((s, dir) => {
      val ref = Tables(s, dir).documents
      val cur = ref
        .withColumn("lang",
          when(col("doc_id") % 5 === 0, lit(null: String))
            .otherwise(col("lang")))
        .withColumn("source",
          when(col("source") === "src0", lit("src0x"))
            .otherwise(col("source")))
      graft.ops.Profiling.profileDrift(ref, cur,
        Seq("doc_id", "lang", "source", "n_chars"),
        maxNullDelta = 0.05, maxDistinctRatio = 2.0)
    }),

    // Pre-tokenizer accounting: GPT-2-style unit counts next to the
    // whitespace-word counts q97 budgets with — the ratio is the
    // words-to-BPE-units inflation factor real token budgets need.
    "q131_pretoken_count" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.preTokenCount(col("text")).as("pre_tokens"))
        .withColumn("inflation",
          when(col("ws_tokens") > 0,
            col("pre_tokens").cast("double") / col("ws_tokens").cast("double")))),

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

    // Segment-level language mixing (code-switching detector): per-doc
    // language profile from per-16-token-segment language ID — the
    // granularity whole-doc q21 can't see. Zero-shuffle segmentation,
    // two keyed aggs.
    "q99_language_mix" -> ((s, dir) =>
      graft.text.Segments.languageMix(Tables(s, dir).documents,
        "doc_id", "text", segPer)),

    // Tokenizer application: every token to its q78-vocabulary rank
    // (OOV -> 0), long form (doc, pos, id). Corpus side never shuffles;
    // the vocab join broadcasts.
    "q100_token_ids" -> ((s, dir) =>
      graft.text.Spans.encodeTokens(Tables(s, dir).documents,
        "doc_id", "text", vocabTopN)),

    // Split-leakage audit: normalized-fingerprint groups spanning the
    // train split and any eval split. One scan-side md5 + one keyed agg.
    "q101_split_leakage" -> ((s, dir) =>
      graft.text.Corpus.splitLeakage(Tables(s, dir).documents,
        "doc_id", "text", leakSalt, leakSplits)),

    // TF-IDF keyword extraction: top-5 tokens per doc by tf * N/df
    // (linear idf — bm25's log-free bit-parity rationale). Three keyed
    // shuffles; rank window partitions by doc.
    "q102_tfidf_keywords" -> ((s, dir) =>
      graft.text.Retrieval.tfidfKeywords(Tables(s, dir).documents,
        "doc_id", "text", k = 5)),

    // Collocation mining: top-20 within-3-token pairs by the log-free
    // PMI ratio c_ab/(c_a*c_b), hapax pairs floored out. q92's bigrams
    // generalized to a window; zero-shuffle pair construction.
    "q106_collocations" -> ((s, dir) =>
      graft.text.Spans.collocations(Tables(s, dir).documents,
        "doc_id", "text", window = 3, minCount = 2L, topN = 20)),

    // Per-source quality distribution: q20's score quantized to integer
    // micro-units (floor q*1e6 — identical doubles both engines, then
    // exact integer arithmetic), exact discrete quartiles (q40) + an
    // order-independent mean derived from the integer sum. The
    // dashboard that sizes per-source quality thresholds and mixing.
    "q108_quality_by_source" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val stopRatio = TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn)
        .cast("double") / greatest(size(toks), lit(1))
      val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
      val punct = TextAnalysis.punctRatio(col("text"))
      val quality = lenScore * lit(0.6) + (lit(1.0) - stopRatio) * lit(0.3) +
        (lit(1.0) - punct) * lit(0.1)
      val base = Tables(s, dir).documents.select(col("source"),
        floor(quality * lit(1000000.0)).cast("long").as("qm"))
      val quant = graft.ops.Quantiles.exact(base, Seq(col("source")),
        col("qm"), Seq(0.25, 0.5, 0.75))
      base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("qm")).as("__qsum"))
        .join(quant, "source")
        .select(col("source"), col("n_docs"),
          (col("__qsum").cast("double") / col("n_docs") / lit(1000000.0))
            .as("mean_q"),
          col("p25"), col("p50"), col("p75"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q19_text_stats" ->
      s"""SELECT doc_id,
        |       CAST(length(text) AS INTEGER) AS len_chars,
        |       CAST(len(toks) AS INTEGER) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |       CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
        |         / greatest(len(toks), 1) AS avg_token_len
        |FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)""".stripMargin,

    "q20_quality_score" ->
      s"""SELECT doc_id,
        |       stop_ratio, punct_ratio, len_score,
        |       len_score * 0.6 + (1.0 - stop_ratio) * 0.3 + (1.0 - punct_ratio) * 0.1 AS quality
        |FROM (
        |  SELECT doc_id,
        |         CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
        |           / greatest(len(toks), 1) AS stop_ratio,
        |         CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
        |           / greatest(length(text), 1) AS punct_ratio,
        |         least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score
        |  FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)
        |)""".stripMargin,

    "q176_char_entropy" -> TextAnalysis.charEntropyOracleSql(
      "documents", "doc_id", "text"),

    "q177_zipf" -> graft.text.Spans.zipfSlopeOracleSql(
      "documents", "source", toksSql, topR = 64),

    "q178_readability" -> TextAnalysis.readabilityOracleSql(
      "documents", "doc_id", "text"),

    "q179_truncate" -> graft.text.Segments.truncateMiddleOutOracleSql(
      "documents", "doc_id", toksSql, maxTokens = 64, headTokens = 32,
      tailTokens = 16),

    "q21_lang_id" ->
      s"""SELECT doc_id,
        |       CAST(en AS INTEGER) AS en_hits,
        |       CAST(es AS INTEGER) AS es_hits,
        |       CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |            WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |            WHEN de >= fr AND de > 0 THEN 'de'
        |            WHEN fr > 0 THEN 'fr'
        |            ELSE 'und' END AS predicted_lang
        |FROM (
        |  SELECT doc_id,
        |         len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it'))) AS en,
        |         len(list_filter(toks, t -> t IN ('el','la','de','y','que','los','en','un'))) AS es,
        |         len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein','nicht','mit'))) AS de,
        |         len(list_filter(toks, t -> t IN ('le','les','des','et','est','une','dans','pour'))) AS fr
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |)""".stripMargin,

    "q22_fingerprint" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q307_unicode_dedup" -> {
      val values = unicodePlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(", ")
      val norm = graft.functions.NormalizeText.oracleSql("text")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $values) v(doc_id, text)
         |), f AS (
         |  SELECT doc_id,
         |         md5(trim(regexp_replace(lower($norm),
         |           '\\s+', ' ', 'g'))) AS fp
         |  FROM all_docs
         |)
         |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
         |       min(doc_id) AS rep_id
         |FROM f
         |GROUP BY 1 HAVING count(*) > 1""".stripMargin
    },

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

    "q270_source_ablation" -> graft.text.Corpus.sourceAblationOracleSql(
      "SELECT source, CAST(n_chars AS BIGINT) AS m FROM documents",
      "source"),

    "q272_rocchio" -> graft.text.Retrieval.rocchioOracleSql(
      toksSql, bm25Terms),

    "q267_best_passage" -> graft.text.Retrieval.bestPassageOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents", "doc_id",
      terms = Seq("spark", "data", "join"), window = 10),

    "q264_token_shift" -> graft.text.Corpus.tokenShareShiftOracleSql(
      s"SELECT $toksSql AS toks FROM documents WHERE source = 'src0'",
      s"SELECT $toksSql AS toks FROM documents WHERE source <> 'src0'"),

    "q257_path_rollup" -> graft.text.Urls.pathRollupOracleSql(
      "documents", s"($dirtyUrlSql)"),

    "q249_lang_confusion" -> graft.ops.Eval.confusionMatrixOracleSql(
      s"""SELECT lang AS a,
         |  CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
         |       WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
         |       WHEN de >= fr AND de > 0 THEN 'de'
         |       WHEN fr > 0 THEN 'fr'
         |       ELSE 'und' END AS p
         |FROM (
         |  SELECT lang,
         |         len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it'))) AS en,
         |         len(list_filter(toks, t -> t IN ('el','la','de','y','que','los','en','un'))) AS es,
         |         len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein','nicht','mit'))) AS de,
         |         len(list_filter(toks, t -> t IN ('le','les','des','et','est','une','dans','pour'))) AS fr
         |  FROM (SELECT lang, $toksSql AS toks FROM documents)
         |)""".stripMargin),

    "q250_deboilerplate" -> graft.text.Segments.removeBoilerplateOracleSql(
      s"""SELECT doc_id, source,
         |       list_filter(string_split_regex(lower(
         |         'welcome to ' || source ||
         |         ' home news about products downloads support faq contact legal ' ||
         |         text), '[^a-z0-9]+'), x -> x <> '') AS toks
         |FROM documents""".stripMargin,
      "doc_id", "source", per = linePer, minFrac = 0.5),

    "q245_rake" -> graft.text.Retrieval.rakeOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents", "doc_id",
      graft.text.TextAnalysis.stopEn),

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

    "q209_kwic" -> graft.text.Retrieval.kwicOracleSql(
      "documents", "doc_id", toksSql, term = "spark", window = 3),

    "q210_next_token_acc" -> graft.text.LangModel.nextTokenAccuracyOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents"),

    "q206_calibration" -> graft.ops.Eval.calibrationOracleSql(
      s"""SELECT CAST(trunc((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
         |  + (1.0 - CAST(len(list_filter(toks,
         |      t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
         |      / greatest(len(toks), 1)) * 0.3
         |  + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1)) * 0.1) * 1000000.0) AS BIGINT) AS p,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |FROM (SELECT text, lang, $toksSql AS toks FROM documents)""".stripMargin),

    "q190_datasheet" -> graft.text.Corpus.datasheetOracleSql(
      "documents", "source", "doc_id", "text", "lang"),

    "q180_vocab_overlap" -> graft.text.Corpus.vocabOverlapOracleSql(
      "documents", "source", toksSql),

    "q181_js_divergence" -> graft.text.Corpus.sourceDivergenceOracleSql(
      "documents", "source", toksSql, buckets = 4096),

    "q183_golden_record" -> graft.ops.Merge.goldenRecordsOracleSql(
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       source, lang, doc_id FROM documents""".stripMargin,
      "fp", Seq("source", "lang", "doc_id")),

    "q23_dedup_docs" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
        |)
        |SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM all_docs GROUP BY 1""".stripMargin,

    "q24_token_jaccard" ->
      s"""WITH tok_all AS (
        |  SELECT doc_id, source, unnest(list_distinct($toksSql)) AS token
        |  FROM documents
        |), kept AS (
        |  SELECT token FROM (SELECT token, count(*) AS df FROM tok_all GROUP BY 1)
        |  WHERE df <= (SELECT count(*) FROM documents) * 0.8
        |), tok AS (
        |  SELECT tok_all.* FROM tok_all JOIN kept USING (token)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM tok a JOIN tok b
        |    ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT d1, d2, inter,
        |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
        |FROM pairs
        |JOIN sizes s1 ON d1 = s1.doc_id
        |JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.9""".stripMargin,

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

    // q55's CTE chain + NOT IN — the survivors instead of the hits.
    "q148_decontam_removal" ->
      s"""WITH sh AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_distinct(${shinglesSql(decontamW)})) AS g
        |    FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |  ) WHERE g <> ''
        |), bench AS (
        |  SELECT DISTINCT g FROM sh WHERE doc_id % 11 = 0
        |), hit AS (
        |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (g)
        |  WHERE s.doc_id % 11 <> 0
        |)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id % 11 <> 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin,

    // Gate CASE with the q125/q21/q40 fragments; fingerprint first-wins
    // ties on doc_id exactly as the Spark window.
    "q149_curation_record" ->
      s"""WITH c AS (
        |  SELECT source,
        |         max(CASE WHEN rn = ceil(0.25 * n) THEN n_chars END) AS cut
        |  FROM (
        |    SELECT source, n_chars,
        |           row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |           count(*) OVER (PARTITION BY source) AS n
        |    FROM documents) GROUP BY 1
        |), r AS (
        |  SELECT doc_id, source, n_chars, text,
        |         len(list_filter($toksSql, t -> t IN ('the','a','and','of','to','in','is','it'))) AS en,
        |         len(list_filter($toksSql, t -> t IN ('el','la','de','y','que','los','en','un'))) AS es,
        |         len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist','ein','nicht','mit'))) AS de,
        |         len(list_filter($toksSql, t -> t IN ('le','les','des','et','est','une','dans','pour'))) AS fr,
        |         row_number() OVER (
        |           PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        |           ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.doc_id, r.source,
        |       CASE WHEN ${graft.text.Scrub.countMojibakeSql("r.text")} > 0
        |                 OR ${graft.text.Scrub.asciiFractionSql("r.text")} < 0.9
        |            THEN 'encoding'
        |            WHEN (CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |                       WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |                       WHEN de >= fr AND de > 0 THEN 'de'
        |                       WHEN fr > 0 THEN 'fr'
        |                       ELSE 'und' END) <> 'en'
        |            THEN 'language'
        |            WHEN r.n_chars < c.cut THEN 'quality'
        |            WHEN r.rn > 1 THEN 'duplicate'
        |            ELSE 'kept' END AS verdict
        |FROM r JOIN c USING (source)""".stripMargin,

    "q146_fertility" ->
      s"""SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(len($toksSql)) AS BIGINT) AS ws_tokens,
        |       CAST(sum(${TextAnalysis.preTokenCountSql("text")}) AS BIGINT) AS pre_tokens,
        |       CASE WHEN sum(len($toksSql)) > 0
        |            THEN CAST(sum(${TextAnalysis.preTokenCountSql("text")}) AS DOUBLE)
        |                 / CAST(sum(len($toksSql)) AS DOUBLE)
        |            END AS fertility
        |FROM documents GROUP BY 1""".stripMargin,

    // q100's vocabulary chain, truncated to the OOV-test size, LEFT
    // JOINed per token occurrence.
    "q147_oov_rate" ->
      s"""WITH pd AS (
        |  SELECT token, doc_id, count(*) AS k
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2
        |), v0 AS (
        |  SELECT token, CAST(sum(k) AS BIGINT) AS freq FROM pd GROUP BY 1
        |), top AS (SELECT token FROM v0 ORDER BY freq DESC, token LIMIT $oovVocabN),
        |tok AS (
        |  SELECT source, unnest($toksSql) AS token FROM documents
        |)
        |SELECT t.source,
        |       count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(floor(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         * 1000000.0 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS oov_micro
        |FROM tok t LEFT JOIN top v USING (token) GROUP BY 1""".stripMargin,

    // q73's gram lineage with the df window swapped for min(doc_id).
    "q142_novelty" ->
      s"""WITH g AS (
        |  SELECT doc_id, ${graft.functions.Hash64.duckSql("gram")} AS h
        |  FROM (SELECT doc_id, unnest(${shinglesSql(spanW)}) AS gram
        |        FROM (SELECT doc_id, $toksSql AS toks FROM documents))
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM g GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, min(doc_id) OVER (PARTITION BY h) AS first_doc
        |  FROM pg
        |), a AS (
        |  SELECT doc_id,
        |         CAST(sum(k) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN first_doc = doc_id THEN k ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM wd GROUP BY 1
        |)
        |SELECT doc_id, n_grams, n_novel,
        |       CAST(floor(CAST(n_novel AS DOUBLE) * 1000000.0
        |         / CAST(n_grams AS DOUBLE)) AS BIGINT) AS novelty_micro
        |FROM a""".stripMargin,

    "q152_ngram_diversity" ->
      s"""WITH g AS (
        |  SELECT source, ${graft.functions.Hash64.duckSql("gram")} AS h
        |  FROM (SELECT source, unnest(${shinglesSql(3)}) AS gram
        |        FROM (SELECT source, $toksSql AS toks FROM documents))
        |), c AS (
        |  SELECT source, h, count(*) AS c FROM g GROUP BY 1, 2
        |), t AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_grams,
        |         CAST(count(*) AS BIGINT) AS n_distinct_grams
        |  FROM c GROUP BY 1
        |), r AS (
        |  SELECT source, c,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY c DESC, h) AS rn
        |  FROM c
        |), k AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS topk_grams
        |  FROM r WHERE rn <= 10 GROUP BY 1
        |)
        |SELECT t.source, n_grams, n_distinct_grams, topk_grams,
        |       CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
        |         AS distinct_ratio,
        |       CAST(topk_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
        |         AS topk_share
        |FROM t JOIN k USING (source)""".stripMargin,

    // q40's rank-cut recipe scoped per source, >= keeps cut ties.
    "q140_adaptive_gate" ->
      s"""WITH r AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |), c AS (
        |  SELECT source, max(CASE WHEN rn = ceil(0.25 * n) THEN n_chars END) AS cut
        |  FROM r GROUP BY 1
        |)
        |SELECT d.doc_id, d.source, d.n_chars, c.cut
        |FROM documents d JOIN c USING (source)
        |WHERE d.n_chars >= c.cut""".stripMargin,

    "q141_temp_mixture" -> graft.ops.Sampling.temperatureOracleSql(
      "SELECT source, count(*) AS n FROM documents GROUP BY 1",
      budgetNum = 3L, budgetDen = 5L),

    "q154_cdc_chunks" -> graft.text.Cdc.profileOracleSql(
      "SELECT doc_id, text FROM documents"),

    "q155_naive_bayes" -> {
      val pred = graft.text.NaiveBayes.classifyOracleSql(
        trainSql = s"SELECT lang AS lab, $toksSql AS toks FROM documents",
        docsSql = s"SELECT doc_id, $toksSql AS toks FROM documents")
      s"""WITH pred AS ($pred)
        |SELECT p.doc_id, p.pred_label, p.cost_bits, p.n_tokens, d.lang,
        |       p.pred_label = d.lang AS correct
        |FROM pred p JOIN documents d USING (doc_id)""".stripMargin
    },

    "q139_dsir_weights" -> graft.text.Dsir.importanceOracleSql(
      docsSql = s"SELECT doc_id, $toksSql AS toks FROM documents",
      targetSql = s"""SELECT doc_id, $toksSql AS toks FROM documents
                     | WHERE source IN (${dsirTarget.map(s => s"'$s'").mkString(", ")})""".stripMargin,
      rawSql = s"SELECT doc_id, $toksSql AS toks FROM documents",
      buckets = dsirBuckets),

    // Same df-ascending order, prefix cut, integer cross-multiplied
    // accept test. ceil(num·n/den) = (num·n + den − 1) // den.
    "q137_prefix_join" ->
      s"""WITH tk AS (
        |  SELECT doc_id AS id,
        |         unnest(list_distinct(${NearDup.duckShinglesSql(prefixW)})) AS tok
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), dfs AS (
        |  SELECT tok, count(*) AS df FROM tk GROUP BY 1
        |), rk AS (
        |  SELECT id, tok,
        |         row_number() OVER (PARTITION BY id ORDER BY df, tok) AS r,
        |         count(*) OVER (PARTITION BY id) AS n
        |  FROM tk JOIN dfs USING (tok)
        |), pf AS (
        |  SELECT id, tok FROM rk
        |  WHERE r <= n - (($prefixNum * n + ${prefixDen - 1}) // $prefixDen) + 1
        |), cd AS (
        |  SELECT DISTINCT a.id AS d1, b.id AS d2
        |  FROM pf a JOIN pf b ON a.tok = b.tok AND a.id < b.id
        |), sz AS (
        |  SELECT id, count(*) AS n FROM tk GROUP BY 1
        |), iv AS (
        |  SELECT d1, d2, count(*) AS inter
        |  FROM cd
        |  JOIN tk t1 ON d1 = t1.id
        |  JOIN tk t2 ON d2 = t2.id AND t1.tok = t2.tok
        |  GROUP BY 1, 2
        |)
        |SELECT d1, d2, inter,
        |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
        |FROM iv JOIN sz s1 ON d1 = s1.id JOIN sz s2 ON d2 = s2.id
        |WHERE $prefixDen * inter >= $prefixNum * (s1.n + s2.n - inter)""".stripMargin,

    "q125_encoding_report" ->
      s"""WITH corpus AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 17 = 0
        |              THEN regexp_replace(text, 'a', 'Ã¡', 'g')
        |              ELSE text END AS text
        |  FROM documents
        |)
        |SELECT doc_id, n_moji, n_ctrl, ascii_frac,
        |       CAST(CASE WHEN n_moji > 0 OR ascii_frac < 0.9
        |            THEN 1 ELSE 0 END AS BIGINT) AS corrupt
        |FROM (
        |  SELECT doc_id,
        |         ${graft.text.Scrub.countMojibakeSql("text")} AS n_moji,
        |         ${graft.text.Scrub.countControlSql("text")} AS n_ctrl,
        |         ${graft.text.Scrub.asciiFractionSql("text")} AS ascii_frac
        |  FROM corpus
        |)""".stripMargin,

    // Same injected-snippet corpus, same df-cut, asymmetric fractions.
    "q120_containment" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 900000, substring(text, 1, 240), source
        |  FROM documents WHERE doc_id % 13 = 0
        |), tok_all AS (
        |  SELECT doc_id, source, unnest(list_distinct($toksSql)) AS token
        |  FROM corpus
        |), kept AS (
        |  SELECT token FROM (SELECT token, count(*) AS df FROM tok_all GROUP BY 1)
        |  WHERE df <= (SELECT count(*) FROM corpus) * 0.8
        |), tok AS (
        |  SELECT tok_all.* FROM tok_all JOIN kept USING (token)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM tok a JOIN tok b
        |    ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT d1, d2, inter,
        |       CAST(inter AS DOUBLE) / s1.n AS c1,
        |       CAST(inter AS DOUBLE) / s2.n AS c2
        |FROM pairs
        |JOIN sizes s1 ON d1 = s1.doc_id
        |JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE greatest(CAST(inter AS DOUBLE) / s1.n,
        |               CAST(inter AS DOUBLE) / s2.n) >= 0.9""".stripMargin,

    "q50_corpus" -> {
      val smp = graft.ops.Sampling.hashBucketSql("doc_id", "corp-smp")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text, lang FROM documents WHERE doc_id % 7 = 0
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
        |  FROM (SELECT doc_id, text, lang, $toksSql AS toks FROM deduped)
        |)
        |SELECT doc_id, lang, n_tokens, quality,
        |       ${graft.ops.Sampling.splitCaseSql("doc_id", "corp-spl", corpusSplits)} AS split
        |FROM scored WHERE quality >= 0.6""".stripMargin
    },

    "q54_repetition" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(toks) AS tok
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), tc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
        |), ts AS (
        |  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_tok
        |  FROM tc GROUP BY 1
        |), grams AS (
        |  SELECT doc_id, unnest(${shinglesSql(2)}) AS g
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), gc AS (
        |  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
        |), gs AS (
        |  SELECT doc_id, sum(c) AS n_grams, max(c) AS top_gram FROM gc GROUP BY 1
        |)
        |SELECT ts.doc_id,
        |       1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_tok_frac,
        |       CAST(top_tok AS DOUBLE) / n_tokens AS top_tok_frac,
        |       CAST(top_gram AS DOUBLE) / n_grams AS top_2gram_frac
        |FROM ts JOIN gs ON ts.doc_id = gs.doc_id""".stripMargin,

    "q53_pii_scrub" -> {
      import graft.text.Scrub
      s"""WITH planted AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |                THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |              WHEN doc_id % 5 = 1
        |                THEN 'from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7 ' || text
        |              WHEN doc_id % 5 = 2
        |                THEN text || ' call +1 555 01' || CAST(doc_id % 90 + 10 AS VARCHAR) || ' 0199'
        |              ELSE text END AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '${Scrub.emailRe}')) AS INTEGER) AS n_emails,
        |       CAST(len(regexp_extract_all(text, '${Scrub.ipRe}')) AS INTEGER) AS n_ips,
        |       CAST(len(regexp_extract_all(text, '${Scrub.phoneRe}')) AS INTEGER) AS n_phones,
        |       md5(regexp_replace(regexp_replace(regexp_replace(text,
        |             '${Scrub.emailRe}', '[EMAIL]', 'g'),
        |             '${Scrub.ipRe}', '[IP]', 'g'),
        |             '${Scrub.phoneRe}', '[PHONE]', 'g')) AS scrubbed_fp
        |FROM planted""".stripMargin
    },

    "q34_ngram_jaccard" ->
      s"""WITH tok AS (
        |  SELECT doc_id, source, unnest(list_distinct(${shinglesSql(3)})) AS token
        |  FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM tok a JOIN tok b
        |    ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT d1, d2, inter,
        |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
        |FROM pairs
        |JOIN sizes s1 ON d1 = s1.doc_id
        |JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8""".stripMargin,

    "q55_decontaminate" ->
      s"""WITH sh AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_distinct(${shinglesSql(decontamW)})) AS g
        |    FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |  ) WHERE g <> ''
        |), bench AS (
        |  SELECT DISTINCT g FROM sh WHERE doc_id % 11 = 0
        |)
        |SELECT s.doc_id, count(*) AS n_shared
        |FROM sh s JOIN bench b USING (g)
        |WHERE s.doc_id % 11 <> 0
        |GROUP BY 1""".stripMargin,

    "q56_bm25" ->
      graft.text.Retrieval.bm25OracleSql(toksSql, bm25Terms),

    "q59_inverted_index" ->
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct($toksSql)) AS token
        |  FROM documents
        |)
        |SELECT token, count(*) AS df,
        |       array_to_string(list_transform(list_sort(list(doc_id)),
        |         x -> CAST(x AS VARCHAR)), ',') AS postings
        |FROM tok GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

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

    "q301_shared_lines" -> graft.text.Segments.sharedLinePairsOracleSql(
      s"""SELECT doc_id, $toksSql AS toks FROM (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |         regexp_replace(text, '^\\S+\\s*', '') AS text
         |  FROM documents WHERE doc_id % 10 = 0
         |)""".stripMargin,
      "doc_id", per = linePer, minShared = 2L),

    "q290_heaps" -> graft.text.Corpus.heapsCurveOracleSql(
      s"SELECT doc_id AS id, $toksSql AS toks FROM documents",
      checkpoints = Seq(50L, 100L, 200L, 500L, 1000L, 5000L)),

    "q292_dup_by_length" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) // 50 AS band,
        |         row_number() OVER (
        |           PARTITION BY md5(trim(regexp_replace(lower(text),
        |             '\s+', ' ', 'g')))
        |           ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup,
        |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS dup_rate
        |FROM f GROUP BY 1""".stripMargin,

    "q283_kappa" -> graft.ops.Profiling.cohensKappaOracleSql(
      s"""SELECT lang AS a,
         |  CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
         |       WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
         |       WHEN de >= fr AND de > 0 THEN 'de'
         |       WHEN fr > 0 THEN 'fr'
         |       ELSE 'und' END AS b
         |FROM (
         |  SELECT lang,
         |         len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it'))) AS en,
         |         len(list_filter(toks, t -> t IN ('el','la','de','y','que','los','en','un'))) AS es,
         |         len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein','nicht','mit'))) AS de,
         |         len(list_filter(toks, t -> t IN ('le','les','des','et','est','une','dans','pour'))) AS fr
         |  FROM (SELECT lang, $toksSql AS toks FROM documents)
         |)""".stripMargin),

    "q281_sn_jw" ->
      s"""WITH all_recs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         regexp_replace(text, '^\\S+\\s*', '') AS text
        |  FROM documents WHERE doc_id % 10 = 0
        |), base AS (
        |  SELECT doc_id,
        |         array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS key,
        |         substr(text, 1, 80) AS p
        |  FROM (SELECT doc_id, text, $toksSql AS toks FROM all_recs)
        |), rn AS (
        |  SELECT doc_id, key, p, substr(key, 1, 2) AS bkt,
        |         row_number() OVER (PARTITION BY substr(key, 1, 2)
        |           ORDER BY key, doc_id) AS rn
        |  FROM base
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |       jaro_winkler_similarity(a.p, b.p) AS jw
        |FROM rn a JOIN rn b
        |  ON a.bkt = b.bkt AND b.rn > a.rn AND b.rn <= a.rn + 9
        |WHERE jaro_winkler_similarity(a.p, b.p) >= 0.8""".stripMargin,

    "q166_sn_edit_distance" ->
      s"""WITH all_recs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         regexp_replace(text, '^\\S+\\s*', '') AS text
        |  FROM documents WHERE doc_id % 10 = 0
        |), base AS (
        |  SELECT doc_id,
        |         array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS key,
        |         substr(text, 1, 80) AS p
        |  FROM (SELECT doc_id, text, $toksSql AS toks FROM all_recs)
        |), rn AS (
        |  SELECT doc_id, key, p, substr(key, 1, 2) AS bkt,
        |         row_number() OVER (PARTITION BY substr(key, 1, 2)
        |           ORDER BY key, doc_id) AS rn
        |  FROM base
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
        |FROM rn a JOIN rn b
        |  ON a.bkt = b.bkt AND b.rn > a.rn AND b.rn <= a.rn + 9
        |WHERE levenshtein(a.p, b.p) <= 25""".stripMargin,

    "q162_sorted_neighborhood" ->
      s"""WITH all_recs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         regexp_replace(text, '^\\S+\\s*', '') AS text
        |  FROM documents WHERE doc_id % 10 = 0
        |), base AS (
        |  SELECT doc_id,
        |         array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS key,
        |         list_distinct(toks) AS s
        |  FROM (SELECT doc_id, $toksSql AS toks FROM all_recs)
        |), rn AS (
        |  SELECT doc_id, key, s, substr(key, 1, 2) AS bkt,
        |         row_number() OVER (PARTITION BY substr(key, 1, 2)
        |           ORDER BY key, doc_id) AS rn
        |  FROM base
        |), p AS (
        |  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
        |         len(a.s) + len(b.s) AS sz
        |  FROM rn a JOIN rn b
        |    ON a.bkt = b.bkt AND b.rn > a.rn AND b.rn <= a.rn + 9
        |)
        |SELECT left_id, right_id, inter,
        |       CAST(inter AS DOUBLE) / (sz - inter) AS jaccard
        |FROM p
        |WHERE sz - inter > 0 AND 10 * inter >= 7 * (sz - inter)""".stripMargin,

    "q70_record_link" ->
      s"""WITH dirty AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |         regexp_replace(text, '^\\S+\\s*', '') AS text, source
        |  FROM documents WHERE doc_id % 10 = 0
        |), ta AS (
        |  SELECT doc_id, source, unnest(list_distinct(${shinglesSql(3)})) AS token
        |  FROM (SELECT doc_id, source, $toksSql AS toks FROM dirty)
        |), tb AS (
        |  SELECT doc_id, source, unnest(list_distinct(${shinglesSql(3)})) AS token
        |  FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)
        |), s1 AS (SELECT doc_id, count(*) AS n FROM ta GROUP BY 1
        |), s2 AS (SELECT doc_id, count(*) AS n FROM tb GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS inter
        |  FROM ta a JOIN tb b ON a.token = b.token AND a.source = b.source
        |  GROUP BY 1, 2
        |)
        |SELECT left_id, right_id, inter,
        |       CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
        |FROM pairs
        |JOIN s1 ON left_id = s1.doc_id
        |JOIN s2 ON right_id = s2.doc_id
        |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.7""".stripMargin,

    "q67_packing" ->
      s"""SELECT doc_id,
        |       ${graft.ops.Sampling.hashBucketSql("doc_id", packSalt, packShards)} AS shard,
        |       CAST(len($toksSql) AS BIGINT) AS n_tokens,
        |       CAST(sum(CAST(len($toksSql) AS BIGINT)) OVER w
        |         - CAST(len($toksSql) AS BIGINT) AS BIGINT) AS start_off,
        |       CAST((sum(CAST(len($toksSql) AS BIGINT)) OVER w
        |         - CAST(len($toksSql) AS BIGINT)) // $packCapacity
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
        |         CAST(len($toksSql) AS BIGINT) AS n_tokens
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

    "q73_dup_spans" ->
      s"""WITH g AS (
        |  SELECT doc_id, ${graft.functions.Hash64.duckSql("gram")} AS h
        |  FROM (SELECT doc_id, unnest(${shinglesSql(spanW)}) AS gram
        |        FROM (SELECT doc_id, $toksSql AS toks FROM documents))
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM g GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, count(*) OVER (PARTITION BY h) AS df FROM pg
        |)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN df >= 2 THEN k ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |       CAST(sum(CASE WHEN df >= 2 THEN k ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(k) AS DOUBLE) AS dup_frac
        |FROM wd GROUP BY 1""".stripMargin,

    "q74_token_rarity" ->
      s"""WITH t AS (
        |  SELECT doc_id, unnest(toks) AS h
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM t GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, count(*) OVER (PARTITION BY h) AS df FROM pg
        |), nd AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_tokens,
        |       CAST(sum(k * df) AS BIGINT) AS df_sum,
        |       1.0 - CAST(sum(k * df) AS DOUBLE)
        |         / CAST(sum(k) * n_docs AS DOUBLE) AS rarity
        |FROM wd, nd GROUP BY doc_id, n_docs""".stripMargin,

    "q77_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
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

    "q78_vocab" ->
      s"""WITH pd AS (
        |  SELECT token, doc_id, count(*) AS k
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2
        |), v AS (
        |  SELECT token, CAST(sum(k) AS BIGINT) AS freq, count(*) AS df
        |  FROM pd GROUP BY 1
        |), top AS (SELECT * FROM v ORDER BY freq DESC, token LIMIT $vocabTopN)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
        |       token, freq, df
        |FROM top""".stripMargin,

    "q80_line_filter" -> {
      val stopList = graft.text.TextAnalysis.stopEn
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |l AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) > 0 THEN
        |           list_transform(generate_series(0, len(toks) - 1, $linePer),
        |             st -> list_slice(toks, st + 1, st + $linePer))
        |         ELSE CAST([] AS VARCHAR[][]) END AS lines
        |  FROM t),
        |k AS (
        |  SELECT doc_id, lines,
        |         list_filter(lines, a -> len(a) >= $lineMinTokens
        |           AND list_has_any(a, [$stopList])) AS kept
        |  FROM l)
        |SELECT doc_id,
        |       CAST(len(lines) AS BIGINT) AS n_lines,
        |       CAST(len(kept) AS BIGINT) AS n_kept,
        |       coalesce(array_to_string(flatten(kept), ' '), '') AS kept_text
        |FROM k""".stripMargin
    },

    // LEFT JOIN back to documents: zero-token docs survive with
    // (0, 0, '') — the Spark side's posexplode_outer contract.
    "q81_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, unnest(generate_series(0, len(toks) - 1, $linePer)) AS st, toks
        |  FROM t WHERE len(toks) > 0),
        |d AS (
        |  SELECT doc_id, st,
        |         array_to_string(list_slice(toks, st + 1, st + $linePer), ' ') AS line
        |  FROM s),
        |r AS (
        |  SELECT doc_id, st, line,
        |         row_number() OVER (
        |           PARTITION BY ${graft.functions.Hash64.duckSql("line")}
        |           ORDER BY doc_id, st) AS rn
        |  FROM d),
        |g AS (
        |  SELECT doc_id,
        |         count(*) AS n_lines,
        |         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY st), '') AS kept_text
        |  FROM r GROUP BY 1)
        |SELECT t.doc_id,
        |       CAST(coalesce(g.n_lines, 0) AS BIGINT) AS n_lines,
        |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(g.kept_text, '') AS kept_text
        |FROM t LEFT JOIN g USING (doc_id)""".stripMargin,

    // Mirrors the injection (truncate-to-whole-lines, self-concat) then
    // q81's window machinery with the partition key scoped to the doc.
    "q136_selfrep_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |h AS (
        |  SELECT doc_id, list_slice(tk, 1, len(tk) - (len(tk) % $linePer)) AS hd
        |  FROM t),
        |t2 AS (SELECT doc_id, hd || hd AS toks FROM h),
        |s AS (
        |  SELECT doc_id, unnest(generate_series(0, len(toks) - 1, $linePer)) AS st, toks
        |  FROM t2 WHERE len(toks) > 0),
        |d AS (
        |  SELECT doc_id, st,
        |         array_to_string(list_slice(toks, st + 1, st + $linePer), ' ') AS line
        |  FROM s),
        |r AS (
        |  SELECT doc_id, st, line,
        |         row_number() OVER (PARTITION BY doc_id, line ORDER BY st) AS rn
        |  FROM d),
        |g AS (
        |  SELECT doc_id,
        |         count(*) AS n_lines,
        |         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY st), '') AS kept_text
        |  FROM r GROUP BY 1)
        |SELECT t2.doc_id,
        |       CAST(coalesce(g.n_lines, 0) AS BIGINT) AS n_lines,
        |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(g.kept_text, '') AS kept_text
        |FROM t2 LEFT JOIN g USING (doc_id)""".stripMargin,

    "q82_domain_cap" ->
      s"""WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY ${graft.ops.Sampling.capPrioritySql("doc_id", capSalt)}, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= $capK""".stripMargin,

    "q91_markup_strip" -> {
      val dirty = s"'$markupPrefix' || text || '$markupSuffix'"
      s"""WITH s AS (
        |  SELECT doc_id, ${graft.text.Scrub.stripMarkupSql(dirty)} AS clean
        |  FROM documents)
        |SELECT doc_id, clean, length(clean) AS n_chars_clean FROM s""".stripMargin
    },

    "q92_bigrams" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS pair
        |  FROM t WHERE len(toks) >= 2),
        |v AS (SELECT pair, count(*) AS freq FROM p GROUP BY 1),
        |top AS (SELECT * FROM v ORDER BY freq DESC, pair LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rank,
        |       pair, freq
        |FROM top""".stripMargin,

    "q93_weighted_sample" ->
      s"""SELECT doc_id, n_chars FROM documents
        |WHERE ${graft.ops.Sampling.weightedSampleSql("doc_id", "n_chars", wtMaxW, wtSalt)}""".stripMargin,

    "q94_minmax_norm" ->
      """WITH s AS (
        |  SELECT source, min(n_chars) AS mn, max(n_chars) AS mx
        |  FROM documents GROUP BY 1)
        |SELECT d.source, doc_id, n_chars,
        |       CASE WHEN mx > mn
        |         THEN CAST(n_chars - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
        |         ELSE 0.5 END AS norm
        |FROM documents d JOIN s USING (source)""".stripMargin,

    "q167_rank_normalize" ->
      """SELECT doc_id, source, n_chars,
        |       CASE WHEN n > 1
        |         THEN CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |       END AS norm
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents
        |)""".stripMargin,

    // Positions come from generate_series over the shingle list (1-based
    // in DuckDB — only ordering matters); islands mirror the Spark
    // lag/cumsum windows row for row.
    "q95_dup_span_runs" ->
      s"""WITH t AS (
        |  SELECT doc_id, ${shinglesSql(spanW)} AS grams
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
        |), gp AS (
        |  SELECT doc_id, unnest(generate_series(1, len(grams))) AS pos,
        |         grams FROM t
        |), g AS (
        |  SELECT doc_id, pos, ${Hash64.duckSql("grams[pos]")} AS h FROM gp
        |), pg AS (
        |  SELECT h, doc_id FROM g GROUP BY 1, 2
        |), wd AS (
        |  SELECT h, doc_id, count(*) OVER (PARTITION BY h) AS df FROM pg
        |), f AS (
        |  SELECT g.doc_id, g.pos, wd.df >= 2 AS dup
        |  FROM g JOIN wd ON g.h = wd.h AND g.doc_id = wd.doc_id
        |), r AS (
        |  SELECT doc_id, pos, dup,
        |         CASE WHEN lag(dup) OVER w IS NULL
        |                OR lag(dup) OVER w <> dup THEN 1 ELSE 0 END AS brk
        |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), sgrp AS (
        |  SELECT doc_id, dup,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM r
        |), grps AS (
        |  SELECT doc_id, grp, dup, count(*) AS len FROM sgrp GROUP BY 1, 2, 3
        |)
        |SELECT doc_id,
        |       CAST(sum(len) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
        |       CAST(coalesce(max(CASE WHEN dup THEN len END), 0) AS BIGINT)
        |         AS max_run_grams,
        |       CAST(CASE WHEN coalesce(max(CASE WHEN dup THEN len END), 0) > 0
        |            THEN coalesce(max(CASE WHEN dup THEN len END), 0) + ${spanW - 1}
        |            ELSE 0 END AS BIGINT) AS max_run_tokens
        |FROM grps GROUP BY 1""".stripMargin,

    // q95's islands folded to 0-based token intervals (DuckDB positions
    // are 1-based, so s = min(pos) − 1), then a NOT EXISTS re-filter of
    // the exploded tokens and an ordered string_agg reassembly — row for
    // row the Spark rewrite's interval/exists/array_join.
    "q109_span_removal" ->
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, ${shinglesSql(spanW)} AS grams
        |  FROM (SELECT doc_id, toks FROM t)
        |), gp AS (
        |  SELECT doc_id, unnest(generate_series(1, len(grams))) AS pos,
        |         grams FROM sh
        |), g AS (
        |  SELECT doc_id, pos, ${Hash64.duckSql("grams[pos]")} AS h FROM gp
        |), pg AS (
        |  SELECT h, doc_id FROM g GROUP BY 1, 2
        |), wd AS (
        |  SELECT h, doc_id, count(*) OVER (PARTITION BY h) AS df FROM pg
        |), f AS (
        |  SELECT g.doc_id, g.pos, wd.df >= 2 AS dup
        |  FROM g JOIN wd ON g.h = wd.h AND g.doc_id = wd.doc_id
        |), r AS (
        |  SELECT doc_id, pos, dup,
        |         CASE WHEN lag(dup) OVER w IS NULL
        |                OR lag(dup) OVER w <> dup THEN 1 ELSE 0 END AS brk
        |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), sgrp AS (
        |  SELECT doc_id, pos, dup,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM r
        |), iv AS (
        |  SELECT doc_id, min(pos) - 1 AS s,
        |         min(pos) - 1 + count(*) + ${spanW - 2} AS e
        |  FROM sgrp WHERE dup GROUP BY doc_id, grp
        |  HAVING count(*) >= $spanRemovalMinRun
        |), tp AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks
        |  FROM t WHERE len(toks) > 0
        |), kept AS (
        |  SELECT tp.doc_id, tp.i, tp.toks[tp.i] AS tok FROM tp
        |  WHERE NOT EXISTS (SELECT 1 FROM iv
        |    WHERE iv.doc_id = tp.doc_id AND tp.i - 1 BETWEEN iv.s AND iv.e)
        |)
        |SELECT t.doc_id,
        |       CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       CAST(len(t.toks) - count(k.tok) AS BIGINT) AS n_removed,
        |       coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '') AS kept_text
        |FROM t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |GROUP BY t.doc_id, len(t.toks)""".stripMargin,

    // Unrolled replay of the identical merge recurrence (the q63/q104
    // oracle recipe), shared by train and encode.
    "q110_bpe_train" -> graft.text.Bpe.trainOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents", bpeNMerges),

    "q111_bpe_encode" -> graft.text.Bpe.encodeOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents", bpeNMerges),

    "q310_deflate_parity" -> {
      val rows = deflateParity.map { case (id, t) =>
        val raw = t.getBytes("UTF-8").length
        s"(CAST($id AS BIGINT), CAST($raw AS INT), " +
          s"CAST(${independentDeflateLen(t)} AS INT))"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $rows) v(id, raw_bytes, deflate_bytes)"
    },

    "q308_bpe_char_train" -> {
      val inner = graft.text.Bpe.trainOracleSql(
        graft.text.Bpe.charTokSql(
          s"SELECT doc_id, $toksSql AS toks FROM documents"), bpeNMerges)
      s"""SELECT rank, left_sym, right_sym, freq,
         |       replace(left_sym || ' ' || right_sym, ' ', '') AS new_sym
         |FROM ($inner)""".stripMargin
    },

    "q309_bpe_char_encode" -> {
      val inner = graft.text.Bpe.encodeOracleSql(
        graft.text.Bpe.charTokSql(
          s"SELECT doc_id, $toksSql AS toks FROM documents"), bpeNMerges)
      s"""SELECT doc_id, pos, symbol, replace(symbol, ' ', '') AS subword
         |FROM ($inner)""".stripMargin
    },

    // The identical integer bit-length recurrence: bits via
    // length(bin(x)), exact on both engines.
    "q116_lm_quality" -> graft.text.LangModel.scoreOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents",
      s"SELECT doc_id, $toksSql AS toks FROM documents " +
        s"WHERE doc_id % $lmHoldMod <> 0",
      lmMinCount),

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

    // The dot product re-associated as a per-token bucket-weight sum —
    // identical integer-exact value, no 64-element unnest.
    "q112_quality_classifier" -> graft.text.QualityModel.scoreOracleSql(
      s"SELECT doc_id, $toksSql AS toks FROM documents",
      qmWeights, qmD, qmSalt),

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
         |       CAST(len($toksSql) AS BIGINT) AS n
         |FROM documents
         |WHERE len($toksSql) BETWEEN 1 AND $packCapacity""".stripMargin,
      packCapacity),

    "q114_host_curation" ->
      s"""WITH h AS (
        |  SELECT doc_id, ${graft.text.Urls.hostSql(s"($dirtyUrlSql)")} AS host
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, host FROM h
        |  WHERE host NOT IN ${inList(blockedHosts)}
        |), r AS (
        |  SELECT doc_id, host,
        |         row_number() OVER (PARTITION BY host
        |           ORDER BY ${graft.ops.Sampling.capPrioritySql("doc_id", hostCapSalt)}, doc_id) AS rn
        |  FROM f)
        |SELECT doc_id, host FROM r WHERE rn <= $hostCapK""".stripMargin,

    "q127_boilerplate" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, source,
        |         'welcome to ' || source ||
        |         ' home news about products downloads support faq contact legal ' ||
        |         text AS text
        |  FROM documents
        |), t AS (SELECT doc_id, source, $toksSql AS toks FROM corpus),
        |s AS (
        |  SELECT doc_id, source,
        |         unnest(generate_series(0, len(toks) - 1, $linePer)) AS st, toks
        |  FROM t WHERE len(toks) > 0),
        |d AS (
        |  SELECT doc_id, source,
        |         array_to_string(list_slice(toks, st + 1, st + $linePer), ' ') AS line
        |  FROM s),
        |nd AS (
        |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |ldf AS (
        |  SELECT source, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS line_df
        |  FROM d GROUP BY 1, 2)
        |SELECT ldf.source, line, line_df, n_docs,
        |       CAST(line_df AS DOUBLE) / CAST(n_docs AS DOUBLE) AS doc_frac
        |FROM ldf JOIN nd ON ldf.source = nd.source
        |WHERE line_df >= 2
        |  AND CAST(line_df AS DOUBLE) >= 0.5 * CAST(n_docs AS DOUBLE)""".stripMargin,

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

    "q96_bigram_coherence" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |p AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS h
        |  FROM t WHERE len(toks) >= 2
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM p GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, sum(k) OVER (PARTITION BY h) AS cf FROM pg
        |), tot AS (
        |  SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_total
        |  FROM t
        |)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_bigrams,
        |       CAST(sum(k * cf) AS BIGINT) AS cf_sum,
        |       CAST(CAST(sum(k * cf) AS BIGINT) AS DOUBLE)
        |         / (CAST(CAST(sum(k) AS BIGINT) AS DOUBLE)
        |            * CAST(n_total AS DOUBLE)) AS coherence
        |FROM wd, tot GROUP BY doc_id, n_total""".stripMargin,

    "q133_profile_drift" ->
      graft.ops.Profiling.profileDriftOracleSql(
        "documents",
        """(SELECT doc_id, text,
          |        CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,
          |        CASE WHEN source = 'src0' THEN 'src0x' ELSE source END AS source,
          |        n_chars
          | FROM documents)""".stripMargin,
        Seq("doc_id", "lang", "source", "n_chars"),
        maxNullDelta = 0.05, maxDistinctRatio = 2.0),

    "q131_pretoken_count" ->
      s"""SELECT doc_id,
        |       CAST(len($toksSql) AS BIGINT) AS ws_tokens,
        |       ${TextAnalysis.preTokenCountSql("text")} AS pre_tokens,
        |       CASE WHEN len($toksSql) > 0
        |            THEN CAST(${TextAnalysis.preTokenCountSql("text")} AS DOUBLE)
        |                 / CAST(len($toksSql) AS BIGINT)
        |            END AS inflation
        |FROM documents""".stripMargin,

    "q129_token_budget" ->
      graft.ops.Sampling.waterFillOracleSql(
        s"SELECT source, sum(len($toksSql)) AS avail FROM documents GROUP BY 1",
        budgetWeights, defaultWeight = 1L, budgetNum = 3L, budgetDen = 5L),

    "q97_token_accounting" ->
      s"""WITH t AS (SELECT source, len($toksSql) AS nt FROM documents),
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

    // Per-segment language ID mirrors q21's CASE over each 16-token
    // slice; the mode window and per-doc fold mirror languageMix.
    "q99_language_mix" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |e AS (
        |  SELECT doc_id,
        |         unnest(generate_series(0, len(toks) - 1, $segPer)) AS st,
        |         toks
        |  FROM t WHERE len(toks) > 0
        |), seg AS (
        |  SELECT doc_id, list_slice(toks, st + 1, st + $segPer) AS ctoks FROM e
        |), h AS (
        |  SELECT doc_id,
        |    len(list_filter(ctoks, t -> t IN ${inList(TextAnalysis.stopEn)})) AS en,
        |    len(list_filter(ctoks, t -> t IN ${inList(TextAnalysis.stopEs)})) AS es,
        |    len(list_filter(ctoks, t -> t IN ${inList(TextAnalysis.stopDe)})) AS de,
        |    len(list_filter(ctoks, t -> t IN ${inList(TextAnalysis.stopFr)})) AS fr
        |  FROM seg
        |), l AS (
        |  SELECT doc_id,
        |         CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |              WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |              WHEN de >= fr AND de > 0 THEN 'de'
        |              WHEN fr > 0 THEN 'fr'
        |              ELSE 'und' END AS lang
        |  FROM h
        |), c AS (
        |  SELECT doc_id, lang, count(*) AS k FROM l GROUP BY 1, 2
        |), r AS (
        |  SELECT doc_id, lang, k,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY k DESC, lang) AS rn
        |  FROM c
        |)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_segments,
        |       count(*) AS n_langs,
        |       max(CASE WHEN rn = 1 THEN lang END) AS main_lang,
        |       CAST(max(CASE WHEN rn = 1 THEN k END) AS DOUBLE)
        |         / CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) AS main_frac
        |FROM r GROUP BY 1""".stripMargin,

    // q78's vocabulary chain feeding a positional token join;
    // list_zip(toks, range) is the q58 position idiom.
    "q100_token_ids" ->
      s"""WITH pd AS (
        |  SELECT token, doc_id, count(*) AS k
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2
        |), v0 AS (
        |  SELECT token, CAST(sum(k) AS BIGINT) AS freq FROM pd GROUP BY 1
        |), top AS (SELECT * FROM v0 ORDER BY freq DESC, token LIMIT $vocabTopN),
        |v AS (
        |  SELECT token,
        |         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
        |  FROM top
        |), tok AS (
        |  SELECT doc_id, pr[1] AS token, CAST(pr[2] AS BIGINT) AS pos
        |  FROM (SELECT doc_id, unnest(list_zip(toks, range(0, len(toks)))) AS pr
        |        FROM (SELECT doc_id, $toksSql AS toks FROM documents))
        |)
        |SELECT t.doc_id, t.pos,
        |       CAST(coalesce(v.rank, 0) AS BIGINT) AS token_id
        |FROM tok t LEFT JOIN v USING (token)""".stripMargin,

    "q101_split_leakage" ->
      s"""WITH a AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
        |         ${graft.ops.Sampling.splitCaseSql("doc_id", leakSalt, leakSplits)} AS split
        |  FROM documents
        |)
        |SELECT fp,
        |       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |       CAST(sum(CASE WHEN split = 'train' THEN 0 ELSE 1 END) AS BIGINT) AS n_eval,
        |       min(CASE WHEN split = 'train' THEN doc_id END) AS train_id,
        |       min(CASE WHEN split <> 'train' THEN doc_id END) AS eval_id
        |FROM a GROUP BY 1
        |HAVING sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
        |   AND sum(CASE WHEN split = 'train' THEN 0 ELSE 1 END) > 0""".stripMargin,

    "q102_tfidf_keywords" ->
      s"""WITH tf AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, token, tf,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM tf
        |), nd AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, token, tf, df,
        |         CAST(tf AS DOUBLE) * CAST(n AS DOUBLE) / CAST(df AS DOUBLE)
        |           AS score
        |  FROM wd, nd
        |)
        |SELECT doc_id, rn, token, tf, df, score FROM (
        |  SELECT doc_id, token, tf, df, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, token) AS BIGINT) AS rn
        |  FROM scored
        |) WHERE rn <= 5""".stripMargin,

    "q106_collocations" -> {
      val unions = (1 until 3).map { j =>
        s"""SELECT pr[1] AS a, pr[2] AS b FROM (
           |    SELECT unnest(list_zip(
           |      toks[1:greatest(len(toks) - $j, 0)],
           |      toks[${j + 1}:len(toks)])) AS pr
           |    FROM t WHERE len(toks) >= 2)""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
        |p AS (
        |  $unions
        |), pc AS (
        |  SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |), uni AS (
        |  SELECT t2 AS tok, count(*) AS c
        |  FROM (SELECT unnest(toks) AS t2 FROM t) GROUP BY 1
        |), scored AS (
        |  SELECT pc.a, pc.b, pc.c_ab, ua.c AS c_a, ub.c AS c_b,
        |         CAST(pc.c_ab AS DOUBLE)
        |           / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS score
        |  FROM pc JOIN uni ua ON pc.a = ua.tok JOIN uni ub ON pc.b = ub.tok
        |), top AS (
        |  SELECT * FROM scored ORDER BY score DESC, a, b LIMIT 20
        |)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, a, b) AS BIGINT)
        |         AS rank,
        |       a, b, c_ab, c_a, c_b, score
        |FROM top""".stripMargin
    },

    "q108_quality_by_source" ->
      s"""WITH sc AS (
        |  SELECT source,
        |         CAST(floor((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
        |           + (1.0 - CAST(len(list_filter(toks, t -> t IN ${inList(TextAnalysis.stopEn)})) AS DOUBLE)
        |               / greatest(len(toks), 1)) * 0.3
        |           + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
        |               / greatest(length(text), 1)) * 0.1) * 1000000.0) AS BIGINT) AS qm
        |  FROM (SELECT source, text, $toksSql AS toks FROM documents)
        |), r AS (
        |  SELECT source, qm,
        |         row_number() OVER (PARTITION BY source ORDER BY qm) AS rn,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM sc
        |), qt AS (
        |  SELECT source,
        |         max(CASE WHEN rn = ceil(0.25 * n) THEN qm END) AS p25,
        |         max(CASE WHEN rn = ceil(0.5 * n)  THEN qm END) AS p50,
        |         max(CASE WHEN rn = ceil(0.75 * n) THEN qm END) AS p75
        |  FROM r GROUP BY 1
        |), st AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(qm) AS BIGINT) AS qsum
        |  FROM sc GROUP BY 1
        |)
        |SELECT st.source, st.n_docs,
        |       CAST(qsum AS DOUBLE) / n_docs / 1000000.0 AS mean_q,
        |       p25, p50, p75
        |FROM st JOIN qt USING (source)""".stripMargin,
  )
}
