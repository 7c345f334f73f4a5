package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.NearDup
import graft.ops.Features
import graft.text.TextAnalysis

/** The curation GATE family over the `documents` table: per-doc drop/keep
  * rules (Gopher hard gates + repetition coverage, phrase blocklist,
  * language filters, adaptive quality cuts, decision records), the
  * mixture-tilt/NB-langid learned gates, and the composed ONE-PLAN
  * curation pipeline (attrition datasheet, survivors, per-source
  * breakout, budget planner). Split from [[Curation]] (round 10) purely
  * mechanically — query names, semantics, and oracles unchanged;
  * [[Curation]] keeps the mixture/packing/layout/snapshot families and
  * the shared planted-shift helpers both files use.
  */
object CurationGates extends QueryModule {

  /** q379's banned-phrase list: harness-vocabulary phrases that DO
    * occur (so both verdicts appear) plus one that cannot. */
  private val blockPhrases = Seq("table scan merge", "join order",
    "batch batch batch", "slow query", "data line",
    "purple elephant parade")

  /** q392/q393 input: corpus with planted self-repetition (%13 texts
    * doubled — the repetition gate's work) and exact duplicates (%7
    * docs re-issued under shifted ids — the dedup stage's work);
    * repetition planted BEFORE duplication so copies stay exact. The
    * shift derives from max(doc_id)+1 in-plan ([[Curation.plantShift]])
    * so planted ids stay disjoint at any scale factor. */
  private[queries] def curateInput(base: DataFrame) = {
    val rep = base.select(col("doc_id"),
      when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
    rep.unionAll(rep.filter(col("doc_id") % 7 === 0)
      .crossJoin(Curation.plantShift(base))
      .select((col("doc_id") + col("_shift")).as("doc_id"), col("text")))
  }

  /** doc_id → source for the planted corpus (q400/q401): the same
    * derived shift as [[curateInput]] so planted copies resolve to
    * their original's source. */
  private def plantedSources(base: DataFrame) =
    base.select(col("doc_id"), col("source"))
      .unionAll(base.filter(col("doc_id") % 7 === 0)
        .crossJoin(Curation.plantShift(base))
        .select((col("doc_id") + col("_shift")).as("doc_id"), col("source")))

  /** The same planted input as a DuckDB table expression. */
  private[queries] val curateInputSql =
    s"""(WITH rep AS (
      |   SELECT doc_id,
      |          CASE WHEN doc_id % 13 = 0 THEN text || ' ' || text
      |               ELSE text END AS text
      |   FROM documents)
      | SELECT doc_id, text FROM rep
      | UNION ALL
      | SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, text FROM rep
      | WHERE doc_id % 7 = 0)""".stripMargin

  /** q99: 16-token language-ID segments. */
  private val segPer = 16

  /** q403–q405 input: [[curateInput]]'s plants (repetition %13, exact
    * dups %7) extended with release-stage work — PII appended to %19≡3
    * texts BEFORE duplication (copies stay exact, so the dedup stage
    * keeps its work) and NEAR-dup copies of %11≡0 docs at a second
    * derived shift with a 2-token prefix (not exact ⇒ passes stage 5,
    * caught by stage 8's MinHash clusters). */
  private def releaseInput(base: DataFrame) = {
    val rep = base.select(col("doc_id"),
      when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
    val pii = rep.select(col("doc_id"),
      when(col("doc_id") % 19 === 3,
        concat(col("text"), lit(" contact agent"),
          col("doc_id").cast("string"), lit("@example.com now")))
        .otherwise(col("text")).as("text"))
    val sh = Curation.plantShift(base)
    pii
      .unionAll(pii.filter(col("doc_id") % 7 === 0).crossJoin(sh)
        .select((col("doc_id") + col("_shift")).as("doc_id"), col("text")))
      .unionAll(pii.filter(col("doc_id") % 11 === 0).crossJoin(sh)
        .select((col("doc_id") + col("_shift") * 2).as("doc_id"),
          concat(lit("mirror copy "), col("text")).as("text")))
  }

  /** doc_id → source for [[releaseInput]]'s planted ids. */
  private def releaseSources(base: DataFrame) = {
    val sh = Curation.plantShift(base)
    base.select(col("doc_id"), col("source"))
      .unionAll(base.filter(col("doc_id") % 7 === 0).crossJoin(sh)
        .select((col("doc_id") + col("_shift")).as("doc_id"),
          col("source")))
      .unionAll(base.filter(col("doc_id") % 11 === 0).crossJoin(sh)
        .select((col("doc_id") + col("_shift") * 2).as("doc_id"),
          col("source")))
  }

  /** q403's benchmark: the %17≡0 slice of the ORIGINAL docs — those
    * docs sit verbatim in the pipeline input too, so decontamination
    * has true self-leak work (the eval set leaked into the crawl). */
  private def releaseBench(base: DataFrame) =
    base.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), col("text"))

  /** The PRODUCTION path of the release family, priced once (round-12
    * item 4, the x37 chain-once precedent): materialize the 8-stage
    * [[graft.text.Curate.releaseVerdicts]] frame (+source) to parquet
    * ONE time, then serve every consumer from it — datasheet,
    * by-source breakout, survivors+splits, water-fill token-budget
    * sample, training-order layout. The five gate queries
    * (q403/404/405/414/443) re-derive this chain per query for oracle
    * self-containment (~5× the work); Bench's `x403_release_chain`
    * times this entry so the gate-vs-production gap is an explicit
    * artifact number instead of a scaladoc claim. Timed region
    * includes the write and every consumer. */
  // one temp dir per (process, data dir), reused across bench passes:
  // per-run unique (concurrent bench runs never clobber each other) yet
  // bounded on disk (repeated passes overwrite, never accumulate)
  private val chainTableDirs =
    scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def releaseChainOnce(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir).documents
    val tableDir = chainTableDirs.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft_release_chain").toString)
    graft.text.Curate.releaseVerdicts(releaseInput(base), "doc_id",
        "text", blockPhrases, releaseBench(base), minTokens = 10L)
      .join(releaseSources(base), "doc_id")
      .write.mode("overwrite").parquet(tableDir)
    val v = s.read.parquet(tableDir)
    graft.text.Curate.attritionFromVerdicts(
      v.select(col("doc_id"), col("n_tokens"), col("stage"))).count()
    graft.text.Curate.attritionBySourceFromVerdicts(v).count()
    val surv = graft.text.Curate.survivorsFromVerdicts(v, "doc_id")
      .join(v.select(col("doc_id"), col("source")), "doc_id")
    val ps = surv.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("avail"))
    val alloc = graft.ops.Sampling.waterFillAllocation(ps, "source",
      "avail", Curation.budgetWeights, defaultWeight = 1L,
      budgetNum = 1L, budgetDen = 2L)
    val sampled = graft.ops.Sampling.tokenBudgetSample(surv, "source",
      "doc_id", "n_tokens", alloc, "alloc", salt = "budget")
    graft.ops.Sharding.shardLayout(sampled, "doc_id",
        col("n_tokens"), nShards = 8, salt = "layout-rel")
      .join(sampled.select(col("doc_id"), col("source"), col("split")),
        "doc_id")
  }

  /** The same planted input / sources / benchmark as DuckDB SQL. */
  private val releaseInputSql =
    s"""(WITH rep AS (
      |   SELECT doc_id,
      |          CASE WHEN doc_id % 13 = 0 THEN text || ' ' || text
      |               ELSE text END AS text
      |   FROM documents),
      | pii AS (
      |   SELECT doc_id,
      |          CASE WHEN doc_id % 19 = 3
      |               THEN text || ' contact agent' ||
      |                    CAST(doc_id AS VARCHAR) || '@example.com now'
      |               ELSE text END AS text
      |   FROM rep)
      | SELECT doc_id, text FROM pii
      | UNION ALL
      | SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, text
      | FROM pii WHERE doc_id % 7 = 0
      | UNION ALL
      | SELECT doc_id + 2 * ${Curation.plantShiftSql} AS doc_id,
      |        'mirror copy ' || text AS text
      | FROM pii WHERE doc_id % 11 = 0)""".stripMargin

  private val releaseSourcesSql =
    s"""SELECT doc_id, source FROM documents
      | UNION ALL
      | SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, source
      | FROM documents WHERE doc_id % 7 = 0
      | UNION ALL
      | SELECT doc_id + 2 * ${Curation.plantShiftSql} AS doc_id, source
      | FROM documents WHERE doc_id % 11 = 0""".stripMargin

  private val releaseBenchSql =
    "(SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // Segment-level language mixing (code-switching detector): per-doc
    // language profile from per-16-token-segment language ID — the
    // granularity whole-doc q21 can't see. Zero-shuffle segmentation,
    // two keyed aggs.
    "q99_language_mix" -> ((s, dir) =>
      graft.text.Segments.languageMix(Tables(s, dir).documents,
        "doc_id", "text", segPer)),

    // q99's removal form: monolingual extraction — keep only the
    // English-verdict segments, re-serialized in document order; mixed
    // docs contribute their matching paragraphs instead of polluting
    // the bucket whole. One keyed aggregation after zero-shuffle
    // chunking; token-free docs survive as (0, 0, '').
    "q315_lang_filter" -> ((s, dir) =>
      graft.text.Segments.languageFilterSegments(Tables(s, dir).documents,
        "doc_id", "text", segPer, targetLang = "en")),

    // Gopher-rule hard gates (Rae et al. A1.1 adapted): five named
    // pass/fail rules per doc in integer cross-multiplication — the
    // threshold-curation companion to q20's continuous score; min
    // tokens 10 on this short-doc corpus so both verdicts occur.
    "q364_gopher_rules" -> ((s, dir) =>
      graft.text.Gopher.ruleGates(Tables(s, dir).documents,
        "doc_id", "text", minTokens = 10L)),

    // Multi-token phrase blocklist: exact token-boundary matching of a
    // banned-phrase list (lengths 2 and 3 here) via per-length L-gram
    // windows + a broadcast phrase join — the curation gate form;
    // zero-hit docs pass through in the report.
    "q379_blocklist" -> ((s, dir) =>
      graft.text.Blocklist.phraseHits(Tables(s, dir).documents,
        "doc_id", "text", blockPhrases)),

    // DoReMi-flavored mixture tilt: per-source Kneser–Ney excess loss
    // (q362's per-doc bits, bigram mass as the base share) multiplied
    // into the mixture weights at η = 1/5, renormalized to micros —
    // the "upweight what the reference LM finds hard" step, one-step
    // form stated honestly. Pure integer arithmetic end to end.
    "q382_doremi_tilt" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val perDoc = graft.text.LangModel.kneserNeyScore(docs, "doc_id",
          "text", docs, "text")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.ops.Sampling.excessLossTilt(perDoc, "source",
        bitsCol = "total_bits", massCol = "n_bigrams")
    }),

    // Char-trigram Naive Bayes language ID: the q155 learned
    // classifier with its feature extractor swapped to char shingles,
    // so non-Latin scripts are separable (the ASCII word tokenizer
    // sees them as boundary soup) — trained on the labeled fixture
    // slice, classifying slice + a corpus sample; the "bootstrap from
    // a labeled slice" NB use case, multilingual.
    "q384_char_langid" -> ((s, dir) => {
      import s.implicits._
      val slice = TextDedup.multilingualPlanted.toDF("doc_id", "text")
      val train = slice.join(
        TextDedup.multilingualLangs.toDF("doc_id", "lang"), "doc_id")
      val eval = slice.unionByName(Tables(s, dir).documents
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text")))
      graft.text.NaiveBayes.trainAndClassify(train, "lang", "text",
        eval, "doc_id", units = t => NearDup.charShingles(t, 3))
    }),

    // Borda rank fusion of three incomparable-scale quality signals
    // (token count ↑, hashed-linear score ↑, 5-gram repetition ↓) into
    // one exact integer ensemble score — doubled tie-averaged ranks,
    // no normalization constants, no float weights.
    "q381_quality_fusion" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val qm = graft.text.QualityModel.score(d, "doc_id", "text",
          Text.qmWeights, Text.qmD, Text.qmSalt)
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("m_len"),
          col("raw").cast("long").as("m_linear"))
      val rep = graft.text.Gopher
        .dupNgramCoverage(d, "doc_id", "text", ns = Seq(5))
        .select(col("doc_id"), col("frac_micro").as("m_rep"))
      Features.bordaFusion(qm.join(rep, "doc_id"), "doc_id",
        Seq(("m_len", true), ("m_linear", true), ("m_rep", false)))
    }),

    // Unicode script-mix profile over corpus + multilingual fixture:
    // per-doc letter mass by script, fixed-order dominant script, and
    // the >=2-scripts-at-5% mixed flag (homoglyph/code-switch signal) —
    // one regex-count projection, zero shuffles, BMP contract.
    "q380_script_mix" -> ((s, dir) => {
      import s.implicits._
      graft.text.Scripts.scriptMix(
        Tables(s, dir).documents.select(col("doc_id"), col("text"))
          .unionByName(TextDedup.multilingualPlanted
            .toDF("doc_id", "text")),
        "doc_id", "text")
    }),

    // Script-RUN code-switching profile over corpus + fixture: letter
    // compaction kills word-boundary false alternation, per-script
    // maximal runs by the collapse-minus-delete identity, switches =
    // total_runs − 1 with integer micro density — the signal that
    // separates a translation pair from homoglyph spoofing.
    "q387_script_runs" -> ((s, dir) => {
      import s.implicits._
      graft.text.Scripts.scriptRuns(
        Tables(s, dir).documents.select(col("doc_id"), col("text"))
          .unionByName(TextDedup.multilingualPlanted
            .toDF("doc_id", "text")),
        "doc_id", "text")
    }),

    // ONE-PLAN curation pipeline (round-9 item 3): the round-8 gates —
    // Gopher rules + repetition coverage + blocklist + KN ceiling —
    // composed with exact dedup and split as one lazy plan. Input
    // plants work for every stage: doc_id%13 texts are self-doubled
    // (repetition gate fires), doc_id%7 docs are duplicated under
    // shifted ids (dedup fires); gopher/blocklist/kn are naturally
    // selective on this corpus. q392 is the per-stage ATTRITION
    // datasheet; q393 the released corpus with splits.
    "q392_curation_attrition" -> ((s, dir) =>
      graft.text.Curate.attrition(
        curateInput(Tables(s, dir).documents), "doc_id", "text",
        blockPhrases, minTokens = 10L)),

    "q393_curation_survivors" -> ((s, dir) =>
      graft.text.Curate.survivors(
        curateInput(Tables(s, dir).documents), "doc_id", "text",
        blockPhrases, minTokens = 10L, splits = Curation.corpusSplits)),

    // The corpus-build PLANNER end to end: curation survivors (q393's
    // released corpus) -> per-source surviving token supply -> q129's
    // water-fill allocation at a half-supply budget. The number this
    // emits per source is the token allocation a 100 TB build actually
    // samples to — pipeline and planner in ONE lazy plan.
    "q401_curation_budget" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val srcs = plantedSources(base)
      val surv = graft.text.Curate.survivors(curateInput(base), "doc_id",
        "text", blockPhrases, minTokens = 10L,
        splits = Curation.corpusSplits)
      // localCheckpoint the SOURCE-cardinality supply frame: the
      // allocator's per-round aggregates chain on the prior state, and
      // without the lineage cut each of the 3 rounds replays the whole
      // upstream curation pipeline (~2^rounds, measured 27.8 s → the
      // pipeline's one-pass cost)
      val ps = surv.join(srcs, "doc_id")
        .groupBy(col("source")).agg(sum(col("n_tokens")).as("avail"))
        .localCheckpoint()
      graft.ops.Sampling.waterFillAllocation(ps, "source", "avail",
        Curation.budgetWeights, defaultWeight = 1L, budgetNum = 1L,
        budgetDen = 2L)
    }),

    // The budget planner MATERIALIZED (round-10 item 3): q401's
    // per-source alloc composed with the token-budget sampler to EMIT
    // the actual sampled training corpus — (doc_id, source, n_tokens,
    // split, cum_tokens), winners a deterministic salted-hash PREFIX
    // per source (raising an alloc only adds docs; SamplingSpec
    // asserts both properties). The survivor frame is checkpointed
    // ONCE and feeds supply, allocator, and sampler — the whole
    // pipeline evaluates a single time (the q401 lineage lesson).
    "q411_budget_sampled" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val surv = graft.text.Curate.survivors(curateInput(base), "doc_id",
        "text", blockPhrases, minTokens = 10L,
        splits = Curation.corpusSplits)
        .join(plantedSources(base), "doc_id")
        .localCheckpoint()
      val ps = surv.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("avail"))
      val alloc = graft.ops.Sampling.waterFillAllocation(ps, "source",
        "avail", Curation.budgetWeights, defaultWeight = 1L,
        budgetNum = 1L, budgetDen = 2L)
      graft.ops.Sampling.tokenBudgetSample(surv, "source", "doc_id",
        "n_tokens", alloc, "alloc", salt = "budget")
    }),

    // q392 broken out BY SOURCE — which sources lose most to which
    // gate, the table a corpus release's datasheet actually prints.
    "q400_curation_by_source" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      graft.text.Curate.attritionBySource(
        curateInput(base), "doc_id", "text", plantedSources(base), "source",
        blockPhrases, minTokens = 10L)
    }),

    // The FULL corpus-release pipeline (round-10 item 1): q392's five
    // stages extended with 6 PII density, 7 benchmark decontamination,
    // 8 MinHash near-dup cluster resolution — first-failing-stage
    // attribution over all eight, per-stage drops still sum. Input
    // plants work for every stage (see releaseInput); the benchmark is
    // an in-corpus slice so decontam flags true self-leaks. q403 is
    // the 9-row release DATASHEET; q404 the released corpus + splits;
    // q405 the per-source breakout (rows sum to q403, spec-asserted).
    "q403_release_attrition" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      graft.text.Curate.attritionRelease(releaseInput(base), "doc_id",
        "text", blockPhrases, releaseBench(base), minTokens = 10L)
    }),

    "q404_release_survivors" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      graft.text.Curate.survivorsRelease(releaseInput(base), "doc_id",
        "text", blockPhrases, releaseBench(base), minTokens = 10L,
        splits = Curation.corpusSplits)
    }),

    "q405_release_by_source" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      graft.text.Curate.attritionBySourceRelease(releaseInput(base),
        "doc_id", "text", releaseSources(base), "source", blockPhrases,
        releaseBench(base), minTokens = 10L)
    }),

    // The COMPLETE release artifact (capstone composition): the 8-stage
    // release pipeline's survivors -> per-source token supply ->
    // water-fill allocation -> token-budget sampling, ONE run emitting
    // the corpus a training job actually reads — (doc_id, source,
    // n_tokens, split, cum_tokens). Survivors checkpointed once (the
    // q411 shape over releaseVerdicts); winners a deterministic
    // salted-hash prefix per source.
    "q414_release_sampled" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val surv = graft.text.Curate.survivorsRelease(releaseInput(base),
        "doc_id", "text", blockPhrases, releaseBench(base),
        minTokens = 10L, splits = Curation.corpusSplits)
        .join(releaseSources(base), "doc_id")
        .localCheckpoint()
      val ps = surv.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("avail"))
      val alloc = graft.ops.Sampling.waterFillAllocation(ps, "source",
        "avail", Curation.budgetWeights, defaultWeight = 1L,
        budgetNum = 1L, budgetDen = 2L)
      graft.ops.Sampling.tokenBudgetSample(surv, "source", "doc_id",
        "n_tokens", alloc, "alloc", salt = "budget")
    }),

    // The round's capstone composed ONE step further: q414's sampled
    // release corpus laid out into the actual TRAINING ORDER — the
    // q418 hash layout over the survivors, (shard, pos) per document
    // with source/split carried. Raw planted crawl → 8 gates → water-
    // fill budget → deterministic epoch order, one lineage end to end.
    "q443_release_layout" -> ((s, dir) => {
      val base = Tables(s, dir).documents
      val surv = graft.text.Curate.survivorsRelease(releaseInput(base),
        "doc_id", "text", blockPhrases, releaseBench(base),
        minTokens = 10L, splits = Curation.corpusSplits)
        .join(releaseSources(base), "doc_id")
        .localCheckpoint()
      val ps = surv.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("avail"))
      val alloc = graft.ops.Sampling.waterFillAllocation(ps, "source",
        "avail", Curation.budgetWeights, defaultWeight = 1L,
        budgetNum = 1L, budgetDen = 2L)
      // referenced twice (layout input + the source/split join) — left
      // lazy the whole water-fill + budget-sample chain executed twice
      // per run (350-Exchange plan, see plans/r14/q443_*_before.txt)
      val sampled = graft.ops.Sampling.tokenBudgetSample(surv, "source",
        "doc_id", "n_tokens", alloc, "alloc", salt = "budget")
        .localCheckpoint()
      graft.ops.Sharding.shardLayout(sampled, "doc_id",
          col("n_tokens"), nShards = 8, salt = "layout-rel")
        .join(sampled.select(col("doc_id"), col("source"), col("split")),
          "doc_id")
    }),

    // Gopher REPETITION rules: per doc, chars covered by duplicated
    // n-grams (n=5,10) as merged positional intervals over the
    // normalized token stream — the coverage half of the Gopher filter
    // next to q364's hard thresholds and q54's count ratios; ladder
    // gate (20−n)/100 by integer cross-multiplication.
    "q377_gopher_repetition" -> ((s, dir) =>
      graft.text.Gopher.dupNgramCoverage(Tables(s, dir).documents,
        "doc_id", "text")),

    // q315 over the NON-ASCII slice (round-7 verdict item 2): the lang
    // filter's behavior on scripts the ASCII tokenizer cannot see,
    // GATED — pure non-Latin docs tokenize empty and survive as
    // (0, 0, ''), accent-mangled Romance text keeps its deterministic
    // stopword verdicts; the char-level routes (q354) are the dedup
    // path for these scripts, and this gate pins the documented
    // contract instead of leaving it prose.
    "q355_multilingual_langfilter" -> ((s, dir) => {
      import s.implicits._
      val all = Tables(s, dir).documents.select(col("doc_id"), col("text"))
        .unionByName(TextDedup.multilingualPlanted.toDF("doc_id", "text"))
      graft.text.Segments.languageFilterSegments(all,
        "doc_id", "text", segPer, targetLang = "en")
    }),
  )

  /** q315/q355 shared oracle: the segment + stopword-verdict chain
    * with the ordered reassembly fold, over any (doc_id, text) src. */
  private def langFilterOracleSql(src: String): String =
    s"""WITH t AS (SELECT doc_id, ${Text.toksSql} AS toks FROM ($src)),
        |e AS (
        |  SELECT doc_id,
        |         unnest(generate_series(0, len(toks) - 1, $segPer)) AS st,
        |         toks
        |  FROM t WHERE len(toks) > 0
        |), seg AS (
        |  SELECT doc_id, st, list_slice(toks, st + 1, st + $segPer) AS ctoks
        |  FROM e
        |), h AS (
        |  SELECT doc_id, st, ctoks,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopEn)})) AS en,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopEs)})) AS es,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopDe)})) AS de,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopFr)})) AS fr
        |  FROM seg
        |), l AS (
        |  SELECT doc_id, st, ctoks,
        |         CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |              WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |              WHEN de >= fr AND de > 0 THEN 'de'
        |              WHEN fr > 0 THEN 'fr'
        |              ELSE 'und' END AS lang
        |  FROM h
        |), g AS (
        |  SELECT doc_id, count(*) AS n_segments,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         coalesce(string_agg(CASE WHEN lang = 'en'
        |             THEN array_to_string(ctoks, ' ') END, ' ' ORDER BY st), '')
        |           AS kept_text
        |  FROM l GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       CAST(coalesce(g.n_segments, 0) AS BIGINT) AS n_segments,
        |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(g.kept_text, '') AS kept_text
        |FROM ($src) d LEFT JOIN g USING (doc_id)""".stripMargin

  /** q414's oracle (the sampled release corpus) — shared with q443's
    * layout composition. */
  private def releaseSampledSql: String = {
    val dsSql =
      s"""WITH pd AS (${graft.text.Curate.survivorsReleaseOracleSql(
            releaseInputSql, releaseBenchSql, Text.toksSql, blockPhrases,
            minTokens = 10L, splits = Curation.corpusSplits)})
         |SELECT p.doc_id, p.n_tokens, p.split, s.source
         |FROM pd p JOIN ($releaseSourcesSql) s USING (doc_id)"""
        .stripMargin
    val allocSql = graft.ops.Sampling.waterFillOracleSql(
      "SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail FROM ds GROUP BY 1",
      Curation.budgetWeights, defaultWeight = 1L, budgetNum = 1L,
      budgetDen = 2L)
    s"""WITH ds AS MATERIALIZED ($dsSql),
       |alloc AS MATERIALIZED ($allocSql)
       |SELECT doc_id, source, n_tokens, split,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens FROM (
       |  SELECT ds.doc_id, ds.source, ds.n_tokens, ds.split,
       |         a.alloc AS __alloc,
       |         sum(ds.n_tokens) OVER (PARTITION BY ds.source
       |           ORDER BY ${graft.ops.Sampling.capPrioritySql(
                     "ds.doc_id", "budget")}, ds.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS cum_tokens
       |  FROM ds JOIN alloc a ON ds.source = a.source
       |) WHERE cum_tokens <= __alloc""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
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
        |         len(list_filter(${Text.toksSql}, t -> t IN ('the','a','and','of','to','in','is','it'))) AS en,
        |         len(list_filter(${Text.toksSql}, t -> t IN ('el','la','de','y','que','los','en','un'))) AS es,
        |         len(list_filter(${Text.toksSql}, t -> t IN ('der','die','das','und','ist','ein','nicht','mit'))) AS de,
        |         len(list_filter(${Text.toksSql}, t -> t IN ('le','les','des','et','est','une','dans','pour'))) AS fr,
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

    "q364_gopher_rules" -> graft.text.Gopher.ruleGatesOracleSql(
      "documents", "doc_id", Text.toksSql, minTokens = 10L),

    "q377_gopher_repetition" -> graft.text.Gopher.dupNgramCoverageOracleSql(
      "documents", "doc_id", Text.toksSql),

    "q392_curation_attrition" -> graft.text.Curate.attritionOracleSql(
      curateInputSql, Text.toksSql, blockPhrases, minTokens = 10L),

    "q393_curation_survivors" -> graft.text.Curate.survivorsOracleSql(
      curateInputSql, Text.toksSql, blockPhrases, minTokens = 10L,
      splits = Curation.corpusSplits),

    "q401_curation_budget" -> graft.ops.Sampling.waterFillOracleSql(
      s"""(WITH pd AS (${graft.text.Curate.survivorsOracleSql(
            curateInputSql, Text.toksSql, blockPhrases, minTokens = 10L,
            splits = Curation.corpusSplits)})
         | SELECT s.source, CAST(sum(p.n_tokens) AS BIGINT) AS avail
         | FROM pd p JOIN (
         |   SELECT doc_id, source FROM documents
         |   UNION ALL
         |   SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, source
         |   FROM documents WHERE doc_id % 7 = 0) s USING (doc_id)
         | GROUP BY 1)""".stripMargin,
      Curation.budgetWeights, defaultWeight = 1L, budgetNum = 1L,
      budgetDen = 2L),

    "q411_budget_sampled" -> {
      val dsSql =
        s"""WITH pd AS (${graft.text.Curate.survivorsOracleSql(
              curateInputSql, Text.toksSql, blockPhrases, minTokens = 10L,
              splits = Curation.corpusSplits)})
           |SELECT p.doc_id, p.n_tokens, p.split, s.source
           |FROM pd p JOIN (
           |  SELECT doc_id, source FROM documents
           |  UNION ALL
           |  SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, source
           |  FROM documents WHERE doc_id % 7 = 0) s USING (doc_id)"""
          .stripMargin
      graft.ops.Sampling.tokenBudgetSampleOracleSql(
        dsSql,
        graft.ops.Sampling.waterFillOracleSql(
          s"SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail FROM ($dsSql) GROUP BY 1",
          Curation.budgetWeights, defaultWeight = 1L, budgetNum = 1L,
          budgetDen = 2L),
        "source", "doc_id", "n_tokens", "alloc", salt = "budget",
        carryCols = Seq("split"))
    },

    // ds is MATERIALIZED: the 8-stage chain (MinHash + recursive CC
    // inside) referenced twice would otherwise re-open the parquet per
    // reference ("Too many open files", the documented DuckDB trap).
    "q414_release_sampled" -> releaseSampledSql,

    "q443_release_layout" ->
      s"""WITH samp AS MATERIALIZED ($releaseSampledSql),
         |lay AS (${graft.ops.Sharding.shardLayoutOracleSql(
            "SELECT doc_id, n_tokens FROM samp", "doc_id",
            nShards = 8, salt = "layout-rel")})
         |SELECT lay.doc_id, lay.shard, lay.pos, lay.n_tokens,
         |       samp.source, samp.split
         |FROM lay JOIN samp USING (doc_id)""".stripMargin,

    "q400_curation_by_source" -> graft.text.Curate
      .attritionBySourceOracleSql(
        curateInputSql,
        s"""SELECT doc_id, source FROM documents
          | UNION ALL
          | SELECT doc_id + ${Curation.plantShiftSql} AS doc_id, source
          | FROM documents WHERE doc_id % 7 = 0""".stripMargin,
        Text.toksSql, blockPhrases, minTokens = 10L),

    "q403_release_attrition" -> graft.text.Curate.attritionReleaseOracleSql(
      releaseInputSql, releaseBenchSql, Text.toksSql, blockPhrases,
      minTokens = 10L),

    "q404_release_survivors" -> graft.text.Curate.survivorsReleaseOracleSql(
      releaseInputSql, releaseBenchSql, Text.toksSql, blockPhrases,
      minTokens = 10L, splits = Curation.corpusSplits),

    "q405_release_by_source" -> graft.text.Curate
      .attritionBySourceReleaseOracleSql(
        releaseInputSql, releaseBenchSql, releaseSourcesSql, Text.toksSql,
        blockPhrases, minTokens = 10L),

    "q379_blocklist" -> graft.text.Blocklist.phraseHitsOracleSql(
      "documents", "doc_id", Text.toksSql, blockPhrases),

    "q382_doremi_tilt" -> graft.ops.Sampling.excessLossTiltOracleSql(
      s"""SELECT d.source AS src, k.total_bits AS bits,
         |       k.n_bigrams AS mass
         |FROM (${graft.text.LangModel.kneserNeyScoreOracleSql(
            s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents",
            s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents")}) k
         |JOIN documents d ON d.doc_id = k.doc_id""".stripMargin,
      srcName = "source"),

    "q384_char_langid" -> {
      val fold = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
      val sh = NearDup.duckCharShinglesSql(fold, 3)
      graft.text.NaiveBayes.classifyOracleSql(
        s"""SELECT lang AS lab, $sh AS toks
           |FROM (VALUES ${TextDedup.multilingualLabeledValuesSql})
           |     v(doc_id, text, lang)""".stripMargin,
        s"""SELECT doc_id, $sh AS toks FROM (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0
           |  UNION ALL
           |  SELECT * FROM (VALUES
           |    ${TextDedup.multilingualPlantedValuesSql}) v(doc_id, text))
           |""".stripMargin)
    },

    "q381_quality_fusion" -> Features.bordaFusionOracleSql(
      s"""SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS m_len,
         |       CAST(q.raw AS BIGINT) AS m_linear,
         |       r.frac_micro AS m_rep
         |FROM (${graft.text.QualityModel.scoreOracleSql(
            s"SELECT doc_id, ${Text.toksSql} AS toks FROM documents",
            Text.qmWeights, Text.qmD, Text.qmSalt)}) q
         |JOIN (${graft.text.Gopher.dupNgramCoverageOracleSql(
            "documents", "doc_id", Text.toksSql, ns = Seq(5))}) r
         |  ON q.doc_id = r.doc_id""".stripMargin,
      "doc_id",
      Seq(("m_len", true), ("m_linear", true), ("m_rep", false))),

    "q387_script_runs" -> graft.text.Scripts.scriptRunsOracleSql(
      s"""(SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT * FROM (VALUES
         |  ${TextDedup.multilingualPlantedValuesSql}) v(doc_id, text)) u
         |""".stripMargin,
      "doc_id"),

    "q380_script_mix" -> graft.text.Scripts.scriptMixOracleSql(
      s"""(SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT * FROM (VALUES
         |  ${TextDedup.multilingualPlantedValuesSql}) v(doc_id, text)) u
         |""".stripMargin,
      "doc_id"),

    "q355_multilingual_langfilter" ->
      langFilterOracleSql(
        s"""SELECT doc_id, text FROM documents
           |UNION ALL
           |SELECT * FROM (VALUES ${TextDedup.multilingualPlantedValuesSql})
           |  v(doc_id, text)""".stripMargin),

    "q315_lang_filter" ->
      langFilterOracleSql("SELECT doc_id, text FROM documents"),

    // Per-segment language ID mirrors q21's CASE over each 16-token
    // slice; the mode window and per-doc fold mirror languageMix.
    "q99_language_mix" ->
      s"""WITH t AS (SELECT doc_id, ${Text.toksSql} AS toks FROM documents),
        |e AS (
        |  SELECT doc_id,
        |         unnest(generate_series(0, len(toks) - 1, $segPer)) AS st,
        |         toks
        |  FROM t WHERE len(toks) > 0
        |), seg AS (
        |  SELECT doc_id, list_slice(toks, st + 1, st + $segPer) AS ctoks FROM e
        |), h AS (
        |  SELECT doc_id,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopEn)})) AS en,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopEs)})) AS es,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopDe)})) AS de,
        |    len(list_filter(ctoks, t -> t IN ${Text.inList(TextAnalysis.stopFr)})) AS fr
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
  )
}
